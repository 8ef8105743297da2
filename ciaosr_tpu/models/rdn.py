"""RDN encoder trunk (Residual Dense Network, no upsampler).

Behavioral spec: the RDN-variant feature generator at
/root/reference/mmedited/models/backbones/sr_backbones/ciaosr_net.py:314-342
— sfe1 → sfe2 → 16 residual dense blocks (8 dense conv-relu layers, growth
64, 1×1 local fusion, local residual) → global fusion (1×1 then 3×3 over the
concat of all block outputs) → + sfe1.
"""

from __future__ import annotations

import typing

import flax.linen as nn
import jax.numpy as jnp

from ciaosr_tpu.config.registry import BACKBONES
from ciaosr_tpu.models.edsr import conv3x3
from ciaosr_tpu.utils.init import torch_kernel_init, torch_bias_init


class ResidualDenseBlock(nn.Module):
    mid_channels: int = 64
    channel_growth: int = 64
    num_layers: int = 8
    dtype: typing.Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        feat = x
        for i in range(self.num_layers):
            y = conv3x3(self.channel_growth, feat.shape[-1],
                        f"layers_{i}", self.dtype)(feat)
            feat = jnp.concatenate([feat, nn.relu(y)], axis=-1)
        lff = nn.Conv(self.mid_channels, (1, 1),
                      kernel_init=torch_kernel_init, dtype=self.dtype,
                      bias_init=torch_bias_init(feat.shape[-1]),
                      name="lff")(feat)
        return x + lff


@BACKBONES.register(name="RDN")
class RDNEncoder(nn.Module):
    in_channels: int = 3
    out_channels: int = 3          # config parity; trunk has no head
    mid_channels: int = 64
    num_blocks: int = 16
    num_layers: int = 8
    channel_growth: int = 64
    upscale_factor: int = 4        # config parity; unused by the trunk
    dtype: typing.Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        sfe1 = conv3x3(self.mid_channels, self.in_channels, "sfe1",
                       self.dtype)(x)
        sfe2 = conv3x3(self.mid_channels, self.mid_channels, "sfe2",
                       self.dtype)(sfe1)
        feat = sfe2
        locals_ = []
        for i in range(self.num_blocks):
            feat = ResidualDenseBlock(self.mid_channels, self.channel_growth,
                                      self.num_layers, dtype=self.dtype,
                                      name=f"rdb_{i}")(feat)
            locals_.append(feat)
        cat = jnp.concatenate(locals_, axis=-1)
        g = nn.Conv(self.mid_channels, (1, 1),
                    kernel_init=torch_kernel_init, dtype=self.dtype,
                    bias_init=torch_bias_init(cat.shape[-1]),
                    name="gff_0")(cat)
        g = conv3x3(self.mid_channels, self.mid_channels, "gff_1",
                    self.dtype)(g)
        return g + sfe1
