"""EDSR encoder trunk (no upsampler head).

Behavioral spec: the EDSR-variant feature generator at
/root/reference/mmedited/models/backbones/sr_backbones/ciaosr_net.py:388-408
— conv_first → N× residual blocks (conv-relu-conv, ·res_scale, +id) →
conv_after_body → + conv_first skip. The reference steals these submodules
from mmedit's EDSR and discards the upsampler; we just build the trunk.
"""

from __future__ import annotations

import typing

import flax.linen as nn
import jax.numpy as jnp

from ciaosr_tpu.config.registry import BACKBONES
from ciaosr_tpu.utils.init import torch_kernel_init, torch_bias_init


def conv3x3(features: int, in_features: int, name: str,
            dtype=None) -> nn.Conv:
    return nn.Conv(features, (3, 3), padding=((1, 1), (1, 1)),
                   kernel_init=torch_kernel_init, dtype=dtype,
                   bias_init=torch_bias_init(in_features * 9), name=name)


class ResidualBlockNoBN(nn.Module):
    mid_channels: int = 64
    res_scale: float = 1.0
    dtype: typing.Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = conv3x3(self.mid_channels, self.mid_channels, "conv1",
                    self.dtype)(x)
        y = nn.relu(y)
        y = conv3x3(self.mid_channels, self.mid_channels, "conv2",
                    self.dtype)(y)
        return x + y * self.res_scale


@BACKBONES.register(name="EDSR")
class EDSREncoder(nn.Module):
    """EDSR trunk. ``mid_channels`` is the decoder's imnet_dim
    (ciaosr_net.py:57-58)."""

    in_channels: int = 3
    out_channels: int = 3          # config parity; trunk has no head
    mid_channels: int = 64
    num_blocks: int = 16
    res_scale: float = 1.0
    upscale_factor: int = 4        # config parity; unused by the trunk
    dtype: typing.Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = conv3x3(self.mid_channels, self.in_channels, "conv_first",
                    self.dtype)(x)
        res = x
        for i in range(self.num_blocks):
            res = ResidualBlockNoBN(self.mid_channels, self.res_scale,
                                    dtype=self.dtype, name=f"body_{i}")(res)
        res = conv3x3(self.mid_channels, self.mid_channels,
                      "conv_after_body", self.dtype)(res)
        return res + x
