"""Plain fixed-scale SR generators (full nets with upsampler heads).

The reference's generic ``BasicRestorer`` (mmedited/models/restorers/
basic_restorer.py:17-237) serves any mmedit SR backbone that maps
lq → sr directly (EDSR/RDN with their pixel-shuffle upsampler heads,
which the CiaoSR variants build and discard, ciaosr_net.py:314-319,
388-391). These are the TPU-native full nets backing our BasicRestorer.

NHWC throughout; pixel shuffle follows torch semantics (channel-major
sub-pixel order) so converted torch checkpoints land correctly.
"""

from __future__ import annotations

import typing

import flax.linen as nn
import jax.numpy as jnp

from ciaosr_tpu.config.registry import BACKBONES
from ciaosr_tpu.models.edsr import EDSREncoder, conv3x3
from ciaosr_tpu.models.rdn import RDNEncoder


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """NHWC pixel shuffle with torch's channel ordering:
    input channel c·r² + dy·r + dx → output channel c at offset (dy, dx)."""
    b, h, w, c = x.shape
    oc = c // (r * r)
    x = x.reshape(b, h, w, oc, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)          # b, h, r(dy), w, r(dx), oc
    return x.reshape(b, h * r, w * r, oc)


class PixelShuffleUpsample(nn.Module):
    """conv(C→C·r²) + shuffle, factored ×2 steps for scale 2/4/8 and one
    ×3 step for scale 3 (mmedit ``UpsampleModule`` behavior)."""

    scale: int
    mid_channels: int
    dtype: typing.Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = self.scale
        steps = []
        while s % 2 == 0:
            steps.append(2)
            s //= 2
        if s == 3:
            steps.append(3)
        elif s != 1:
            raise ValueError(f"unsupported upscale factor {self.scale}")
        for i, r in enumerate(steps):
            x = conv3x3(self.mid_channels * r * r, self.mid_channels,
                        f"up_{i}", self.dtype)(x)
            x = pixel_shuffle(x, r)
        return x


@BACKBONES.register(name="EDSRNet")
class EDSRNet(nn.Module):
    """Full EDSR: trunk + pixel-shuffle upsampler + conv_last, with the
    dataset-mean shift mmedit's EDSR applies internally."""

    in_channels: int = 3
    out_channels: int = 3
    mid_channels: int = 64
    num_blocks: int = 16
    upscale_factor: int = 4
    res_scale: float = 1.0
    rgb_mean: tuple = (0.4488, 0.4371, 0.4040)
    rgb_std: tuple = (1.0, 1.0, 1.0)
    dtype: typing.Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mean = jnp.asarray(self.rgb_mean, jnp.float32)
        std = jnp.asarray(self.rgb_std, jnp.float32)
        x = (x - mean) / std
        feat = EDSREncoder(self.in_channels, self.out_channels,
                           self.mid_channels, self.num_blocks,
                           self.res_scale, dtype=self.dtype,
                           name="trunk")(x)
        up = PixelShuffleUpsample(self.upscale_factor, self.mid_channels,
                                  dtype=self.dtype, name="upsample")(feat)
        out = conv3x3(self.out_channels, self.mid_channels, "conv_last",
                      self.dtype)(up)
        return out.astype(jnp.float32) * std + mean


@BACKBONES.register(name="RDNNet")
class RDNNet(nn.Module):
    """Full RDN: trunk + UPNet (pixel-shuffle upsampler) + conv_last."""

    in_channels: int = 3
    out_channels: int = 3
    mid_channels: int = 64
    num_blocks: int = 16
    num_layers: int = 8
    channel_growth: int = 64
    upscale_factor: int = 4
    dtype: typing.Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        feat = RDNEncoder(self.in_channels, self.out_channels,
                          self.mid_channels, self.num_blocks,
                          self.num_layers, self.channel_growth,
                          dtype=self.dtype, name="trunk")(x)
        up = PixelShuffleUpsample(self.upscale_factor, self.mid_channels,
                                  dtype=self.dtype, name="upsample")(feat)
        out = conv3x3(self.out_channels, self.mid_channels, "conv_last",
                      self.dtype)(up)
        return out.astype(jnp.float32)
