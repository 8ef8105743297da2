"""U-Net discriminator with spectral normalization.

Behavioral spec: UNetDiscriminatorWithSpectralNorm at
/root/reference/mmedited/models/components/discriminators/unet_disc.py:10-109
(the registered external copy runs; the in-repo one has an unimported-torch
NameError, SURVEY.md §8.2 — not replicated): 3 strided SN-conv downs,
3 bilinear-up + SN-conv ups with skip adds, 2 SN-conv tail, linear head;
LeakyReLU(0.2) activations.

Spectral norm uses flax.linen.SpectralNorm (power iteration state in
'batch_stats'); training steps pass mutable=['batch_stats'].
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ciaosr_tpu.config.registry import COMPONENTS
from ciaosr_tpu.ops.sampling import interpolate_bilinear


@COMPONENTS.register(name="UNetDiscriminatorWithSpectralNorm")
class UNetDiscriminatorSN(nn.Module):
    in_channels: int = 3
    mid_channels: int = 64
    skip_connection: bool = True

    @nn.compact
    def __call__(self, img: jnp.ndarray,
                 update_stats: bool = False) -> jnp.ndarray:
        m = self.mid_channels
        lrelu = lambda v: nn.leaky_relu(v, negative_slope=0.2)  # noqa: E731

        def sn_conv(feats, kernel, stride, name):
            # all SN-wrapped convs are bias-free in the reference disc
            conv = nn.Conv(feats, (kernel, kernel), strides=(stride, stride),
                           padding=((1, 1), (1, 1)), use_bias=False,
                           name=f"{name}_inner")
            return nn.SpectralNorm(conv, name=name)

        x0 = lrelu(nn.Conv(m, (3, 3), padding=((1, 1), (1, 1)),
                           name="conv_0")(img))
        x1 = lrelu(sn_conv(m * 2, 4, 2, "conv_1")(x0,
                                                  update_stats=update_stats))
        x2 = lrelu(sn_conv(m * 4, 4, 2, "conv_2")(x1,
                                                  update_stats=update_stats))
        x3 = lrelu(sn_conv(m * 8, 4, 2, "conv_3")(x2,
                                                  update_stats=update_stats))

        def up(v):
            return interpolate_bilinear(v, v.shape[1] * 2, v.shape[2] * 2)

        x4 = lrelu(sn_conv(m * 4, 3, 1, "conv_4")(up(x3),
                                                  update_stats=update_stats))
        if self.skip_connection:
            x4 = x4 + x2
        x5 = lrelu(sn_conv(m * 2, 3, 1, "conv_5")(up(x4),
                                                  update_stats=update_stats))
        if self.skip_connection:
            x5 = x5 + x1
        x6 = lrelu(sn_conv(m, 3, 1, "conv_6")(up(x5),
                                              update_stats=update_stats))
        if self.skip_connection:
            x6 = x6 + x0

        out = lrelu(sn_conv(m, 3, 1, "conv_7")(x6,
                                               update_stats=update_stats))
        out = lrelu(sn_conv(m, 3, 1, "conv_8")(out,
                                               update_stats=update_stats))
        return nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)),
                       name="conv_9")(out)


@COMPONENTS.register(name="SmallUNetDiscriminatorWithSpectralNorm")
class SmallUNetDiscriminatorSN(nn.Module):
    """Shallow variant (unet_disc.py:113-216): 2 SN-conv downs, 2 bilinear
    ups with skip adds, same SN tail."""

    in_channels: int = 3
    mid_channels: int = 64
    skip_connection: bool = True

    @nn.compact
    def __call__(self, img: jnp.ndarray,
                 update_stats: bool = False) -> jnp.ndarray:
        m = self.mid_channels
        lrelu = lambda v: nn.leaky_relu(v, negative_slope=0.2)  # noqa: E731

        def sn_conv(feats, kernel, stride, name):
            conv = nn.Conv(feats, (kernel, kernel), strides=(stride, stride),
                           padding=((1, 1), (1, 1)), use_bias=False,
                           name=f"{name}_inner")
            return nn.SpectralNorm(conv, name=name)

        def up(v):
            return interpolate_bilinear(v, v.shape[1] * 2, v.shape[2] * 2)

        x0 = lrelu(nn.Conv(m, (3, 3), padding=((1, 1), (1, 1)),
                           name="conv_0")(img))
        x1 = lrelu(sn_conv(m, 4, 2, "conv_1")(x0, update_stats=update_stats))
        x2 = lrelu(sn_conv(m, 4, 2, "conv_2")(x1, update_stats=update_stats))
        x5 = lrelu(sn_conv(m, 3, 1, "conv_5")(up(x2),
                                              update_stats=update_stats))
        if self.skip_connection:
            x5 = x5 + x1
        x6 = lrelu(sn_conv(m, 3, 1, "conv_6")(up(x5),
                                              update_stats=update_stats))
        if self.skip_connection:
            x6 = x6 + x0
        out = lrelu(sn_conv(m, 3, 1, "conv_7")(x6,
                                               update_stats=update_stats))
        out = lrelu(sn_conv(m, 3, 1, "conv_8")(out,
                                               update_stats=update_stats))
        return nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)),
                       name="conv_9")(out)
