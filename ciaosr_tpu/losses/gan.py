"""Adversarial + pixel losses.

Behavioral spec: GANLoss at
/root/reference/mmedited/models/losses/gan_loss.py:12-131 — vanilla
(BCE-with-logits), lsgan (MSE), wgan, hinge, smgan; generator loss scaled
by loss_weight, discriminator always 1.0 (:127-131). Pixel losses: mmedit
L1Loss/MSELoss/CharbonnierLoss surface.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ciaosr_tpu.config.registry import LOSSES


def _bce_with_logits(x: jnp.ndarray, target: float) -> jnp.ndarray:
    # log-sum-exp stable BCE: max(x,0) - x*t + log(1+exp(-|x|))
    t = jnp.full_like(x, target)
    return jnp.mean(jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x))))


@LOSSES.register(name="GANLoss")
class GANLoss:
    """gan_type ∈ {vanilla, lsgan, wgan, hinge, smgan}."""

    def __init__(self, gan_type: str = "vanilla", real_label_val: float = 1.0,
                 fake_label_val: float = 0.0, loss_weight: float = 1.0):
        if gan_type not in ("vanilla", "lsgan", "wgan", "hinge", "smgan"):
            raise ValueError(f"unsupported gan_type {gan_type}")
        self.gan_type = gan_type
        self.real_label_val = real_label_val
        self.fake_label_val = fake_label_val
        self.loss_weight = loss_weight

    def __call__(self, pred: jnp.ndarray, target_is_real: bool,
                 is_disc: bool = False, mask: jnp.ndarray | None = None
                 ) -> jnp.ndarray:
        if self.gan_type == "vanilla":
            target = self.real_label_val if target_is_real \
                else self.fake_label_val
            loss = _bce_with_logits(pred, target)
        elif self.gan_type == "lsgan":
            target = self.real_label_val if target_is_real \
                else self.fake_label_val
            loss = jnp.mean((pred - target) ** 2)
        elif self.gan_type == "wgan":
            loss = -jnp.mean(pred) if target_is_real else jnp.mean(pred)
        elif self.gan_type == "hinge":
            if is_disc:
                loss = jnp.mean(jax.nn.relu(
                    1 - pred if target_is_real else 1 + pred))
            else:
                loss = -jnp.mean(pred)
        elif self.gan_type == "smgan":
            # soft-mask GAN (gan_loss.py:100-126), shim-parity-tested.
            # pred NHWC; mask NHWC (any channel count broadcastable).
            target = self.real_label_val if target_is_real \
                else self.fake_label_val
            if mask is None:
                loss = jnp.mean((pred - target) ** 2)
            else:
                if pred.shape[1:3] != mask.shape[1:3]:
                    # reference resizes the PREDICTION to the mask size,
                    # bilinear align_corners=True (gan_loss.py:106-113)
                    pred = _interp_bilinear_align_corners(
                        pred, mask.shape[1], mask.shape[2])
                if is_disc and not target_is_real:
                    tgt = jax.lax.stop_gradient(gaussian_blur_71(mask))
                    loss = jnp.mean((pred - tgt) ** 2)
                else:
                    # reference quirk (gan_loss.py:124-126): the generator
                    # branch computes the MEAN MSE (a scalar) then
                    # multiplies by mask/mask.mean() and means AGAIN —
                    # the mask weighting cancels identically, leaving
                    # plain MSE. Kept verbatim for parity.
                    loss = jnp.mean((pred - target) ** 2)
        return loss if is_disc else loss * self.loss_weight


def _interp_bilinear_align_corners(x: jnp.ndarray, out_h: int,
                                   out_w: int) -> jnp.ndarray:
    """NHWC bilinear resize with align_corners=True (the F.interpolate
    mode the reference smgan path uses, gan_loss.py:106-113); src coord =
    dst · (in−1)/(out−1)."""
    h, w = x.shape[1:3]
    ys = jnp.linspace(0.0, h - 1, out_h)
    xs = jnp.linspace(0.0, w - 1, out_w)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    rows0, rows1 = x[:, y0], x[:, y1]
    g = lambda r: r[:, :, x0] * (1 - wx) + r[:, :, x1] * wx
    return g(rows0) * (1 - wy) + g(rows1) * wy


def gaussian_blur_71(mask: jnp.ndarray, kernel_size: int = 71,
                     sigma: float = 10.0) -> jnp.ndarray:
    """Depthwise 2-D Gaussian blur (GANLoss smgan mask target,
    gan_loss.py:134-248; NHWC)."""
    import numpy as np
    x = np.arange(kernel_size, dtype=np.float64) - (kernel_size - 1) / 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    k2 = jnp.asarray(np.outer(g, g), jnp.float32)
    c = mask.shape[-1]
    kernel = jnp.tile(k2[:, :, None, None], (1, 1, 1, c))
    pad = (kernel_size - 1) // 2
    return jax.lax.conv_general_dilated(
        mask, kernel, (1, 1), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)


def _reduce(x, reduction, weight=None):
    if weight is not None:
        x = x * weight
    if reduction == "mean":
        return jnp.mean(x)
    if reduction == "sum":
        return jnp.sum(x)
    return x


@LOSSES.register(name="L1Loss")
class L1Loss:
    def __init__(self, loss_weight: float = 1.0, reduction: str = "mean"):
        self.loss_weight = loss_weight
        self.reduction = reduction

    def __call__(self, pred, target, weight=None):
        return self.loss_weight * _reduce(jnp.abs(pred - target),
                                          self.reduction, weight)


@LOSSES.register(name="MSELoss")
class MSELoss:
    def __init__(self, loss_weight: float = 1.0, reduction: str = "mean"):
        self.loss_weight = loss_weight
        self.reduction = reduction

    def __call__(self, pred, target, weight=None):
        return self.loss_weight * _reduce((pred - target) ** 2,
                                          self.reduction, weight)


@LOSSES.register(name="CharbonnierLoss")
class CharbonnierLoss:
    def __init__(self, loss_weight: float = 1.0, reduction: str = "mean",
                 eps: float = 1e-12):
        self.loss_weight = loss_weight
        self.reduction = reduction
        self.eps = eps

    def __call__(self, pred, target, weight=None):
        return self.loss_weight * _reduce(
            jnp.sqrt((pred - target) ** 2 + self.eps), self.reduction, weight)
