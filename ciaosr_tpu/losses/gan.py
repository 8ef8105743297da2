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
            # soft-mask GAN (gan_loss.py:100-126): MSE against a
            # Gaussian-blurred mask target (disc/fake) or mask-weighted
            # MSE (generator). pred and mask must share spatial shape.
            target = self.real_label_val if target_is_real \
                else self.fake_label_val
            if mask is None:
                loss = jnp.mean((pred - target) ** 2)
            elif is_disc:
                if target_is_real:
                    loss = jnp.mean((pred - target) ** 2)
                else:
                    tgt = jax.lax.stop_gradient(
                        gaussian_blur_71(mask))
                    loss = jnp.mean((pred - tgt) ** 2)
            else:
                per_px = (pred - target) ** 2
                loss = jnp.mean(per_px * mask / jnp.mean(mask))
        return loss if is_disc else loss * self.loss_weight


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
