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
            # soft-mask GAN: lsgan against a (blurred) mask target; without
            # a mask it reduces to lsgan (gan_loss.py:134-248)
            target = self.real_label_val if target_is_real \
                else self.fake_label_val
            if mask is not None and not target_is_real:
                loss = jnp.mean((pred - (1 - mask) * target) ** 2)
            else:
                loss = jnp.mean((pred - target) ** 2)
        return loss if is_disc else loss * self.loss_weight


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
