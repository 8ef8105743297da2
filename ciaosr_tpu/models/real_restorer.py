"""Real-world GAN restorer: EMA'd generator + U-Net discriminator.

Behavioral spec: RealCiaoSR at
/root/reference/mmedited/models/restorers/real_ciaosr.py:28-373 —
EMA generator copy (:84-91), pixel + perceptual + GAN generator objective
with sharpened-GT routing flags (:136-186), generator updates gated by
disc_steps/disc_init_steps, two-phase discriminator step (:200-223),
image reshape of flat queries via W=H=√ns (:146-147; requires the
is_shuffle=False contiguous sampling), EMA inference (:270-278).

TPU design: ONE jit'd step carrying both optimizers; the generator update
is gated with lax.cond (both branches traced once — no dynamic graphs);
spectral-norm power iterations live in the discriminator's 'batch_stats'
collection and advance only on discriminator forward passes.
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import struct

from ciaosr_tpu.config.registry import (COMPONENTS, LOSSES, MODELS,
                                        build_from_cfg)
from ciaosr_tpu.models.builder import build_generator
from ciaosr_tpu.models.discriminator import UNetDiscriminatorSN
from ciaosr_tpu.models.restorers import CiaoSRRestorer
import ciaosr_tpu.losses.gan  # noqa: F401  (registry side effects)
import ciaosr_tpu.losses.perceptual  # noqa: F401


@struct.dataclass
class GANTrainState:
    step: jnp.ndarray
    g_params: Any
    g_opt: Any
    d_vars: Any          # {'params', 'batch_stats'} (spectral norm u/v)
    d_opt: Any
    ema_params: Any


@MODELS.register(name="RealCiaoSR")
class RealCiaoSRRestorer(CiaoSRRestorer):
    def __init__(self, generator: dict, discriminator: dict | None = None,
                 rgb_mean=(0.4488, 0.4371, 0.4040), rgb_std=(1.0, 1.0, 1.0),
                 pixel_loss: dict | None = None,
                 perceptual_loss: dict | None = None,
                 gan_loss: dict | None = None,
                 is_use_sharpened_gt_in_pixel: bool = False,
                 is_use_sharpened_gt_in_percep: bool = False,
                 is_use_sharpened_gt_in_gan: bool = False,
                 is_use_ema: bool = True,
                 train_cfg: Any = None, test_cfg: Any = None):
        super().__init__(generator=generator, rgb_mean=rgb_mean,
                         rgb_std=rgb_std, pixel_loss=pixel_loss,
                         train_cfg=train_cfg, test_cfg=test_cfg)
        self.discriminator = build_from_cfg(discriminator, COMPONENTS) \
            if discriminator else None
        self.pixel_loss = build_from_cfg(pixel_loss, LOSSES) \
            if pixel_loss else None
        self.gan_loss = build_from_cfg(gan_loss, LOSSES) if gan_loss else None
        self.perceptual_loss = build_from_cfg(perceptual_loss, LOSSES) \
            if perceptual_loss else None
        self.use_sharp_pixel = is_use_sharpened_gt_in_pixel
        self.use_sharp_percep = is_use_sharpened_gt_in_percep
        self.use_sharp_gan = is_use_sharpened_gt_in_gan
        self.is_use_ema = is_use_ema
        tc = train_cfg or {}
        self.disc_steps = tc.get("disc_steps", 1) if hasattr(tc, "get") else 1
        self.disc_init_steps = tc.get("disc_init_steps", 0) \
            if hasattr(tc, "get") else 0
        self.ema_momentum = tc.get("ema_momentum", 0.999) \
            if hasattr(tc, "get") else 0.999
        # start_iter: iteration at which the GENERATOR re-seeds from the
        # EMA copy (real_ciaosr.py:118-125); -1 = never (reference default)
        self.ema_start_iter = tc.get("start_iter", -1) \
            if hasattr(tc, "get") else -1

    # ------------------------------------------------------------- init --
    def init_gan_state(self, rng, g_tx, d_tx, lq_shape=(1, 64, 64, 3),
                       n_queries: int = 4096,
                       g_params=None, ema_params=None) -> GANTrainState:
        """``ema_params`` seeds the EMA copy independently (staged
        load_from restores stage-1's generator_ema, real_ciaosr.py:84-91 +
        configs/002_real_gan_...py:376); default: a copy of g_params."""
        rng_g, rng_d = jax.random.split(rng)
        if g_params is None:
            g_params = self.init_params(rng_g, lq_shape, n_queries)
        if self.discriminator is not None:
            side = int(math.isqrt(n_queries))
            d_vars = dict(jax.jit(self.discriminator.init)(
                rng_d, jnp.zeros((lq_shape[0], side, side, 3), jnp.float32)))
            d_vars.setdefault("batch_stats", {})
            d_opt = d_tx.init(d_vars["params"])
        else:  # stage 1 (wogan): generator + EMA only
            d_vars = {"params": {}, "batch_stats": {}}
            d_opt = d_tx.init(d_vars["params"])
        return GANTrainState(
            step=jnp.asarray(0), g_params=g_params,
            g_opt=g_tx.init(g_params), d_vars=d_vars, d_opt=d_opt,
            ema_params=(jax.tree.map(jnp.copy, g_params)
                        if ema_params is None else ema_params))

    # -------------------------------------------------------- train step --
    def make_gan_train_step(self, g_tx, d_tx):
        """Build the jit'd alternating G/D step (real_ciaosr.py:98-233)."""
        gen = self.generator
        disc = self.discriminator
        mean, std = self.rgb_mean, self.rgb_std
        m_ema = self.ema_momentum

        def g_loss_fn(g_params, d_vars, batch):
            lq = (batch["lq"] - mean) / std
            gt = (batch["gt"] - mean) / std
            gt_unsharp = (batch.get("gt_unsharp", batch["gt"]) - mean) / std

            gt_pixel = gt_unsharp if self.use_sharp_pixel else gt
            gt_percep = gt_unsharp if self.use_sharp_percep else gt
            gt_gan = gt_unsharp if self.use_sharp_gan else gt

            pred = gen.apply(g_params, lq, batch["coord"], batch["cell"],
                             gen.use_pallas)
            b, ns, _ = pred.shape
            side = int(math.isqrt(ns))  # static (real_ciaosr.py:146-147)
            pred_img = pred.reshape(b, side, side, 3)

            losses = {}
            total = 0.0
            if self.pixel_loss:
                losses["loss_pix"] = self.pixel_loss(pred, gt_pixel)
                total += losses["loss_pix"]
            if self.perceptual_loss:
                percep, style = self.perceptual_loss(
                    pred_img, gt_percep.reshape(b, side, side, 3))
                if percep is not None:
                    losses["loss_perceptual"] = percep
                    total += percep
                if style is not None:
                    losses["loss_style"] = style
                    total += style
            if self.gan_loss and disc is not None:
                fake_logits = disc.apply(d_vars, pred_img,
                                         update_stats=False)
                losses["loss_gan"] = self.gan_loss(fake_logits, True,
                                                   is_disc=False)
                total += losses["loss_gan"]
            del gt_gan  # gan target routing affects only the D step below
            return total, (losses, pred_img)

        def d_loss_fn(d_params, batch_stats, pred_img, gt_img):
            variables = {"params": d_params, "batch_stats": batch_stats}
            real_logits, mut = disc.apply(
                variables, gt_img, update_stats=True,
                mutable=["batch_stats"])
            loss_real = self.gan_loss(real_logits, True, is_disc=True)
            fake_logits, mut = disc.apply(
                {"params": d_params, "batch_stats": mut["batch_stats"]},
                jax.lax.stop_gradient(pred_img), update_stats=True,
                mutable=["batch_stats"])
            loss_fake = self.gan_loss(fake_logits, False, is_disc=True)
            return loss_real + loss_fake, (mut["batch_stats"], loss_real,
                                           loss_fake)

        @__import__("functools").partial(jax.jit, donate_argnums=(0,))
        def train_step(state: GANTrainState, batch: dict):
            step = state.step

            # generator re-seeds from EMA at start_iter (:118-125)
            if self.ema_start_iter >= 0:
                seed_now = step == self.ema_start_iter
                state = state.replace(g_params=jax.tree.map(
                    lambda g, e: jnp.where(seed_now, e, g),
                    state.g_params, state.ema_params))

            # ---- generator phase (gated: real_ciaosr.py:157-189) ----
            def g_update(_):
                (_, (losses, pred_img)), grads = jax.value_and_grad(
                    g_loss_fn, has_aux=True)(state.g_params, state.d_vars,
                                             batch)
                updates, g_opt = g_tx.update(grads, state.g_opt,
                                             state.g_params)
                g_params = optax.apply_updates(state.g_params, updates)
                return g_params, g_opt, losses, pred_img

            def g_skip(_):
                # L1-only bookkeeping branch (real_ciaosr.py:188-189):
                # no generator update, but pred is still needed for D
                lq = (batch["lq"] - mean) / std
                pred = gen.apply(state.g_params, lq, batch["coord"],
                                 batch["cell"], gen.use_pallas)
                b, ns, _ = pred.shape
                side = int(math.isqrt(ns))
                zeros = {k: jnp.zeros(()) for k in _g_loss_keys}
                return (state.g_params, state.g_opt, zeros,
                        pred.reshape(b, side, side, 3))

            # trace once to learn the loss-dict structure
            _g_loss_keys = jax.eval_shape(
                lambda p: g_loss_fn(p, state.d_vars, batch)[1][0],
                state.g_params).keys()

            do_g = jnp.logical_and(step % self.disc_steps == 0,
                                   step >= self.disc_init_steps)
            g_params, g_opt, g_losses, pred_img = jax.lax.cond(
                do_g, g_update, g_skip, operand=None)

            # ---- discriminator phase (real_ciaosr.py:200-223) ----
            if disc is not None and self.gan_loss is not None:
                gt = (batch["gt"] - mean) / std
                gt_unsharp = (batch.get("gt_unsharp", batch["gt"])
                              - mean) / std
                gt_gan = gt_unsharp if self.use_sharp_gan else gt
                b, ns, _ = gt_gan.shape
                side = int(math.isqrt(ns))
                gt_img = gt_gan.reshape(b, side, side, 3)
                (d_loss, (bstats, loss_real, loss_fake)), d_grads = \
                    jax.value_and_grad(d_loss_fn, has_aux=True)(
                        state.d_vars["params"], state.d_vars["batch_stats"],
                        pred_img, gt_img)
                d_updates, d_opt = d_tx.update(d_grads, state.d_opt,
                                               state.d_vars["params"])
                d_params = optax.apply_updates(state.d_vars["params"],
                                               d_updates)
                d_vars = {"params": d_params, "batch_stats": bstats}
                d_metrics = {"loss_d_real": loss_real,
                             "loss_d_fake": loss_fake}
            else:
                d_vars, d_opt = state.d_vars, state.d_opt
                d_metrics = {}

            # ---- EMA (ExponentialMovingAverageHook, interval 1) ----
            ema = jax.tree.map(
                lambda e, p: e * m_ema + p * (1.0 - m_ema),
                state.ema_params, g_params)

            new_state = GANTrainState(
                step=step + 1, g_params=g_params, g_opt=g_opt,
                d_vars=d_vars, d_opt=d_opt, ema_params=ema)
            return new_state, {**g_losses, **d_metrics}

        return train_step

    # ------------------------------------------------------------- eval --
    def forward_test(self, params_or_state, lq: np.ndarray,
                     target_shape=None, scale=None, mesh=None) -> np.ndarray:
        params = params_or_state
        if isinstance(params_or_state, GANTrainState):
            params = params_or_state.ema_params if self.is_use_ema \
                else params_or_state.g_params
        return super().forward_test(params, lq, target_shape=target_shape,
                                    scale=scale, mesh=mesh)
