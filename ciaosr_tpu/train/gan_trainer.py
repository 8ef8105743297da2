"""GAN (real-world) trainer: two optimizers, EMA, staged load_from.

Behavioral spec: the runner config of configs/002_real_gan_...py:338-376 —
per-module Adam optimizers, EMA hook (interval 1, momentum 0.999), staged
``load_from`` of the wogan stage-1 checkpoint, checkpoint/eval/log hooks as
in the classical trainer.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from ciaosr_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from ciaosr_tpu.train.checkpoint import CheckpointManager
from ciaosr_tpu.train.optim import build_optimizer
from ciaosr_tpu.train.trainer import MetricLogger


@dataclass
class GANTrainer:
    restorer: Any   # RealCiaoSRRestorer
    cfg: Any
    work_dir: str
    resume_from: str | None = None
    auto_resume: bool = True
    seed: int = 0

    def __post_init__(self):
        self.mesh = make_mesh()
        opt_cfg = dict(self.cfg.optimizers)
        lr_cfg = dict(self.cfg.get("lr_config") or {})
        self.g_tx, self.schedule = build_optimizer(
            dict(opt_cfg["generator"]), lr_cfg)
        self.d_tx, _ = build_optimizer(
            dict(opt_cfg.get("discriminator", opt_cfg["generator"])), lr_cfg)
        self.train_step = self.restorer.make_gan_train_step(self.g_tx,
                                                            self.d_tx)
        ckpt_cfg = self.cfg.get("checkpoint_config", {})
        self.ckpt = CheckpointManager(
            self.work_dir,
            interval=ckpt_cfg.get("interval", 3000),
            max_to_keep=ckpt_cfg.get("max_to_keep", 10),
            keep_best_metric=ckpt_cfg.get("keep_best_metric"))
        self.logger = MetricLogger(
            self.work_dir,
            interval=self.cfg.get("log_config", {}).get("interval", 100))

    def init_state(self, sample_batch: dict):
        g_params = ema_params = None
        load_from = self.cfg.get("load_from")
        if load_from:  # staged training: stage-1 (wogan) generator + EMA
            from ciaosr_tpu.train.checkpoint import load_staged_generator
            g_params, ema_params = load_staged_generator(load_from)
            g_params = jax.tree.map(jnp.asarray, g_params)
            ema_params = jax.tree.map(jnp.asarray, ema_params)
            print(f"[load_from] generator initialized from {load_from}",
                  flush=True)
        lq = sample_batch["lq"]
        state = self.restorer.init_gan_state(
            jax.random.PRNGKey(self.seed), self.g_tx, self.d_tx,
            lq_shape=(1, *lq.shape[1:]),
            n_queries=sample_batch["coord"].shape[1], g_params=g_params,
            ema_params=ema_params)
        return replicate(self.mesh, state)

    def run(self, loader, total_iters: int, eval_fn=None,
            eval_interval: int | None = None):
        it = iter(loader)
        batch = next(it)
        state = self.init_state(batch)
        # --resume-from > auto-resume > fresh (reference tools/train.py:90-101)
        if self.resume_from:
            from ciaosr_tpu.train.checkpoint import restore_external
            restored, step0 = restore_external(self.resume_from,
                                               jax.device_get(state))
            state = replicate(self.mesh, restored)
            print(f"[resume] from {self.resume_from} @ iteration {step0}",
                  flush=True)
        elif self.auto_resume:
            restored, step0 = self.ckpt.restore(state)
            if restored is not None:
                state = replicate(self.mesh, restored)
                print(f"[resume] from iteration {step0}", flush=True)

        step = int(state.step)
        t_last = time.time()
        last_eval: dict = {}
        while step < total_iters:
            device_batch = shard_batch(self.mesh, batch)
            state, metrics = self.train_step(state, device_batch)
            step += 1
            ips = 1.0 / max(time.time() - t_last, 1e-9)
            t_last = time.time()
            self.logger.log(step, metrics, {"iters_per_s": ips})
            if eval_fn and eval_interval and step % eval_interval == 0:
                last_eval = eval_fn(state)
                print(f"[eval @ {step}] {last_eval}", flush=True)
            # gate BEFORE device_get (see trainer.py): the full-state host
            # pull is only needed on checkpoint steps
            if step % self.ckpt.interval == 0:
                self.ckpt.maybe_save(step, jax.device_get(state), last_eval)
            if step >= total_iters:
                break
            batch = next(it)
        self.ckpt.save(step, jax.device_get(state))
        self.ckpt.wait()
        return state
