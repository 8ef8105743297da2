"""Iteration-based trainer: the mmcv IterBasedRunner + hooks, TPU-native.

Behavioral spec: the external runner layer the reference declares in config
(/root/reference/configs/001_..._rdn_...py:156-187 and tools/train.py:181-189):
1M-iteration loop, step LR hook, checkpoint hook (3000), eval hook (3000),
text/TensorBoard logging (100), auto-resume from the latest checkpoint.

TPU design: ONE jit'd SPMD train step over a 1-D 'data' mesh (params
replicated, batch sharded); the host loop just feeds batches and runs
hooks. Gradient reduction is XLA's — there is no DDP wrapper to configure.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Any, Callable

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import struct

from ciaosr_tpu.parallel.mesh import make_mesh, shard_batch, replicate
from ciaosr_tpu.train.checkpoint import CheckpointManager
from ciaosr_tpu.train.optim import build_optimizer


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any


def make_train_step(restorer, tx) -> Callable:
    """Build the jit'd L1 train step (ciaosr.py:60-109 semantics)."""

    keys = getattr(restorer, "batch_keys", ("lq", "gt", "coord", "cell"))

    # donate the state: optimizer/param buffers are updated in place
    @__import__("functools").partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: dict):
        def loss_fn(params):
            loss, _ = restorer.train_forward(
                params, *[batch[k] for k in keys])
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state)
        return new_state, {"loss_pix": loss}

    return train_step


class MetricLogger:
    """JSONL + optional TensorBoard logging (TextLoggerHook equivalent)."""

    def __init__(self, work_dir: str, interval: int = 100):
        self.interval = interval
        os.makedirs(work_dir, exist_ok=True)
        self.path = os.path.join(work_dir, "train_log.jsonl")
        self._tb = None
        try:
            from tensorboardX import SummaryWriter
            self._tb = SummaryWriter(os.path.join(work_dir, "tb"))
        except ImportError:  # pragma: no cover
            pass
        self._acc: dict[str, list] = {}

    def log(self, step: int, metrics: dict, extra: dict | None = None):
        # keep device arrays; convert once per interval (a host sync per
        # step is expensive on high-latency device links)
        for k, v in metrics.items():
            self._acc.setdefault(k, []).append(v)
        if step % self.interval != 0:
            return
        def _mean(vals):
            try:
                import jax.numpy as _jnp
                return float(np.asarray(_jnp.stack(
                    [_jnp.asarray(x) for x in vals])).mean())
            except Exception:
                return float(np.mean([float(x) for x in vals]))

        means = {k: _mean(v) for k, v in self._acc.items()}
        self._acc.clear()
        rec = {"step": step, **means, **(extra or {}),
               "time": time.time()}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._tb:
            for k, v in means.items():
                self._tb.add_scalar(k, v, step)
        msg = " ".join(f"{k}={v:.4g}" for k, v in means.items())
        print(f"[iter {step}] {msg}", flush=True)


@dataclass
class Trainer:
    """Classical (L1) CiaoSR training."""

    restorer: Any
    cfg: Any
    work_dir: str
    resume_from: str | None = None
    auto_resume: bool = True
    seed: int = 0

    def __post_init__(self):
        self.mesh = make_mesh()
        tx, self.schedule = build_optimizer(
            dict(self.cfg.optimizers), dict(self.cfg.get("lr_config") or {}))
        self.tx = tx
        self.train_step = make_train_step(self.restorer, tx)
        ckpt_cfg = self.cfg.get("checkpoint_config", {})
        self.ckpt = CheckpointManager(
            self.work_dir,
            interval=ckpt_cfg.get("interval", 3000),
            max_to_keep=ckpt_cfg.get("max_to_keep", 10),
            keep_best_metric=ckpt_cfg.get("keep_best_metric"))
        self.logger = MetricLogger(
            self.work_dir,
            interval=self.cfg.get("log_config", {}).get("interval", 100))

    def init_state(self, sample_batch: dict) -> TrainState:
        rng = jax.random.PRNGKey(self.seed)
        lq = sample_batch["lq"]
        params = self.restorer.init_params(
            rng, lq_shape=(1, *lq.shape[1:]),
            n_queries=sample_batch["coord"].shape[1])
        opt_state = self.tx.init(params)
        state = TrainState(step=jnp.asarray(0), params=params,
                           opt_state=opt_state)
        return replicate(self.mesh, state)

    def _maybe_resume(self, state):
        """--resume-from (explicit external dir) takes precedence over
        auto-resume from the run's own work_dir; --no-auto-resume disables
        the latter (reference tools/train.py:90-101 semantics)."""
        if self.resume_from:
            from ciaosr_tpu.train.checkpoint import restore_external
            restored, step0 = restore_external(self.resume_from,
                                               jax.device_get(state))
            print(f"[resume] from {self.resume_from} @ iteration {step0}",
                  flush=True)
            return replicate(self.mesh, restored)
        if self.auto_resume:
            restored, step0 = self.ckpt.restore(state)
            if restored is not None:
                print(f"[resume] from iteration {step0}", flush=True)
                return replicate(self.mesh, restored)
        return state

    def run(self, loader, total_iters: int, eval_fn=None,
            eval_interval: int | None = None) -> TrainState:
        it = iter(loader)
        first = next(it)
        state = self.init_state(first)

        state = self._maybe_resume(state)

        step = int(state.step)
        # interval-mean throughput: amortizes the log-flush host sync over
        # the whole window instead of charging it to one step
        win_t0, win_n = time.time(), 0
        batch = first
        last_eval: dict = {}
        while step < total_iters:
            device_batch = shard_batch(self.mesh, batch)
            state, metrics = self.train_step(state, device_batch)
            step += 1
            win_n += 1
            extra = None
            if step % self.logger.interval == 0:
                ips = win_n / max(time.time() - win_t0, 1e-9)
                extra = {"lr": float(self.schedule(step)) if callable(
                    self.schedule) else self.schedule,
                    "iters_per_s": ips}
                win_t0, win_n = time.time(), 0
            self.logger.log(step, metrics, extra)
            if eval_fn and eval_interval and step % eval_interval == 0:
                last_eval = eval_fn(state.params)
                print(f"[eval @ {step}] {last_eval}", flush=True)
                self.logger.log(step, {f"val_{k}": v
                                       for k, v in last_eval.items()
                                       if isinstance(v, (int, float))})
            # gate BEFORE device_get: pulling the full train state to host
            # every step (~3 buffers × params) would dominate the step time
            # on a slow host link, for a hook that fires every `interval`
            if step % self.ckpt.interval == 0:
                self.ckpt.maybe_save(step, jax.device_get(state), last_eval)
            if step >= total_iters:
                break
            batch = next(it)
        self.ckpt.save(step, jax.device_get(state))
        self.ckpt.wait()
        return state
