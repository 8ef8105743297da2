"""Orbax checkpointing of {params, opt_state, ema, step} + auto-resume.

Behavioral spec: mmcv CheckpointHook every N iters with optimizer state
(configs/001_..._rdn_...py:168), auto-resume from work_dir/latest
(/root/reference/tools/train.py:90-101), staged load_from for GAN stage 2
(configs/002_real_gan_...py:376).
"""

from __future__ import annotations

import os

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, work_dir: str, max_to_keep: int = 10,
                 interval: int = 3000):
        self.dir = os.path.abspath(os.path.join(work_dir, "checkpoints"))
        os.makedirs(self.dir, exist_ok=True)
        self.interval = interval
        self.mgr = ocp.CheckpointManager(
            self.dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True,
                enable_async_checkpointing=True))

    def maybe_save(self, step: int, state) -> bool:
        if step % self.interval != 0:
            return False
        self.save(step, state)
        return True

    def save(self, step: int, state):
        self.mgr.save(step, args=ocp.args.StandardSave(state))

    def latest_step(self) -> int | None:
        return self.mgr.latest_step()

    def restore(self, state_like, step: int | None = None):
        step = step if step is not None else self.latest_step()
        if step is None:
            return None, None
        restored = self.mgr.restore(
            step, args=ocp.args.StandardRestore(state_like))
        return restored, step

    def wait(self):
        self.mgr.wait_until_finished()


def save_params(path: str, params) -> None:
    """One-shot params save (for converted checkpoints / release)."""
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.abspath(path), params)
    ckpt.wait_until_finished()


def load_params(path: str, params_like=None):
    ckpt = ocp.StandardCheckpointer()
    return ckpt.restore(os.path.abspath(path), params_like)
