"""Optimizers + LR schedules from reference-style config dicts.

Behavioral spec: Adam lr 1e-4 with step decay ×0.5 at {200,400,600,800}k
(configs/001_..._rdn_...py:156-166); the GAN stage uses two optimizers
(configs/002_real_gan_...py:338-349). torch Adam defaults: b1=0.9,
b2=0.999, eps=1e-8.
"""

from __future__ import annotations

import optax


def build_schedule(base_lr: float, lr_config: dict | None):
    if not lr_config:
        return base_lr
    policy = lr_config.get("policy", "Step")
    if policy in ("Step", "step"):
        gamma = lr_config.get("gamma", 0.5)
        steps = lr_config.get("step", [])
        return optax.piecewise_constant_schedule(
            base_lr, {int(s): gamma for s in steps})
    if policy in ("Fixed", "fixed"):
        return base_lr
    raise ValueError(f"unsupported lr policy {policy}")


def build_optimizer(opt_cfg: dict, lr_config: dict | None = None,
                    autoscale: float = 1.0):
    cfg = dict(opt_cfg)
    otype = cfg.pop("type", "Adam")
    lr = cfg.pop("lr", 1e-4) * autoscale
    schedule = build_schedule(lr, lr_config)
    if otype.lower() == "adam":
        betas = cfg.pop("betas", (0.9, 0.999))
        tx = optax.adam(schedule, b1=betas[0], b2=betas[1],
                        eps=cfg.pop("eps", 1e-8))
    elif otype.lower() == "adamw":
        tx = optax.adamw(schedule,
                         weight_decay=cfg.pop("weight_decay", 1e-2))
    elif otype.lower() == "sgd":
        tx = optax.sgd(schedule, momentum=cfg.pop("momentum", 0.9))
    else:
        raise ValueError(f"unsupported optimizer {otype}")
    return tx, schedule
