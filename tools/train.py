#!/usr/bin/env python
"""Training CLI — mirrors /root/reference/tools/train.py:30-193 surface.

    python tools/train.py CONFIG [--work-dir D] [--resume-from CKPT]
                          [--seed N] [--autoscale-lr] [--total-iters N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="ciaosr_tpu train")
    p.add_argument("config")
    p.add_argument("--work-dir", help="override config work_dir")
    p.add_argument("--resume-from", help="checkpoint dir to resume")
    p.add_argument("--no-auto-resume", action="store_true",
                   help="disable auto-resume from work_dir latest")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--deterministic", action="store_true")
    p.add_argument("--autoscale-lr", action="store_true",
                   help="linear LR scaling by n_devices/8 "
                        "(reference tools/train.py:105-107 rule)")
    p.add_argument("--total-iters", type=int, default=None,
                   help="override config total_iters (smoke runs)")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 compute (f32 params) — the reference "
                        "Lightning path's precision intent "
                        "(tools/train_pl.py:77)")
    p.add_argument("--launcher", default="none", choices=["none", "tpu"])
    return p.parse_args()


def main():
    args = parse_args()
    if args.launcher == "tpu":  # pragma: no cover - multihost only
        import jax
        jax.distributed.initialize()

    import jax
    from ciaosr_tpu.utils.compilation_cache import enable_compilation_cache
    enable_compilation_cache()  # crash-and-restart resume (auto-resume,
    # reference tools/train.py:90-101) must not re-pay the multi-minute
    # train-step compile on every relaunch
    from ciaosr_tpu.config.config import Config
    from ciaosr_tpu.data.datasets import build_dataset
    from ciaosr_tpu.data.loader import build_dataloader
    from ciaosr_tpu.eval.evaluator import evaluate_dataset
    from ciaosr_tpu.models.builder import build_model
    from ciaosr_tpu.train.trainer import Trainer
    from ciaosr_tpu.train.gan_trainer import GANTrainer
    import ciaosr_tpu.models.restorers  # noqa: F401
    import ciaosr_tpu.models.real_restorer  # noqa: F401
    import ciaosr_tpu.data.degradations  # noqa: F401

    if args.deterministic:
        # JAX compute + the loader's ordered merge are already deterministic
        # given a seed; this additionally pins the host-side RNGs the data
        # pipeline draws from (reference set_random_seed(deterministic=True),
        # tools/train.py:136-143)
        import random
        import numpy as _np
        random.seed(args.seed)
        _np.random.seed(args.seed)

    cfg = Config.fromfile(args.config)
    work_dir = args.work_dir or cfg.work_dir
    os.makedirs(work_dir, exist_ok=True)
    with open(os.path.join(work_dir, "config_dump.py"), "w") as f:
        f.write(cfg.text)

    # environment dump (reference collect_env, tools/train.py:126-134)
    import platform
    import jax as _jax
    env = {
        "python": platform.python_version(),
        "platform": platform.platform(),
        "jax": _jax.__version__,
        "backend": _jax.default_backend(),
        "devices": [str(d) for d in _jax.devices()],
        "process_count": _jax.process_count(),
    }
    print("Environment:", env, flush=True)
    import json as _json
    with open(os.path.join(work_dir, "env.json"), "w") as f:
        _json.dump(env, f, indent=2)

    if args.autoscale_lr:
        cfg.optimizers = dict(cfg.optimizers)
        cfg.optimizers["lr"] = cfg.optimizers["lr"] * jax.device_count() / 8

    if args.bf16:
        cfg.model = dict(cfg.model)
        cfg.model["generator"] = dict(cfg.model["generator"], dtype="bf16")
    model = build_model(cfg.model, train_cfg=cfg.get("train_cfg"),
                        test_cfg=cfg.test_cfg)
    train_ds = build_dataset(cfg.data["train"])
    loader_cfg = cfg.data.get("train_dataloader", {})
    loader = build_dataloader(
        train_ds,
        samples_per_gpu=loader_cfg.get("samples_per_gpu", 16),
        workers_per_gpu=cfg.data.get("workers_per_gpu", 4),
        worker_mode=cfg.data.get("worker_mode", "thread"),
        seed=args.seed)

    eval_fn = None
    eval_interval = cfg.get("evaluation", {}).get("interval")
    if "val" in cfg.data:
        val_ds = build_dataset(cfg.data["val"])

        def eval_fn(params):  # noqa: F811
            return evaluate_dataset(model, params, val_ds)

    mtype = cfg.model["type"]
    mname = mtype if isinstance(mtype, str) else mtype.__name__
    cls = GANTrainer if mname == "RealCiaoSR" else Trainer
    trainer = cls(restorer=model, cfg=cfg, work_dir=work_dir,
                  resume_from=args.resume_from,
                  auto_resume=not args.no_auto_resume, seed=args.seed)
    total = args.total_iters or cfg.total_iters
    trainer.run(loader, total_iters=total, eval_fn=eval_fn,
                eval_interval=eval_interval)


if __name__ == "__main__":
    main()
