#!/usr/bin/env python
"""Evaluation CLI — mirrors /root/reference/tools/test.py:28-162 surface.

    python tools/test.py CONFIG CHECKPOINT [--save-path DIR] [--out F.json]

CHECKPOINT is an orbax params directory (or 'None' to use the config's
``test_checkpoint_path``, tools/test.py:77-78 semantics), or a .pth torch
checkpoint, which is converted on the fly (incl. the SwinIR-family
``'^' → 'generator.'`` key rewrite, tools/test.py:115-118).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="ciaosr_tpu test")
    p.add_argument("config")
    p.add_argument("checkpoint", help="params dir, .pth file, 'None' "
                   "(config test_checkpoint_path), or 'random' (smoke)")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--deterministic", action="store_true")
    p.add_argument("--out", help="write metrics JSON here")
    p.add_argument("--save-path", help="save predicted PNGs here")
    p.add_argument("--launcher", default="none",
                   choices=["none", "tpu"],
                   help="'tpu' runs jax.distributed.initialize()")
    p.add_argument("--gpu-collect", action="store_true",
                   help="accepted for reference-CLI parity; result "
                        "gathering always uses process_allgather")
    p.add_argument("--local_rank", type=int, default=0,
                   help="accepted for reference-CLI parity (the torch "
                        "launcher injects it); process identity comes from "
                        "jax.distributed here")
    p.add_argument("--tmpdir",
                   help="accepted for reference-CLI parity; unused")
    p.add_argument("--split", default="test", choices=["test", "val"])
    p.add_argument("--shard-tiles", action="store_true",
                   help="shard each image's tile batch over local chips "
                        "(tile/'sequence' parallelism)")
    p.add_argument("--pallas", action="store_true",
                   help="route integer-scale grid decodes (and the SwinIR "
                        "encoder) through the fused Pallas kernels — "
                        "~1.4x eval throughput on TPU; configs keep the "
                        "reference's keys, so this is a CLI switch")
    return p.parse_args()


def _load_orbax(ckpt: str, model):
    """Load params from an orbax path: either a bare params dir (converted
    checkpoints) or a training work_dir / checkpoints dir / step dir, from
    which the generator params (EMA preferred, real_ciaosr.py:270) are
    extracted — so ``tools/test.py CONFIG WORK_DIR`` works directly on a
    training run, like the reference's ``latest.pth``."""
    import os as _os

    import jax
    import orbax.checkpoint as ocp

    from ciaosr_tpu.train.checkpoint import load_params, resolve_checkpoint_dir

    mgr_dir, step = resolve_checkpoint_dir(ckpt)
    has_steps = _os.path.isdir(mgr_dir) and any(
        d.isdigit() for d in _os.listdir(mgr_dir))
    if has_steps:
        mgr = ocp.CheckpointManager(
            mgr_dir, options=ocp.CheckpointManagerOptions(create=False))
        step = step if step is not None else mgr.latest_step()
        raw = mgr.restore(step)  # saved structure (StandardSave)
        mgr.close()
        for key in ("ema", "params", "g_params"):
            if isinstance(raw, dict) and key in raw:
                print(f"[ckpt] using '{key}' from training state @ step "
                      f"{step}", flush=True)
                return raw[key]
        return raw
    like = jax.eval_shape(lambda: model.init_params(jax.random.PRNGKey(0)))
    return load_params(ckpt, like)


def main():
    args = parse_args()
    if args.launcher == "tpu":  # pragma: no cover - multihost only
        import jax
        jax.distributed.initialize()

    import jax
    import numpy as np
    from ciaosr_tpu.utils.compilation_cache import enable_compilation_cache
    enable_compilation_cache()  # amortize per-size eval compiles across runs
    from ciaosr_tpu.config.config import Config
    from ciaosr_tpu.data.datasets import build_dataset
    from ciaosr_tpu.eval.evaluator import evaluate_dataset
    from ciaosr_tpu.models.builder import build_model
    import ciaosr_tpu.models.restorers  # noqa: F401 (registry)
    import ciaosr_tpu.models.real_restorer  # noqa: F401
    import ciaosr_tpu.data.degradations  # noqa: F401

    cfg = Config.fromfile(args.config)
    if args.seed is not None or args.deterministic:
        import random
        random.seed(args.seed or 0)
        np.random.seed(args.seed or 0)

    dataset = build_dataset(cfg.data[args.split])
    if args.pallas:
        cfg.model["generator"]["use_pallas"] = True
    model = build_model(cfg.model, test_cfg=cfg.test_cfg)

    ckpt = args.checkpoint
    if ckpt == "None":
        ckpt = cfg.get("test_checkpoint_path")
    if ckpt == "random":
        params = model.init_params(jax.random.PRNGKey(args.seed or 0))
        print("[warn] evaluating RANDOM weights (smoke mode)", flush=True)
    elif ckpt.endswith((".pth", ".pt")):
        from ciaosr_tpu.convert.load import load_torch_checkpoint
        params = load_torch_checkpoint(ckpt, cfg.model)
    else:
        params = _load_orbax(ckpt, model)

    mesh = None
    if args.shard_tiles and len(jax.local_devices()) > 1:
        from ciaosr_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(len(jax.local_devices()))
    results = evaluate_dataset(model, params, dataset,
                               save_path=args.save_path, mesh=mesh)
    if jax.process_index() == 0:
        print("Eval results:")
        for k, v in results.items():
            print(f"  {k}: {v:.4f}" if isinstance(v, float)
                  else f"  {k}: {v}")
        if args.out:
            os.makedirs(os.path.dirname(os.path.abspath(args.out)),
                        exist_ok=True)
            with open(args.out, "w") as f:
                json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
