#!/usr/bin/env python
"""FLOPs/memory analysis + optional device trace — the reference's thop
profiling scaffold (disabled at ciaosr.py:153-156) and hand-written
swinir flops() methods, replaced by XLA's own cost model.

    python tools/profile.py CONFIG [--lq H W] [--scale S] [--trace DIR]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--lq", type=int, nargs=2, default=(48, 48))
    p.add_argument("--scale", type=int, default=4)
    p.add_argument("--trace", help="write a jax.profiler trace here")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from ciaosr_tpu.config.config import Config
    from ciaosr_tpu.models.builder import build_model
    import ciaosr_tpu.models.restorers  # noqa: F401
    import ciaosr_tpu.models.real_restorer  # noqa: F401

    cfg = Config.fromfile(args.config)
    model = build_model(cfg.model, test_cfg=cfg.test_cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    n_params = sum(x.size for x in jax.tree.leaves(params))
    h, w = args.lq
    lq = jnp.zeros((1, h, w, 3), jnp.float32)

    fn = model._grid_fn(h, w, args.scale)
    lowered = fn.lower(params, lq)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0]
    flops = cost.get("flops", float("nan"))
    bytes_ = cost.get("bytes accessed", float("nan"))
    out_px = (h * args.scale) * (w * args.scale)
    print(f"model params:        {n_params / 1e6:.2f} M")
    print(f"input (LQ):          {h}x{w}  scale x{args.scale}")
    print(f"compiled flops:      {flops / 1e9:.2f} GFLOP "
          f"({flops / out_px / 1e6:.3f} MFLOP/output px)")
    print(f"bytes accessed:      {bytes_ / 1e9:.2f} GB")
    mem = compiled.memory_analysis()
    if mem is not None:
        print(f"peak device memory:  "
              f"{getattr(mem, 'temp_size_in_bytes', 0) / 1e9:.2f} GB temp + "
              f"{getattr(mem, 'argument_size_in_bytes', 0) / 1e9:.2f} GB args")

    if args.trace:
        import numpy as np
        with jax.profiler.trace(args.trace):
            out = fn(params, lq)
            float(out.sum())
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
