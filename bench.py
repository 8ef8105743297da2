#!/usr/bin/env python
"""Headline benchmark: RDN-CiaoSR ×4 eval throughput on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "megapixels/s/chip", "vs_baseline": N}

Workload = the reference's reported-results protocol (SURVEY.md §6):
tile 192 LR / overlap 32, ×4 upscaling, eval_bsize 30000 query chunks —
output megapixels (HR pixels produced) per second, steady-state (excludes
compile).

Baseline: the reference publishes no throughput (BASELINE.md). We hold
ourselves to BASELINE.json's north star — ≥5× the reference GPU's MP/s.
Reference-GPU estimate: LIIF-RDN ×4 ≈ 1.2 MP/s on a V100-class GPU
(public LIIF benchmarks); CiaoSR adds ~4 decoder MLP passes + CSA
(~3× cost) → ≈ 0.4 MP/s. vs_baseline is value / 0.4.
"""

import json
import time

import numpy as np


REFERENCE_GPU_MPS_ESTIMATE = 0.4


def main():
    import jax

    from __graft_entry__ import _flagship

    restorer = _flagship()
    params = restorer.init_params(jax.random.PRNGKey(0),
                                  lq_shape=(1, 48, 48, 3), n_queries=2304)

    rng = np.random.default_rng(0)
    lq_tile = 192
    scale = 4
    lq = rng.random((lq_tile, lq_tile, 3), dtype=np.float32)

    # warm-up / compile
    out = restorer.predict(params, lq, (lq_tile * scale, lq_tile * scale))
    assert out.shape == (768, 768, 3)

    iters = 8
    t0 = time.perf_counter()
    for _ in range(iters):
        restorer.predict(params, lq, (lq_tile * scale, lq_tile * scale))
    dt = time.perf_counter() - t0

    mp = (lq_tile * scale) ** 2 / 1e6
    mps = mp * iters / dt
    print(json.dumps({
        "metric": "rdn_ciaosr_x4_eval_throughput",
        "value": round(mps, 4),
        "unit": "megapixels/s/chip",
        "vs_baseline": round(mps / REFERENCE_GPU_MPS_ESTIMATE, 2),
    }))


if __name__ == "__main__":
    main()
