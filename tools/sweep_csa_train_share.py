#!/usr/bin/env python
"""Measure training-time CSA cost share: classical train step with
non_local_attn on vs off (RDN + SwinIR, production 001 dims).

Backs the PERF_NOTES "Training-time CSA share" numbers (round 5).
Run on an otherwise-idle chip.
"""

import os
import sys
import time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
import jax, jax.numpy as jnp
from ciaosr_tpu.utils.compilation_cache import enable_compilation_cache
enable_compilation_cache()
from ciaosr_tpu.models.restorers import CiaoSRRestorer
from ciaosr_tpu.train.optim import build_optimizer
from ciaosr_tpu.train.trainer import TrainState, make_train_step
import ciaosr_tpu.models.restorers  # noqa

from benchmark import ENCODERS, GEN_TYPES

def step_ms(model, non_local, use_pallas=False):
    gen = dict(type=GEN_TYPES[model], encoder=ENCODERS[model],
               imnet_q=dict(type="MLPRefiner", out_dim=3,
                            hidden_list=[256] * 4),
               imnet_k=dict(type="MLPRefiner", out_dim=64,
                            hidden_list=[256] * 4),
               imnet_v=dict(type="MLPRefiner", out_dim=64,
                            hidden_list=[256] * 4),
               feat_unfold=True, eval_bsize=30000,
               non_local_attn=non_local, use_pallas=use_pallas)
    if model == "swinir":
        gen["window_size"] = 8
    r = CiaoSRRestorer(generator=gen, test_cfg=dict(metrics=["PSNR"]))
    tx, _ = build_optimizer(dict(type="Adam", lr=1e-4), None)
    step_fn = make_train_step(r, tx)
    b, patch, q = 16, 48, 2304
    params = r.init_params(jax.random.PRNGKey(0),
                           lq_shape=(1, patch, patch, 3), n_queries=q)
    state = TrainState(step=jnp.asarray(0), params=params,
                       opt_state=tx.init(params))
    rng = np.random.default_rng(0)
    batch = {
        "lq": jnp.asarray(rng.random((b, patch, patch, 3), np.float32)),
        "gt": jnp.asarray(rng.random((b, q, 3), np.float32)),
        "coord": jnp.asarray(rng.uniform(-0.99, 0.99,
                                         (b, q, 2)).astype(np.float32)),
        "cell": jnp.full((b, q, 2), 2.0 / 192, jnp.float32),
    }
    state, m = step_fn(state, batch)
    _ = float(m["loss_pix"])
    t0 = time.perf_counter()
    for _ in range(10):
        state, m = step_fn(state, batch)
    _ = float(m["loss_pix"])
    return (time.perf_counter() - t0) / 10 * 1e3

for model in ("rdn", "swinir"):
    pall = model == "swinir"
    on = step_ms(model, True, pall)
    off = step_ms(model, False, pall)
    share = (on - off) / on * 100
    print(f"{model}: train step CSA on {on:.1f} ms / off {off:.1f} ms "
          f"-> CSA fwd+bwd share {share:.1f}%", flush=True)
print("CSA SHARE DONE", flush=True)
