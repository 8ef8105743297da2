#!/usr/bin/env python
"""Sweep the halo decode kernel's row-block cap (`_HALO_RMAX_OVERRIDE`).

Measures grid_decode_fused at RDN x4 dims for several row-block caps; the
production gate in decoder_kernel._grid_decode_halo was picked from this
sweep (rmax=8 for lanes<=1536, else 4). Re-run after kernel changes or on
a new TPU generation before touching the gate.
"""

import os
import sys

import numpy as np  # noqa: F401
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import ciaosr_tpu.ops.pallas.decoder_kernel as dk_mod
from profile_stages import mk_params, scan_time

c = 64
s = 4
hw = 192
dk, dc = 9 * c, c
params = mk_params(jax.random.PRNGKey(0), dk, dc)
u_map = jax.random.normal(jax.random.PRNGKey(1), (1, hw, hw, dk), jnp.bfloat16)
csa = jax.random.normal(jax.random.PRNGKey(2), (1, hw, hw, dc), jnp.bfloat16)
for rmax in (None, 4, 8, 12, 16, 24):
    dk_mod._HALO_RMAX_OVERRIDE = rmax
    try:
        t = scan_time(lambda u: dk_mod.grid_decode_fused(
            u, csa, params, scale=s, local_size=2, softmax_scale=1.0), u_map)
        print(f"rmax={rmax}: {t:.2f} ms", flush=True)
    except Exception as e:  # noqa: BLE001 — sweep must report, not die
        print(f"rmax={rmax}: FAIL {type(e).__name__}", flush=True)
dk_mod._HALO_RMAX_OVERRIDE = None
