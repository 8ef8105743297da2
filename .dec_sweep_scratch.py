import time, functools
import numpy as np, jax, jax.numpy as jnp
import ciaosr_tpu.ops.pallas.decoder_kernel as dk_mod

c = 64; s = 4; hw = 192
dk, dc = 9 * c, c
import sys
sys.path.insert(0, "tools")
from profile_stages import mk_params, scan_time
params = mk_params(jax.random.PRNGKey(0), dk, dc)
u_map = jax.random.normal(jax.random.PRNGKey(1), (1, hw, hw, dk), jnp.bfloat16)
csa = jax.random.normal(jax.random.PRNGKey(2), (1, hw, hw, dc), jnp.bfloat16)
for rmax in (None, 12, 16, 24):
    dk_mod._HALO_RMAX_OVERRIDE = rmax
    try:
        t = scan_time(lambda u: dk_mod.grid_decode_fused(
            u, csa, params, scale=s, local_size=2, softmax_scale=1.0), u_map)
        print(f"rmax={rmax}: {t:.2f} ms", flush=True)
    except Exception as e:
        print(f"rmax={rmax}: FAIL {type(e).__name__}", flush=True)
