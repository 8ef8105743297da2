"""On-chip (rows, tl) sweep for csa_stencil_fused at the production
192-tile geometries (RDN C=64/cr=32, SwinIR C=180/cr=90, s=2).
Baselines: csa_fused resident (RDN) 13.56 ms / two-kernel stencil
(SwinIR) 20.16 ms."""
import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from ciaosr_tpu.ops.pallas.csa_attention import csa_stencil_fused

N = 10
def bench(fn, match, k, embed):
    def run(m):
        def step(carry, i):
            o = fn(m + i * jnp.asarray(1e-12, m.dtype), k, embed)
            return carry + jnp.sum(o[..., 0].astype(jnp.float32)), None
        acc, _ = jax.lax.scan(step, jnp.float32(0.), jnp.arange(N, dtype=m.dtype))
        return acc
    r = jax.jit(run)
    float(r(match))
    t0 = time.perf_counter(); float(r(match)); return (time.perf_counter()-t0)/N*1e3

hp = wp = 192; s = 2
rng = np.random.default_rng(0)
combos = [(4, 1024), (8, 1024), (2, 1024), (6, 1024), (8, 512), (4, 512),
          (12, 1024), (16, 1024)]
for name, C, cr in [("rdn", 64, 32), ("swinir", 180, 90)]:
    match = jnp.asarray(rng.standard_normal((1, hp, wp, cr), dtype=np.float32)).astype(jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, (hp//s)*(wp//s), 9*cr), dtype=np.float32)).astype(jnp.bfloat16)
    k = k / jnp.maximum(jnp.linalg.norm(k.astype(jnp.float32), axis=-1, keepdims=True), 1e-4).astype(jnp.bfloat16)
    embed = jnp.asarray(rng.standard_normal((1, hp, wp, C), dtype=np.float32)).astype(jnp.bfloat16)
    ref = None
    for rows, tl in combos:
        try:
            fn = functools.partial(csa_stencil_fused, scale=0.1, hp=hp, wp=wp,
                                   s=s, channels=C, rows=rows, tl=tl)
            dt = bench(fn, match, k, embed)
            o = jax.jit(fn)(match, k, embed)
            if ref is None:
                ref = o
                pstr = "(ref)"
            else:
                pstr = f"max|d|={float(jnp.abs(o-ref).max()):.1e}"
            print(f"{name} fused-stencil rows={rows} tl={tl}: {dt:.2f} ms {pstr}", flush=True)
        except Exception as e:
            print(f"{name} fused-stencil rows={rows} tl={tl}: FAIL {type(e).__name__}: {str(e)[:100]}", flush=True)
