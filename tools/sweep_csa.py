"""On-chip (rows, tl) sweep for the windowed csa_fused kernel at the
SwinIR 192-tile geometry (C=180, cr=90, s=2). Scratch driver; numbers
land in PERF_NOTES.md."""
import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from ciaosr_tpu.ops.pallas.csa_attention import csa_fused

hp = wp = 192; s = 2; C = 180; cr = 90
rng = np.random.default_rng(0)
match = jnp.asarray(rng.standard_normal((1, hp, wp, cr), dtype=np.float32)).astype(jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((1, (hp//s)*(wp//s), 9*cr), dtype=np.float32)).astype(jnp.bfloat16)
embed = jnp.asarray(rng.standard_normal((1, hp, wp, C), dtype=np.float32)).astype(jnp.bfloat16)

N = 10
def bench(rows, tl, windowed):
    fn = jax.jit(functools.partial(csa_fused, scale=0.1, hp=hp, wp=wp, s=s,
                                   channels=C, rows=rows, tl=tl,
                                   windowed=windowed))
    def run(m):
        def step(carry, i):
            o = fn(m + i * jnp.asarray(1e-12, m.dtype), k, embed)
            return carry + jnp.sum(o[..., 0].astype(jnp.float32)), None
        acc, _ = jax.lax.scan(step, jnp.float32(0.), jnp.arange(N, dtype=m.dtype))
        return acc
    r = jax.jit(run)
    float(r(match))
    t0 = time.perf_counter(); float(r(match)); dt = (time.perf_counter()-t0)/N*1e3
    return dt

for rows, tl in [(4,1024),(4,512),(2,1024),(2,512),(6,512),(6,256),(8,512),(3,1024),(3,512),(1,1024)]:
    try:
        dt = bench(rows, tl, True)
        print(f"windowed rows={rows} tl={tl}: {dt:.2f} ms", flush=True)
    except Exception as e:
        print(f"windowed rows={rows} tl={tl}: FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)
