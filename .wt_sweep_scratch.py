import time, functools
import numpy as np, jax, jax.numpy as jnp
import ciaosr_tpu.ops.pallas.decoder_kernel as dkmod
from ciaosr_tpu.ops.pallas.decoder_kernel import _wt_hoist_planes, _build_f3p, a128

# RDN geometry: h=w=192, dk=576, hidden 256, dc=256
h = w = 192; dk = 576; dc = 256; hidden = 256; bsz = 1
rng = np.random.default_rng(0)
u_map = jnp.asarray(rng.standard_normal((bsz, h, w, dk), dtype=np.float32))
csa_map = jnp.asarray(rng.standard_normal((bsz, h, w, dc), dtype=np.float32))
wk0 = jnp.asarray(rng.standard_normal((dk, hidden), dtype=np.float32))
wv0 = jnp.asarray(rng.standard_normal((dk + dc, hidden), dtype=np.float32))
w_kout_t = jnp.asarray(rng.standard_normal((hidden, dk), dtype=np.float32)).T
b_kout = jnp.asarray(rng.standard_normal((dk,), dtype=np.float32))
f3p = _build_f3p(u_map, csa_map, wk0, wv0[:dk], wv0[dk:], False)
f3p = jax.block_until_ready(f3p)
hk_p = hv_p = a128(hidden); o_u = hk_p + hv_p + a128(dc)
h_last = w_kout_t.shape[-1]

def run(rmax):
    orig = dkmod._wt_hoist_planes.__wrapped__ if hasattr(dkmod._wt_hoist_planes,'__wrapped__') else None
    # monkeypatch rmax by patching the function's logic: easier — copy driver with rows forced
    import ciaosr_tpu.ops.pallas.decoder_kernel as m
    src_rows = max(r for r in range(1, rmax + 1) if h % r == 0)
    # call internal with patched range: temporarily wrap
    import types
    def timed():
        def body(x, _):
            wt9, ck9 = _wt_hoist_planes(x, w_kout_t, b_kout, dk, o_u, h, w, bsz, h_last, False)
            return x + 0, (wt9.sum() + ck9.sum())
        def prog(x):
            _, s = jax.lax.scan(body, x, None, length=10)
            return s.sum()
        f = jax.jit(prog)
        r = f(f3p); r.block_until_ready()
        t0 = time.perf_counter(); r = f(f3p); r.block_until_ready()
        return (time.perf_counter() - t0) / 10 * 1000
    return timed()

import re, inspect
src = inspect.getsource(dkmod._wt_hoist_planes)
for rmax_val in (8, 16, 24, 12, 6):
    # patch the rmax line
    code = src.replace("rmax = 8 if dk_pad <= 1024 else 4", f"rmax = {rmax_val}").replace("vmem_limit_bytes=100 * 1024 * 1024", "vmem_limit_bytes=127 * 1024 * 1024")
    ns = dict(dkmod.__dict__)
    exec(code, ns)
    _wt_hoist_planes = ns["_wt_hoist_planes"]
    ms = None
    try:
        ms = run(rmax_val)
    except Exception as e:
        print(f'rmax={rmax_val}: FAIL {type(e).__name__}'); continue
    print(f"rmax={rmax_val}: {ms:.3f} ms")
