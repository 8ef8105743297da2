"""Stage-split timing for the halo grid decoder at production geometries.

Each stage is timed as a lax.scan of N iterations inside ONE jit dispatch
(input perturbed per-iteration so XLA cannot hoist the call), one scalar
sync at the end — no per-call tunnel overhead.
"""
import time
import functools
import numpy as np
import jax
import jax.numpy as jnp

from ciaosr_tpu.ops.pallas import decoder_kernel as dk_mod

N_ITER = 10


def mk_params(rng, dk, dc, n_hidden=4, hidden=256):
    def mlp(key, din, dout):
        p, keys = {}, jax.random.split(key, n_hidden + 1)
        d = din
        for i in range(n_hidden):
            p[f"layers_{i}"] = {
                "kernel": jax.random.normal(keys[i], (d, hidden)) * 0.05,
                "bias": jnp.zeros((hidden,))}
            d = hidden
        p["out"] = {"kernel": jax.random.normal(keys[-1], (d, dout)) * 0.05,
                    "bias": jnp.zeros((dout,))}
        return p
    dv = dk + dc
    k1, k2, k3 = jax.random.split(rng, 3)
    return {"imnet_k": mlp(k1, dk + 4, dk),
            "imnet_v": mlp(k2, dv + 4, dv),
            "imnet_q": mlp(k3, dv, 3)}


def scan_time(body, x0):
    """body: x -> array; time N_ITER scanned calls, return ms/call."""
    @jax.jit
    def run(x):
        def step(carry, i):
            out = body(x + i * jnp.asarray(1e-12, x.dtype))
            return carry + jnp.sum(out[..., 0].astype(jnp.float32)), None
        acc, _ = jax.lax.scan(step, jnp.float32(0.0),
                              jnp.arange(N_ITER, dtype=x.dtype))
        return acc
    float(run(x0))          # compile + warm
    t0 = time.perf_counter()
    float(run(x0))
    return (time.perf_counter() - t0) / N_ITER * 1e3


def profile(name, c, s=4, hw=192):
    dk, dc = 9 * c, c
    params = mk_params(jax.random.PRNGKey(0), dk, dc)
    u_map = jax.random.normal(jax.random.PRNGKey(1), (1, hw, hw, dk),
                              jnp.bfloat16)
    csa = jax.random.normal(jax.random.PRNGKey(2), (1, hw, hw, dc),
                            jnp.bfloat16)
    wk0 = params["imnet_k"]["layers_0"]["kernel"][:dk]
    wv0 = params["imnet_v"]["layers_0"]["kernel"][:dk + dc]
    a128 = dk_mod.a128
    o_u = a128(256) + a128(256) + a128(dc)

    t_f3p = scan_time(
        lambda u: dk_mod._build_f3p(u, csa, wk0, wv0[:dk], wv0[dk:], False),
        u_map)

    f3p = jax.jit(functools.partial(dk_mod._build_f3p, interpret=False))(
        u_map, csa, wk0, wv0[:dk], wv0[dk:])
    w_kout_t = params["imnet_k"]["out"]["kernel"].T
    b_kout = params["imnet_k"]["out"]["bias"]
    t_wt = scan_time(
        lambda f: dk_mod._wt_hoist_planes(f, w_kout_t, b_kout, dk, o_u,
                                          hw, hw, 1, 256, False)[0],
        f3p)

    t_full = scan_time(
        lambda u: dk_mod.grid_decode_fused(
            u, csa, params, scale=s, local_size=2, softmax_scale=1.0),
        u_map)

    print(f"{name}: f3p {t_f3p:.2f} ms | wt_hoist {t_wt:.2f} ms | "
          f"grid_decode_fused total {t_full:.2f} ms "
          f"(main kernel ~= {t_full - t_f3p - t_wt:.2f})", flush=True)


if __name__ == "__main__":
    profile("RDN   C=64  DK=576 ", 64)
    profile("SwinIR C=180 DK=1620", 180)
