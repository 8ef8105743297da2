"""Stage-split profiler for the fused eval tile path (real models, TPU).

Times each pipeline stage of the dense-grid decode — encoder, unfold,
CSA, the f3p merged-map build, the k-out hoist planes, the main decoder
kernel, and the full jitted tile program — plus an A/B of the halo
kernel's phase-outer vs phase-inner grid orders. Complements
tools/profile.py (whole-program XLA cost analysis) with per-stage wall
numbers; PERF_NOTES.md records the measured history.

Methodology: each stage runs as a lax.scan of N_ITER iterations inside
ONE jit dispatch (input perturbed per iteration so XLA cannot hoist the
call), one scalar sync at the end — no per-call tunnel overhead.

Usage:
    python tools/profile_stages.py                 # rdn + swinir tiles
    python tools/profile_stages.py swinir --tile 192 --scale 4
    python tools/profile_stages.py --kernel-only   # synthetic weights
    python tools/profile_stages.py --phase-order   # phase-inner A/B
"""
import argparse
import functools
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ciaosr_tpu.ops.pallas import decoder_kernel as dk_mod  # noqa: E402

N_ITER = 10


def mk_params(rng, dk, dc, n_hidden=4, hidden=256):
    """Synthetic imnet_k/v/q parameter pytrees at production widths."""
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


def profile_kernel(name, c, s=4, hw=192):
    """Decoder-kernel-only split with synthetic weights (no encoder)."""
    dk, dc = 9 * c, c
    params = mk_params(jax.random.PRNGKey(0), dk, dc)
    u_map = jax.random.normal(jax.random.PRNGKey(1), (1, hw, hw, dk),
                              jnp.bfloat16)
    csa = jax.random.normal(jax.random.PRNGKey(2), (1, hw, hw, dc),
                            jnp.bfloat16)
    wk0 = params["imnet_k"]["layers_0"]["kernel"][:dk]
    wv0 = params["imnet_v"]["layers_0"]["kernel"][:dk + dc]
    o_u = dk_mod.a128(256) + dk_mod.a128(256) + dk_mod.a128(dc)

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


def profile_phase_order(name, c, s=4, hw=192):
    """A/B the halo kernel's phase-outer vs phase-inner grid orders.
    (Correctness parity for both orders lives in
    tests/test_pallas_kernel.py::test_halo_phase_inner_*.)"""
    dk, dc = 9 * c, c
    params = mk_params(jax.random.PRNGKey(0), dk, dc)
    u_map = jax.random.normal(jax.random.PRNGKey(1), (1, hw, hw, dk),
                              jnp.bfloat16)
    csa = jax.random.normal(jax.random.PRNGKey(2), (1, hw, hw, dc),
                            jnp.bfloat16)
    interp = jax.default_backend() == "cpu"

    def call(pi, u):
        return dk_mod._grid_decode_halo(
            u, csa, params, s, [(-1, -1), (-1, 1), (1, -1), (1, 1)],
            4, 2.0 / s, 1.0, interp, True, phase_inner=pi)

    t0 = scan_time(lambda u: call(False, u), u_map)
    t1 = scan_time(lambda u: call(True, u), u_map)
    print(f"{name}: phase-outer {t0:.2f} ms | phase-inner {t1:.2f} ms",
          flush=True)


def profile_model(model, tile=192, s=4):
    """Full-pipeline stage split through a real restorer (tools/benchmark
    model zoo): encoder | unfold | CSA | decode kernel | epilogue | full."""
    from benchmark import build
    restorer = build(model)
    params = restorer.init_params(jax.random.PRNGKey(0))
    gen = restorer.generator
    rng = np.random.default_rng(0)
    lq = jnp.asarray(rng.random((1, tile, tile, 3), dtype=np.float32))
    lq_n = (lq - restorer.rgb_mean) / restorer.rgb_std

    t_enc = scan_time(
        lambda x: gen.apply(params, x, True, method="gen_feature"), lq_n)
    feature = jax.jit(lambda x: gen.apply(params, x, True,
                                          method="gen_feature"))(lq_n)

    from ciaosr_tpu.ops.neighborhood import unfold_nhwc
    t_unf = scan_time(lambda f: unfold_nhwc(f), feature)
    u_map = jax.jit(unfold_nhwc)(feature)

    t_csa = scan_time(
        lambda f: gen.apply(
            params, f, method=lambda g, ff: g.cs_attn(ff, flash=True)),
        feature)
    csa_map = jax.jit(lambda f: gen.apply(
        params, f, method=lambda g, ff: g.cs_attn(ff, flash=True)))(feature)

    dec_params = {
        "imnet_k": params["params"]["imnet_k"],
        "imnet_v": params["params"]["imnet_v"],
        "imnet_q": params["params"]["imnet_q"]}
    t_dec = scan_time(
        lambda u: dk_mod.grid_decode_fused(
            u, csa_map, dec_params, scale=s,
            local_size=gen.local_size, softmax_scale=gen.softmax_scale),
        u_map.astype(jnp.bfloat16))

    t_pal = scan_time(
        lambda f: gen.apply(params, f, lq_n, s,
                            method="query_rgb_grid_pallas"), feature)

    fn = restorer._grid_fn(tile, tile, s)
    out = fn(params, lq)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(N_ITER):
        out = fn(params, lq)
    float(jnp.sum(out))
    t_full = (time.perf_counter() - t0) / N_ITER * 1e3

    print(f"{model}: encoder {t_enc:.2f} | unfold {t_unf:.2f} | "
          f"csa {t_csa:.2f} | decode-kernel {t_dec:.2f} | "
          f"unfold+csa+decode+epilogue {t_pal:.2f} | full {t_full:.2f} ms",
          flush=True)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("models", nargs="*", default=None,
                    help="benchmark-zoo model names (default rdn swinir)")
    ap.add_argument("--tile", type=int, default=192)
    ap.add_argument("--scale", type=int, default=4)
    ap.add_argument("--kernel-only", action="store_true",
                    help="synthetic-weight decoder kernel split")
    ap.add_argument("--phase-order", action="store_true",
                    help="phase-outer vs phase-inner halo A/B")
    args = ap.parse_args()
    if args.kernel_only or args.phase_order:
        fn = profile_phase_order if args.phase_order else profile_kernel
        fn("RDN    C=64  DK=576 ", 64, s=args.scale, hw=args.tile)
        fn("SwinIR C=180 DK=1620", 180, s=args.scale, hw=args.tile)
        return
    for m in args.models or ["rdn", "swinir"]:
        profile_model(m, tile=args.tile, s=args.scale)


if __name__ == "__main__":
    main()
