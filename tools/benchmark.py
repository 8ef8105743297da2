#!/usr/bin/env python
"""Throughput benchmark suite: eval per scale + training step.

    python tools/benchmark.py [--model rdn|edsr|swinir] [--scales 2 3 4 ...]
                              [--tile 192] [--train] [--json OUT]

Eval workload matches the reported-results protocol (tile=LR input,
dense-grid decoder, bf16 compute); training workload is the 001 recipe
(batch 16, LR patch 48, 2304 queries). Device-side timing with a single
final sync (see bench.py note on the sandbox host tunnel).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


ENCODERS = {
    "rdn": dict(type="RDN", in_channels=3, mid_channels=64, num_blocks=16,
                num_layers=8, channel_growth=64),
    "edsr": dict(type="EDSR", in_channels=3, mid_channels=64, num_blocks=16),
    "swinir": dict(type="SwinIR", embed_dim=180, depths=[6] * 6,
                   num_heads=[6] * 6, window_size=8, mlp_ratio=2),
}
GEN_TYPES = {"rdn": "LocalImplicitSRRDN", "edsr": "LocalImplicitSREDSR",
             "swinir": "LocalImplicitSRSWINIR"}


def build(model: str, dtype="bf16", use_pallas=None):
    import ciaosr_tpu.models.restorers  # noqa: F401
    from ciaosr_tpu.models.restorers import CiaoSRRestorer
    gen = dict(type=GEN_TYPES[model], encoder=ENCODERS[model],
               imnet_q=dict(type="MLPRefiner", out_dim=3,
                            hidden_list=[256] * 4),
               imnet_k=dict(type="MLPRefiner", out_dim=64,
                            hidden_list=[256] * 4),
               imnet_v=dict(type="MLPRefiner", out_dim=64,
                            hidden_list=[256] * 4),
               feat_unfold=True, eval_bsize=30000, dtype=dtype,
               use_pallas=(use_pallas if use_pallas is not None
                           else dtype == "bf16"))
    if model == "swinir":
        gen["window_size"] = 8
    return CiaoSRRestorer(generator=gen, test_cfg=dict(metrics=["PSNR"]))


PEAK_BF16_TFLOPS = 197.0   # TPU v5e (v5 lite) bf16 peak


def cost_mfu(jitted, dt, *args):
    """XLA's own FLOP count for the compiled program over measured wall
    time vs v5e bf16 peak — same methodology as bench.py:79-88 (Pallas
    custom-call FLOPs counted via CostEstimate). Returns {} where cost
    analysis is unavailable (non-TPU backends)."""
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        if flops <= 0:
            return {}
        achieved = flops / dt / 1e12
        return {"achieved_tflops": round(achieved, 2),
                "mfu_pct": round(100.0 * achieved / PEAK_BF16_TFLOPS, 2)}
    except Exception:
        return {}


def bench_fn(fn, *args, iters=15):
    import jax  # noqa: F401
    out = fn(*args)
    _ = float(np.asarray(out).ravel()[0]) if hasattr(out, "ravel") \
        else float(out[0].sum() if isinstance(out, tuple) else out.sum())
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    last = outs[-1]
    _ = float((last[0] if isinstance(last, tuple) else last).sum())
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="rdn", choices=sorted(ENCODERS))
    p.add_argument("--scales", type=str, nargs="+",
                   default=["2", "3", "4", "6", "8"],
                   help="integer, decimal (1.5) or rational (7/3) scales")
    p.add_argument("--tile", type=int, default=192)
    p.add_argument("--train", action="store_true",
                   help="also benchmark the training step")
    p.add_argument("--train-pallas", action="store_true",
                   help="route the train step through the fused Swin"
                        " block custom-VJP kernel (swinir only)")
    p.add_argument("--gan", action="store_true",
                   help="benchmark the RealCiaoSR G+D train step (002 "
                        "recipe shape)")
    p.add_argument("--perceptual", action="store_true",
                   help="include the VGG19 perceptual term in the GAN "
                        "step (the true 002-gan generator objective, "
                        "configs/002_real_gan_...py:69-81). Uses "
                        "CIAOSR_VGG19_WEIGHTS when set; otherwise "
                        "synthetic VGG weights (identical cost, no "
                        "network access needed)")
    p.add_argument("--json", help="write results here")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from ciaosr_tpu.utils.compilation_cache import enable_compilation_cache
    enable_compilation_cache()  # rational/hybrid programs compile slowly

    restorer = build(args.model)
    params = restorer.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    results = {"model": args.model, "tile": args.tile,
               "device": str(jax.devices()[0])}

    lq = jnp.asarray(rng.random((1, args.tile, args.tile, 3),
                                dtype=np.float32))
    from ciaosr_tpu.models.restorers import as_scale_fraction
    for s_str in args.scales:
        s = as_scale_fraction(s_str)
        p_, q_ = s.numerator, s.denominator
        if args.tile % q_:
            print(f"x{s_str}: skipped (tile {args.tile} not divisible by "
                  f"q={q_})", flush=True)
            continue
        if q_ == 1:
            fn = restorer._grid_fn(args.tile, args.tile, p_)
        else:
            fn = restorer._grid_rational_fn(args.tile, args.tile,
                                            p_, q_, p_, q_)
        dt = bench_fn(fn, params, lq)
        mps = (args.tile * p_ // q_) ** 2 / 1e6 / dt
        results[f"x{s_str}_ms"] = round(dt * 1e3, 1)
        results[f"x{s_str}_mps"] = round(mps, 2)
        eff = cost_mfu(fn, dt, params, lq)
        for k, v in eff.items():
            results[f"x{s_str}_{k}"] = v
        print(f"x{s_str}: {dt * 1e3:7.1f} ms/tile  {mps:7.2f} MP/s"
              + (f"  ({eff['achieved_tflops']} TF/s, "
                 f"{eff['mfu_pct']}% MFU)" if eff else ""), flush=True)

    if args.train:
        from ciaosr_tpu.train.optim import build_optimizer
        from ciaosr_tpu.train.trainer import TrainState, make_train_step
        restorer_f32 = build(args.model, dtype=None,
                             use_pallas=args.train_pallas)
        tx, _ = build_optimizer(dict(type="Adam", lr=1e-4), None)
        step_fn = make_train_step(restorer_f32, tx)
        b, patch, q = 16, 48, 2304
        tparams = restorer_f32.init_params(
            jax.random.PRNGKey(0), lq_shape=(1, patch, patch, 3),
            n_queries=q)
        state = TrainState(step=jnp.asarray(0), params=tparams,
                           opt_state=tx.init(tparams))
        batch = {
            "lq": jnp.asarray(rng.random((b, patch, patch, 3), np.float32)),
            "gt": jnp.asarray(rng.random((b, q, 3), np.float32)),
            "coord": jnp.asarray(rng.uniform(-0.99, 0.99,
                                             (b, q, 2)).astype(np.float32)),
            "cell": jnp.full((b, q, 2), 2.0 / 192, jnp.float32),
        }

        def train_once(state_and_batch):
            st, bt = state_and_batch
            st2, m = step_fn(st, bt)
            return st2, m

        state, m = step_fn(state, batch)  # compile
        _ = float(m["loss_pix"])
        t0 = time.perf_counter()
        iters = 10
        for _ in range(iters):
            state, m = step_fn(state, batch)
        _ = float(m["loss_pix"])
        dt = (time.perf_counter() - t0) / iters
        results["train_step_ms"] = round(dt * 1e3, 1)
        results["train_iters_per_s"] = round(1.0 / dt, 2)
        eff = cost_mfu(step_fn, dt, state, batch)
        for k, v in eff.items():
            results[f"train_{k}"] = v
        results["train_compute_dtype"] = "f32"  # 001 recipe trains f32;
        # mfu_pct is against the bf16 peak for cross-row comparability
        print(f"train step (b{b}, {patch}px, {q}q): {dt * 1e3:.1f} ms "
              f"({1 / dt:.2f} it/s)"
              + (f"  ({eff['achieved_tflops']} TF/s, "
                 f"{eff['mfu_pct']}% MFU-bf16peak)" if eff else ""),
              flush=True)

    if args.gan:
        import ciaosr_tpu.models.real_restorer as rr
        from ciaosr_tpu.train.optim import build_optimizer
        gen = dict(type=GEN_TYPES[args.model], encoder=ENCODERS[args.model],
                   imnet_q=dict(type="MLPRefiner", out_dim=3,
                                hidden_list=[256] * 4),
                   imnet_k=dict(type="MLPRefiner", out_dim=64,
                                hidden_list=[256] * 4),
                   imnet_v=dict(type="MLPRefiner", out_dim=64,
                                hidden_list=[256] * 4),
                   feat_unfold=True, non_local_attn=False,
                   use_pallas=args.train_pallas)
        if args.model == "swinir":
            gen["window_size"] = 8
        percep_cfg = dict(
            type="PerceptualLoss",
            layer_weights={"2": 0.1, "7": 0.1, "16": 1.0, "25": 1.0,
                           "34": 1.0},
            perceptual_weight=1.0, style_weight=0.0,
            pretrained=os.environ.get("CIAOSR_VGG19_WEIGHTS")) \
            if args.perceptual else None
        gan = rr.RealCiaoSRRestorer(
            generator=gen,
            discriminator=dict(type="UNetDiscriminatorWithSpectralNorm",
                               in_channels=3, mid_channels=64),
            pixel_loss=dict(type="L1Loss", loss_weight=1.0),
            perceptual_loss=percep_cfg,
            gan_loss=dict(type="GANLoss", gan_type="vanilla",
                          loss_weight=0.1),
            is_use_sharpened_gt_in_pixel=True,
            train_cfg=dict(disc_steps=1, disc_init_steps=0,
                           ema_momentum=0.999))
        if args.perceptual and not os.environ.get("CIAOSR_VGG19_WEIGHTS"):
            # synthetic VGG19 weights: the step's cost is weight-value-
            # independent, so the timing is the true 002-gan number
            gan.perceptual_loss._params = jax.jit(
                gan.perceptual_loss.net.init)(
                    jax.random.PRNGKey(7),
                    jnp.zeros((1, 64, 64, 3), jnp.float32))
        g_tx, _ = build_optimizer(dict(type="Adam", lr=1e-4), None)
        d_tx, _ = build_optimizer(dict(type="Adam", lr=1e-4), None)
        step_fn = gan.make_gan_train_step(g_tx, d_tx)
        # 002 recipe: lq 64², 4096 contiguous queries (configs/002_*.py)
        b, hw, q = 6, 64, 64 * 64
        state = gan.init_gan_state(jax.random.PRNGKey(0), g_tx, d_tx,
                                   lq_shape=(1, hw, hw, 3), n_queries=q)
        batch = {
            "lq": jnp.asarray(rng.random((b, hw, hw, 3), np.float32)),
            "gt": jnp.asarray(rng.random((b, q, 3), np.float32)),
            "gt_unsharp": jnp.asarray(rng.random((b, q, 3), np.float32)),
            "coord": jnp.asarray(rng.uniform(
                -0.99, 0.99, (b, q, 2)).astype(np.float32)),
            "cell": jnp.full((b, q, 2), 2.0 / 256, jnp.float32),
        }
        state, m = step_fn(state, batch)  # compile
        _ = float(m["loss_pix"])
        t0 = time.perf_counter()
        iters = 10
        for _ in range(iters):
            state, m = step_fn(state, batch)
        _ = float(m["loss_pix"])
        dt = (time.perf_counter() - t0) / iters
        results["gan_step_ms"] = round(dt * 1e3, 1)
        results["gan_iters_per_s"] = round(1.0 / dt, 2)
        results["gan_perceptual"] = bool(args.perceptual)
        eff = cost_mfu(step_fn, dt, state, batch)
        for k, v in eff.items():
            results[f"gan_{k}"] = v
        tag = "with VGG19 perceptual" if args.perceptual \
            else "no perceptual"
        print(f"GAN G+D step (b{b}, {hw}px, {q}q, {tag}): "
              f"{dt * 1e3:.1f} ms ({1 / dt:.2f} it/s)"
              + (f"  ({eff['achieved_tflops']} TF/s, "
                 f"{eff['mfu_pct']}% MFU-bf16peak)" if eff else ""),
              flush=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
