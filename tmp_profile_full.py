"""Full-pipeline stage split for the eval tile path (real models, TPU)."""
import sys
import time
import functools
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "tools")
from benchmark import build  # noqa: E402
from tmp_profile_stages import scan_time  # noqa: E402


def profile(model, tile=192, s=4):
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

    from ciaosr_tpu.ops.pallas.decoder_kernel import grid_decode_fused
    dec_params = {
        "imnet_k": params["params"]["imnet_k"],
        "imnet_v": params["params"]["imnet_v"],
        "imnet_q": params["params"]["imnet_q"]}
    t_dec = scan_time(
        lambda u: grid_decode_fused(
            u, csa_map, dec_params, scale=s,
            local_size=gen.local_size, softmax_scale=gen.softmax_scale),
        u_map.astype(jnp.bfloat16))

    t_pal = scan_time(
        lambda f: gen.apply(params, f, lq_n, s,
                            method="query_rgb_grid_pallas"), feature)

    fn = restorer._grid_fn(tile, tile, s)
    _ = fn(params, lq)
    jax.block_until_ready(_)
    float(jnp.sum(_))
    t0 = time.perf_counter()
    N = 10
    outs = None
    for _i in range(N):
        outs = fn(params, lq)
    float(jnp.sum(outs))
    t_full = (time.perf_counter() - t0) / N * 1e3

    print(f"{model}: encoder {t_enc:.2f} | unfold {t_unf:.2f} | "
          f"csa {t_csa:.2f} | decode-kernel {t_dec:.2f} | "
          f"unfold+csa+decode+epilogue {t_pal:.2f} | full {t_full:.2f} ms",
          flush=True)


if __name__ == "__main__":
    for m in sys.argv[1:] or ["swinir", "rdn"]:
        profile(m)
