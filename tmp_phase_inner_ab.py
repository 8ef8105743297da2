"""A/B the phase-inner halo grid order (CPU parity via interpret, TPU timing)."""
import sys
import time
import functools
import numpy as np
import jax
import jax.numpy as jnp

from ciaosr_tpu.ops.pallas import decoder_kernel as dk_mod
from tmp_profile_stages import mk_params, scan_time


def run(name, c, s=4, hw=192, parity_only=False):
    dk, dc = 9 * c, c
    params = mk_params(jax.random.PRNGKey(0), dk, dc)
    u_map = jax.random.normal(jax.random.PRNGKey(1), (1, hw, hw, dk),
                              jnp.bfloat16)
    csa = jax.random.normal(jax.random.PRNGKey(2), (1, hw, hw, dc),
                            jnp.bfloat16)
    interp = jax.default_backend() == "cpu"

    def f(pi):
        return functools.partial(
            dk_mod.grid_decode_fused, scale=s, local_size=2,
            softmax_scale=1.0, interpret=interp, assembly="halo")

    def call(pi, u):
        return dk_mod._grid_decode_halo(
            u, csa, params, s, [(-1, -1), (-1, 1), (1, -1), (1, 1)],
            4, 2.0 / s, 1.0, interp, True, phase_inner=pi)

    if parity_only:
        a = call(False, u_map)
        b = call(True, u_map)
        d = float(jnp.max(jnp.abs(a - b)))
        print(f"{name}: phase_inner parity max|d|={d:.2e}", flush=True)
        assert d == 0.0, d
        return
    t0 = scan_time(lambda u: call(False, u), u_map)
    t1 = scan_time(lambda u: call(True, u), u_map)
    print(f"{name}: phase-outer {t0:.2f} ms | phase-inner {t1:.2f} ms",
          flush=True)


if __name__ == "__main__":
    parity = "--parity" in sys.argv
    run("RDN   DK=576 ", 64, hw=48 if parity else 192, parity_only=parity,
        s=3 if parity else 4)
    run("SwinIR DK=1620", 180, hw=48 if parity else 192, parity_only=parity,
        s=3 if parity else 4)
