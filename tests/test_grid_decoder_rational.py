"""Rational-scale dense-grid decoder (query_rgb_grid_rational) parity.

Split from test_grid_decoder.py (round-3 verdict: no single slow file
over ~5 min — the rational param matrix alone is ~4.5 min of CPU
compiles). Integer-scale grid parity stays in test_grid_decoder.py; the
fused Pallas rational path is tested in test_rational_pallas.py.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from ciaosr_tpu.core.coords import make_coord_cell
from ciaosr_tpu.models.builder import build_generator


def _net(non_local=True, local_size=2):
    return build_generator(dict(
        type="LocalImplicitSRRDN",
        encoder=dict(type="RDN", in_channels=3, mid_channels=16,
                     num_blocks=2, num_layers=3, channel_growth=8),
        imnet_q=dict(type="MLPRefiner", out_dim=3, hidden_list=[32, 32]),
        imnet_k=dict(type="MLPRefiner", out_dim=1, hidden_list=[32, 32]),
        imnet_v=dict(type="MLPRefiner", out_dim=1, hidden_list=[32, 32]),
        non_local_attn=non_local, local_size=local_size))


@pytest.mark.parametrize("py,qy,px,qx,hw", [
    (3, 2, 3, 2, (8, 6)),      # ×1.5 — exercises exact nearest-tie rows
    (5, 2, 5, 2, (8, 6)),      # ×2.5
    (7, 3, 7, 3, (9, 6)),      # ×7/3
    (5, 3, 7, 2, (9, 8)),      # anisotropic rational target
])
def test_rational_grid_matches_gather(rng, py, qy, px, qx, hw):
    """query_rgb_grid_rational == the per-query gather path at rational
    scales (the arbitrary-scale headline, VERDICT r2 item 1). The host
    index tables emulate the gather path's float32 rounding bit-exactly,
    so even scales whose HR centers sit on LR nearest-neighbor ties
    (×1.5) agree to dense-vs-gather float noise."""
    net = _net()
    h, w = hw
    x = jnp.asarray(rng.random((2, h, w, 3), dtype=np.float32))
    params = net.init(jax.random.PRNGKey(0), x, jnp.zeros((2, 8, 2)),
                      jnp.full((2, 8, 2), 0.1))
    th, tw = h * py // qy, w * px // qx
    coord, cell = make_coord_cell((th, tw))
    coord_b = jnp.broadcast_to(coord[None], (2, th * tw, 2))
    cell_b = jnp.broadcast_to(cell[None], (2, th * tw, 2))
    gather = net.apply(params, x, coord_b, cell_b)
    feat = net.apply(params, x, method="gen_feature")
    grid = net.apply(params, feat, x, py, qy, px, qx,
                     method="query_rgb_grid_rational")
    np.testing.assert_allclose(np.asarray(grid.reshape(2, th * tw, 3)),
                               np.asarray(gather), atol=3e-5, rtol=1e-4)


def test_rational_grid_integer_scale_identical(rng):
    """At q=1 the rational path must reproduce query_rgb_grid to float
    fusion noise (same hoists, same tables) — guards both against drift."""
    net = _net()
    x = jnp.asarray(rng.random((1, 8, 6, 3), dtype=np.float32))
    params = net.init(jax.random.PRNGKey(0), x, jnp.zeros((1, 8, 2)),
                      jnp.full((1, 8, 2), 0.1))
    feat = net.apply(params, x, method="gen_feature")
    g_int = net.apply(params, feat, x, 3, method="query_rgb_grid")
    g_rat = net.apply(params, feat, x, 3, 1, 3, 1,
                      method="query_rgb_grid_rational")
    np.testing.assert_allclose(np.asarray(g_int), np.asarray(g_rat),
                               atol=1e-6)


def _edsr_restorer(test_cfg):
    from ciaosr_tpu.models.restorers import CiaoSRRestorer
    return CiaoSRRestorer(
        generator=dict(
            type="LocalImplicitSREDSR",
            encoder=dict(type="EDSR", in_channels=3, mid_channels=16,
                         num_blocks=2),
            imnet_q=dict(type="MLPRefiner", out_dim=3, hidden_list=[32, 32]),
            imnet_k=dict(type="MLPRefiner", out_dim=1, hidden_list=[32, 32]),
            imnet_v=dict(type="MLPRefiner", out_dim=1, hidden_list=[32, 32]),
            eval_bsize=500),
        test_cfg=test_cfg)


def test_restorer_predict_routes_rational(rng):
    """predict() routes tractable rational scales through the dense
    rational program (not the slow gather fallback) and agrees with the
    generator's gather path on the same target grid."""
    restorer = _edsr_restorer(dict(metrics=["PSNR"], scale=2.5))
    params = restorer.init_params(jax.random.PRNGKey(0))
    lq = rng.random((8, 6, 3), dtype=np.float32)
    out = restorer.predict(params, lq, (20, 15))           # ×2.5
    assert ("gridr", 8, 6, 5, 2, 5, 2) in restorer._jit_cache
    assert out.shape == (20, 15, 3)
    coord, cell = make_coord_cell((20, 15))
    lq_n = (jnp.asarray(lq[None]) - restorer.rgb_mean) / restorer.rgb_std
    ref = restorer.generator.apply(params, lq_n, coord[None], cell[None])
    ref = np.asarray(jnp.clip(
        ref * restorer.rgb_std + restorer.rgb_mean, 0, 1)).reshape(20, 15, 3)
    np.testing.assert_allclose(out, ref, atol=3e-5, rtol=1e-4)


def test_tiled_eval_rational_scale(rng):
    """forward_test with tile + non-integer scale must NOT floor the scale
    (VERDICT r2 weak #3): a single-tile image reproduces the full-image
    rational predict exactly; a multi-tile odd-sized image pads to the
    q-grid and crops back to the exact rounded target."""
    restorer = _edsr_restorer(dict(metrics=["PSNR"], scale=2.5, tile=8,
                                   tile_overlap=4))
    params = restorer.init_params(jax.random.PRNGKey(0))
    # one-tile case: tiled == full predict, and output is ×2.5 not ×2
    lq = rng.random((8, 8, 3), dtype=np.float32)
    tiled = restorer.forward_test(params, lq, scale=2.5)
    assert tiled.shape == (20, 20, 3)
    full = restorer.predict(params, lq, (20, 20))
    np.testing.assert_allclose(tiled, full, atol=1e-6)
    # odd size: 9 not divisible by q=2 → reflect-pad + crop to round(9·2.5)
    lq = rng.random((9, 14, 3), dtype=np.float32)
    out = restorer.forward_test(params, lq, scale=2.5)
    assert out.shape == (round(9 * 2.5), 35, 3)
    assert np.isfinite(out).all()
