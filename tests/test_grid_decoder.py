"""Dense-grid decoder (query_rgb_grid) vs per-query gather path parity.

The grid path is the integer-scale eval fast path (zero gathers); it must
reproduce query_rgb exactly on uniform grids — including the border-clamp
behavior of the shifted samples and the local-ensemble snap offsets.
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


@pytest.mark.parametrize("scale", [1, 2, 3, 4, 6, 12, 30])
def test_grid_matches_gather(rng, scale):
    net = _net()
    hw = (10, 9) if scale <= 6 else (5, 4)  # OOD scales: tiny LR grid
    x = jnp.asarray(rng.random((2, *hw, 3), dtype=np.float32))
    params = net.init(jax.random.PRNGKey(0), x, jnp.zeros((2, 8, 2)),
                      jnp.full((2, 8, 2), 0.1))
    th, tw = hw[0] * scale, hw[1] * scale
    coord, cell = make_coord_cell((th, tw))
    coord_b = jnp.broadcast_to(coord[None], (2, th * tw, 2))
    cell_b = jnp.broadcast_to(cell[None], (2, th * tw, 2))
    gather = net.apply(params, x, coord_b, cell_b)
    feat = net.apply(params, x, method="gen_feature")
    grid = net.apply(params, feat, x, scale, method="query_rgb_grid")
    np.testing.assert_allclose(np.asarray(grid.reshape(2, th * tw, 3)),
                               np.asarray(gather), atol=3e-5, rtol=1e-4)


@pytest.mark.parametrize("local_size", [1, 3])
def test_grid_matches_gather_local_sizes(rng, local_size):
    net = _net(non_local=False, local_size=local_size)
    x = jnp.asarray(rng.random((1, 7, 8, 3), dtype=np.float32))
    params = net.init(jax.random.PRNGKey(1), x, jnp.zeros((1, 8, 2)),
                      jnp.full((1, 8, 2), 0.1))
    s = 3
    th, tw = 7 * s, 8 * s
    coord, cell = make_coord_cell((th, tw))
    gather = net.apply(params, x, coord[None], cell[None])
    feat = net.apply(params, x, method="gen_feature")
    grid = net.apply(params, feat, x, s, method="query_rgb_grid")
    np.testing.assert_allclose(np.asarray(grid.reshape(1, th * tw, 3)),
                               np.asarray(gather), atol=3e-5, rtol=1e-4)


def test_restorer_uses_grid_path(rng):
    """predict() routes integer-scale targets through the grid program and
    non-integer targets through the chunked path; results agree with the
    direct generator forward."""
    from ciaosr_tpu.models.restorers import CiaoSRRestorer
    restorer = CiaoSRRestorer(
        generator=dict(
            type="LocalImplicitSREDSR",
            encoder=dict(type="EDSR", in_channels=3, mid_channels=16,
                         num_blocks=2),
            imnet_q=dict(type="MLPRefiner", out_dim=3, hidden_list=[32, 32]),
            imnet_k=dict(type="MLPRefiner", out_dim=1, hidden_list=[32, 32]),
            imnet_v=dict(type="MLPRefiner", out_dim=1, hidden_list=[32, 32]),
            eval_bsize=500),
        test_cfg=dict(metrics=["PSNR"], scale=4))
    params = restorer.init_params(jax.random.PRNGKey(0))
    lq = rng.random((11, 13, 3), dtype=np.float32)
    out_grid = restorer.predict(params, lq, (44, 52))      # integer ×4
    assert ("grid", 11, 13, 4) in restorer._jit_cache
    out_chunk = restorer.predict(params, lq, (44, 51))     # non-integer
    assert any(k[0] == "pred" for k in restorer._jit_cache)
    assert out_grid.shape == (44, 52, 3)
    assert out_chunk.shape == (44, 51, 3)
    # the grid output must equal the chunked machinery on the SAME grid:
    # rebuild via the generator's gather path + normalization protocol
    from ciaosr_tpu.core.coords import make_coord_cell
    coord, cell = make_coord_cell((44, 52))
    lq_n = (jnp.asarray(lq[None]) - restorer.rgb_mean) / restorer.rgb_std
    ref = restorer.generator.apply(params, lq_n, coord[None], cell[None])
    ref = np.asarray(jnp.clip(
        ref * restorer.rgb_std + restorer.rgb_mean, 0, 1)
    ).reshape(44, 52, 3)
    np.testing.assert_allclose(out_grid, ref, atol=1e-5)
