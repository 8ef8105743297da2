"""Rational-scale fused halo decode vs the XLA rational grid path.

grid_decode_fused_rational (ops/pallas/decoder_kernel.py) decodes
rational scales p/q over residue-grouped strided fetches; these tests
pin it (interpret mode) against query_rgb_grid_rational — the XLA path
that is itself parity-tested against the reference's per-query gather
semantics (tests/test_grid_decoder.py). Reference capability being
covered: arbitrary target sizes, mmedited/models/restorers/ciaosr.py:
240-243.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ciaosr_tpu.models.builder import build_generator
from ciaosr_tpu.models.csa import CrossScaleAttention
from ciaosr_tpu.ops.neighborhood import unfold_nhwc
from ciaosr_tpu.ops.pallas.decoder_kernel import (
    grid_decode_fused_rational, rational_halo_supported,
    rational_phase_split)
from ciaosr_tpu.ops.sampling import interpolate_bilinear


def _tiny_net(non_local=True):
    return build_generator(dict(
        type="LocalImplicitSRRDN",
        encoder=dict(type="RDN", in_channels=3, mid_channels=16,
                     num_blocks=2, num_layers=3, channel_growth=8),
        imnet_q=dict(type="MLPRefiner", out_dim=3, hidden_list=[32, 32]),
        imnet_k=dict(type="MLPRefiner", out_dim=1, hidden_list=[32, 32]),
        imnet_v=dict(type="MLPRefiner", out_dim=1, hidden_list=[32, 32]),
        non_local_attn=non_local))


@pytest.mark.slow
@pytest.mark.parametrize("h,w,ry,rx,hoist", [
    # x2.5 isotropic (the paper's headline rational capability)
    (8, 16, (5, 2), (5, 2), True),
    (8, 16, (5, 2), (5, 2), False),
    # x1.5 isotropic
    (8, 16, (3, 2), (3, 2), True),
    # x7/3 isotropic (needs q | size: h=6, w=24 -> kh=2, kw=8)
    (6, 24, (7, 3), (7, 3), True),
    # anisotropic rational: 3/2 rows x 5/4 cols
    (8, 32, (3, 2), (5, 4), True),
])
def test_rational_halo_matches_xla_grid(rng, h, w, ry, rx, hoist):
    """Fused rational decode == query_rgb_grid_rational on the full
    image, including border rows/cols (residue wrap + edge clamps) and
    the anisotropic per-axis cell folding."""
    py, qy = ry
    px, qx = rx
    net = _tiny_net()
    x = jnp.asarray(rng.random((2, h, w, 3), dtype=np.float32))
    params = net.init(jax.random.PRNGKey(0), x, jnp.zeros((2, 8, 2)),
                      jnp.full((2, 8, 2), 0.1))
    feat = net.apply(params, x, method="gen_feature")
    ref = net.apply(params, feat, x, py, qy, px, qx,
                    method="query_rgb_grid_rational")

    assert rational_halo_supported(h, w, py, qy, px, qx, 2)
    # these geometries are fully fused (no float32 tie phases) — the
    # direct-kernel assembly below assumes every phase came from the kernel
    assert not rational_phase_split(h, w, py, qy, px, qx, 2)[1]
    u = unfold_nhwc(feat)
    csa = CrossScaleAttention(channels=16, scales=(2,))
    csa_map = csa.apply({"params": params["params"]["cs_attn"]}, feat)
    phases = grid_decode_fused_rational(
        u, csa_map, params["params"], py, qy, px, qx, local_size=2,
        softmax_scale=1.0, interpret=True, hoist_kout=hoist)
    kh, kw = h // qy, w // qx
    th, tw = kh * py, kw * px
    img = phases.reshape(2, py, px, kh, kw, 3).transpose(
        0, 3, 1, 4, 2, 5).reshape(2, th, tw, 3)
    img = img + interpolate_bilinear(x, th, tw)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                               atol=2e-3, rtol=1e-2)

    # phase-inner grid order must be BIT-identical (pure reordering)
    ph2 = grid_decode_fused_rational(
        u, csa_map, params["params"], py, qy, px, qx, local_size=2,
        softmax_scale=1.0, interpret=True, hoist_kout=hoist,
        phase_inner=True)
    np.testing.assert_array_equal(np.asarray(phases), np.asarray(ph2))


@pytest.mark.slow
@pytest.mark.parametrize("ry", [(5, 2), (3, 2)])
def test_rational_hybrid_tie_phase_composition(rng, ry):
    """Even-q scales have float32 tie phases (HR centers exactly between
    LR pixels — e.g. ×2.5's center phase) whose per-row rounding is
    irregular and cannot ride a strided fetch; the model method must
    compose fused-eligible phases (kernel) with tie phases (XLA dense
    subset) and match the pure XLA path exactly. (40, 16) is the
    smallest geometry where the irregularity appears."""
    py, qy = ry
    h, w = 40, 16
    eligible, excluded = rational_phase_split(h, w, py, qy, py, qy, 2)
    assert excluded, "geometry no longer exercises the tie-phase branch"
    net = _tiny_net()
    x = jnp.asarray(rng.random((1, h, w, 3), dtype=np.float32))
    params = net.init(jax.random.PRNGKey(0), x, jnp.zeros((1, 8, 2)),
                      jnp.full((1, 8, 2), 0.1))
    feat = net.apply(params, x, method="gen_feature")
    ref = net.apply(params, feat, x, py, qy, py, qy,
                    method="query_rgb_grid_rational")
    hyb = net.apply(params, feat, x, py, qy, py, qy,
                    method="query_rgb_grid_rational_pallas")
    assert hyb.shape == ref.shape
    np.testing.assert_allclose(np.asarray(hyb), np.asarray(ref),
                               atol=2e-3, rtol=1e-2)
    # the XLA-decoded tie phases must be BIT-equal (same code path);
    # check one excluded phase's pixels exactly
    a, b = excluded[0]
    np.testing.assert_array_equal(np.asarray(hyb)[:, a::py, b::py],
                                  np.asarray(ref)[:, a::py, b::py])


def test_rational_halo_supported_gates():
    """The host gate rejects inexpressible geometries (and the decode
    entry raises on them) instead of silently mis-decoding."""
    # kw = w/qx not 8-aligned
    assert not rational_halo_supported(8, 8, 5, 2, 5, 2, 2)
    # q does not divide the size
    assert not rational_halo_supported(9, 16, 5, 2, 5, 2, 2)
    # kh < 2
    assert not rational_halo_supported(2, 16, 5, 2, 5, 2, 2)
    # downscale
    assert not rational_halo_supported(8, 16, 1, 2, 1, 2, 2)
    # integer scales belong to grid_decode_fused
    assert not rational_halo_supported(8, 16, 4, 1, 4, 1, 2)
    with pytest.raises(ValueError, match="unsupported"):
        grid_decode_fused_rational(
            jnp.zeros((1, 8, 8, 144), jnp.bfloat16), None, {}, 5, 2, 5, 2,
            local_size=2, softmax_scale=1.0, interpret=True)


@pytest.mark.slow
def test_restorer_rational_pallas_routing(rng):
    """use_pallas restorers route expressible rational predictions (full
    image and tiled) through the fused kernel and match the XLA path."""
    from ciaosr_tpu.models.restorers import CiaoSRRestorer
    gen = dict(type="LocalImplicitSREDSR",
               encoder=dict(type="EDSR", in_channels=3, mid_channels=16,
                            num_blocks=2),
               imnet_q=dict(type="MLPRefiner", out_dim=3,
                            hidden_list=[32, 32]),
               imnet_k=dict(type="MLPRefiner", out_dim=1,
                            hidden_list=[32, 32]),
               imnet_v=dict(type="MLPRefiner", out_dim=1,
                            hidden_list=[32, 32]))
    r_pallas = CiaoSRRestorer(generator=dict(gen, use_pallas=True),
                              test_cfg=dict(metrics=["PSNR"]))
    r_xla = CiaoSRRestorer(generator=gen, test_cfg=dict(metrics=["PSNR"]))
    params = r_xla.init_params(jax.random.PRNGKey(0))
    lq = rng.random((8, 16, 3), dtype=np.float32)
    # x2.5 full image: 8x16 -> 20x40
    out_p = r_pallas.predict(params, lq, (20, 40))
    out_x = r_xla.predict(params, lq, (20, 40))
    assert out_p.shape == (20, 40, 3)
    np.testing.assert_allclose(out_p, out_x, atol=3e-3)
    # the routing really took the fused path (jit-cache key flags it)
    from ciaosr_tpu.models.restorers import _rational_pallas_ok
    assert _rational_pallas_ok(r_pallas.generator, 8, 16, 5, 2, 5, 2)
    # tiled x2.5 (q-snapped tiles through the fused kernel)
    lq2 = rng.random((16, 16, 3), dtype=np.float32)
    tp = r_pallas.predict_tiled(params, lq2, 2.5, tile=16, tile_overlap=4)
    tx = r_xla.predict_tiled(params, lq2, 2.5, tile=16, tile_overlap=4)
    assert tp.shape == (40, 40, 3)
    np.testing.assert_allclose(tp, tx, atol=3e-3)
