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
def test_rational_tie_phases_fully_fused(rng, ry):
    """Even-q scales have float32 tie phases (HR centers exactly between
    LR pixels — e.g. ×2.5's center phase) whose per-row query rounding
    is irregular. Round 5 fuses them via query-window variant blending
    (_rational_tables tie groups): at (40, 16) — the smallest geometry
    where the irregularity appears — NO phase falls to the XLA path any
    more, and the model method must match the pure XLA path."""
    py, qy = ry
    h, w = 40, 16
    eligible, excluded = rational_phase_split(h, w, py, qy, py, qy, 2)
    assert not excluded, "tie phases should fuse since round 5"
    assert len(eligible) == py * py
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


@pytest.mark.slow
def test_rational_tie_groups_kernel_parity(rng):
    """Kernel-level parity at a geometry that ties on BOTH axes
    (h=12 y-tie, w=48 x-tie at ×5/2) — exercises all four tie-signature
    groups (affine, x-tie dual, y-tie dual, quad window) incl. the
    per-row/col ε-mask blending, against the XLA grid path."""
    from ciaosr_tpu.ops.pallas.decoder_kernel import _rational_tables

    py = px = 5
    qy = qx = 2
    h, w = 12, 48
    groups = [(sig, _rational_tables(h, w, py, qy, px, qx, 2, sig))
              for sig in ((0, 0), (0, 1), (1, 0), (1, 1))]
    n_per = {sig: (len(t["phase_ids"]) if t else 0) for sig, t in groups}
    assert n_per[(0, 1)] and n_per[(1, 0)] and n_per[(1, 1)], n_per
    eligible, excluded = rational_phase_split(h, w, py, qy, px, qx, 2)
    assert not excluded and len(eligible) == py * px

    net = _tiny_net()
    x = jnp.asarray(rng.random((1, h, w, 3), dtype=np.float32))
    params = net.init(jax.random.PRNGKey(0), x, jnp.zeros((1, 8, 2)),
                      jnp.full((1, 8, 2), 0.1))
    feat = net.apply(params, x, method="gen_feature")
    ref = net.apply(params, feat, x, py, qy, px, qx,
                    method="query_rgb_grid_rational")

    u = unfold_nhwc(feat)
    csa = CrossScaleAttention(channels=16, scales=(2,))
    csa_map = csa.apply({"params": params["params"]["cs_attn"]}, feat)
    phases = grid_decode_fused_rational(
        u, csa_map, params["params"], py, qy, px, qx, local_size=2,
        softmax_scale=1.0, interpret=True)
    kh, kw = h // qy, w // qx
    th, tw = kh * py, kw * px
    # compose in rational_phase_split order (group-concatenated)
    order = np.argsort([a * px + b for a, b in eligible])
    parts = phases.reshape(1, len(eligible), kh, kw, 3)
    parts = jnp.take(parts, jnp.asarray(order), axis=1)
    img = parts.reshape(1, py, px, kh, kw, 3).transpose(
        0, 3, 1, 4, 2, 5).reshape(1, th, tw, 3)
    img = img + interpolate_bilinear(x, th, tw)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                               atol=2e-3, rtol=1e-2)


def test_rational_hybrid_composition_fallback(rng, monkeypatch):
    """The XLA-composition fallback (excluded phases) is defensive code
    since round 5 — no scanned geometry produces an excluded phase — but
    must stay correct: force one phase out of the fused set (at the
    _rational_tables level, so the split and the decode agree) and check
    the model still composes to the reference."""
    from ciaosr_tpu.ops.pallas import decoder_kernel as dk

    py, qy = 5, 2
    h, w = 8, 16
    real_tables = dk._rational_tables

    def fake_tables(h_, w_, py_, qy_, px_, qx_, ls, sig=(0, 0)):
        t = real_tables(h_, w_, py_, qy_, px_, qx_, ls, sig)
        if t is None:
            return None
        t = dict(t)
        ids = list(t["phase_ids"])
        if (0, 0) in ids:
            i = ids.index((0, 0))
            for k, v in t.items():
                if isinstance(v, np.ndarray):
                    t[k] = np.delete(v, i, axis=0)
            t["phase_ids"] = tuple(p for p in ids if p != (0, 0))
        t["excluded"] = ((0, 0),)
        return t

    monkeypatch.setattr(dk, "_rational_tables", fake_tables)

    net = _tiny_net()
    x = jnp.asarray(rng.random((1, h, w, 3), dtype=np.float32))
    params = net.init(jax.random.PRNGKey(0), x, jnp.zeros((1, 8, 2)),
                      jnp.full((1, 8, 2), 0.1))
    feat = net.apply(params, x, method="gen_feature")
    ref = net.apply(params, feat, x, py, qy, py, qy,
                    method="query_rgb_grid_rational")
    hyb = net.apply(params, feat, x, py, qy, py, qy,
                    method="query_rgb_grid_rational_pallas")
    np.testing.assert_allclose(np.asarray(hyb), np.asarray(ref),
                               atol=2e-3, rtol=1e-2)
    # the XLA-decoded phase follows the same f32 code path as the
    # reference method — only reduction-shape effects may differ (the
    # subset decode batches 1 phase where the full path batches all), so
    # f32-noise tight, not bit-equal
    np.testing.assert_allclose(np.asarray(hyb)[:, 0::py, 0::py],
                               np.asarray(ref)[:, 0::py, 0::py],
                               atol=1e-5, rtol=1e-5)


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
