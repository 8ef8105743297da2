"""Fused Pallas grid-decoder kernel vs the XLA grid path (interpret mode).

The kernel (ops/pallas/decoder_kernel.py) is the fully fused per-pixel
decoder; on CPU it runs under the Pallas interpreter. Tolerances reflect
its bf16 weight storage (the XLA reference path here runs f32).
"""

import numpy as np
import pytest

# interpret-mode kernel matrices are compile-heavy (~15-40 s each); the
# fast lane keeps only library-level smoke coverage (round-3 verdict:
# fast lane ≤ 2-3 min measured, not claimed)
pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from ciaosr_tpu.models.builder import build_generator
from ciaosr_tpu.models.csa import CrossScaleAttention
from ciaosr_tpu.ops.neighborhood import unfold_nhwc
from ciaosr_tpu.ops.pallas.decoder_kernel import grid_decode_fused
from ciaosr_tpu.ops.sampling import interpolate_bilinear


@pytest.mark.parametrize("scale,non_local,batch,hoist",
                         [(2, True, 1, None),
                          (3, True, 2, None),
                          (4, False, 1, None),
                          # wide-DK (SwinIR-sized) code path: k-out layer
                          # NOT hoisted
                          (2, True, 1, False)])
def test_fused_kernel_matches_grid_path(rng, scale, non_local, batch,
                                        hoist):
    net = build_generator(dict(
        type="LocalImplicitSRRDN",
        encoder=dict(type="RDN", in_channels=3, mid_channels=16,
                     num_blocks=2, num_layers=3, channel_growth=8),
        imnet_q=dict(type="MLPRefiner", out_dim=3, hidden_list=[32, 32]),
        imnet_k=dict(type="MLPRefiner", out_dim=1, hidden_list=[32, 32]),
        imnet_v=dict(type="MLPRefiner", out_dim=1, hidden_list=[32, 32]),
        non_local_attn=non_local))
    x = jnp.asarray(rng.random((batch, 8, 10, 3), dtype=np.float32))
    params = net.init(jax.random.PRNGKey(0), x, jnp.zeros((batch, 8, 2)),
                      jnp.full((batch, 8, 2), 0.1))
    feat = net.apply(params, x, method="gen_feature")
    ref = net.apply(params, feat, x, scale, method="query_rgb_grid")

    u = unfold_nhwc(feat)
    if non_local:
        csa = CrossScaleAttention(channels=16, scales=(2,))
        csa_map = csa.apply({"params": params["params"]["cs_attn"]}, feat)
    else:
        csa_map = None
    phases = grid_decode_fused(u, csa_map, params["params"], scale=scale,
                               local_size=2, softmax_scale=1.0, rows=2,
                               interpret=True, hoist_kout=hoist)
    h, w = 8, 10
    img = phases.reshape(batch, scale, scale, h, w, 3).transpose(
        0, 3, 1, 4, 2, 5).reshape(batch, scale * h, scale * w, 3)
    img = img + interpolate_bilinear(x, scale * h, scale * w)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                               atol=2e-3, rtol=1e-2)


@pytest.mark.parametrize("scale,non_local,batch,hoist",
                         [(2, True, 1, None), (3, True, 2, None),
                          (4, False, 1, None),
                          # wide-DK (SwinIR-sized) branch: k-out layer
                          # runs in-kernel against the query window
                          (2, True, 1, False)])
def test_halo_assembly_matches_grid_path(rng, scale, non_local, batch,
                                         hoist):
    """The round-2 'halo' assembly (in-kernel shifted-plane construction
    from column variants + halo rows, ops/pallas/decoder_kernel.py
    _grid_decode_halo) must match the XLA grid path — including the
    image-border rows/columns where the index-map clamp has to reproduce
    _shift_planes' edge padding, hence the asymmetric 8×16 geometry."""
    net = build_generator(dict(
        type="LocalImplicitSRRDN",
        encoder=dict(type="RDN", in_channels=3, mid_channels=16,
                     num_blocks=2, num_layers=3, channel_growth=8),
        imnet_q=dict(type="MLPRefiner", out_dim=3, hidden_list=[32, 32]),
        imnet_k=dict(type="MLPRefiner", out_dim=1, hidden_list=[32, 32]),
        imnet_v=dict(type="MLPRefiner", out_dim=1, hidden_list=[32, 32]),
        non_local_attn=non_local))
    x = jnp.asarray(rng.random((batch, 8, 16, 3), dtype=np.float32))
    params = net.init(jax.random.PRNGKey(0), x, jnp.zeros((batch, 8, 2)),
                      jnp.full((batch, 8, 2), 0.1))
    feat = net.apply(params, x, method="gen_feature")
    ref = net.apply(params, feat, x, scale, method="query_rgb_grid")

    u = unfold_nhwc(feat)
    if non_local:
        csa = CrossScaleAttention(channels=16, scales=(2,))
        csa_map = csa.apply({"params": params["params"]["cs_attn"]}, feat)
    else:
        csa_map = None
    phases = grid_decode_fused(u, csa_map, params["params"], scale=scale,
                               local_size=2, softmax_scale=1.0, rows=2,
                               interpret=True, assembly="halo",
                               hoist_kout=hoist)
    h, w = 8, 16
    img = phases.reshape(batch, scale, scale, h, w, 3).transpose(
        0, 3, 1, 4, 2, 5).reshape(batch, scale * h, scale * w, 3)
    img = img + interpolate_bilinear(x, scale * h, scale * w)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                               atol=2e-3, rtol=1e-2)
    # and bit-parity against the stacked assembly (same kernel numerics)
    ph2 = grid_decode_fused(u, csa_map, params["params"], scale=scale,
                            local_size=2, softmax_scale=1.0, rows=2,
                            interpret=True, assembly="stacked",
                            hoist_kout=hoist)
    np.testing.assert_allclose(np.asarray(phases), np.asarray(ph2),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("non_local", [True, False])
def test_from_feature_unfold_matches_materialized(rng, non_local):
    """The in-kernel 3×3 unfold (halo f3p build ``from_feature``) must be
    bit-identical to passing the materialized unfold_nhwc u_map — edge
    rows/columns included (8×16 exercises the zero-pad boundary in both
    dims). Pins the decoder_kernel._build_f3p from_feature path directly;
    the model-level rational tests only cover it indirectly."""
    net = build_generator(dict(
        type="LocalImplicitSRRDN",
        encoder=dict(type="RDN", in_channels=3, mid_channels=16,
                     num_blocks=2, num_layers=3, channel_growth=8),
        imnet_q=dict(type="MLPRefiner", out_dim=3, hidden_list=[32, 32]),
        imnet_k=dict(type="MLPRefiner", out_dim=1, hidden_list=[32, 32]),
        imnet_v=dict(type="MLPRefiner", out_dim=1, hidden_list=[32, 32]),
        non_local_attn=non_local))
    x = jnp.asarray(rng.random((1, 8, 16, 3), dtype=np.float32))
    params = net.init(jax.random.PRNGKey(0), x, jnp.zeros((1, 8, 2)),
                      jnp.full((1, 8, 2), 0.1))
    feat = net.apply(params, x, method="gen_feature")
    if non_local:
        csa = CrossScaleAttention(channels=16, scales=(2,))
        csa_map = csa.apply({"params": params["params"]["cs_attn"]}, feat)
    else:
        csa_map = None
    kw = dict(scale=2, local_size=2, softmax_scale=1.0,
              interpret=True, assembly="halo")
    from_u = grid_decode_fused(unfold_nhwc(feat), csa_map,
                               params["params"], **kw)
    from_f = grid_decode_fused(None, csa_map, params["params"],
                               feature=feat, **kw)
    np.testing.assert_array_equal(np.asarray(from_u), np.asarray(from_f))
    # passing both (or neither) is a contract violation
    with pytest.raises(ValueError, match="exactly one"):
        grid_decode_fused(unfold_nhwc(feat), csa_map, params["params"],
                          feature=feat, **kw)
    with pytest.raises(ValueError, match="exactly one"):
        grid_decode_fused(None, csa_map, params["params"], **kw)


@pytest.mark.parametrize("scale,hoist", [(3, True), (3, False), (4, True)])
def test_halo_phase_inner_matches_phase_outer(rng, scale, hoist):
    """The phase-inner grid permutation (decoder_kernel.py
    _grid_decode_halo phase_inner=True — the order production wide-DK
    SwinIR models auto-take via the lanes > 1536 gate) must be
    BIT-identical to the phase-outer order: it only reorders grid steps
    and re-sorts the sel/rely/relx tables, never the math. Also checked
    against the XLA grid path so a consistent-but-wrong permutation of
    both orders cannot pass."""
    net = build_generator(dict(
        type="LocalImplicitSRRDN",
        encoder=dict(type="RDN", in_channels=3, mid_channels=16,
                     num_blocks=2, num_layers=3, channel_growth=8),
        imnet_q=dict(type="MLPRefiner", out_dim=3, hidden_list=[32, 32]),
        imnet_k=dict(type="MLPRefiner", out_dim=1, hidden_list=[32, 32]),
        imnet_v=dict(type="MLPRefiner", out_dim=1, hidden_list=[32, 32]),
        non_local_attn=True))
    x = jnp.asarray(rng.random((2, 8, 16, 3), dtype=np.float32))
    params = net.init(jax.random.PRNGKey(0), x, jnp.zeros((2, 8, 2)),
                      jnp.full((2, 8, 2), 0.1))
    feat = net.apply(params, x, method="gen_feature")
    u = unfold_nhwc(feat)
    csa = CrossScaleAttention(channels=16, scales=(2,))
    csa_map = csa.apply({"params": params["params"]["cs_attn"]}, feat)

    kw = dict(scale=scale, local_size=2, softmax_scale=1.0, rows=2,
              interpret=True, assembly="halo", hoist_kout=hoist)
    inner = grid_decode_fused(u, csa_map, params["params"],
                              phase_inner=True, **kw)
    outer = grid_decode_fused(u, csa_map, params["params"],
                              phase_inner=False, **kw)
    np.testing.assert_array_equal(np.asarray(inner), np.asarray(outer))

    ref = net.apply(params, feat, x, scale, method="query_rgb_grid")
    h, w = 8, 16
    img = inner.reshape(2, scale, scale, h, w, 3).transpose(
        0, 3, 1, 4, 2, 5).reshape(2, scale * h, scale * w, 3)
    img = img + interpolate_bilinear(x, scale * h, scale * w)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                               atol=2e-3, rtol=1e-2)


def test_restorer_pallas_routing(rng):
    """use_pallas generators route single-image grid decodes through the
    fused kernel (interpret mode on CPU) and match the XLA grid path."""
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
                              test_cfg=dict(metrics=["PSNR"], scale=2))
    r_xla = CiaoSRRestorer(generator=gen,
                           test_cfg=dict(metrics=["PSNR"], scale=2))
    params = r_xla.init_params(jax.random.PRNGKey(0))
    lq = rng.random((10, 12, 3), dtype=np.float32)
    out_p = r_pallas.predict(params, lq, (20, 24))
    out_x = r_xla.predict(params, lq, (20, 24))
    np.testing.assert_allclose(out_p, out_x, atol=3e-3)
    # tiled path: batched (tile_batch=2) kernel instances
    tiled_p = r_pallas.predict_tiled(params, lq, 2, tile=8, tile_overlap=4)
    tiled_x = r_xla.predict_tiled(params, lq, 2, tile=8, tile_overlap=4)
    np.testing.assert_allclose(tiled_p, tiled_x, atol=3e-3)


@pytest.mark.parametrize("p,l", [(100, 25), (256, 512), (37, 130)])
def test_csa_attention_matches_softmax(rng, p, l):
    from ciaosr_tpu.ops.pallas.csa_attention import csa_attention
    dk, dv = 18, 36
    q = jnp.asarray(rng.standard_normal((2, p, dk), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((2, l, dk), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((2, l, dv), dtype=np.float32))
    ref = jnp.einsum("bpl,blk->bpk",
                     jax.nn.softmax(jnp.einsum("bpk,blk->bpl", q, k) * 10.0,
                                    axis=-1), v)
    got = csa_attention(q, k, v, 10.0, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_fused_swin_block_matches_einsum(rng):
    """SwinIR encoder with the fused whole-block kernel (interpret mode)
    matches the einsum path, including shifted blocks (mask kinds) and
    reflect padding to window multiples."""
    from ciaosr_tpu.models.swinir import SwinIREncoder
    enc = SwinIREncoder(embed_dim=12, depths=(2, 2), num_heads=(2, 2),
                        window_size=4, mlp_ratio=2.0)
    x = jnp.asarray(rng.random((2, 10, 14, 3), dtype=np.float32))
    params = enc.init(jax.random.PRNGKey(0), x)
    ref = enc.apply(params, x)
    got = enc.apply(params, x, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3, rtol=1e-2)


def test_fused_swin_block_gradient_parity(rng):
    """Custom-VJP backward kernel vs jax.grad through the XLA einsum path:
    input grads AND parameter grads (qkv/proj/MLP/LN/rel-pos-bias) must
    match on an encoder with shifted blocks (masked windows exercised)."""
    from ciaosr_tpu.models.swinir import SwinIREncoder
    enc = SwinIREncoder(embed_dim=16, depths=(2,), num_heads=(2,),
                        window_size=4, mlp_ratio=2.0)
    x = jnp.asarray(rng.random((1, 8, 8, 3), dtype=np.float32))
    params = enc.init(jax.random.PRNGKey(1), x)
    tgt = jnp.asarray(rng.random((1, 8, 8, 16), dtype=np.float32))

    def loss(p, flash):
        out = enc.apply(p, x, flash)
        return jnp.mean((out - tgt) ** 2)

    l_ref, g_ref = jax.value_and_grad(lambda p: loss(p, False))(params)
    l_ker, g_ker = jax.value_and_grad(lambda p: loss(p, True))(params)
    assert np.allclose(float(l_ref), float(l_ker), rtol=1e-2)

    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_ker = dict(jax.tree_util.tree_leaves_with_path(g_ker))
    checked = 0
    for path, ref_leaf in flat_ref:
        ker_leaf = flat_ker[path]
        ref_np, ker_np = np.asarray(ref_leaf), np.asarray(ker_leaf)
        denom = max(np.abs(ref_np).max(), 1e-3)
        assert np.abs(ker_np - ref_np).max() / denom < 5e-2, (
            f"grad mismatch at {jax.tree_util.keystr(path)}: "
            f"max|Δ|/max|ref| = "
            f"{np.abs(ker_np - ref_np).max() / denom:.3e}")
        checked += 1
    assert checked >= 10  # LNs, qkv, proj, mlp, bias tables all present


def test_csa_fused_full_kernel_parity(rng):
    """csa_fused (in-kernel banks + overlap-add epilogue) vs the einsum
    path at a gate-eligible geometry (s²·C multiple of 128)."""
    from ciaosr_tpu.models.csa import CrossScaleAttention
    c = 32  # s=2 → s²C = 128: the fused-path gate admits it
    csa = CrossScaleAttention(channels=c, scales=(2,))
    x = jnp.asarray(rng.random((2, 16, 16, c), dtype=np.float32))
    params = csa.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(csa.apply(params, x))
    got = np.asarray(csa.apply(params, x, True))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)
    # non-lane-aligned channels (s²C = 32) go through the fused path via
    # the aligned_channels zero-pad (8 → 32; the SwinIR C=180 → 192 case
    # at test size) — must match the einsum path exactly the same way
    c2 = 8
    csa2 = CrossScaleAttention(channels=c2, scales=(2,))
    x2 = jnp.asarray(rng.random((1, 12, 16, c2), dtype=np.float32))
    p2 = csa2.init(jax.random.PRNGKey(1), x2)
    np.testing.assert_allclose(np.asarray(csa2.apply(p2, x2, True)),
                               np.asarray(csa2.apply(p2, x2)),
                               atol=2e-4, rtol=1e-3)
    # a genuinely gate-ineligible geometry (width not 8-aligned) still
    # matches through the streaming fallback
    csa3 = CrossScaleAttention(channels=c2, scales=(2,))
    x3 = jnp.asarray(rng.random((1, 12, 12, c2), dtype=np.float32))
    p3 = csa3.init(jax.random.PRNGKey(2), x3)
    np.testing.assert_allclose(np.asarray(csa3.apply(p3, x3, True)),
                               np.asarray(csa3.apply(p3, x3)),
                               atol=2e-4, rtol=1e-3)


def test_csa_fused_windowed_matches_resident(rng):
    """csa_fused(windowed=True) — element-offset plane windows instead of
    VMEM-resident maps (the big-geometry admission path) — must be
    bit-equal to the resident kernel on synthesized middle tensors,
    across multiple (rows, tl) tilings and both scales."""
    from ciaosr_tpu.ops.pallas.csa_attention import csa_fused

    for s, hp, wp, c, cr in [(2, 16, 32, 32, 16), (3, 18, 24, 8, 4)]:
        lq = (hp // s) * (wp // s)
        match = jnp.asarray(
            rng.standard_normal((2, hp, wp, cr), dtype=np.float32))
        k = jnp.asarray(
            rng.standard_normal((2, lq, 9 * cr), dtype=np.float32))
        embed = jnp.asarray(
            rng.standard_normal((2, hp, wp, c), dtype=np.float32))
        res = np.asarray(csa_fused(match, k, embed, 3.0, hp, wp, s, c,
                                   interpret=True, windowed=False))
        # same tiling → identical flash accumulation → bit-equal
        win = np.asarray(csa_fused(match, k, embed, 3.0, hp, wp, s, c,
                                   interpret=True, windowed=True))
        np.testing.assert_array_equal(win, res)
        # a different (rows, tl) tiling reorders the online-softmax
        # accumulation — equal to f32 rounding only
        win2 = np.asarray(csa_fused(match, k, embed, 3.0, hp, wp, s, c,
                                    interpret=True, windowed=True,
                                    rows=2, tl=256))
        np.testing.assert_allclose(win2, res, atol=1e-5, rtol=1e-5)


def test_halo_dispatch_gate(rng, monkeypatch):
    """grid_decode_fused auto-selects the halo assembly exactly when the
    geometry qualifies (W % 8 == 0, H > 1) — for both the hoisted and the
    wide-DK branch — and falls back to the stacked path otherwise."""
    import ciaosr_tpu.ops.pallas.decoder_kernel as dk

    calls = []
    monkeypatch.setattr(dk, "_grid_decode_halo",
                        lambda *a, **k: calls.append("halo") or 0)

    def fake_params(hidden=32, dk_=144, dv_=160):
        mk = lambda i, o: {"kernel": jnp.zeros((i, o)),
                           "bias": jnp.zeros((o,))}
        return {name: {"layers_0": mk(ind, hidden),
                       "layers_1": mk(hidden, hidden),
                       "out": mk(hidden, outd)}
                for name, ind, outd in [("imnet_k", dk_ + 4, dk_),
                                        ("imnet_v", dv_ + 4, dv_),
                                        ("imnet_q", dv_, 3)]}

    u = jnp.zeros((1, 8, 16, 144))
    c = jnp.zeros((1, 8, 16, 16))
    p = fake_params()
    dk.grid_decode_fused(u, c, p, 2, 2, 1.0, interpret=True)
    assert calls == ["halo"]
    # wide-DK (hoist off) also routes halo
    dk.grid_decode_fused(u, c, p, 2, 2, 1.0, interpret=True,
                         hoist_kout=False)
    assert calls == ["halo", "halo"]
    # W not 8-aligned → stacked (the real kernel path; just check no halo)
    u2 = jnp.zeros((1, 8, 10, 144))
    c2 = jnp.zeros((1, 8, 10, 16))
    out = dk.grid_decode_fused(u2, c2, p, 2, 2, 1.0, interpret=True)
    assert calls == ["halo", "halo"] and out.shape == (4, 8, 10, 3)


def test_csa_fused_admission_decisions():
    """Pin the CSA kernel-choice gate at the production geometries
    (measured order, PERF_NOTES round 4): every tiled geometry whose Ā
    scratch fits VMEM takes the single-kernel stencil (one score sweep,
    no HBM intermediate — RDN 192-tile 10.60 ms vs 13.56 resident;
    SwinIR 17.29 vs 20.16 two-kernel stencil), with the measured
    sc2-dependent P-tile (RDN rows=6, SwinIR rows=4); big untiled maps
    whose Ā blows even the two-kernel HBM budget fall back to the
    windowed strip kernel; odd widths stream."""
    from ciaosr_tpu.models.csa import fused_admission

    mode, rows, tl = fused_admission(192, 192, 2, 64, 32, es=2)
    assert (mode, rows) == ("stencil_fused", 6)
    mode, rows, tl = fused_admission(192, 192, 2, 180, 90, es=2)
    assert (mode, rows) == ("stencil_fused", 4) and tl >= 256
    mode, _, _ = fused_admission(192, 192, 3, 64, 32, es=2)
    assert mode == "stencil_fused"
    # 96-tile SwinIR (round-2 resident measurement point) also fits
    mode, _, _ = fused_admission(96, 96, 2, 180, 90, es=2)
    assert mode == "stencil_fused"
    # big untiled map (s=6 protocol, ~510px LR): Ā blows the HBM budget
    # → falls back to the strip kernels, never materializing it
    mode, _, _ = fused_admission(512, 512, 2, 64, 32, es=2)
    assert mode in ("resident", "windowed")
    # width not 8-aligned → streaming
    mode, _, _ = fused_admission(12, 12, 2, 8, 4, es=4)
    assert mode == "streaming"


def test_csa_admission_vmem_budget_derivation(monkeypatch):
    """The VMEM admission budget derives from the device: measured 85 MiB
    on 128-MiB-VMEM generations (v4/v5/v6 families, and CPU interpret
    mode so test decisions mirror production), a conservative fallback on
    unknown TPU generations (under-admit, never mis-admit), env override
    wins outright."""
    import ciaosr_tpu.models.csa as csa_mod
    from ciaosr_tpu.models.csa import (_VMEM_BUDGET_FALLBACK,
                                       _VMEM_BUDGET_MEASURED, vmem_budget)

    monkeypatch.delenv("CIAOSR_CSA_VMEM_BUDGET", raising=False)
    assert vmem_budget() == _VMEM_BUDGET_MEASURED  # cpu/tpu-v5 test env

    class FakeDev:
        platform = "tpu"
        device_kind = "TPU v99 mega"

    import jax as _jax
    monkeypatch.setattr(_jax, "devices", lambda *a: [FakeDev()])
    assert vmem_budget() == _VMEM_BUDGET_FALLBACK
    # an unknown generation under-admits: the production RDN geometry
    # that takes stencil_fused on v5e now falls back, it does not OOM
    mode, _, _ = csa_mod.fused_admission(192, 192, 2, 64, 32, es=2)
    assert mode in ("stencil", "windowed", "streaming")

    FakeDev.device_kind = "TPU v6 lite"
    assert vmem_budget() == _VMEM_BUDGET_MEASURED

    monkeypatch.setenv("CIAOSR_CSA_VMEM_BUDGET", str(7 << 20))
    assert vmem_budget() == 7 << 20
