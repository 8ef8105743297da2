"""SwinIR trunk parity vs torch oracle through the real converter."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import torch

import jax.numpy as jnp

from ciaosr_tpu.convert.swinir_weights import convert_swinir_encoder
from ciaosr_tpu.models.swinir import SwinIREncoder
from tests.oracles.torch_swinir import OracleSwinIRTrunk


@pytest.mark.parametrize("hw", [(16, 16), (13, 11)])  # aligned + padded
def test_swinir_trunk_parity(rng, hw):
    torch.manual_seed(0)
    dim, depths, heads, ws = 12, (2, 2), (3, 3), 8
    oracle = OracleSwinIRTrunk(embed_dim=dim, depths=depths, heads=heads,
                               ws=ws)
    oracle.eval()
    enc = SwinIREncoder(embed_dim=dim, depths=depths, num_heads=heads,
                        window_size=ws)
    params = {"params": convert_swinir_encoder(oracle.state_dict())}

    x = rng.standard_normal((2, *hw, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(
            0, 2, 3, 1).numpy()
    ours = np.asarray(enc.apply(params, jnp.asarray(x)))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_swinir_shifted_mask_gates_cross_region_attention(rng):
    """Behavioral proof the shifted-window mask gates attention between
    wrapped regions (swinir_net.py:243-263 semantics): perturbing every
    pixel of ONE shift region must leave the block output at all other
    regions' positions bit-identical — even for positions sharing a
    (rolled) window with perturbed pixels.  All block ops other than
    attention are per-position, so any leak is a mask failure."""
    import jax

    from ciaosr_tpu.models.swinir import SwinBlock

    h = w = 8
    ws, shift = 4, 2
    blk = SwinBlock(dim=12, num_heads=3, window_size=ws, shift_size=shift)
    x0 = rng.standard_normal((1, h * w, 12)).astype(np.float32)
    params = blk.init(jax.random.PRNGKey(0), jnp.asarray(x0), (h, w))

    # independent region-id derivation (the reference's img_mask loop)
    region = np.zeros((h, w), np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            region[hs, wsl] = cnt
            cnt += 1
    perturb = (region == region[-1, -1]).reshape(-1)   # corner region
    assert perturb.sum() == shift * shift

    # sanity that the test can catch a leak: some unperturbed position
    # shares a post-roll window with a perturbed one
    rolled = np.roll(region, (-shift, -shift), axis=(0, 1))
    shares = False
    for wi in range(0, h, ws):
        for wj in range(0, w, ws):
            win = rolled[wi:wi + ws, wj:wj + ws]
            if (win == region[-1, -1]).any() and \
                    (win != region[-1, -1]).any():
                shares = True
    assert shares

    # per-channel noise (a constant shift would be erased by norm1 and
    # couldn't leak through attention even unmasked)
    x1 = x0.copy()
    x1[0, perturb, :] += rng.standard_normal(
        (int(perturb.sum()), 12)).astype(np.float32) * 3.0
    out0 = np.asarray(blk.apply(params, jnp.asarray(x0), (h, w)))
    out1 = np.asarray(blk.apply(params, jnp.asarray(x1), (h, w)))
    keep = ~perturb
    # an unmasked leak puts O(0.1) deltas here; the -100 mask logit leaves
    # only sub-float32-epsilon residue
    np.testing.assert_allclose(out0[0, keep], out1[0, keep], atol=1e-5,
                               rtol=0)
    # and the perturbed region itself did change (non-vacuous)
    assert np.abs(out0[0, perturb] - out1[0, perturb]).max() > 1e-2


def test_swinir_ciaosr_builds(rng):
    """Full LocalImplicitSRSWINIR builds through the config surface,
    including the 002 configs' extra knobs (SURVEY.md §8.1)."""
    import jax
    from ciaosr_tpu.models.builder import build_generator

    net = build_generator(dict(
        type="LocalImplicitSRSWINIR",
        window_size=8,
        encoder=dict(type="SwinIR", upscale=4, img_size=48, window_size=8,
                     compress_ratio=3, squeeze_factor=30, conv_scale=0.01,
                     overlap_ratio=0.5, img_range=1.0, depths=[2],
                     embed_dim=12, num_heads=[3], mlp_ratio=2,
                     upsampler="pixelshuffle", resi_connection="1conv"),
        imnet_q=dict(type="MLPRefiner", out_dim=3, hidden_list=[16]),
        imnet_k=dict(type="MLPRefiner", out_dim=1, hidden_list=[16]),
        imnet_v=dict(type="MLPRefiner", out_dim=1, hidden_list=[16]),
        feat_unfold=True, eval_bsize=1000,
        # 002-config knobs with baked-in semantics:
        local_ensemble_coord=True, imnet_k_type="mul_w_cell",
        imnet_v_type="mul_w_cell", res=True, cat_nla_v=True))
    assert net.feat_dim == 12
    x = jnp.asarray(rng.random((1, 10, 9, 3), dtype=np.float32))
    coord = jnp.zeros((1, 50, 2), jnp.float32)
    cell = jnp.full((1, 50, 2), 0.05, jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x, coord, cell)
    out = net.apply(params, x, coord, cell)
    assert out.shape == (1, 50, 3)

    # contradicting knob values warn (or raise with strict_knobs=True)
    import pytest as _pytest
    knob_cfg = dict(
        type="LocalImplicitSRSWINIR", window_size=8,
        encoder=dict(type="SwinIR", embed_dim=12, depths=[2],
                     num_heads=[3]),
        imnet_q=dict(type="MLPRefiner", out_dim=3, hidden_list=[16]),
        imnet_k=dict(type="MLPRefiner", out_dim=1, hidden_list=[16]),
        imnet_v=dict(type="MLPRefiner", out_dim=1, hidden_list=[16]),
        imnet_k_type="no_mul")
    with _pytest.warns(UserWarning, match="baked-in"):
        build_generator(dict(knob_cfg))
    with _pytest.raises(ValueError):
        build_generator(dict(knob_cfg, strict_knobs=True))
