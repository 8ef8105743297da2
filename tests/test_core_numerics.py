"""Golden tests: core numerics vs PyTorch-CPU oracles.

Every 0.02 dB of eval parity lives in these ops (SURVEY.md §7 hard part 1):
MATLAB bicubic resize, make_coord, grid-sample semantics, color/metric
protocol.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from ciaosr_tpu.core.coords import make_coord, make_coord_np, make_cell_np
from ciaosr_tpu.core.resize import imresize_np, imresize_jnp, resize_table
from ciaosr_tpu.core.color import rgb2ycbcr, bgr2ycbcr, tensor2img
from ciaosr_tpu.core.metrics import psnr, ssim
from ciaosr_tpu.ops.sampling import (
    grid_sample_nearest, grid_sample_bilinear_border, interpolate_bilinear)
from ciaosr_tpu.ops.neighborhood import unfold_nhwc, gather_patches


# --------------------------------------------------------------- oracles ---

def torch_matlab_resize(img_hwc: np.ndarray, out_h, out_w, scale,
                        antialiasing=True) -> np.ndarray:
    """Independent oracle for MATLAB imresize, straight from the algorithm
    definition (dense-loop form), float64."""
    def weights_indices(in_len, out_len, s):
        kw = 4.0 / s if (s < 1 and antialiasing) else 4.0
        out = np.zeros((out_len, in_len))
        for i in range(out_len):
            u = (i + 1) / s + 0.5 * (1 - 1 / s)
            left = math.floor(u - kw / 2)
            p = math.ceil(kw) + 2
            total = 0.0
            vals = []
            for j in range(p):
                idx = left + j
                d = u - idx
                if s < 1 and antialiasing:
                    wv = s * _cubic(d * s)
                else:
                    wv = _cubic(d)
                vals.append((idx, wv))
                total += wv
            for idx, wv in vals:
                idx0 = idx - 1
                if idx0 < 0:
                    idx0 = -1 - idx0
                if idx0 >= in_len:
                    idx0 = 2 * in_len - 1 - idx0
                out[i, idx0] += wv / total
        return out

    def _cubic(x):
        ax = abs(x)
        if ax <= 1:
            return 1.5 * ax**3 - 2.5 * ax**2 + 1
        if ax <= 2:
            return -0.5 * ax**3 + 2.5 * ax**2 - 4 * ax + 2
        return 0.0

    wh = weights_indices(img_hwc.shape[0], out_h, scale)
    ww = weights_indices(img_hwc.shape[1], out_w, scale)
    tmp = np.einsum("oi,ijc->ojc", wh, img_hwc.astype(np.float64))
    return np.einsum("oj,ijc->ioc", ww, tmp)


# ----------------------------------------------------------------- tests ---

def test_make_coord_matches_liif_convention():
    c = make_coord_np((4, 6))
    assert c.shape == (24, 2)
    # first pixel center
    np.testing.assert_allclose(c[0], [-1 + 1 / 4, -1 + 1 / 6], rtol=1e-6)
    # row-major: second entry moves along x
    np.testing.assert_allclose(c[1], [-1 + 1 / 4, -1 + 3 / 6], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(make_coord((4, 6))), c, rtol=1e-6)


def test_make_cell():
    cell = make_cell_np((10, 20))
    assert cell.shape == (200, 2)
    np.testing.assert_allclose(cell[0], [0.2, 0.1], rtol=1e-6)


@pytest.mark.parametrize("in_hw,scale", [
    ((24, 17), 0.5), ((24, 17), 0.25), ((12, 9), 2.0),
    ((20, 20), 1 / 3), ((16, 16), 0.4371), ((7, 11), 3.3)])
def test_matlab_resize_vs_oracle(rng, in_hw, scale):
    img = rng.random((*in_hw, 3), dtype=np.float64)
    out_h, out_w = math.ceil(in_hw[0] * scale), math.ceil(in_hw[1] * scale)
    ours = imresize_np(img, scale=scale)
    oracle = torch_matlab_resize(img, out_h, out_w, scale)
    np.testing.assert_allclose(ours, oracle, atol=1e-5)
    # jnp path agrees with numpy path
    j = imresize_jnp(jnp.asarray(img[None], dtype=jnp.float32),
                     (out_h, out_w), scale)
    np.testing.assert_allclose(np.asarray(j[0]), ours, atol=1e-4)


def test_resize_table_weights_sum_to_one():
    for args in [(48, 192, 4.0), (100, 37, 0.37), (48, 31, 31 / 48)]:
        idx, w = resize_table(*args)
        np.testing.assert_allclose(w.sum(1), 1.0, atol=1e-12)
        assert idx.min() >= 0 and idx.max() < args[0]


@pytest.mark.parametrize("mode", ["nearest", "bilinear"])
def test_grid_sample_vs_torch(rng, mode):
    b, h, w, c, q = 2, 13, 9, 5, 64
    feat = rng.standard_normal((b, h, w, c)).astype(np.float32)
    # coords like the decoder's: near pixel centers, clamped in-range
    coord = rng.uniform(-1 + 1e-6, 1 - 1e-6, (b, q, 2)).astype(np.float32)

    tfeat = torch.from_numpy(feat).permute(0, 3, 1, 2)
    tcoord = torch.from_numpy(coord)
    # torch convention: grid is (x, y) — flip our (y, x)
    grid = tcoord.flip(-1).unsqueeze(1)  # (B, 1, Q, 2)
    if mode == "nearest":
        ref = F.grid_sample(tfeat, grid, mode="nearest",
                            align_corners=False)
        ours = grid_sample_nearest(jnp.asarray(feat), jnp.asarray(coord))
    else:
        ref = F.grid_sample(tfeat, grid, mode="bilinear",
                            padding_mode="border", align_corners=False)
        ours = grid_sample_bilinear_border(jnp.asarray(feat),
                                           jnp.asarray(coord))
    ref = ref[:, :, 0, :].permute(0, 2, 1).numpy()  # (B, Q, C)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-6)


def test_unfold_matches_torch_layout_permuted(rng):
    b, h, w, c = 2, 7, 6, 4
    feat = rng.standard_normal((b, h, w, c)).astype(np.float32)
    ours = np.asarray(unfold_nhwc(jnp.asarray(feat)))  # tap-major
    ref = F.unfold(torch.from_numpy(feat).permute(0, 3, 1, 2), 3,
                   padding=1).view(b, c * 9, h, w).numpy()
    # torch layout: channel-major (c*9 + tap) on dim 1
    ref = ref.reshape(b, c, 9, h, w).transpose(0, 3, 4, 2, 1).reshape(
        b, h, w, 9 * c)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_gather_patches_equals_unfold_then_nearest(rng):
    b, h, w, c, q = 2, 9, 8, 3, 40
    feat = rng.standard_normal((b, h, w, c)).astype(np.float32)
    coord = rng.uniform(-1 + 1e-6, 1 - 1e-6, (b, q, 2)).astype(np.float32)
    unf = unfold_nhwc(jnp.asarray(feat))
    via_unfold = grid_sample_nearest(unf, jnp.asarray(coord))
    from ciaosr_tpu.ops.sampling import nearest_index
    iy = jnp.clip(nearest_index(jnp.asarray(coord)[..., 0], h), 0, h - 1)
    ix = jnp.clip(nearest_index(jnp.asarray(coord)[..., 1], w), 0, w - 1)
    direct = gather_patches(jnp.asarray(feat), iy, ix)
    np.testing.assert_allclose(np.asarray(direct), np.asarray(via_unfold),
                               atol=1e-6)


def test_interpolate_bilinear_vs_torch(rng):
    x = rng.standard_normal((2, 12, 10, 4)).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                        scale_factor=0.5, mode="bilinear").permute(
        0, 2, 3, 1).numpy()
    ours = np.asarray(interpolate_bilinear(jnp.asarray(x), 6, 5))
    np.testing.assert_allclose(ours, ref, atol=1e-6)
    ref_up = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                           size=(25, 17), mode="bilinear").permute(
        0, 2, 3, 1).numpy()
    ours_up = np.asarray(interpolate_bilinear(jnp.asarray(x), 25, 17))
    np.testing.assert_allclose(ours_up, ref_up, atol=1e-6)


def test_ycbcr_bt601():
    img = np.array([[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0],
                     [0.0, 0.0, 1.0], [1.0, 1.0, 1.0]]], dtype=np.float32)
    y = rgb2ycbcr(img, y_only=True) * 255.0
    np.testing.assert_allclose(
        y[0], [65.481 + 16, 128.553 + 16, 24.966 + 16, 235.0], atol=1e-3)
    np.testing.assert_allclose(bgr2ycbcr(img[..., ::-1], y_only=True) * 255.0,
                               y, atol=1e-5)


def test_tensor2img_rounding():
    arr = np.array([[[0.5019, 0.002, 0.999]]], dtype=np.float32)
    out = tensor2img(arr)  # BGR uint8
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out[0, 0], [255, 1, 128])


def test_psnr_ssim_protocol(rng):
    gt = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    noisy = np.clip(gt.astype(np.int32)
                    + rng.integers(-10, 10, gt.shape), 0, 255).astype(np.uint8)
    p = psnr(gt, noisy, crop_border=4, convert_to="y")
    s = ssim(gt, noisy, crop_border=4, convert_to="y")
    assert 25 < p < 45
    assert 0.5 < s < 1.0
    assert psnr(gt, gt) == float("inf")
    assert ssim(gt, gt) == pytest.approx(1.0, abs=1e-9)
    # identical protocol invariance: Y conversion then crop
    p_rgb = psnr(gt, noisy, crop_border=4)
    assert p_rgb != p
