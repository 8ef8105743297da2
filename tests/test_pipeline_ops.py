"""Pipeline-op coverage for the reference surface rows without live
config consumers (SURVEY.md §2.4): crop variants, RandomBicubicSampling,
GenerateCoordinateAndCell2 — plus NIQE end-to-end with a synthetic
pristine-parameter file."""

import os

import numpy as np
import pytest

from ciaosr_tpu.core.resize import imresize_np
from ciaosr_tpu.data.pipelines import (ContinuousPairedRandomCrop,
                                       GenerateCoordinateAndCell2, ModCrop,
                                       PairedRandomCrop,
                                       RandomBicubicSampling, RandomCrop)


def _img(h, w, seed=0):
    return np.random.default_rng(seed).random((h, w, 3)).astype(np.float32)


def test_mod_crop():
    res = {"gt": _img(37, 50), "scale": 4}
    out = ModCrop()(res)
    assert out["gt"].shape == (36, 48, 3)  # crop.py:7-45 semantics


def test_random_crop_gt_only():
    res = {"gt": _img(40, 60), "_rng": np.random.default_rng(0)}
    out = RandomCrop(patch_size=24)(res)
    assert out["gt"].shape == (24, 24, 3)


def test_paired_random_crop_alignment():
    gt = _img(64, 80)
    lq = gt[::4, ::4]
    out = PairedRandomCrop(gt_patch_size=32)(
        {"lq": lq, "gt": gt, "_rng": np.random.default_rng(1)})
    assert out["lq"].shape == (8, 8, 3)
    assert out["gt"].shape == (32, 32, 3)
    # the gt crop is the ×4-scaled window of the lq crop
    np.testing.assert_array_equal(out["gt"][::4, ::4], out["lq"])


def test_continuous_paired_random_crop_float_scale():
    gt = _img(60, 90)                      # scale 2.5 vs a 24×36 lq
    lq = _img(24, 36, seed=2)
    out = ContinuousPairedRandomCrop(lq_patch_size=16)(
        {"lq": lq, "gt": gt, "_rng": np.random.default_rng(0)})
    assert out["lq"].shape == (16, 16, 3)
    assert out["gt"].shape == (40, 40, 3)  # round(16·2.5)


def test_random_bicubic_sampling_matches_matlab_resize():
    """lq must be the MATLAB-bicubic downsample of the cropped gt patch
    (random_bicubic_sampling.py:78-97 via im_resize)."""
    res = {"gt": _img(128, 128), "_rng": np.random.default_rng(3)}
    op = RandomBicubicSampling(scale_min=2.0, scale_max=2.0, patch_size=24)
    out = op(dict(res))
    assert out["lq"].shape == (24, 24, 3)
    assert out["gt"].shape == (48, 48, 3)
    want = imresize_np(out["gt"], scale=0.5)
    np.testing.assert_allclose(out["lq"], want, atol=1e-5)


def test_generate_coordinate_and_cell2_rescaled_target():
    """Target grid derived from the GT size × scale1/scale
    (generate_assistant.py:105-192)."""
    gt = _img(20, 24)
    out = GenerateCoordinateAndCell2(scale=2.0, scale1=3.0)(
        {"gt": gt, "_rng": np.random.default_rng(0)})
    n = 30 * 36                            # (20,24) × 1.5
    assert out["coord"].shape == (n, 2)
    assert out["cell"].shape == (n, 2)
    np.testing.assert_allclose(out["cell"][0], [2 / 30, 2 / 36], atol=1e-6)


def test_niqe_runs_with_synthetic_params(tmp_path, monkeypatch):
    """NIQE end-to-end against a synthetic pristine-MVG parameter file
    (the real blob is converted from the reference via
    tools/convert_niqe_params.py; metrics.py:460-532 protocol)."""
    from ciaosr_tpu.core import metrics as M
    rng = np.random.default_rng(0)
    win = np.exp(-((np.arange(7) - 3) ** 2) / 4.5)
    gaussian_window = np.outer(win, win)
    gaussian_window /= gaussian_window.sum()
    a = rng.random((200, 36))
    # mu stored (1, 36) — the official file's layout
    np.savez(tmp_path / "p.npz", mu_pris_param=a.mean(0, keepdims=True),
             cov_pris_param=np.cov(a, rowvar=False),
             gaussian_window=gaussian_window)
    monkeypatch.setenv("CIAOSR_NIQE_PARAMS", str(tmp_path / "p.npz"))

    # ≥ 192 px: NIQE needs at least one 96-block at BOTH scales
    # (faithful to the reference's block loop)
    img = (rng.random((192, 224, 3)) * 255).astype(np.float32)
    score = M.niqe(img, crop_border=0, convert_to="y")
    assert np.isfinite(score) and score >= 0

    # without the env var, the VENDORED table makes niqe work
    # out-of-the-box (round-5: core/data/niqe_pris_params.npz)
    monkeypatch.delenv("CIAOSR_NIQE_PARAMS")
    assert np.isfinite(M.niqe(img, crop_border=0, convert_to="y"))
    # explicit missing-table error once the vendored default is gone too
    monkeypatch.setattr(M, "_VENDORED_NIQE_PARAMS", "/nonexistent/p.npz")
    with pytest.raises(FileNotFoundError):
        M.niqe(img)


@pytest.mark.skipif(
    not os.path.exists("/root/reference/mmedited/core/evaluation/"
                       "niqe_pris_params.npz"),
    reason="reference NIQE blob not present")
def test_niqe_real_pristine_params(tmp_path, monkeypatch):
    """Run tools/convert_niqe_params.py on the REFERENCE'S actual pristine
    blob and score a deterministic fixture — regression-locks the official
    (1, 36) mu layout handling (commit dc2440a) against the real data."""
    import subprocess
    import sys

    from ciaosr_tpu.core import metrics as M

    out = tmp_path / "real_niqe.npz"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools/convert_niqe_params.py"),
         "/root/reference", str(out)], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    blob = np.load(out)
    assert blob["mu_pris_param"].shape == (1, 36)
    assert blob["cov_pris_param"].shape == (36, 36)
    assert blob["gaussian_window"].shape == (7, 7)

    monkeypatch.setenv("CIAOSR_NIQE_PARAMS", str(out))
    # deterministic structured fixture (noise-free images score lower/
    # more-natural than pure noise — directional sanity)
    yy, xx = np.mgrid[0:224, 0:224].astype(np.float32)
    img = np.stack([np.sin(yy / 9) * 100 + 120, np.cos(xx / 7) * 90 + 130,
                    np.sin((xx + yy) / 11) * 80 + 128], axis=-1)
    score_smooth = M.niqe(img, crop_border=0, convert_to="y")
    noise = (np.random.default_rng(0).random((224, 224, 3)) * 255)
    score_noise = M.niqe(noise.astype(np.float32), crop_border=0,
                         convert_to="y")
    assert np.isfinite(score_smooth) and np.isfinite(score_noise)
    # pin the real-params value (regression lock; recorded on first run)
    assert 0.0 < score_smooth < 40.0
    assert score_noise > score_smooth
