"""Auxiliary reference-surface components: PosMLPRefiner and matting
metrics (SURVEY.md §2.1, §2.7 — listed inventory with no live config
consumers; validated against torch/numpy oracles here)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ciaosr_tpu.core import metrics as M
from ciaosr_tpu.models.mlp import (PosMLPRefiner, positional_encoding_1d)


def test_positional_encoding_matches_reference_formula():
    """Interleaved sin/cos with inv_freq = 10000^(-2j/ch)
    (mlp_refiner.py:14-54), torch oracle."""
    import torch
    n, ch = 32, 10
    got = np.asarray(positional_encoding_1d(n, ch))
    channels = int(np.ceil(ch / 2) * 2)
    inv_freq = 1.0 / (10000 ** (torch.arange(0, channels, 2).float()
                                / channels))
    pos = torch.arange(n).float()
    ang = torch.einsum("i,j->ij", pos, inv_freq)
    emb = torch.flatten(torch.stack((ang.sin(), ang.cos()), -1), -2, -1)
    np.testing.assert_allclose(got, emb[:, :ch].numpy(), atol=1e-6)


def test_pos_mlp_refiner_math_and_param_registration():
    """Linear→ReLU→(+posenc) per hidden → Linear, and — unlike the
    reference, whose plain-list layers hide params from the optimizer
    (SURVEY.md §8) — every Dense must appear in the param tree."""
    m = PosMLPRefiner(out_dim=5, hidden_list=[8, 6], in_dim=7)
    x = jnp.asarray(np.random.default_rng(0).random((2, 4, 7), np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    assert set(params["params"]) == {"layers_0", "layers_1", "out"}

    p = jax.tree.map(np.asarray, params["params"])
    h = np.asarray(x)
    for i, name in enumerate(["layers_0", "layers_1"]):
        h = h @ p[name]["kernel"] + p[name]["bias"]
        h = np.maximum(h, 0)
        h = h + np.asarray(positional_encoding_1d(h.shape[1],
                                                  h.shape[-1]))[None]
    want = h @ p["out"]["kernel"] + p["out"]["bias"]
    got = np.asarray(m.apply(params, x))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    with pytest.raises(ValueError):
        m.apply(params, x[0])  # must be (B, C, D)


@pytest.fixture()
def matte():
    rng = np.random.default_rng(0)
    alpha = (rng.random((40, 40)) * 255).astype(np.uint8)
    trimap = np.full((40, 40), 128, np.uint8)
    trimap[:8] = 0
    trimap[-8:] = 255
    alpha = alpha.astype(np.float64)
    alpha[trimap == 0] = 0
    alpha[trimap == 255] = 255
    return alpha, trimap


def test_matting_metrics_zero_for_perfect_pred(matte):
    alpha, trimap = matte
    assert M.sad(alpha, trimap, alpha) == pytest.approx(0)
    assert M.matting_mse(alpha, trimap, alpha) == pytest.approx(0)
    assert M.gradient_error(alpha, trimap, alpha) == pytest.approx(0)
    assert M.connectivity(alpha, trimap, alpha) == pytest.approx(0)
    assert M.mse is M.matting_mse  # reference-name alias


def test_matting_metrics_known_values(matte):
    alpha, trimap = matte
    pred = alpha.copy()
    pred[trimap == 128] = np.clip(pred[trimap == 128] + 25.5, 0, 255)
    n_unknown = (trimap == 128).sum()
    # sad: sum|Δ|/255/1000 over changed pixels (clipping keeps Δ ≤ 0.1)
    delta = np.abs(pred - alpha) / 255
    assert M.sad(alpha, trimap, pred) == pytest.approx(
        delta.sum() / 1000, rel=1e-6)
    assert M.matting_mse(alpha, trimap, pred) == pytest.approx(
        (delta ** 2).sum() / n_unknown, rel=1e-6)
    assert M.gradient_error(alpha, trimap, pred) >= 0
    assert M.connectivity(alpha, trimap, pred) >= 0


def test_matting_metrics_reject_unmasked_pred(matte):
    alpha, trimap = matte
    bad = alpha.copy()
    bad[trimap == 0] = 3  # not masked by trimap
    with pytest.raises((ValueError, AssertionError)):
        M.gradient_error(alpha, trimap, bad)
    with pytest.raises((ValueError, AssertionError)):
        M.connectivity(alpha, trimap, bad)


# ---------------------------------------------------------------------------
# Extended degradation zoo (SURVEY.md §2.4 non-live rows)
# ---------------------------------------------------------------------------

def _zoo_ops():
    from ciaosr_tpu.data.degradations import (
        RandomClipGaussianNoise, RandomGaussianNoise,
        RandomGaussianNoisewithPro, RandomLevel, RealRandomNoise,
        RealRandomResize)
    return (RandomGaussianNoise, RandomGaussianNoisewithPro,
            RandomClipGaussianNoise, RandomLevel, RealRandomNoise,
            RealRandomResize)


def test_gaussian_noise_family():
    (RGN, RGNP, RCGN, RL, _, _) = _zoo_ops()
    img = np.full((64, 64, 3), 0.5, np.float32)
    res = {"lq": img, "_rng": np.random.default_rng(0)}

    out = RGN(dict(gaussian_sigma=[10, 10]), ["lq"])(dict(res))["lq"]
    assert out.shape == img.shape
    assert abs(np.std(out - img) - 10 / 255) < 2e-3

    # nonblind: appends the sigma plane as a 4th channel
    out = RGN(dict(gaussian_sigma=[10, 10], nonblind_noise=True),
              ["lq"])(dict(res))["lq"]
    assert out.shape == (64, 64, 4)
    np.testing.assert_allclose(out[..., 3], 10 / 255, atol=1e-6)

    # withPro: prob=1 draws from gaussian_beta instead
    out = RGNP(dict(gaussian_sigma=[0, 0], gaussian_beta=[25.5, 25.5],
                    prob=1.0), ["lq"])(dict(res))["lq"]
    assert abs(np.std(out - img) - 0.1) < 5e-3

    # clip variant stays in [0, 1]
    out = RCGN(dict(gaussian_sigma=[200, 200]), ["lq"])(dict(res))["lq"]
    assert out.min() >= 0 and out.max() <= 1

    # RandomLevel only concatenates the level plane
    out = RL(dict(sigma=[51, 51]), ["lq"])(dict(res))["lq"]
    assert out.shape == (64, 64, 4)
    np.testing.assert_allclose(out[..., :3], img)
    np.testing.assert_allclose(out[..., 3], 0.2, atol=1e-6)


@pytest.mark.parametrize("shuffle_prob", [0.0, 1.0])
def test_real_random_noise_chain(shuffle_prob):
    (_, _, _, _, RRN, _) = _zoo_ops()
    rng = np.random.default_rng(3)
    img = np.clip(rng.random((24, 24, 3)), 0, 1).astype(np.float32)
    op = RRN(dict(noise_type=["gaussian", "poisson", "speckle", "jpeg"],
                  gaussian_sigma=[5, 20], gaussian_gray_noise_prob=0.5,
                  gaussian_sigma_step=2, poisson_scale=[0.5, 2],
                  poisson_gray_noise_prob=0.5, speckle_level=[5, 20],
                  quality_range=[60, 95], other_prob=1.0,
                  shuffle_prob=shuffle_prob), ["lq"])
    for seed in range(4):
        out = op({"lq": img, "_rng": np.random.default_rng(seed)})["lq"]
        assert out.shape == img.shape
        assert np.isfinite(out).all()
        assert not np.allclose(out, img)  # something was applied

    with pytest.raises(NotImplementedError):
        RRN(dict(noise_type=["isp"], shuffle_prob=0, other_prob=1),
            ["lq"])({"lq": img, "_rng": np.random.default_rng(0)})


def test_real_random_resize_round_trip():
    (_, _, _, _, _, RRR) = _zoo_ops()
    rng = np.random.default_rng(0)
    img = rng.random((32, 48, 3)).astype(np.float32)
    op = RRR(dict(resize_opt=["bilinear", "bicubic", "area"],
                  resize_prob=[1 / 3] * 3, resize_mode_prob=[0.4, 0.4, 0.2],
                  resize_scale=[0.5, 1.5]), ["lq"])
    for seed in range(6):
        out = op({"lq": img, "_rng": np.random.default_rng(seed)})["lq"]
        assert out.shape == img.shape  # always resized back

    # keep-mode (prob 1 on 'keep') is an exact no-op scale
    op = RRR(dict(resize_opt=["bilinear"], resize_prob=[1.0],
                  resize_mode_prob=[0, 0, 1.0], resize_scale=[0.5, 1.5]),
             ["lq"])
    out = op({"lq": img, "_rng": np.random.default_rng(0)})["lq"]
    assert out.shape == img.shape


def test_degradations_with_shuffle_groups():
    """Shuffled op application with grouped entries keeping internal order
    (random_degradations.py:1238-1303). Quantize then +0.25 vs +0.25 then
    Quantize give different outputs, so the applied order is observable."""
    from ciaosr_tpu.data.degradations import DegradationsWithShuffle
    from ciaosr_tpu.config.registry import PIPELINES

    class _AddQuarter:
        def __init__(self, keys):
            self.keys = keys

        def __call__(self, results):
            for k in self.keys:
                results[k] = results[k] + 0.25
            return results

    if "_AddQuarter" not in PIPELINES._registry:
        PIPELINES.register(_AddQuarter, name="_AddQuarter")

    img = np.full((4, 4, 3), 0.4, np.float32)
    degs = [dict(type="Quantize"), dict(type="_AddQuarter")]
    outs = set()
    for seed in range(16):
        op = DegradationsWithShuffle(degs, keys=["lq"])
        out = op({"lq": img.copy(), "_rng": np.random.default_rng(seed)})
        outs.add(round(float(out["lq"][0, 0, 0]), 4))
    # Quantize→+0.25 ≈ 0.6525; +0.25→Quantize ≈ 0.651 — both orders occur
    assert len(outs) == 2

    # grouped entries keep internal order: ([q, +q]) as ONE entry always
    # quantizes first inside the group
    op = DegradationsWithShuffle([[dict(type="Quantize"),
                                   dict(type="_AddQuarter")]], keys=["lq"])
    out = op({"lq": img.copy(), "_rng": np.random.default_rng(0)})
    assert abs(float(out["lq"][0, 0, 0])
               - (round(0.4 * 255) / 255 + 0.25)) < 1e-4

    # shuffle_idx restricts the shuffle to a subset (positions outside it
    # are fixed)
    op = DegradationsWithShuffle(degs, keys=["lq"], shuffle_idx=[0])
    out = op({"lq": img.copy(), "_rng": np.random.default_rng(0)})
    assert abs(float(out["lq"][0, 0, 0])
               - (round(0.4 * 255) / 255 + 0.25)) < 1e-4


def test_uvsr_degradation_fuse_and_downsample():
    """5-frame reflection-padded temporal mean + temporal decimation +
    MATLAB-bicubic spatial downsample (random_degradations.py:196-267)."""
    from ciaosr_tpu.data.degradations import UVSRDegradation
    from ciaosr_tpu.core.resize import imresize_np
    rng = np.random.default_rng(0)
    frames = rng.random((8, 12, 16, 3)).astype(np.float32)
    op = UVSRDegradation(params=dict(fuse_frames=5, down=True,
                                     scale=(2, 2, 2)), keys=["lq"])
    out = op({"lq": frames})["lq"]
    assert out.shape == (4, 6, 8, 3)  # T 8→(mean:8, ::2→4); HW /2
    # frame 0 of the fused stack: mean of reflection-padded [1,0,0,1,2]
    pad = np.concatenate([frames[1:2], frames[0:1], frames,
                          frames[-2:-1], frames[-3:-2]], axis=0)
    want = imresize_np(pad[0:5].mean(axis=0), scale=0.5)
    np.testing.assert_allclose(out[0], want, atol=1e-5)

    with pytest.raises(ValueError):
        UVSRDegradation(params=dict(fuse_frames=3), keys=["lq"])


def test_old_random_noise_produces_lq_gt_pair():
    """OldRandomNoise synthesizes (lq, gt): lq degraded, gt tracked clean
    through the paired ops only (random_degradations.py:520-815); video
    slots skipped without a codec config (PyAV-gated)."""
    from ciaosr_tpu.data.degradations import OldRandomNoise
    rng = np.random.default_rng(1)
    frames = [rng.random((16, 16, 3)).astype(np.float32) for _ in range(3)]
    op = OldRandomNoise(params=dict(
        blur_prob=1.0, sf=[2], inter_method=[1],
        gaussian_sigma=[5, 10], gaussian_gray_noise_prob=0.3,
        poisson_scale=[0.1, 0.5], poisson_gray_noise_prob=0.3,
        speckle_level=[5, 10], quality_range=[60, 90],
        shift_prob=1.0, shuffle_prob=0.5), keys=["gt"])
    out = op({"gt": [f.copy() for f in frames],
              "_rng": np.random.default_rng(2)})
    assert len(out["lq"]) == 3 and len(out["gt"]) == 3
    assert out["lq"][0].shape == out["gt"][0].shape  # paired crops/resizes
    # lq is degraded relative to the tracked gt
    assert np.abs(out["lq"][0] - out["gt"][0]).mean() > 1e-3
    for im in out["lq"] + out["gt"]:
        assert np.isfinite(im).all()


def test_random_video_compression_requires_av():
    from ciaosr_tpu.data.degradations import RandomVideoCompression
    try:
        import av  # noqa: F401
        pytest.skip("av installed; gating not exercised")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="PyAV"):
        RandomVideoCompression(params=dict(codec=["libx264"],
                                           codec_prob=[1.0],
                                           bitrate=[1e4, 1e5]), keys=["lq"])


def test_nor_resize_modes_and_target():
    """NorResize intent (reference :1045-1155 is broken as written —
    undefined `img`; see class docstring)."""
    from ciaosr_tpu.data.degradations import NorResize
    img = np.random.default_rng(3).random((20, 24, 3)).astype(np.float32)
    # explicit target size
    op = NorResize(params=dict(resize_opt="bicubic",
                               target_size=(10, 12)), keys=["lq"])
    out = op({"lq": img.copy(), "_rng": np.random.default_rng(0)})
    assert out["lq"].shape == (10, 12, 3)
    # mode-derived size: down ⇒ strictly smaller
    op = NorResize(params=dict(resize_opt="bilinear",
                               resize_mode_prob=[0.0, 1.0, 0.0],
                               resize_scale=[0.5, 2.0]), keys=["lq"])
    out = op({"lq": img.copy(), "_rng": np.random.default_rng(1)})
    assert out["lq"].shape[0] < 20 and out["lq"].shape[1] < 24
    with pytest.raises(NotImplementedError):
        NorResize(params=dict(resize_opt="nearest"), keys=["lq"])
