"""Real-world GAN stack: degradation pipeline, discriminator, GAN step."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from ciaosr_tpu.data.pipelines import Compose
import ciaosr_tpu.data.degradations  # noqa: F401  (registry)


TINY_GEN = dict(
    type="LocalImplicitSRSWINIR", window_size=8,
    encoder=dict(type="SwinIR", embed_dim=12, depths=[1], num_heads=[3],
                 window_size=8, mlp_ratio=2),
    imnet_q=dict(type="MLPRefiner", out_dim=3, hidden_list=[16]),
    imnet_k=dict(type="MLPRefiner", out_dim=1, hidden_list=[16]),
    imnet_v=dict(type="MLPRefiner", out_dim=1, hidden_list=[16]),
    feat_unfold=True, non_local_attn=False, eval_bsize=None)


def _real_train_pipeline(lq_patch=8, queries=16):
    """The 002 degradation chain (configs/002_real_gan_...py:100-246),
    scaled down."""
    blur_params = dict(
        kernel_size=[7, 9], kernel_list=[
            "iso", "aniso", "generalized_iso", "generalized_aniso",
            "plateau_iso", "plateau_aniso", "sinc"],
        kernel_prob=[0.405, 0.225, 0.108, 0.027, 0.108, 0.027, 0.1],
        sigma_x=[0.2, 3], sigma_y=[0.2, 3],
        rotate_angle=[-3.1416, 3.1416], beta_gaussian=[0.5, 4],
        beta_plateau=[1, 2])
    return [
        dict(type="Crop", keys=["gt"], crop_size=(48, 48), random_crop=True),
        dict(type="RescaleToZeroOne", keys=["gt"]),
        dict(type="UnsharpMasking", keys=["gt"], kernel_size=51, sigma=0,
             weight=0.5, threshold=10),
        dict(type="CopyValues", src_keys=["gt_unsharp"], dst_keys=["lq"]),
        dict(type="RandomBlur", params=blur_params, keys=["lq"]),
        dict(type="RandomResize",
             params=dict(resize_mode_prob=[0.2, 0.7, 0.1],
                         resize_scale=[0.15, 1.5],
                         resize_opt=["bilinear", "area", "bicubic"],
                         resize_prob=[1 / 3, 1 / 3, 1 / 3]),
             keys=["lq"]),
        dict(type="RandomNoise",
             params=dict(noise_type=["gaussian", "poisson"],
                         noise_prob=[0.5, 0.5], gaussian_sigma=[1, 30],
                         gaussian_gray_noise_prob=0.4,
                         poisson_scale=[0.05, 3],
                         poisson_gray_noise_prob=0.4),
             keys=["lq"]),
        dict(type="RandomJPEGCompression", params=dict(quality=[30, 95]),
             keys=["lq"]),
        dict(type="DegradationsWithShuffle1",
             degradations=[
                 dict(type="RandomJPEGCompression",
                      params=dict(quality=[5, 50])),
                 [dict(type="RandomScaleResize1",
                       params=dict(scale_min=1, scale_max=4,
                                   resize_opt=["bilinear", "area",
                                               "bicubic"],
                                   resize_prob=[1 / 3, 1 / 3, 1 / 3])),
                  dict(type="RandomBlur",
                       params=dict(prob=0.8, kernel_size=[7, 9],
                                   kernel_list=["sinc"], kernel_prob=[1],
                                   omega=[3.1416 / 3, 3.1416]))],
             ],
             keys=["lq"]),
        dict(type="Flip", keys=["lq", "gt"], flip_ratio=0.5,
             direction="horizontal"),
        dict(type="PairedRandomCropwScale", lq_patch_size=lq_patch),
        dict(type="Quantize", keys=["lq"]),
        dict(type="UnsharpMasking", keys=["gt"], kernel_size=51, sigma=0,
             weight=0.5, threshold=10),
        dict(type="ImageToTensor", keys=["lq", "gt", "gt_unsharp"]),
        dict(type="GenerateCoordinateAndCell", sample_quantity=queries,
             is_shuffle=False),
        dict(type="Collect", keys=["lq", "gt", "gt_unsharp", "coord",
                                   "cell"], meta_keys=["gt_path"]),
    ]


def test_degradation_pipeline_shapes(rng):
    pipe = Compose(_real_train_pipeline(lq_patch=8, queries=16))
    for seed in range(4):  # different random degradation draws
        gt = rng.random((64, 80, 3), dtype=np.float32)
        out = pipe({"gt": (gt * 255).astype(np.uint8),
                    "gt_path": "x.png",
                    "_rng": np.random.default_rng(seed)})
        assert out["lq"].shape == (8, 8, 3)
        assert out["coord"].shape == (16, 2) and out["cell"].shape == (16, 2)
        assert out["gt"].shape == (16, 3)  # flattened + sampled
        assert out["gt_unsharp"].shape == (16, 3)
        assert np.isfinite(out["lq"]).all()


def test_discriminator_shapes(rng):
    from ciaosr_tpu.models.discriminator import UNetDiscriminatorSN
    disc = UNetDiscriminatorSN(mid_channels=8)
    x = jnp.asarray(rng.random((2, 16, 16, 3), dtype=np.float32))
    variables = disc.init(jax.random.PRNGKey(0), x)
    out, mut = disc.apply(variables, x, update_stats=True,
                          mutable=["batch_stats"])
    assert out.shape == (2, 16, 16, 1)
    # spectral-norm power-iteration state exists and updates
    assert "batch_stats" in variables
    leaves0 = jax.tree.leaves(variables["batch_stats"])
    leaves1 = jax.tree.leaves(mut["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(leaves0, leaves1))


def test_gan_losses():
    from ciaosr_tpu.losses.gan import GANLoss
    import torch
    import torch.nn.functional as F
    x = np.linspace(-3, 3, 24).reshape(2, 12).astype(np.float32)
    tx = torch.from_numpy(x)
    vanilla = GANLoss("vanilla", loss_weight=0.1)
    ref_real = F.binary_cross_entropy_with_logits(
        tx, torch.ones_like(tx)).item()
    assert np.isclose(float(vanilla(jnp.asarray(x), True, is_disc=True)),
                      ref_real, atol=1e-6)
    # generator loss scaled by weight, disc not (gan_loss.py:127-131)
    assert np.isclose(float(vanilla(jnp.asarray(x), True, is_disc=False)),
                      0.1 * ref_real, atol=1e-6)
    hinge = GANLoss("hinge")
    assert np.isclose(float(hinge(jnp.asarray(x), False, is_disc=True)),
                      float(F.relu(1 + tx).mean()), atol=1e-6)
    wgan = GANLoss("wgan")
    assert np.isclose(float(wgan(jnp.asarray(x), True, is_disc=True)),
                      -x.mean(), atol=1e-6)


def test_gan_train_step_and_ema(rng):
    import ciaosr_tpu.models.real_restorer as rr
    from ciaosr_tpu.train.optim import build_optimizer

    restorer = rr.RealCiaoSRRestorer(
        generator=TINY_GEN,
        discriminator=dict(type="UNetDiscriminatorWithSpectralNorm",
                           in_channels=3, mid_channels=8),
        pixel_loss=dict(type="L1Loss", loss_weight=1.0),
        gan_loss=dict(type="GANLoss", gan_type="vanilla", loss_weight=0.1),
        is_use_sharpened_gt_in_pixel=True,
        train_cfg=dict(disc_steps=1, disc_init_steps=0, ema_momentum=0.9))
    g_tx, _ = build_optimizer(dict(type="Adam", lr=1e-4,
                                   betas=(0.9, 0.99)), None)
    d_tx, _ = build_optimizer(dict(type="Adam", lr=1e-4,
                                   betas=(0.9, 0.99)), None)
    step_fn = restorer.make_gan_train_step(g_tx, d_tx)

    b, hw, q = 2, 8, 16 * 16
    state = restorer.init_gan_state(jax.random.PRNGKey(0), g_tx, d_tx,
                                    lq_shape=(1, hw, hw, 3), n_queries=q)
    batch = {
        "lq": jnp.asarray(rng.random((b, hw, hw, 3), dtype=np.float32)),
        "gt": jnp.asarray(rng.random((b, q, 3), dtype=np.float32)),
        "gt_unsharp": jnp.asarray(rng.random((b, q, 3), dtype=np.float32)),
        "coord": jnp.asarray(
            rng.uniform(-0.9, 0.9, (b, q, 2)).astype(np.float32)),
        "cell": jnp.full((b, q, 2), 2.0 / 32, jnp.float32),
    }
    # the step donates its input state — snapshot compared values first
    g0 = np.asarray(jax.tree.leaves(state.g_params)[0])
    d0 = np.asarray(jax.tree.leaves(state.d_vars["params"])[0])
    s1, m1 = step_fn(state, batch)
    assert np.isfinite(m1["loss_pix"]) and np.isfinite(m1["loss_gan"])
    assert np.isfinite(m1["loss_d_real"]) and np.isfinite(m1["loss_d_fake"])
    # G updated, D updated, EMA moved toward new params
    g1 = jax.tree.leaves(s1.g_params)[0]
    assert not np.allclose(g0, g1)
    e1 = jax.tree.leaves(s1.ema_params)[0]
    assert not np.allclose(e1, g0) and not np.allclose(e1, g1)

    # disc_init_steps gating: G must NOT update before warm-up
    restorer2 = rr.RealCiaoSRRestorer(
        generator=TINY_GEN,
        discriminator=dict(type="UNetDiscriminatorWithSpectralNorm",
                           in_channels=3, mid_channels=8),
        pixel_loss=dict(type="L1Loss"),
        gan_loss=dict(type="GANLoss", gan_type="vanilla", loss_weight=0.1),
        train_cfg=dict(disc_steps=1, disc_init_steps=5))
    step_fn2 = restorer2.make_gan_train_step(g_tx, d_tx)
    state2 = restorer2.init_gan_state(jax.random.PRNGKey(0), g_tx, d_tx,
                                      lq_shape=(1, hw, hw, 3), n_queries=q)
    g0b = np.asarray(jax.tree.leaves(state2.g_params)[0])
    d0b = np.asarray(jax.tree.leaves(state2.d_vars["params"])[0])
    s2, m2 = step_fn2(state2, batch)
    g2 = jax.tree.leaves(s2.g_params)[0]
    assert np.allclose(g0b, g2)  # gated out
    d2 = jax.tree.leaves(s2.d_vars["params"])[0]
    assert not np.allclose(d0b, d2)  # D still learns


def test_ema_inference_path(rng):
    import ciaosr_tpu.models.real_restorer as rr
    from ciaosr_tpu.train.optim import build_optimizer
    restorer = rr.RealCiaoSRRestorer(
        generator=TINY_GEN, is_use_ema=True,
        test_cfg=dict(metrics=["PSNR"], scale=4))
    g_tx, _ = build_optimizer(dict(type="Adam", lr=1e-3), None)
    restorer.discriminator = None
    # forward_test dispatches on GANTrainState and uses EMA params
    params = restorer.init_params(jax.random.PRNGKey(0))
    state = rr.GANTrainState(step=jnp.asarray(0), g_params=params,
                             g_opt=None, d_vars=None, d_opt=None,
                             ema_params=jax.tree.map(
                                 lambda p: p * 0.5, params))
    lq = rng.random((8, 8, 3), dtype=np.float32)
    out_ema = restorer.forward_test(state, lq, target_shape=(16, 16))
    out_raw = restorer.forward_test(params, lq, target_shape=(16, 16))
    assert out_ema.shape == (16, 16, 3)
    assert not np.allclose(out_ema, out_raw)


def test_load_staged_generator_roundtrip(tmp_path, rng):
    """load_staged_generator extracts (g_params, ema_params) from a saved
    GANTrainState work_dir, from a classical TrainState, and from a raw
    params dir — the three load_from shapes (checkpoint.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ciaosr_tpu.train.checkpoint import (CheckpointManager,
                                             load_staged_generator,
                                             save_params)

    g = {"dense": {"kernel": jnp.asarray(rng.random((3, 4), np.float32))}}
    ema = {"dense": {"kernel": jnp.asarray(rng.random((3, 4), np.float32))}}

    # GANTrainState-shaped tree in a work_dir
    wd = tmp_path / "gan_run"
    mgr = CheckpointManager(str(wd), interval=1)
    state = {"step": jnp.asarray(3), "g_params": g, "ema_params": ema,
             "g_opt": {"count": jnp.asarray(3)},
             "d_vars": {"params": {}, "batch_stats": {}},
             "d_opt": {"count": jnp.asarray(3)}}
    mgr.save(3, state)
    mgr.wait()
    got_g, got_ema = load_staged_generator(str(wd))
    np.testing.assert_array_equal(got_g["dense"]["kernel"],
                                  g["dense"]["kernel"])
    np.testing.assert_array_equal(got_ema["dense"]["kernel"],
                                  ema["dense"]["kernel"])

    # classical TrainState (params only) → ema defaults to params
    wd2 = tmp_path / "classical_run"
    mgr2 = CheckpointManager(str(wd2), interval=1)
    mgr2.save(5, {"step": jnp.asarray(5), "params": g,
                  "opt_state": {"count": jnp.asarray(5)}})
    mgr2.wait()
    got_g, got_ema = load_staged_generator(str(wd2))
    np.testing.assert_array_equal(got_g["dense"]["kernel"],
                                  g["dense"]["kernel"])
    np.testing.assert_array_equal(got_ema["dense"]["kernel"],
                                  g["dense"]["kernel"])

    # raw params dir (converted-checkpoint shape)
    raw = tmp_path / "raw_params"
    save_params(str(raw), g)
    got_g, got_ema = load_staged_generator(str(raw))
    np.testing.assert_array_equal(got_g["dense"]["kernel"],
                                  g["dense"]["kernel"])


def test_perceptual_synthetic_optin(monkeypatch):
    """Weight-less environments can opt into seeded-random VGG19
    features explicitly (pretrained='synthetic' or
    CIAOSR_VGG19_SYNTHETIC=1) — round 5, used by the 002 soak; without
    the opt-in the clear FileNotFoundError stands."""
    import jax.numpy as jnp
    import pytest

    from ciaosr_tpu.losses.perceptual import PerceptualLoss

    monkeypatch.delenv("CIAOSR_VGG19_WEIGHTS", raising=False)
    monkeypatch.delenv("CIAOSR_VGG19_SYNTHETIC", raising=False)
    ploss = PerceptualLoss(layer_weights={"2": 1.0},
                           pretrained="synthetic")
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    percep, style = ploss(x, x)
    assert float(percep) == 0.0          # identical inputs
    with pytest.raises(FileNotFoundError):
        PerceptualLoss(layer_weights={"2": 1.0})(x, x)
    monkeypatch.setenv("CIAOSR_VGG19_SYNTHETIC", "1")
    p2, _ = PerceptualLoss(layer_weights={"2": 1.0})(x, x + 0.1)
    assert float(p2) > 0.0
