"""Restorer-layer parity against the REFERENCE'S OWN SOURCE.

Round 2 closed the generator layer (test_reference_parity.py); this file
closes the remaining layers that only had from-spec tests (round-2 VERDICT
missing #2/#4): the reference's

  mmedited/models/restorers/ciaosr.py       forward_test + clip_test tiling
  mmedited/models/restorers/real_ciaosr.py  train_step loss routing/gating
  mmedited/core/evaluation/metrics.py       psnr/ssim protocol

run as genuine reference code under tests/oracles/reference_shim.py
(load_reference_restorers), against our CiaoSRRestorer.forward_test /
RealCiaoSRRestorer GAN step on the same converted weights and data.
"""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ciaosr_tpu.core.coords import make_coord_cell

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.isdir("/root/reference"),
    reason="reference tree not present")]

RGB_MEAN = (0.4488, 0.4371, 0.4040)   # DIV2K protocol (configs 001)


@pytest.fixture(scope="module")
def ref():
    from tests.oracles.reference_shim import load_reference_restorers
    return load_reference_restorers()


def _gen_cfgs(ref, hidden=(32, 32)):
    """Matching (reference ctor kwargs, our build cfg, converter kwargs)
    for a tiny RDN-CiaoSR generator."""
    enc = dict(type="RDN", mid_channels=16, num_blocks=2, num_layers=3,
               channel_growth=8)
    h = list(hidden)
    ref_gen = dict(
        type=ref.ciaosr_net.LocalImplicitSRRDN, encoder=dict(enc),
        imnet_q=dict(type="MLPRefiner", in_dim=0, out_dim=3, hidden_list=h),
        imnet_k=dict(type="MLPRefiner", in_dim=0, out_dim=0, hidden_list=h),
        imnet_v=dict(type="MLPRefiner", in_dim=0, out_dim=0, hidden_list=h))
    our_gen = dict(
        type="LocalImplicitSRRDN", encoder=dict(enc),
        imnet_q=dict(type="MLPRefiner", out_dim=3, hidden_list=h),
        imnet_k=dict(type="MLPRefiner", out_dim=1, hidden_list=h),
        imnet_v=dict(type="MLPRefiner", out_dim=1, hidden_list=h))
    conv_kw = dict(encoder="rdn", feat_dim=16, n_hidden=len(h),
                   non_local_attn=True)
    return ref_gen, our_gen, conv_kw


def test_forward_test_tiled_vs_reference(ref, rng):
    """Reference CiaoSR.forward_test with clip_test tiling (tile 8/overlap
    4, x2) vs our forward_test on converted weights: image-level agreement
    AND equal PSNR/SSIM through both metric stacks (the reference's own
    metrics.py vs ours). Closes round-2 VERDICT missing #2."""
    from tests.oracles.reference_shim import RefCfg
    from ciaosr_tpu.convert.torch_weights import convert_generator
    from ciaosr_tpu.models.restorers import CiaoSRRestorer

    torch.manual_seed(7)
    ref_gen, our_gen, conv_kw = _gen_cfgs(ref)
    scale, h, w = 2, 12, 14
    th, tw = h * scale, w * scale

    ref_restorer = ref.ciaosr_restorer.CiaoSR(
        generator=ref_gen, pixel_loss=dict(type="L1Loss", loss_weight=1.0),
        rgb_mean=RGB_MEAN, rgb_std=(1.0, 1.0, 1.0),
        test_cfg=RefCfg(metrics=["PSNR", "SSIM"], crop_border=scale,
                        convert_to="y", tile=8, tile_overlap=4, scale=scale))
    ref_restorer.eval()

    ours = CiaoSRRestorer(
        generator=our_gen, rgb_mean=RGB_MEAN,
        test_cfg=dict(metrics=["PSNR", "SSIM"], crop_border=scale,
                      convert_to="y", tile=8, tile_overlap=4, scale=scale))
    params = convert_generator(ref_restorer.generator.state_dict(), **conv_kw)

    lq = rng.random((h, w, 3), dtype=np.float32)
    gt = rng.random((th, tw, 3), dtype=np.float32)
    coord, cell = make_coord_cell((th, tw))
    lq_t = torch.from_numpy(lq).permute(2, 0, 1)[None]
    gt_flat = torch.from_numpy(gt.reshape(1, th * tw, 3))

    # --- image-level: run the reference without metrics to get the image
    ref_restorer.test_cfg = RefCfg(tile=8, tile_overlap=4, scale=scale)
    with torch.no_grad():
        out = ref_restorer.forward_test(
            lq_t, gt_flat, torch.from_numpy(np.asarray(coord))[None],
            torch.from_numpy(np.asarray(cell))[None])
    ref_img = out["output"][0].permute(1, 2, 0).numpy()      # (th, tw, 3)

    our_img = ours.forward_test(params, lq, scale=scale)
    assert our_img.shape == ref_img.shape == (th, tw, 3)
    delta = np.abs(our_img - ref_img).max()
    print(f"tiled forward_test image max|d| = {delta:.2e}")
    assert delta < 1e-3

    # --- metric protocol: reference evaluate (its own metrics.py) vs ours
    ref_restorer.test_cfg = RefCfg(metrics=["PSNR", "SSIM"],
                                   crop_border=scale, convert_to="y",
                                   tile=8, tile_overlap=4, scale=scale)
    with torch.no_grad():
        res = ref_restorer.forward_test(
            lq_t, gt_flat, torch.from_numpy(np.asarray(coord))[None],
            torch.from_numpy(np.asarray(cell))[None])
    ref_eval = res["eval_result"]
    our_eval = ours.evaluate(our_img, gt)
    for k in ("PSNR", "SSIM"):
        assert abs(ref_eval[k] - our_eval[k]) < 0.02, (k, ref_eval, our_eval)

    # --- metric stacks on the SAME uint8 input must agree exactly
    ref_on_ref = ref_restorer.evaluate(
        torch.from_numpy(ref_img).permute(2, 0, 1)[None],
        torch.from_numpy(gt).permute(2, 0, 1)[None])
    our_on_ref = ours.evaluate(ref_img, gt)
    for k in ("PSNR", "SSIM"):
        assert abs(ref_on_ref[k] - our_on_ref[k]) < 1e-6


def test_forward_test_untiled_vs_reference(ref, rng):
    """Reference forward_test WITHOUT tiling (batched_predict full-image
    path + sqrt-ratio reshape, ciaosr.py:155-169) vs our predict()."""
    from tests.oracles.reference_shim import RefCfg
    from ciaosr_tpu.convert.torch_weights import convert_generator
    from ciaosr_tpu.models.restorers import CiaoSRRestorer

    torch.manual_seed(8)
    ref_gen, our_gen, conv_kw = _gen_cfgs(ref)
    h, w, th, tw = 10, 8, 25, 20      # x2.5: non-integer scale path

    ref_restorer = ref.ciaosr_restorer.CiaoSR(
        generator=ref_gen, pixel_loss=dict(type="L1Loss", loss_weight=1.0),
        rgb_mean=RGB_MEAN, rgb_std=(1.0, 1.0, 1.0), test_cfg=RefCfg())
    ref_restorer.eval()
    ours = CiaoSRRestorer(generator=our_gen, rgb_mean=RGB_MEAN,
                          test_cfg=dict(metrics=["PSNR"]))
    params = convert_generator(ref_restorer.generator.state_dict(), **conv_kw)

    lq = rng.random((h, w, 3), dtype=np.float32)
    coord, cell = make_coord_cell((th, tw))
    with torch.no_grad():
        out = ref_restorer.forward_test(
            torch.from_numpy(lq).permute(2, 0, 1)[None], None,
            torch.from_numpy(np.asarray(coord))[None],
            torch.from_numpy(np.asarray(cell))[None])
    ref_img = out["output"][0].permute(1, 2, 0).numpy()

    our_img = ours.predict(params, lq, (th, tw))
    delta = np.abs(our_img - ref_img).max()
    print(f"untiled forward_test (x2.5) image max|d| = {delta:.2e}")
    assert delta < 1e-3


class _TorchTinyDisc(torch.nn.Module):
    """Minimal conv discriminator used as a CLASS-OBJECT component on the
    reference side (the configs' type=<class> style, SURVEY.md §0.2) so the
    GAN-step parity test isolates the train_step orchestration — loss
    routing, gating, normalization — which is the reference code under
    test (real_ciaosr.py:98-233)."""

    def __init__(self, in_channels=3, mid_channels=8):
        super().__init__()
        self.c1 = torch.nn.Conv2d(in_channels, mid_channels, 3, 1, 1)
        self.c2 = torch.nn.Conv2d(mid_channels, 1, 3, 1, 1)

    def forward(self, x):
        return self.c2(torch.nn.functional.leaky_relu(self.c1(x), 0.2))

    def init_weights(self, pretrained=None):
        pass


def _register_jax_tiny_disc():
    import flax.linen as nn
    from ciaosr_tpu.config.registry import COMPONENTS

    if "TinyDiscForParity" in getattr(COMPONENTS, "_registry", {}) or \
            "TinyDiscForParity" in getattr(COMPONENTS, "registry", {}):
        return
    try:
        @COMPONENTS.register(name="TinyDiscForParity")
        class TinyDiscJAX(nn.Module):
            in_channels: int = 3
            mid_channels: int = 8

            @nn.compact
            def __call__(self, x, update_stats: bool = False):
                x = nn.Conv(self.mid_channels, (3, 3),
                            padding=((1, 1), (1, 1)), name="c1")(x)
                x = nn.leaky_relu(x, negative_slope=0.2)
                return nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)),
                               name="c2")(x)
    except (KeyError, ValueError):
        pass  # already registered by a previous test in the session


def test_real_ciaosr_train_step_vs_reference(ref, rng):
    """ONE RealCiaoSR.train_step on identical weights+batch: the
    reference's loss dict (log_vars) vs our jit'd G+D step metrics —
    pixel loss with sharpened-GT routing, generator GAN loss, and both
    discriminator losses. Closes round-2 VERDICT missing #4."""
    from tests.oracles.reference_shim import RefCfg
    from ciaosr_tpu.convert.torch_weights import convert_generator
    from ciaosr_tpu.models.real_restorer import RealCiaoSRRestorer
    from ciaosr_tpu.train.optim import build_optimizer

    torch.manual_seed(9)
    ref_gen, our_gen, conv_kw = _gen_cfgs(ref)
    _register_jax_tiny_disc()

    ref_model = ref.real_ciaosr.RealCiaoSR(
        generator=ref_gen,
        discriminator=dict(type=_TorchTinyDisc, in_channels=3,
                           mid_channels=8),
        pixel_loss=dict(type="L1Loss", loss_weight=1.0),
        gan_loss=dict(type="GANLoss", gan_type="vanilla", loss_weight=0.1),
        rgb_mean=RGB_MEAN, rgb_std=(1.0, 1.0, 1.0),
        is_use_sharpened_gt_in_pixel=True,
        is_use_sharpened_gt_in_gan=False,
        train_cfg=RefCfg(disc_steps=1, disc_init_steps=0),
        test_cfg=RefCfg())
    ref_model.train()

    our_gen_cfg = dict(our_gen)
    ours = RealCiaoSRRestorer(
        generator=our_gen_cfg,
        discriminator=dict(type="TinyDiscForParity", in_channels=3,
                           mid_channels=8),
        pixel_loss=dict(type="L1Loss", loss_weight=1.0),
        gan_loss=dict(type="GANLoss", gan_type="vanilla", loss_weight=0.1),
        rgb_mean=RGB_MEAN,
        is_use_sharpened_gt_in_pixel=True,
        is_use_sharpened_gt_in_gan=False,
        train_cfg=dict(disc_steps=1, disc_init_steps=0, ema_momentum=0.999))

    # identical weights through the converters
    g_params = convert_generator(ref_model.generator.state_dict(), **conv_kw)
    td = ref_model.discriminator
    # .copy() matters: jnp.asarray zero-copies aligned numpy views on CPU,
    # and torch's optimizer.step() below mutates the parameters in place
    d_params = {"params": {
        "c1": {"kernel": jnp.asarray(
            td.c1.weight.detach().numpy().transpose(2, 3, 1, 0).copy()),
            "bias": jnp.asarray(td.c1.bias.detach().numpy().copy())},
        "c2": {"kernel": jnp.asarray(
            td.c2.weight.detach().numpy().transpose(2, 3, 1, 0).copy()),
            "bias": jnp.asarray(td.c2.bias.detach().numpy().copy())},
    }, "batch_stats": {}}

    # identical batch (B=2, 16 queries -> 4x4 image reshape)
    b, h, w, ns = 2, 8, 8, 16
    batch_np = {
        "lq": rng.random((b, h, w, 3), dtype=np.float32),
        "gt": rng.random((b, ns, 3), dtype=np.float32),
        "gt_unsharp": rng.random((b, ns, 3), dtype=np.float32),
        "coord": rng.uniform(-0.9, 0.9, (b, ns, 2)).astype(np.float32),
        "cell": np.full((b, ns, 2), 0.125, np.float32),
    }

    optim = {"generator": torch.optim.Adam(ref_model.generator.parameters()),
             "discriminator": torch.optim.Adam(
                 ref_model.discriminator.parameters())}
    t_batch = {k: torch.from_numpy(v.copy()) for k, v in batch_np.items()}
    t_batch["lq"] = t_batch["lq"].permute(0, 3, 1, 2)   # reference is NCHW
    out = ref_model.train_step(t_batch, optim)
    ref_vars = out["log_vars"]

    g_tx, _ = build_optimizer(dict(type="Adam", lr=1e-3), None)
    d_tx, _ = build_optimizer(dict(type="Adam", lr=1e-3), None)
    step_fn = ours.make_gan_train_step(g_tx, d_tx)
    state = ours.init_gan_state(jax.random.PRNGKey(0), g_tx, d_tx,
                                lq_shape=(1, h, w, 3), n_queries=ns,
                                g_params=g_params)
    state = state.replace(d_vars=d_params, d_opt=d_tx.init(
        d_params["params"]))
    _, metrics = step_fn(state, {k: jnp.asarray(v)
                                 for k, v in batch_np.items()})

    for k in ("loss_pix", "loss_gan", "loss_d_real", "loss_d_fake"):
        ours_v = float(metrics[k])
        ref_v = float(ref_vars[k])
        print(f"{k}: ref {ref_v:.6f}  ours {ours_v:.6f}")
        assert abs(ours_v - ref_v) < 3e-4, (k, ref_v, ours_v)
