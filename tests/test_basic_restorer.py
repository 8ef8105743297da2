"""BasicRestorer + full SR nets (EDSRNet/RDNNet) — the reference's generic
restorer surface (basic_restorer.py:17-237)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from ciaosr_tpu.models.basic_sr import pixel_shuffle
from ciaosr_tpu.models.restorers import BasicRestorer


def test_pixel_shuffle_matches_torch(rng):
    import torch
    x = rng.random((2, 4, 5, 18), dtype=np.float32)
    got = np.asarray(pixel_shuffle(jnp.asarray(x), 3))
    ref = torch.pixel_shuffle(
        torch.from_numpy(x).permute(0, 3, 1, 2), 3).permute(0, 2, 3, 1)
    np.testing.assert_allclose(got, ref.numpy(), atol=1e-7)


@pytest.mark.parametrize("gen_type,scale", [("EDSRNet", 2), ("RDNNet", 3)])
def test_basic_restorer_predict_shapes(rng, gen_type, scale):
    r = BasicRestorer(
        generator=dict(type=gen_type, mid_channels=8, num_blocks=2,
                       num_layers=2, channel_growth=4,
                       upscale_factor=scale)
        if gen_type == "RDNNet" else
        dict(type=gen_type, mid_channels=8, num_blocks=2,
             upscale_factor=scale),
        test_cfg=dict(metrics=["PSNR", "SSIM"], crop_border=scale,
                      window_size=4))
    params = r.init_params(jax.random.PRNGKey(0), lq_shape=(1, 8, 8, 3))
    # 10x13 is NOT a window_size (4) multiple — exercises the reflect-pad
    # clip_generator path (basic_restorer.py:175-191)
    lq = rng.random((10, 13, 3), dtype=np.float32)
    sr = r.predict(params, lq)
    assert sr.shape == (10 * scale, 13 * scale, 3)
    assert np.isfinite(sr).all() and sr.min() >= 0 and sr.max() <= 1
    gt = rng.random(sr.shape, dtype=np.float32)
    metrics = r.evaluate(sr, gt)
    assert set(metrics) == {"PSNR", "SSIM"}


def test_basic_restorer_trains(rng):
    from ciaosr_tpu.train.optim import build_optimizer
    from ciaosr_tpu.train.trainer import TrainState, make_train_step

    r = BasicRestorer(generator=dict(type="EDSRNet", mid_channels=8,
                                     num_blocks=2, upscale_factor=2))
    params = r.init_params(jax.random.PRNGKey(0), lq_shape=(2, 8, 8, 3))
    tx, _ = build_optimizer(dict(type="Adam", lr=1e-3),
                            dict(policy="Step", step=[100], gamma=0.5))
    step = make_train_step(r, tx)
    state = TrainState(step=jnp.asarray(0), params=params,
                       opt_state=tx.init(params))
    lq = jnp.asarray(rng.random((2, 8, 8, 3), dtype=np.float32))
    gt = jnp.asarray(np.repeat(np.repeat(
        np.asarray(lq), 2, axis=1), 2, axis=2))
    losses = []
    for _ in range(5):
        state, m = step(state, {"lq": lq, "gt": gt})
        losses.append(float(m["loss_pix"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 5
