"""End-to-end slice: dataset fixture → pipeline → eval protocol → training.

The minimum end-to-end slice of SURVEY.md §7.4-7.5 on tiny synthetic data:
paired-folder eval (LRbicx/GTmod12 layout), on-the-fly degradation eval,
and a short L1 training run whose loss must drop.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax

from ciaosr_tpu.config.config import Config
from ciaosr_tpu.core.resize import imresize_np


TINY_GEN = dict(
    type="LocalImplicitSREDSR",
    encoder=dict(type="EDSR", in_channels=3, mid_channels=16, num_blocks=2),
    imnet_q=dict(type="MLPRefiner", out_dim=3, hidden_list=[32, 32]),
    imnet_k=dict(type="MLPRefiner", out_dim=1, hidden_list=[32, 32]),
    imnet_v=dict(type="MLPRefiner", out_dim=1, hidden_list=[32, 32]),
    eval_bsize=2000)


@pytest.fixture(scope="module")
def sr_fixture(tmp_path_factory):
    """Classical-benchmark folder layout with MATLAB-bicubic LR files."""
    import cv2
    root = tmp_path_factory.mktemp("set_tiny")
    gt_dir = root / "GTmod12"
    lq_dir = root / "LRbicx4"
    gt_dir.mkdir()
    lq_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        yy, xx = np.mgrid[0:48, 0:60].astype(np.float32)
        img = np.stack([np.sin(yy / (2 + i)) * .5 + .5,
                        np.cos(xx / (3 + i)) * .5 + .5,
                        np.sin((yy + xx) / (4 + i)) * .5 + .5], -1)
        gt = (img * 255).round().astype(np.uint8)
        cv2.imwrite(str(gt_dir / f"img{i}.png"), gt[..., ::-1])
        lr = imresize_np(gt.astype(np.float32) / 255.0, scale=0.25)
        lr8 = (np.clip(lr, 0, 1) * 255).round().astype(np.uint8)
        cv2.imwrite(str(lq_dir / f"img{i}.png"), lr8[..., ::-1])
    return root


def test_paired_folder_eval(sr_fixture):
    from ciaosr_tpu.data.datasets import build_dataset
    from ciaosr_tpu.eval.evaluator import evaluate_dataset
    from ciaosr_tpu.models.restorers import CiaoSRRestorer

    pipeline = [
        dict(type="LoadImageFromFile", key="gt", channel_order="rgb"),
        dict(type="LoadImageFromFile", key="lq", channel_order="rgb"),
        dict(type="RescaleToZeroOne", keys=["lq", "gt"]),
        dict(type="ImageToTensor", keys=["lq", "gt"]),
        dict(type="GenerateCoordinateAndCell", scale=4),
        dict(type="Collect", keys=["lq", "gt", "coord", "cell"],
             meta_keys=["gt_path"]),
    ]
    ds = build_dataset(dict(type="SRFolderDataset",
                            lq_folder=str(sr_fixture / "LRbicx4"),
                            gt_folder=str(sr_fixture / "GTmod12"),
                            pipeline=pipeline, scale=4))
    assert len(ds) == 3
    restorer = CiaoSRRestorer(
        generator=TINY_GEN,
        test_cfg=dict(metrics=["PSNR", "SSIM"], crop_border=4,
                      scale=4, convert_to="y"))
    params = restorer.init_params(jax.random.PRNGKey(0))
    res = evaluate_dataset(restorer, params, ds)
    assert res["n_images"] == 3
    assert np.isfinite(res["PSNR"]) and 0 <= res["SSIM"] <= 1
    # random weights + global bilinear residual ⇒ roughly bilinear quality
    assert res["PSNR"] > 15


def test_onthefly_degradation_eval(sr_fixture):
    """scale>4 protocol: RandomDownSampling val path, no tiling."""
    from ciaosr_tpu.data.datasets import build_dataset
    from ciaosr_tpu.eval.evaluator import evaluate_dataset
    from ciaosr_tpu.models.restorers import CiaoSRRestorer

    pipeline = [
        dict(type="LoadImageFromFile", key="gt", channel_order="rgb"),
        dict(type="RandomDownSampling", scale_min=6, scale_max=6),
        dict(type="RescaleToZeroOne", keys=["lq", "gt"]),
        dict(type="ImageToTensor", keys=["lq", "gt"]),
        dict(type="GenerateCoordinateAndCell", scale=6),
        dict(type="Collect", keys=["lq", "gt", "coord", "cell"],
             meta_keys=["gt_path"]),
    ]
    ds = build_dataset(dict(type="SRFolderGTDataset",
                            gt_folder=str(sr_fixture / "GTmod12"),
                            pipeline=pipeline, scale=6))
    restorer = CiaoSRRestorer(
        generator=TINY_GEN,
        test_cfg=dict(metrics=["PSNR"], crop_border=6, scale=6,
                      convert_to="y"))
    params = restorer.init_params(jax.random.PRNGKey(0))
    res = evaluate_dataset(restorer, params, ds)
    assert res["n_images"] == 3 and np.isfinite(res["PSNR"])


def test_multisize_folder_eval_with_compilation_cache(tmp_path, monkeypatch):
    """Realistic heterogeneous val folder (untiled s>4 protocol,
    configs/001_..._rdn_...py:139-154): every image has a DISTINCT size,
    so the jitted predictor recompiles per size; the persistent
    compilation cache (utils/compilation_cache.py) must capture those
    programs so later runs restore instead of recompiling."""
    import cv2
    from ciaosr_tpu.data.datasets import build_dataset
    from ciaosr_tpu.eval.evaluator import evaluate_dataset
    from ciaosr_tpu.models.restorers import CiaoSRRestorer
    from ciaosr_tpu.utils.compilation_cache import enable_compilation_cache

    gt_dir = tmp_path / "gt"
    gt_dir.mkdir()
    rng = np.random.default_rng(3)
    for i, (h, w) in enumerate([(36, 42), (42, 36)]):
        img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(gt_dir / f"img{i}.png"), img)

    cache_dir = tmp_path / "jax_cache"
    monkeypatch.setenv("CIAOSR_COMPILATION_CACHE", str(cache_dir))
    assert enable_compilation_cache() == str(cache_dir)

    pipeline = [
        dict(type="LoadImageFromFile", key="gt", channel_order="rgb"),
        dict(type="RandomDownSampling", scale_min=6, scale_max=6),
        dict(type="RescaleToZeroOne", keys=["lq", "gt"]),
        dict(type="ImageToTensor", keys=["lq", "gt"]),
        dict(type="GenerateCoordinateAndCell", scale=6),
        dict(type="Collect", keys=["lq", "gt", "coord", "cell"],
             meta_keys=["gt_path"]),
    ]
    ds = build_dataset(dict(type="SRFolderGTDataset",
                            gt_folder=str(gt_dir),
                            pipeline=pipeline, scale=6))
    # no CSA: this test targets the per-size compile/cache story, and
    # the tiny CSA graph alone costs ~40 s of CPU compile per size
    restorer = CiaoSRRestorer(
        generator=dict(TINY_GEN, non_local_attn=False),
        test_cfg=dict(metrics=["PSNR"], crop_border=6, scale=6,
                      convert_to="y"))
    params = restorer.init_params(jax.random.PRNGKey(0))
    res = evaluate_dataset(restorer, params, ds)
    assert res["n_images"] == 2 and np.isfinite(res["PSNR"])
    # two distinct input sizes -> two compiled predictor programs
    assert len(restorer._jit_cache) == 2
    # the persistent cache captured the per-size programs on disk
    entries = [f for f in os.listdir(cache_dir)] if cache_dir.exists() \
        else []
    assert entries, "persistent compilation cache wrote no entries"


def test_training_loss_decreases(sr_fixture):
    """30 iterations of the L1 recipe on tiny data: loss must drop."""
    from ciaosr_tpu.data.datasets import build_dataset
    from ciaosr_tpu.data.loader import build_dataloader
    from ciaosr_tpu.models.restorers import CiaoSRRestorer
    from ciaosr_tpu.train.optim import build_optimizer
    from ciaosr_tpu.train.trainer import TrainState, make_train_step
    from ciaosr_tpu.parallel.mesh import make_mesh, shard_batch, replicate
    import jax.numpy as jnp

    pipeline = [
        dict(type="LoadImageFromFile", key="gt", channel_order="rgb"),
        dict(type="RandomDownSampling", scale_min=1, scale_max=4,
             patch_size=12),
        dict(type="RescaleToZeroOne", keys=["lq", "gt"]),
        dict(type="Flip", keys=["lq", "gt"], flip_ratio=0.5,
             direction="horizontal"),
        dict(type="ImageToTensor", keys=["lq", "gt"]),
        dict(type="GenerateCoordinateAndCell", sample_quantity=128),
        dict(type="Collect", keys=["lq", "gt", "coord", "cell"],
             meta_keys=["gt_path"]),
    ]
    ds = build_dataset(dict(
        type="RepeatDataset", times=50,
        dataset=dict(type="SRFolderGTDataset",
                     gt_folder=str(sr_fixture / "GTmod12"),
                     pipeline=pipeline, scale=4, seed=0)))
    loader = build_dataloader(ds, samples_per_gpu=8, workers_per_gpu=2,
                              seed=0)
    restorer = CiaoSRRestorer(generator=TINY_GEN)
    tx, _ = build_optimizer(dict(type="Adam", lr=1e-3), None)
    step_fn = make_train_step(restorer, tx)
    mesh = make_mesh()

    it = iter(loader)
    batch = next(it)
    params = restorer.init_params(jax.random.PRNGKey(0),
                                  lq_shape=(1, 12, 12, 3), n_queries=128)
    state = replicate(mesh, TrainState(step=jnp.asarray(0), params=params,
                                       opt_state=tx.init(params)))
    losses = []
    for i in range(60):
        state, m = step_fn(state, shard_batch(mesh, batch))
        losses.append(float(m["loss_pix"]))
        batch = next(it)
    assert int(state.step) == 60
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) * 0.8, losses
    assert all(np.isfinite(l) for l in losses)


def test_config_loads_and_builds():
    """All five shipped configs parse and their models build."""
    import ciaosr_tpu.models.restorers  # noqa: F401
    import ciaosr_tpu.models.real_restorer  # noqa: F401
    import ciaosr_tpu.data.degradations  # noqa: F401
    from ciaosr_tpu.models.builder import build_model
    from ciaosr_tpu.data.pipelines import Compose

    cfg_dir = os.path.join(os.path.dirname(__file__), "..", "configs")
    names = [n for n in sorted(os.listdir(cfg_dir))
             if n.startswith(("001", "002"))]   # reference-mirror recipes
    assert len(names) == 5                      # (soak_* are scaled runs)
    for name in names:
        cfg = Config.fromfile(os.path.join(cfg_dir, name))
        assert cfg.total_iters == 1000000
        model = build_model(cfg.model, train_cfg=cfg.get("train_cfg"),
                            test_cfg=cfg.test_cfg)
        assert model.eval_bsize == 30000
        # every train pipeline is buildable
        Compose(cfg.train_pipeline)
        if name.startswith("001"):
            assert model.generator.feat_dim in (64, 180)
            assert cfg.test_cfg["tile"] == 192
        else:
            assert model.generator.non_local_attn is False
            assert model.is_use_ema
            if "gan" in name and "wogan" not in name:
                assert model.gan_loss is not None
                assert model.discriminator is not None
                assert cfg.load_from


def test_sharded_tiled_eval_matches_single_device(rng):
    """predict_tiled over an 8-device mesh (tile/'sequence' parallelism,
    SURVEY.md §5.7) matches the single-device result."""
    import jax
    from ciaosr_tpu.models.restorers import CiaoSRRestorer
    from ciaosr_tpu.parallel.mesh import make_mesh

    r = CiaoSRRestorer(
        generator=dict(
            type="LocalImplicitSREDSR",
            encoder=dict(type="EDSR", in_channels=3, mid_channels=8,
                         num_blocks=1),
            imnet_q=dict(type="MLPRefiner", out_dim=3, hidden_list=[16]),
            imnet_k=dict(type="MLPRefiner", out_dim=1, hidden_list=[16]),
            imnet_v=dict(type="MLPRefiner", out_dim=1, hidden_list=[16])),
        test_cfg=dict(metrics=["PSNR"], scale=2, tile=8, tile_overlap=4,
                      tile_batch=8))
    params = r.init_params(jax.random.PRNGKey(0))
    lq = rng.random((20, 24, 3), dtype=np.float32)
    single = r.predict_tiled(params, lq, 2, tile=8, tile_overlap=4)
    sharded = r.predict_tiled(params, lq, 2, tile=8, tile_overlap=4,
                              mesh=make_mesh())
    assert sharded.shape == (40, 48, 3)
    np.testing.assert_allclose(sharded, single, atol=1e-5)


def test_sharded_tiled_eval_pallas_path(rng):
    """--shard-tiles composed with use_pallas (the real-pod eval
    configuration): the fused grid-decode kernel must run under the
    sharded tile batch and match the single-device XLA path."""
    import jax
    from ciaosr_tpu.models.restorers import CiaoSRRestorer
    from ciaosr_tpu.parallel.mesh import make_mesh

    gen = dict(
        type="LocalImplicitSREDSR",
        encoder=dict(type="EDSR", in_channels=3, mid_channels=8,
                     num_blocks=1),
        imnet_q=dict(type="MLPRefiner", out_dim=3, hidden_list=[16]),
        imnet_k=dict(type="MLPRefiner", out_dim=1, hidden_list=[16]),
        imnet_v=dict(type="MLPRefiner", out_dim=1, hidden_list=[16]))
    tcfg = dict(metrics=["PSNR"], scale=2, tile=8, tile_overlap=4,
                tile_batch=8)
    r_pallas = CiaoSRRestorer(generator=dict(gen, use_pallas=True),
                              test_cfg=tcfg)
    r_xla = CiaoSRRestorer(generator=gen, test_cfg=tcfg)
    params = r_xla.init_params(jax.random.PRNGKey(0))
    lq = rng.random((20, 24, 3), dtype=np.float32)
    ref = r_xla.predict_tiled(params, lq, 2, tile=8, tile_overlap=4)
    sharded = r_pallas.predict_tiled(params, lq, 2, tile=8, tile_overlap=4,
                                     mesh=make_mesh())
    np.testing.assert_allclose(sharded, ref, atol=3e-3)
