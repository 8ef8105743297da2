"""Worker for tests/test_distributed.py — one process of a 2-process
jax.distributed CPU cluster (the TPU-world fake-NCCL analogue, SURVEY.md §4).

Usage: python tests/distributed_worker.py PID NPROC PORT TMPDIR
Writes eval metrics and 20-step train losses to TMPDIR/out_{PID}.json.
"""

import json
import os
import sys


def _make_global(mesh, pspec, np_array):
    """Build a global jax.Array from identical host data on every process
    (device_put can't target non-addressable devices)."""
    import jax
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, pspec)
    return jax.make_array_from_callback(
        np_array.shape, sharding, lambda idx: np_array[idx])


def main():
    pid, nproc, port, tmp = (int(sys.argv[1]), int(sys.argv[2]),
                             sys.argv[3], sys.argv[4])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    import jax
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 2 * nproc  # 2 local CPU devices each

    import numpy as np

    from ciaosr_tpu.data.datasets import build_dataset
    from ciaosr_tpu.eval.evaluator import evaluate_dataset
    from ciaosr_tpu.models.restorers import CiaoSRRestorer

    gen = dict(
        type="LocalImplicitSREDSR",
        encoder=dict(type="EDSR", in_channels=3, mid_channels=8,
                     num_blocks=1),
        imnet_q=dict(type="MLPRefiner", out_dim=3, hidden_list=[16]),
        imnet_k=dict(type="MLPRefiner", out_dim=1, hidden_list=[16]),
        imnet_v=dict(type="MLPRefiner", out_dim=1, hidden_list=[16]),
        eval_bsize=512)
    restorer = CiaoSRRestorer(
        generator=gen,
        test_cfg=dict(metrics=["PSNR"], crop_border=2, scale=2,
                      convert_to="y"))
    params = restorer.init_params(jax.random.PRNGKey(0))

    # ---- eval: strided indices + padded process_allgather (3 imgs / 2
    # procs exercises the ragged-count path) ----
    pipeline = [
        dict(type="LoadImageFromFile", key="gt", channel_order="rgb"),
        dict(type="RandomDownSampling", scale_min=2, scale_max=2),
        dict(type="RescaleToZeroOne", keys=["lq", "gt"]),
        dict(type="ImageToTensor", keys=["lq", "gt"]),
        dict(type="GenerateCoordinateAndCell", scale=2),
        dict(type="Collect", keys=["lq", "gt", "coord", "cell"],
             meta_keys=["gt_path"]),
    ]
    ds = build_dataset(dict(type="SRFolderGTDataset",
                            gt_folder=os.path.join(tmp, "gt"),
                            pipeline=pipeline, scale=2))
    eval_res = evaluate_dataset(restorer, params, ds)

    # ---- train: 20 SPMD steps over the global 4-device mesh ----
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P

    from ciaosr_tpu.train.optim import build_optimizer
    from ciaosr_tpu.train.trainer import TrainState, make_train_step

    mesh = Mesh(np.array(jax.devices()), ("data",))
    tx, _ = build_optimizer(dict(type="Adam", lr=1e-3), None)
    step_fn = make_train_step(restorer, tx)
    b, hw, q = 4, 8, 64
    tparams = restorer.init_params(jax.random.PRNGKey(1),
                                   lq_shape=(1, hw, hw, 3), n_queries=q)
    state = TrainState(step=jnp.asarray(0),
                       params=jax.device_get(tparams),
                       opt_state=jax.device_get(tx.init(tparams)))
    state = jax.tree.map(
        lambda x: _make_global(mesh, P(), np.asarray(x)), state)

    rng = np.random.default_rng(7)  # identical stream on every process
    losses = []
    for _ in range(20):
        batch = {
            "lq": rng.random((b, hw, hw, 3)).astype(np.float32),
            "gt": rng.random((b, q, 3)).astype(np.float32),
            "coord": rng.uniform(-0.9, 0.9, (b, q, 2)).astype(np.float32),
            "cell": np.full((b, q, 2), 2 / 16, np.float32),
        }
        gbatch = {k: _make_global(mesh, P("data"), v)
                  for k, v in batch.items()}
        state, metrics = step_fn(state, gbatch)
        losses.append(float(metrics["loss_pix"]))

    with open(os.path.join(tmp, f"out_{pid}.json"), "w") as f:
        json.dump({"eval": eval_res, "losses": losses}, f)
    print(f"worker {pid}: OK", flush=True)


if __name__ == "__main__":
    main()
