#!/usr/bin/env python
"""Host data-pipeline throughput benchmark.

Measures batches/s and images/s through the threaded prefetch loader for
the two training recipes' pipelines (001 classical RandomDownSampling,
002 real-world two-stage degradation chain), on synthetic HR images —
no dataset download needed. The point: show the host pipeline sustains
the device step rate (tools/benchmark.py --train) with headroom.

    python tools/bench_loader.py [--batch 16] [--workers 8] [--iters 50]
                                 [--recipe 001|002] [--native 0|1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_fixture(root: str, n: int = 16, size: int = 480) -> str:
    import cv2
    gt_dir = os.path.join(root, "GT")
    os.makedirs(gt_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        img = (rng.random((size, size, 3)) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(gt_dir, f"{i:04d}.png"), img)
    return gt_dir


def pipeline_001(patch: int, quantity: int) -> list:
    return [
        dict(type="LoadImageFromFile", key="gt", channel_order="rgb"),
        dict(type="RandomDownSampling", scale_min=1, scale_max=4,
             patch_size=patch),
        dict(type="RescaleToZeroOne", keys=["lq", "gt"]),
        dict(type="Flip", keys=["lq", "gt"], flip_ratio=0.5,
             direction="horizontal"),
        dict(type="Flip", keys=["lq", "gt"], flip_ratio=0.5,
             direction="vertical"),
        dict(type="RandomTransposeHW", keys=["lq", "gt"]),
        dict(type="ImageToTensor", keys=["lq", "gt"]),
        dict(type="GenerateCoordinateAndCell", sample_quantity=quantity),
        dict(type="Collect", keys=["lq", "gt", "coord", "cell"],
             meta_keys=["gt_path"]),
    ]


def pipeline_002(quantity: int) -> list:
    """Real-world chain: crop → unsharp → blur/resize/noise/JPEG ×2 with
    shuffle (configs/002_...py:100-246 surface)."""
    blur = dict(type="RandomBlur",
                params=dict(kernel_size=[7, 9, 11, 13, 15, 17, 19, 21],
                            kernel_list=["iso", "aniso", "generalized_iso",
                                         "generalized_aniso", "plateau_iso",
                                         "plateau_aniso", "sinc"],
                            kernel_prob=[0.405, 0.225, 0.108, 0.027, 0.108,
                                         0.027, 0.1],
                            sigma_x=[0.2, 3], sigma_y=[0.2, 3],
                            rotate_angle=[-3.1416, 3.1416],
                            beta_gaussian=[0.5, 4], beta_plateau=[1, 2],
                            omega=[0.3927, 3.1416]),
                keys=["lq"])
    resize = dict(type="RandomResize",
                  params=dict(resize_mode_prob=[0.2, 0.7, 0.1],
                              resize_scale=[0.15, 1.5],
                              resize_opt=["bilinear", "area", "bicubic"],
                              resize_prob=[1 / 3.0] * 3),
                  keys=["lq"])
    noise = dict(type="RandomNoise",
                 params=dict(noise_type=["gaussian", "poisson"],
                             noise_prob=[0.5, 0.5],
                             gaussian_sigma=[1, 30],
                             gaussian_gray_noise_prob=0.4,
                             poisson_scale=[0.05, 3],
                             poisson_gray_noise_prob=0.4),
                 keys=["lq"])
    jpeg = dict(type="RandomJPEGCompression", params=dict(quality=[30, 95]),
                keys=["lq"])
    return [
        dict(type="LoadImageFromFile", key="gt", channel_order="rgb"),
        dict(type="Crop", keys=["gt"], crop_size=(400, 400),
             random_crop=True),
        dict(type="RescaleToZeroOne", keys=["gt"]),
        dict(type="UnsharpMasking", keys=["gt"], kernel_size=51, sigma=0,
             weight=0.5, threshold=10),
        dict(type="CopyValues", src_keys=["gt"], dst_keys=["lq"]),
        blur, resize, noise, jpeg,
        dict(type="RandomScaleResize1", params=dict(
            scale_min=0.25, scale_max=1.0,
            resize_opt=["bilinear", "area", "bicubic"],
            resize_prob=[1 / 3.0] * 3), keys=["lq"]),
        dict(type="Crop", keys=["lq"], crop_size=(64, 64), random_crop=True),
        dict(type="Quantize", keys=["lq"]),
        dict(type="ImageToTensor", keys=["lq", "gt", "gt_unsharp"]),
        dict(type="GenerateCoordinateAndCell1", sample_quantity=quantity),
        dict(type="Collect", keys=["lq", "gt", "coord", "cell",
                                   "gt_unsharp"],
             meta_keys=["gt_path"]),
    ]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--mode", default="thread", choices=["thread", "process"],
                   help="loader worker mode (process = fork pool for the "
                        "GIL-bound 002 chain)")
    p.add_argument("--recipe", default="001", choices=["001", "002"])
    p.add_argument("--patch", type=int, default=48)
    p.add_argument("--quantity", type=int, default=2304)
    p.add_argument("--native", default=None,
                   help="set CIAOSR_NATIVE=0/1 to force the bicubic impl")
    p.add_argument("--json", help="write results here")
    args = p.parse_args()

    if args.native is not None:
        os.environ["CIAOSR_NATIVE"] = str(args.native)
        if args.native != "0":
            os.environ["CIAOSR_BUILD_NATIVE"] = "1"

    from ciaosr_tpu.data.datasets import build_dataset
    from ciaosr_tpu.data.loader import build_dataloader

    with tempfile.TemporaryDirectory() as tmp:
        gt_dir = make_fixture(tmp)
        if args.recipe == "001":
            pipe = pipeline_001(args.patch, args.quantity)
        else:
            pipe = pipeline_002(4096)
        ds = build_dataset(dict(
            type="RepeatDataset", times=10000,
            dataset=dict(type="SRFolderGTDataset", gt_folder=gt_dir,
                         pipeline=pipe, scale=4, seed=0)))
        loader = build_dataloader(ds, samples_per_gpu=args.batch,
                                  workers_per_gpu=args.workers, seed=0,
                                  worker_mode=args.mode)
        it = iter(loader)
        for _ in range(4):                       # warm up workers
            next(it)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            batch = next(it)
        dt = (time.perf_counter() - t0) / args.iters
        assert batch["lq"].shape[0] == args.batch
        it.close()                               # stop prefetch threads
        time.sleep(0.3)                          # let them drain

    result = {
        "recipe": args.recipe,
        "batch": args.batch,
        "workers": args.workers,
        "mode": args.mode,
        "batches_per_s": round(1.0 / dt, 2),
        "images_per_s": round(args.batch / dt, 1),
        "ms_per_batch": round(dt * 1e3, 1),
    }
    print(json.dumps(result))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(result, f)


if __name__ == "__main__":
    main()
