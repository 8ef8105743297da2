#!/usr/bin/env python
"""Heterogeneous val-folder eval benchmark (untiled s>4 protocol).

The reference's s>4 protocol evaluates full images with no tiling
(configs/001_..._rdn_...py:139-154), so every distinct image size
compiles its own predictor program. This tool measures that end-to-end
— wall time INCLUDING compiles — on a DIV2K-val-like synthetic folder
of N distinct-size images, with the persistent compilation cache
enabled (utils/compilation_cache.py). Run it twice with the same
--cache-dir: the first run pays the per-size compiles, the second
restores them from disk.

    python tools/bench_folder_eval.py --model rdn --images 8 --scale 6 \
        --cache-dir /tmp/jax_cache
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_folder(root: str, n: int, seed: int = 0):
    """n structured GT images with DISTINCT sizes (DIV2K-val-like spread,
    scaled down so one chip finishes in minutes)."""
    import cv2
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(seed)
    # distinct (h, w) per image, mod-12-cropped like GTmod12
    sizes = [(132 + 12 * i, 228 - 12 * (i % 5)) for i in range(n)]
    for i, (h, w) in enumerate(sizes):
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        img = np.stack([np.sin(yy / (3 + i)) * .4 + .5,
                        np.cos(xx / (5 + i)) * .4 + .5,
                        rng.random((h, w), dtype=np.float32)], -1)
        cv2.imwrite(os.path.join(root, f"img{i:02d}.png"),
                    (np.clip(img, 0, 1) * 255).round().astype(np.uint8))
    return sizes


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="rdn")
    p.add_argument("--images", type=int, default=8)
    p.add_argument("--scale", type=int, default=6,
                   help="untiled on-the-fly protocol scale (>4)")
    p.add_argument("--cache-dir", default="/tmp/ciaosr_folder_eval_cache")
    p.add_argument("--folder", default="/tmp/ciaosr_folder_eval_imgs")
    args = p.parse_args()

    from ciaosr_tpu.utils.compilation_cache import enable_compilation_cache
    cache = enable_compilation_cache(args.cache_dir)
    n_entries = len(os.listdir(cache)) if cache and os.path.isdir(cache) \
        else 0
    print(f"compilation cache: {cache} ({n_entries} entries — "
          f"{'warm' if n_entries else 'cold'} run)", flush=True)

    import jax
    from benchmark import build
    from ciaosr_tpu.data.datasets import build_dataset
    from ciaosr_tpu.eval.evaluator import evaluate_dataset

    make_folder(args.folder, args.images)
    pipeline = [
        dict(type="LoadImageFromFile", key="gt", channel_order="rgb"),
        dict(type="RandomDownSampling", scale_min=args.scale,
             scale_max=args.scale),
        dict(type="RescaleToZeroOne", keys=["lq", "gt"]),
        dict(type="ImageToTensor", keys=["lq", "gt"]),
        dict(type="GenerateCoordinateAndCell", scale=args.scale),
        dict(type="Collect", keys=["lq", "gt", "coord", "cell"],
             meta_keys=["gt_path"]),
    ]
    ds = build_dataset(dict(type="SRFolderGTDataset",
                            gt_folder=args.folder,
                            pipeline=pipeline, scale=args.scale))
    restorer = build(args.model)
    restorer.test_cfg = dict(metrics=["PSNR"], crop_border=args.scale,
                             scale=args.scale, convert_to="y")
    t0 = time.time()
    params = restorer.init_params(jax.random.PRNGKey(0))
    t_init = time.time() - t0

    t0 = time.time()
    res = evaluate_dataset(restorer, params, ds, log_every=2)
    wall = time.time() - t0
    n_after = len(os.listdir(cache)) if cache else 0
    print(f"init {t_init:.1f}s | folder eval ({args.images} distinct "
          f"sizes, x{args.scale} untiled): {wall:.1f}s total incl. "
          f"compiles, {wall / args.images:.2f}s/img | PSNR "
          f"{res['PSNR']:.2f} | cache entries {n_entries} -> {n_after}",
          flush=True)


if __name__ == "__main__":
    main()
