#!/usr/bin/env python
"""Generate a procedural, *learnable* HR image folder for training soaks.

The reference's primary workload is a 1M-iteration DIV2K run
(/root/reference/configs/001_..._rdn_...py:156-175); this environment has
no dataset downloads, so endurance runs use procedural images instead.
Random noise would give the model nothing to learn — these images are
built from structure a bicubic-downsample SR model can actually exploit
(smooth gradients, oriented sinusoid textures, anti-aliased shapes, mild
band-limited noise), so the loss curve and val PSNR are meaningful.

    python tools/make_synth_dataset.py OUT_DIR [--n 64] [--size 480]
                                       [--seed 0]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def make_image(rng: np.random.Generator, size: int) -> np.ndarray:
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float64) / size
    img = np.zeros((size, size, 3))

    # smooth polynomial gradient background, per channel
    for c in range(3):
        a = rng.uniform(-1, 1, size=6)
        img[..., c] = (a[0] + a[1] * xx + a[2] * yy + a[3] * xx * yy
                       + a[4] * xx ** 2 + a[5] * yy ** 2)

    # oriented sinusoid textures in soft windows
    for _ in range(rng.integers(2, 5)):
        theta = rng.uniform(0, np.pi)
        freq = rng.uniform(4, 40)
        phase = rng.uniform(0, 2 * np.pi)
        cx, cy = rng.uniform(0.2, 0.8, 2)
        sigma = rng.uniform(0.08, 0.3)
        window = np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2)
                          / (2 * sigma ** 2)))
        wave = np.sin(2 * np.pi * freq
                      * (xx * np.cos(theta) + yy * np.sin(theta)) + phase)
        color = rng.uniform(-0.6, 0.6, 3)
        img += (window * wave)[..., None] * color

    # anti-aliased shapes: discs and rotated rectangles (soft edges —
    # hard 1px edges are exactly what SR models train on, the smoothstep
    # keeps them band-limited like a real camera)
    for _ in range(rng.integers(3, 8)):
        cx, cy = rng.uniform(0.05, 0.95, 2)
        color = rng.uniform(0, 1, 3)
        edge = rng.uniform(0.002, 0.01)
        if rng.random() < 0.5:
            r = rng.uniform(0.03, 0.2)
            d = np.sqrt((xx - cx) ** 2 + (yy - cy) ** 2)
            mask = np.clip((r - d) / edge, 0, 1)
        else:
            w, h = rng.uniform(0.05, 0.3, 2)
            theta = rng.uniform(0, np.pi)
            xr = (xx - cx) * np.cos(theta) + (yy - cy) * np.sin(theta)
            yr = -(xx - cx) * np.sin(theta) + (yy - cy) * np.cos(theta)
            mask = (np.clip((w / 2 - np.abs(xr)) / edge, 0, 1)
                    * np.clip((h / 2 - np.abs(yr)) / edge, 0, 1))
        alpha = mask[..., None] * rng.uniform(0.4, 1.0)
        img = img * (1 - alpha) + color * alpha

    # mild band-limited noise (texture, not salt-and-pepper)
    try:
        import cv2
        noise = rng.normal(0, 1, (size, size, 3))
        k = 2 * int(rng.integers(1, 4)) + 1
        noise = cv2.GaussianBlur(noise, (k, k), 0)
        img += noise * rng.uniform(0.01, 0.05)
    except ImportError:  # pragma: no cover
        pass

    lo, hi = img.min(), img.max()
    img = (img - lo) / max(hi - lo, 1e-9)
    return (img * 255).round().astype(np.uint8)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("out_dir")
    p.add_argument("--n", type=int, default=64)
    p.add_argument("--size", type=int, default=480)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import cv2
    os.makedirs(args.out_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    for i in range(args.n):
        img = make_image(rng, args.size)
        cv2.imwrite(os.path.join(args.out_dir, f"{i:04d}.png"),
                    img[..., ::-1])  # RGB -> BGR for cv2
    print(f"wrote {args.n} {args.size}x{args.size} images to {args.out_dir}")


if __name__ == "__main__":
    main()
