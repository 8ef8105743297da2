#!/usr/bin/env python
"""Single-image / folder SR inference CLI.

    python tools/inference.py CONFIG CHECKPOINT --img LQ.png --scale 4 \
        [--out SR.png] [--tile 192] [--tile-overlap 32] [--shard-tiles]

The reference exposes inference only through dataset evaluation
(/root/reference/tools/test.py); this is the missing "upscale one file"
surface on the same checkpoint/config machinery: CHECKPOINT accepts an
orbax params dir, a training work_dir, a torch ``.pth`` (converted on
the fly), or ``random`` — exactly like tools/test.py.

Non-integer scales run through the implicit-coordinate ``predict`` path
(any output size); integer scales on large inputs run the static-shape
tile engine (clip_test semantics, ciaosr.py:218-257).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="ciaosr_tpu single-image SR")
    p.add_argument("config")
    p.add_argument("checkpoint", help="params dir, work_dir, .pth, or "
                   "'random' (smoke)")
    p.add_argument("--img", required=True,
                   help="LQ image file, or a directory of images")
    p.add_argument("--out", help="output file (or directory for --img DIR; "
                   "default: <input>_x<scale>.png)")
    p.add_argument("--scale", type=float, default=4.0,
                   help="upscaling factor (non-integer allowed)")
    p.add_argument("--tile", type=int, default=192,
                   help="LR tile size for integer scales (0 = untiled)")
    p.add_argument("--tile-overlap", type=int, default=32)
    p.add_argument("--shard-tiles", action="store_true",
                   help="shard the tile batch over local chips")
    p.add_argument("--pallas", action="store_true",
                   help="route integer-scale grid decodes through the "
                        "fused Pallas kernels (TPU)")
    return p.parse_args()


def _iter_images(path):
    exts = (".png", ".jpg", ".jpeg", ".bmp", ".webp")
    if os.path.isdir(path):
        for name in sorted(os.listdir(path)):
            if name.lower().endswith(exts):
                yield os.path.join(path, name)
    else:
        yield path


def main():
    args = parse_args()

    import cv2
    import jax
    import numpy as np

    from ciaosr_tpu.utils.compilation_cache import enable_compilation_cache
    enable_compilation_cache()  # arbitrary input sizes -> per-size compiles
    from ciaosr_tpu.config.config import Config
    from ciaosr_tpu.models.builder import build_model
    import ciaosr_tpu.models.restorers  # noqa: F401 (registry)
    import ciaosr_tpu.models.real_restorer  # noqa: F401
    from test import _load_orbax

    cfg = Config.fromfile(args.config)
    if args.pallas:
        cfg.model["generator"]["use_pallas"] = True
    model = build_model(cfg.model, test_cfg=cfg.get("test_cfg"))

    ckpt = args.checkpoint
    if ckpt == "random":
        params = model.init_params(jax.random.PRNGKey(0))
        print("[warn] upscaling with RANDOM weights (smoke mode)",
              flush=True)
    elif ckpt.endswith((".pth", ".pt")):
        from ciaosr_tpu.convert.load import load_torch_checkpoint
        params = load_torch_checkpoint(ckpt, cfg.model)
    else:
        params = _load_orbax(ckpt, model)

    mesh = None
    if args.shard_tiles and len(jax.local_devices()) > 1:
        from ciaosr_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(len(jax.local_devices()))

    scale = args.scale
    int_scale = scale == int(scale)
    out_dir_mode = os.path.isdir(args.img)
    if out_dir_mode and args.out:
        os.makedirs(args.out, exist_ok=True)

    for path in _iter_images(args.img):
        bgr = cv2.imread(path, cv2.IMREAD_COLOR)
        if bgr is None:
            print(f"[skip] unreadable: {path}", flush=True)
            continue
        lq = bgr[:, :, ::-1].astype(np.float32) / 255.0
        h, w = lq.shape[:2]
        if int_scale and args.tile and (h > args.tile or w > args.tile):
            sr = model.predict_tiled(params, lq, int(scale), args.tile,
                                     args.tile_overlap, mesh=mesh)
        else:
            target = (int(round(h * scale)), int(round(w * scale)))
            sr = model.predict(params, lq, target)
        sr8 = np.clip(np.asarray(sr) * 255.0 + 0.5, 0,
                      255).astype(np.uint8)
        if args.out:
            out = (os.path.join(args.out, os.path.basename(path))
                   if out_dir_mode else args.out)
        else:
            stem, _ = os.path.splitext(path)
            tag = int(scale) if int_scale else scale
            out = f"{stem}_x{tag}.png"
        cv2.imwrite(out, sr8[:, :, ::-1])
        print(f"{path} ({h}x{w}) -> {out} ({sr8.shape[0]}x{sr8.shape[1]})",
              flush=True)


if __name__ == "__main__":
    main()
