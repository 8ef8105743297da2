"""Evaluation driver: dataset → restorer → metric aggregation.

Behavioral spec: the single/multi-gpu test loop + rank-0 aggregation of
/root/reference/tools/test.py:98-158 (external mmedit drivers). Here a host
loop feeds the jitted predictors; multi-host aggregation uses
jax.experimental.multihost_utils when processes > 1.
"""

from __future__ import annotations

import os
import time

import numpy as np

import jax


def _save_png(path: str, img01: np.ndarray):
    from ciaosr_tpu.core.color import tensor2img
    import cv2
    os.makedirs(os.path.dirname(path), exist_ok=True)
    cv2.imwrite(path, tensor2img(img01))  # tensor2img returns BGR uint8


def evaluate_dataset(restorer, params, dataset, save_path: str | None = None,
                     log_every: int = 10, progress=print,
                     mesh=None) -> dict:
    """Run the eval protocol over a dataset; returns mean metrics.

    Work is sharded over processes by index stride (process i takes items
    i, i+P, ...), then all-gathered — the ICI/DCN equivalent of the
    reference's gpu_collect path (tools/test.py:138-146). ``mesh``
    additionally shards each image's tile batch over local chips
    (restorers.predict_tiled)."""
    nproc = jax.process_count()
    pid = jax.process_index()

    per_image = []
    indices = list(range(pid, len(dataset), nproc))
    t0 = time.time()
    for n, idx in enumerate(indices):
        sample = dataset[idx]
        lq = sample["lq"]
        gt = sample.get("gt")
        meta = sample.get("meta", {})
        target = meta.get("target_size")
        if target is None and gt is not None and gt.ndim == 3:
            target = gt.shape[:2]
        scale = meta.get("scale") or getattr(dataset, "scale", None)
        out = restorer.forward_test(params, lq, target_shape=target,
                                    scale=scale, mesh=mesh)
        rec = {"idx": idx}
        if gt is not None and gt.ndim == 3:
            rec.update(restorer.evaluate(out, gt))
        per_image.append(rec)
        if save_path:
            name = os.path.splitext(os.path.basename(
                meta.get("gt_path") or f"img_{idx}"))[0]
            _save_png(os.path.join(save_path, f"{name}.png"), out)
        if (n + 1) % log_every == 0:
            progress(f"[eval] {n + 1}/{len(indices)} "
                     f"({(time.time() - t0) / (n + 1):.2f}s/img)")

    if nproc > 1:
        # process_allgather needs identical pytree structure on every
        # process; per-process item counts differ when len(dataset) %
        # nproc != 0, so gather a NaN-padded fixed-shape array instead
        # (exercised by tests/test_distributed.py on a 2-process CPU
        # cluster — the reference's gpu_collect analogue,
        # tools/test.py:138-146)
        from jax.experimental import multihost_utils
        # Key names must be identical on every process (the gathered array
        # has one column per key), and a process may have drawn ZERO items
        # when nproc > len(dataset) — so derive them statically from the
        # restorer's metric config rather than from observed records.
        test_cfg = getattr(restorer, "test_cfg", None) or {}
        metric_names = list(test_cfg.get("metrics", ["PSNR"])
                            if hasattr(test_cfg, "get") else ["PSNR"])
        keys = sorted({"idx", *metric_names})
        cap = max(1, -(-len(dataset) // nproc))
        arr = np.full((cap, len(keys)), np.nan, np.float64)
        for i, r in enumerate(per_image):
            for j, k in enumerate(keys):
                arr[i, j] = float(r.get(k, np.nan))
        gathered = np.asarray(multihost_utils.process_allgather(arr))
        rows = gathered.reshape(-1, len(keys))
        idx_col = keys.index("idx")
        per_image = [dict(zip(keys, row)) for row in rows
                     if np.isfinite(row[idx_col])]
        per_image.sort(key=lambda r: r["idx"])

    keys = sorted({k for r in per_image for k in r} - {"idx"})
    vals = {k: [r[k] for r in per_image
                if k in r and not np.isnan(r[k])] for k in keys}
    summary = {k: float(np.mean(v)) for k, v in vals.items() if v}
    summary["n_images"] = len(per_image)
    summary["elapsed_s"] = time.time() - t0
    return summary
