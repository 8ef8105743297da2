#!/usr/bin/env python
"""Render the endurance-soak curves (loss + val PSNR vs iteration) to PNG.

    python tools/soak_plot.py WORK_DIR [--stdout-log FILE] [--out PNG]

Two stacked single-series panels (never a dual axis): train loss_pix and
eval PSNR over iterations, with the observed LR boundaries and resume
events annotated. Styling follows the repo's chart conventions: thin
2px lines, recessive grid, text in ink tokens (not series colors).
"""

from __future__ import annotations

import argparse
import json
import os
import re

SURFACE = "#fcfcfb"
INK = "#0b0b0b"
INK2 = "#52514e"
S1 = "#2a78d6"   # loss
S3 = "#1baf7a"   # psnr


def main():
    p = argparse.ArgumentParser()
    p.add_argument("work_dir")
    p.add_argument("--stdout-log")
    p.add_argument("--out")
    args = p.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    recs = []
    with open(os.path.join(args.work_dir, "train_log.jsonl")) as f:
        for line in f:
            if line.strip():
                recs.append(json.loads(line))
    train = sorted((r for r in recs if "loss_pix" in r),
                   key=lambda r: r["step"])
    evals = []
    resumes = []
    if args.stdout_log and os.path.exists(args.stdout_log):
        with open(args.stdout_log, errors="replace") as f:
            for line in f:
                m = re.match(r"\[eval @ (\d+)\] (.*)", line.strip())
                if m:
                    try:
                        d = eval(m.group(2), {"__builtins__": {}})  # noqa
                        evals.append((int(m.group(1)), d.get("PSNR")))
                    except Exception:
                        pass
                m = re.match(r"\[resume\] from iteration (\d+)",
                             line.strip())
                if m:
                    resumes.append(int(m.group(1)))

    lr_bounds = []
    last_lr = None
    for r in train:
        if "lr" in r and last_lr is not None and \
                abs(r["lr"] - last_lr) > 1e-12:
            lr_bounds.append(r["step"])
        last_lr = r.get("lr", last_lr)

    fig, (ax1, ax2) = plt.subplots(2, 1, figsize=(9, 6), sharex=True,
                                   facecolor=SURFACE)
    for ax in (ax1, ax2):
        ax.set_facecolor(SURFACE)
        ax.grid(True, color="#e6e5e1", linewidth=0.8)
        for sp in ("top", "right"):
            ax.spines[sp].set_visible(False)
        for sp in ("left", "bottom"):
            ax.spines[sp].set_color(INK2)
        ax.tick_params(colors=INK2, labelsize=9)

    steps = [r["step"] for r in train]
    loss = [r["loss_pix"] for r in train]
    ax1.plot(steps, loss, color=S1, linewidth=2)
    ax1.set_ylabel("train loss_pix (L1)", color=INK, fontsize=10)
    ax1.set_yscale("log")
    ax1.set_title("Endurance soak — production-dims RDN-CiaoSR, scaled "
                  "1M-recipe", color=INK, fontsize=11, loc="left")

    if evals:
        es, ep = zip(*[(s, v) for s, v in evals if v is not None])
        ax2.plot(es, ep, color=S3, linewidth=2, marker="o", markersize=4)
    ax2.set_ylabel("val PSNR (dB)", color=INK, fontsize=10)
    ax2.set_xlabel("iteration", color=INK, fontsize=10)

    for ax in (ax1, ax2):
        for sb in lr_bounds:
            ax.axvline(sb, color=INK2, linewidth=1, linestyle="--",
                       alpha=0.6)
        for rs in set(resumes):
            ax.axvline(rs, color="#eb6834", linewidth=1.2,
                       linestyle=":", alpha=0.9)
    if lr_bounds:
        ax1.annotate("LR ×0.5 boundaries", fontsize=8.5, color=INK2,
                     xy=(lr_bounds[0], max(loss) * 0.82),
                     xytext=(lr_bounds[0] + 500, max(loss) * 0.82))
    for rs in sorted(set(resumes)):
        ax1.annotate(f"kill −9 → auto-resume @ {rs}",
                     xy=(rs, min(loss)), fontsize=8.5, color="#b44a1e",
                     ha="right",
                     xytext=(rs - 500, min(loss) * 1.12))

    out = args.out or os.path.join(args.work_dir, "soak_curves.png")
    fig.tight_layout()
    fig.savefig(out, dpi=130, facecolor=SURFACE)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
