#!/usr/bin/env python
"""Summarize an endurance-soak work_dir into a markdown report.

Reads train_log.jsonl (loss/lr/throughput every log interval) and the
eval records appended by the trainer, and writes a report with the
schedule milestones (LR boundaries), eval PSNR/SSIM trajectory,
throughput statistics, checkpoint inventory, and any resume events
found in the stdout log.

    python tools/soak_report.py WORK_DIR [--stdout-log FILE] [--out MD]
"""

from __future__ import annotations

import argparse
import json
import os
import re


def load_jsonl(path):
    recs = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                try:
                    recs.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
    return recs


def main():
    p = argparse.ArgumentParser()
    p.add_argument("work_dir")
    p.add_argument("--stdout-log", help="trainer stdout (for eval/resume "
                                        "lines)")
    p.add_argument("--out", help="output markdown (default: "
                                 "WORK_DIR/SOAK_REPORT.md)")
    args = p.parse_args()

    recs = load_jsonl(os.path.join(args.work_dir, "train_log.jsonl"))
    train = [r for r in recs if "loss_pix" in r]
    evals = [r for r in recs if any(k.startswith("val_") for k in r)]

    resumes, eval_lines = [], []
    if args.stdout_log and os.path.exists(args.stdout_log):
        with open(args.stdout_log, errors="replace") as f:
            for line in f:
                if line.startswith("[resume]"):
                    resumes.append(line.strip())
                m = re.match(r"\[eval @ (\d+)\] (.*)", line.strip())
                if m:
                    eval_lines.append((int(m.group(1)), m.group(2)))

    ckpt_dir = os.path.join(args.work_dir, "checkpoints")
    ckpts = sorted(int(d) for d in os.listdir(ckpt_dir)
                   if d.isdigit()) if os.path.isdir(ckpt_dir) else []

    out = args.out or os.path.join(args.work_dir, "SOAK_REPORT.md")
    lines = ["# Endurance soak report", ""]
    if train:
        first, last = train[0], train[-1]
        span_s = last["time"] - first["time"]
        total_steps = last["step"] - first["step"]
        ips = [r["iters_per_s"] for r in train if "iters_per_s" in r]
        lines += [
            f"- steps logged: {first['step']} → {last['step']} "
            f"({len(train)} log records)",
            f"- wall span of log: {span_s / 3600:.2f} h; mean throughput "
            f"{total_steps / max(span_s, 1e-9):.2f} it/s "
            f"(per-interval p10/median/p90: "
            f"{sorted(ips)[len(ips) // 10]:.2f}/"
            f"{sorted(ips)[len(ips) // 2]:.2f}/"
            f"{sorted(ips)[9 * len(ips) // 10]:.2f})" if ips else "",
            f"- loss_pix: first {first['loss_pix']:.5f} → last "
            f"{last['loss_pix']:.5f}",
            "",
        ]
        # LR schedule milestones actually taken
        lr_seen = []
        for r in train:
            if "lr" in r and (not lr_seen or
                              abs(r["lr"] - lr_seen[-1][1]) > 1e-12):
                lr_seen.append((r["step"], r["lr"]))
        lines += ["## LR schedule (observed boundaries)", ""]
        lines += [f"- step {s}: lr {v:.3e}" for s, v in lr_seen]
        lines += [""]
    if eval_lines:
        lines += ["## Eval trajectory (hook cadence)", "",
                  "| step | record |", "|---|---|"]
        for s, txt in eval_lines:
            lines.append(f"| {s} | `{txt}` |")
        lines += [""]
    if resumes:
        lines += ["## Resume events", ""]
        lines += [f"- `{r}`" for r in resumes]
        lines += [""]
    if ckpts:
        lines += ["## Checkpoints on disk", "",
                  f"- {len(ckpts)} kept (max_to_keep rotation): "
                  + ", ".join(map(str, ckpts)), ""]

    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
