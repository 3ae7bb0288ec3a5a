"""Summarize a vts_tpu.train log: metric milestones, best votes, wall-clock
anatomy.  Usage: python scripts/summarize_run.py runs/sched_prod.log [epochs]

Prints a markdown table of the val metrics at milestone epochs, the list of
best-vote epochs, epoch-time statistics (median/min/max, the D3-crossing
recompile), and total wall-clock — the inputs for RESULTS.md's full-schedule
tables.
"""

from __future__ import annotations

import re
import statistics
import sys

METRICS = ("I_SIFID", "I_PSNR", "I_SSIM", "T_SIFID", "T_AE", "T_MSE")


def main(path: str, milestones=None):
    metrics_by_epoch = {}
    best_epochs = []
    epoch_times = {}
    eval_times = []
    lr_by_epoch = {}
    last_epoch = 0
    for line in open(path, errors="replace"):
        m = re.match(r"\(epoch: (\d+)\) (.*)", line)
        if m:
            ep = int(m.group(1))
            vals = dict(re.findall(r"(metric_\w+): ([\d.eE+-]+)", m.group(2)))
            metrics_by_epoch[ep] = {
                k: float(vals[f"metric_{k}"]) for k in METRICS
                if f"metric_{k}" in vals}
            last_epoch = max(last_epoch, ep)
        m = re.search(r"saving the BEST model at epoch (\d+)", line)
        if m:
            best_epochs.append(int(m.group(1)))
        m = re.search(r"End of epoch (\d+) / \d+ \t Time Taken: (\d+) sec",
                      line)
        if m:
            epoch_times[int(m.group(1))] = int(m.group(2))
        m = re.search(r"\[eval\] epoch \d+ metric suite .* took ([\d.]+) s",
                      line)
        if m:
            eval_times.append(float(m.group(1)))

    if milestones is None:
        milestones = [1, 5, 12, 50, 100, 101, 150, 200, 300, 400, last_epoch]
    milestones = sorted({e for e in milestones if e in metrics_by_epoch})

    print(f"log: {path}  (epochs seen: {len(epoch_times)}, "
          f"last: {last_epoch})")
    hdr = "| epoch | " + " | ".join(METRICS) + " |"
    print(hdr)
    print("|" + "---|" * (len(METRICS) + 1))
    for ep in milestones:
        row = metrics_by_epoch[ep]
        cells = " | ".join(f"{row.get(k, float('nan')):.4g}" for k in METRICS)
        star = " *best*" if ep in best_epochs else ""
        print(f"| {ep}{star} | {cells} |")

    if epoch_times:
        ts = sorted(epoch_times.values())
        total = sum(epoch_times.values())
        print(f"\nepoch time: median {statistics.median(ts):.0f} s, "
              f"min {ts[0]} s, max {ts[-1]} s; total "
              f"{total} s = {total / 3600:.2f} h over {len(epoch_times)} epochs")
        for ep in (100, 101):
            if ep in epoch_times:
                print(f"  epoch {ep} (D3 boundary): {epoch_times[ep]} s")
    if eval_times:
        print(f"eval suite: median {statistics.median(eval_times):.1f} s, "
              f"min {min(eval_times):.1f}, max {max(eval_times):.1f} "
              f"({len(eval_times)} evals, "
              f"{sum(eval_times) / 3600:.2f} h total)")
    print(f"best votes: {len(best_epochs)} "
          f"(epochs {best_epochs[:10]}{'…' if len(best_epochs) > 10 else ''}"
          f"{' … ' + str(best_epochs[-5:]) if len(best_epochs) > 10 else ''})")


if __name__ == "__main__":
    ms = [int(x) for x in sys.argv[2].split(",")] if len(sys.argv) > 2 else None
    main(sys.argv[1], ms)
