"""Learning-curve plots from monitor / logs CSVs.

Replaces scripts/plot.py + scripts/plot_shaded.py (moving-average smoothing
over Monitor episode logs, shaded multi-run variance bands). Input is this
framework's log_file.monitor.csv / logs.csv (training/callbacks.py).

  python scripts/plot.py --dirs out/run1 out/run2 --metric success_rate \
      --out curves.png
"""

from __future__ import annotations

import argparse
import csv
import os

import numpy as np


def moving_average(values, window):
    """Smoothing kernel (reference scripts/plot.py:22-47)."""
    if len(values) < window:
        return np.asarray(values)
    weights = np.repeat(1.0, window) / window
    return np.convolve(values, weights, "valid")


def read_monitor(path):
    rows = []
    with open(path) as f:
        first = f.readline()
        if not first.startswith("#"):
            f.seek(0)
        for row in csv.DictReader(f):
            rows.append({k: float(v) for k, v in row.items() if v != ""})
    return rows


def read_logs(path):
    with open(path) as f:
        return [
            {k: float(v) for k, v in row.items() if v != ""}
            for row in csv.DictReader(f)
        ]


def main(argv=None):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    p = argparse.ArgumentParser()
    p.add_argument("--dirs", nargs="+", required=True)
    p.add_argument("--metric", default="success_rate")
    p.add_argument("--window", type=int, default=10)
    p.add_argument("--out", default="curves.png")
    p.add_argument("--shaded", action="store_true",
                   help="mean +- std band across runs")
    args = p.parse_args(argv)

    fig, ax = plt.subplots(figsize=(8, 5))
    series = []
    for d in args.dirs:
        logs = os.path.join(d, "logs.csv")
        mon = os.path.join(d, "log_file.monitor.csv")
        if os.path.exists(logs):
            rows = read_logs(logs)
            xs = np.array([r.get("step", i) for i, r in enumerate(rows)])
            ys = np.array([r.get(args.metric, np.nan) for r in rows])
        elif os.path.exists(mon):
            rows = read_monitor(mon)
            xs = np.arange(len(rows))
            col = {"success_rate": "s", "reward": "r", "length": "l"}.get(
                args.metric, args.metric
            )
            ys = np.array([r.get(col, np.nan) for r in rows])
        else:
            raise FileNotFoundError(f"no logs in {d}")
        ys_s = moving_average(ys, args.window)
        xs_s = xs[len(xs) - len(ys_s):]
        series.append((xs_s, ys_s, os.path.basename(d.rstrip("/"))))

    if args.shaded and len(series) > 1:
        n = min(len(s[1]) for s in series)
        stack = np.stack([s[1][:n] for s in series])
        xs = series[0][0][:n]
        mean, std = stack.mean(0), stack.std(0)
        ax.plot(xs, mean, label="mean")
        ax.fill_between(xs, mean - std, mean + std, alpha=0.3)
    else:
        for xs, ys, label in series:
            ax.plot(xs, ys, label=label)

    ax.set_xlabel("step")
    ax.set_ylabel(args.metric)
    ax.legend()
    ax.grid(alpha=0.3)
    fig.savefig(args.out, dpi=120, bbox_inches="tight")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
