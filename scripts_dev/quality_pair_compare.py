"""Sharded-vs-single-chip quality comparison at matched frames (VERDICT #8).

Reads logs.csv from the two quality runs (identical hyperparameters,
8-device CPU mesh vs 1 device) and reports the train-sr gap at matched
frame counts — the "sharded within 5 points of single-chip at equal
frames" criterion. Window sr is the curriculum's own 1000-episode
stochastic metric, directly comparable across the two runs.

Usage: python scripts_dev/quality_pair_compare.py \
    [--sharded out/sac_sharded_quality_r5] [--anchor out/sac_singlechip_quality_r5]
"""

import argparse
import csv
import json
import os

import numpy as np


def load(run):
    with open(os.path.join(run, "logs.csv")) as f:
        rows = list(csv.DictReader(f))
    steps = np.array([int(r["step"]) for r in rows])
    sr = np.array([float(r["success_rate"]) for r in rows])
    lam = np.array([float(r["curriculum_lambda"]) for r in rows])
    return steps, sr, lam


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sharded", default="out/sac_sharded_quality_r5")
    ap.add_argument("--anchor", default="out/sac_singlechip_quality_r5")
    args = ap.parse_args()
    s_steps, s_sr, s_lam = load(args.sharded)
    a_steps, a_sr, a_lam = load(args.anchor)
    top = min(s_steps[-1], a_steps[-1])
    # compare on a grid of matched frames, smoothing each curve over a
    # +-10% window to damp the per-row episode noise
    grid = np.linspace(0.2 * top, top, 9)
    rows = []
    for g in grid:
        lo, hi = 0.9 * g, 1.1 * g
        sv = s_sr[(s_steps >= lo) & (s_steps <= hi)]
        av = a_sr[(a_steps >= lo) & (a_steps <= hi)]
        if len(sv) == 0 or len(av) == 0:
            continue
        rows.append(dict(frames=int(g), sharded=float(sv.mean()),
                         anchor=float(av.mean()),
                         gap=float(sv.mean() - av.mean())))
    for r in rows:
        print(f"frames {r['frames']:>8}  sharded {r['sharded']:.3f}  "
              f"anchor {r['anchor']:.3f}  gap {r['gap']:+.3f}")
    worst = max((abs(r["gap"]) for r in rows), default=float("nan"))
    final = rows[-1] if rows else {}
    print(json.dumps(dict(
        matched_frames_top=int(top), worst_abs_gap=round(worst, 3),
        final=final,
        criterion="sharded within 5 points of single-chip at equal frames",
        passes=bool(rows) and abs(final.get("gap", 1.0)) <= 0.05,
    )))


if __name__ == "__main__":
    main()
