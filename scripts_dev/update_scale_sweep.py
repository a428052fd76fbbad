"""On-chip sweep of tpu.update_batch_scale for the flagship training
regime (VERDICT r4 #9: the collect/train gap).

Measures bench.bench_train at several update-batch scales. Constant
sampled-transitions-per-env-frame at every point (the reference's replay
ratio currency); scale K = K fewer, K-times-larger gradient steps. The
achievable ceiling is bounded by the update stream's arithmetic — see
docs/ROOFLINE.md for the math.

Usage: python scripts_dev/update_scale_sweep.py [--iters 4]
"""

import argparse
import json
import sys

sys.path.insert(0, "/root/repo")

ap = argparse.ArgumentParser()
ap.add_argument("--iters", type=int, default=4)
ap.add_argument("--scales", default="1,16,32,64,128")
args = ap.parse_args()

import bench

for scale in [int(s) for s in args.scales.split(",")]:
    try:
        rate = bench.bench_train(args.iters, update_batch_scale=scale)
        print(json.dumps({"update_batch_scale": scale,
                          "train_steps_per_s": round(rate, 1)}), flush=True)
    except Exception as e:  # noqa: BLE001 — record and keep sweeping
        print(json.dumps({"update_batch_scale": scale, "error": repr(e)}),
              flush=True)
