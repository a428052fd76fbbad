"""Trained-policy re-eval across physics schedules (VERDICT r3 weak #6).

The dt80it4pad6 schedule was fidelity-gated on the SCRIPTED expert's grasp
rate (scripts_dev/physics_cost_sweep.py); a learned policy exploits the
contact physics differently, so docs/PHYSICS_SCHEDULE.md promises a
100-episode protocol re-eval of a TRAINED policy under both schedules
(out/sched_parity/). This script produces that artifact: it restores a
checkpointed policy and runs the fixed-seed protocol twice —

  * "trained"  — the tpu schedule keys the policy was trained under,
  * "reverted" — the code-default reference-fidelity schedule
                 (dt=1/240, 48 gripper substeps; utils/config.py:78-83,
                 matching the reference's bullet defaults at
                 simulation.py:37 / robot.py:248-270)

— at both the protocol difficulty (lambda=1) and the checkpoint's own
training lambda. Pass/fail gate: success under the reverted schedule
within --tol (default 0.10) of the trained schedule at each lambda.

Usage:
  python scripts_dev/sched_parity_eval.py --model out/sac_table_clearing \
      [--episodes 100] [--out out/sched_parity] [--tol 0.1]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCHED_KEYS = ("dt", "gripper_substeps", "move_substeps",
              "solver_iterations", "pad_inner_iterations", "block_e")


def build_and_eval(config, model_dir, episodes, lam):
    import jax
    from deep_rl_grasping_tpu.training import callbacks as cb
    from deep_rl_grasping_tpu.training.train import _bundle
    from deep_rl_grasping_tpu.training.trainer import Trainer

    algo = config.get("algorithm", "sac").upper()
    # Eval never samples the replay ring; shrink it like train.run() does.
    config.setdefault(algo, {})["buffer_size"] = 2048
    tpu_blk = config.setdefault("tpu", {})
    if tpu_blk.get("demo_frames"):
        tpu_blk["demo_frames"] = 2048
        tpu_blk["demo_capacity"] = 2048
    trainer = Trainer(config, algo=algo)
    state = jax.jit(trainer.init_state)(jax.random.PRNGKey(0))
    ckpt = cb.Checkpointer(model_dir)
    bundle = ckpt.restore_best(_bundle(state))
    normalizer = state.normalizer.replace(
        obs_rms=bundle["obs_rms"], ret_rms=bundle["ret_rms"])
    train_lam = float(bundle["curriculum"].lam) if "curriculum" in bundle else None
    res = trainer.evaluate(bundle["algo_state"], normalizer,
                           n_episodes=episodes, validate=True, lam=lam)
    return {k: float(v) for k, v in res.items()}, train_lam


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--episodes", type=int, default=100)
    ap.add_argument("--out", default="out/sched_parity")
    ap.add_argument("--tol", type=float, default=0.10)
    args = ap.parse_args()

    from deep_rl_grasping_tpu.utils import config as cfg_util

    os.makedirs(args.out, exist_ok=True)
    base = cfg_util.load_config(os.path.join(args.model, "config.yaml"))
    trained_sched = {k: base.get("tpu", {}).get(k) for k in SCHED_KEYS
                     if k in base.get("tpu", {})}

    results = {"model": args.model, "episodes": args.episodes,
               "trained_schedule": trained_sched, "runs": {}}

    def load(variant):
        config = cfg_util.load_config(os.path.join(args.model, "config.yaml"))
        if variant == "reverted":
            for k in SCHED_KEYS:
                config.get("tpu", {}).pop(k, None)
        return config

    # First run also discovers the checkpoint's training lambda.
    res, train_lam = build_and_eval(load("trained"), args.model,
                                    args.episodes, 1.0)
    results["runs"]["trained@lam1"] = res
    print(f"trained@lam1: success {res['success_rate']:.3f}", flush=True)

    lams = [1.0]
    if train_lam is not None and round(train_lam, 4) < 1.0:
        lams.append(round(train_lam, 4))
    for variant in ("trained", "reverted"):
        for lam in lams:
            key = f"{variant}@lam{lam:g}"
            if key in results["runs"]:
                continue
            res, _ = build_and_eval(load(variant), args.model,
                                    args.episodes, lam)
            results["runs"][key] = res
            print(f"{key}: success {res['success_rate']:.3f} "
                  f"return {res['mean_return']:.1f} len {res['mean_length']:.1f}",
                  flush=True)

    results["train_lambda"] = train_lam
    gaps = {}
    for lam_tag in {k.split("@")[1] for k in results["runs"]}:
        a = results["runs"].get(f"trained@{lam_tag}")
        b = results["runs"].get(f"reverted@{lam_tag}")
        if a and b:
            gaps[lam_tag] = round(a["success_rate"] - b["success_rate"], 4)
    results["success_gap_trained_minus_reverted"] = gaps
    results["pass"] = all(abs(g) <= args.tol for g in gaps.values())
    with open(os.path.join(args.out, "parity.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({"sched_parity_pass": results["pass"], "gaps": gaps}))


if __name__ == "__main__":
    main()
