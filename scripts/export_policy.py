"""Export a trained run's eval-essential weights to a git-committable
bundle (see utils/policy_io.py for why; VERDICT r4 weak #7).

  python scripts/export_policy.py out/sac_full_flagship_r5 \
      [--out trained/sac_full_flagship_r5] [--latest]

Reads the best-model Orbax checkpoint (fallback: latest), writes
<out>/policy.npz + config.yaml + PROVENANCE.md. Re-evaluate with:

  python -m deep_rl_grasping_tpu.training.train run --npz <out>
"""

import argparse
import os
import shutil
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--out", default=None)
    ap.add_argument("--latest", action="store_true",
                    help="export the latest checkpoint instead of best")
    args = ap.parse_args(argv)

    from deep_rl_grasping_tpu.training import callbacks as cb
    from deep_rl_grasping_tpu.training.train import _bundle
    from deep_rl_grasping_tpu.utils import config as cfg_util
    from deep_rl_grasping_tpu.utils import policy_io

    run_dir = args.run_dir.rstrip("/")
    out_dir = args.out or os.path.join("trained", os.path.basename(run_dir))
    config = cfg_util.load_config(os.path.join(run_dir, "config.yaml"))
    algo = config.get("algorithm", "sac").upper()

    if algo in ("PPO", "TRPO"):
        from deep_rl_grasping_tpu.training.onpolicy import OnPolicyTrainer

        trainer = OnPolicyTrainer(config, algo=algo)
    else:
        from deep_rl_grasping_tpu.training.trainer import Trainer

        # Same ring shrink as train.py run(): eval/export never samples it.
        config.setdefault(algo, {})["buffer_size"] = 2048
        tpu_blk = config.setdefault("tpu", {})
        if tpu_blk.get("demo_frames"):
            tpu_blk["demo_frames"] = 2048
            tpu_blk["demo_capacity"] = 2048
        trainer = Trainer(config, algo=algo)

    state = jax.jit(trainer.init_state)(jax.random.PRNGKey(0))
    ckpt = cb.Checkpointer(run_dir)
    source = "best"
    if args.latest:
        bundle, step = ckpt.restore(_bundle(state)), ckpt.latest_step()
        source = "latest"
    else:
        try:
            bundle = ckpt.restore_best(_bundle(state))
            step = None  # best manager's step is the save-time frame count
        except FileNotFoundError:
            print("no best_model checkpoint — falling back to latest")
            bundle, step = ckpt.restore(_bundle(state)), ckpt.latest_step()
            source = "latest"

    algo_state = bundle["algo_state"]
    params_field = (
        "actor_params" if hasattr(algo_state, "actor_params") else "params"
    )
    policy_params = getattr(algo_state, params_field)
    meta = dict(
        algo=algo,
        params_field=params_field,
        source=source,
        source_dir=os.path.abspath(run_dir),
        checkpoint_step=int(step) if step is not None else None,
    )
    path = policy_io.save_policy(
        out_dir, policy_params, bundle["obs_rms"], bundle["ret_rms"], meta
    )
    shutil.copy(os.path.join(run_dir, "config.yaml"),
                os.path.join(out_dir, "config.yaml"))
    lines = [
        f"# {os.path.basename(out_dir)}",
        "",
        f"- exported from `{run_dir}` ({source} checkpoint"
        + (f", step {step}" if step is not None else "") + ")",
        f"- algo: {algo}; bundle: `policy.npz` "
        f"({os.path.getsize(path) / 1e6:.1f} MB)",
        "- re-evaluate: `python -m deep_rl_grasping_tpu.training.train run "
        f"--npz {out_dir}` (add `-t` for the test split)",
    ]
    for split in ("val", "test"):
        proto = os.path.join(run_dir, f"protocol_{split}.log")
        if os.path.exists(proto):
            with open(proto) as f:
                for ln in f:
                    if "success" in ln.lower():
                        lines.append(
                            f"- protocol {split} (at export): {ln.strip()}"
                        )
    with open(os.path.join(out_dir, "PROVENANCE.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {path} ({os.path.getsize(path) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
