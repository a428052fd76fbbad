"""Per-affordance-class success breakdown of a trained checkpoint.

Round-5 diagnostic for the five-class object library: evaluates the best
(or latest) checkpoint at lambda=1 on the validation split restricted to
ONE shape class at a time (blob/rod/plate/bent/block), so failures
localize to geometry classes instead of averaging out. Used to test the
head-capacity hypothesis (TRAINING_NOTES r5: [64,64] depth heads rot on
the yaw-sensitive rod/plate classes).

Usage:
  python scripts_dev/probe_class_success.py --model out/sac_full_flagship_r5 \
      [--episodes 64] [--latest]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, "/root/repo")

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np

from deep_rl_grasping_tpu.utils import jax_cache

jax_cache.setup()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--episodes", type=int, default=64)
    ap.add_argument("--latest", action="store_true")
    ap.add_argument("--test", action="store_true")
    ap.add_argument("--expert", action="store_true",
                    help="roll the scripted expert instead of the policy "
                         "(isolates env/geometry artifacts from policy gaps)")
    args = ap.parse_args()

    from deep_rl_grasping_tpu.algos import normalize as norm_mod
    from deep_rl_grasping_tpu.envs.grasp_env import BatchedGraspEnv, GraspEnv
    from deep_rl_grasping_tpu.training import callbacks as cb
    from deep_rl_grasping_tpu.training.train import _bundle
    from deep_rl_grasping_tpu.training.trainer import Trainer, _maybe_load_encoder
    from deep_rl_grasping_tpu.utils import config as cfg_util

    config = cfg_util.load_config(os.path.join(args.model, "config.yaml"))
    algo = config.get("algorithm", "sac").upper()
    config.setdefault(algo, {})["buffer_size"] = 2048
    tpu_blk = config.setdefault("tpu", {})
    if tpu_blk.get("demo_frames"):
        tpu_blk["demo_frames"] = 2048
        tpu_blk["demo_capacity"] = 2048
    trainer = Trainer(config, algo=algo)
    state = jax.jit(trainer.init_state)(jax.random.PRNGKey(0))
    ckpt = cb.Checkpointer(args.model)
    if args.latest:
        bundle = ckpt.restore(_bundle(state))
    else:
        bundle = ckpt.restore_best(_bundle(state))
    algo_state = bundle["algo_state"]
    normalizer = state.normalizer.replace(
        obs_rms=bundle["obs_rms"], ret_rms=bundle["ret_rms"]
    )

    env = GraspEnv(config, evaluate=True, validate=not args.test,
                   test=args.test, encoder_fn=_maybe_load_encoder(config))
    env.branched_actions = trainer.env.branched_actions
    env.actuator_spec = trainer.env.actuator_spec
    lib = env.library
    split_ids = np.asarray(env.type_ids)
    classes = sorted(set(lib.shape_class[split_ids].tolist()))
    B = args.episodes

    def run_class(ids):
        env.type_ids = jnp.asarray(ids, jnp.int32)
        benv = BatchedGraspEnv(env, B)
        cur = benv.init_curriculum().replace(lam=jnp.asarray(1.0, jnp.float32))
        states, obs = jax.jit(benv.reset)(jax.random.PRNGKey(1), cur)

        @jax.jit
        def rollout(states, obs, key):
            def cond(c):
                _, _, done_once, _, _, t = c
                return (~jnp.all(done_once)) & (t < env.time_horizon)

            def body(c):
                states, obs, done_once, succ, k, t = c
                k, ka = jax.random.split(k)
                if args.expert:
                    from deep_rl_grasping_tpu.envs import scripted

                    keys = jax.random.split(ka, B)
                    acts = jax.vmap(
                        lambda s, kk: scripted.scripted_full_action(env, s, kk)
                    )(states, keys)
                else:
                    obs_in = (norm_mod.normalize_obs(normalizer, obs)
                              if trainer.normalize else obs)
                    acts = trainer._act(algo_state, obs_in, ka,
                                        deterministic=True)
                states, obs, r, dones, infos, _ = benv.step(states, acts, cur)
                first = dones & ~done_once
                succ = jnp.where(first, infos["is_success"], succ)
                return (states, obs, done_once | dones, succ, k, t + 1)

            init = (states, obs, jnp.zeros(B, bool), jnp.zeros(B, bool),
                    key, jnp.asarray(0, jnp.int32))
            _, _, done_once, succ, _, _ = jax.lax.while_loop(cond, body, init)
            return done_once.sum(), (done_once & succ).sum()

        nd, ns = rollout(states, obs, jax.random.PRNGKey(0))
        return int(ns), int(nd)

    out = {}
    for cls in classes:
        ids = split_ids[lib.shape_class[split_ids] == cls]
        ns, nd = run_class(ids)
        out[cls] = dict(success=round(ns / max(nd, 1), 3), episodes=nd)
        print(f"{cls:<8} {ns}/{nd} = {ns / max(nd, 1):.3f}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
