"""Headline benchmark: env throughput (physics + 64x64 depth render + SAC act)
on the flagship full-grasping task, batched on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference steps the same task at ~11.2 env steps/s on CPU
(BASELINE.md: SAC_depth_1mbuffer monitor log, step+render+train).
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_grasp_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_STEPS_PER_S = 11.2


def main():
    num_envs = int(os.environ.get("BENCH_NUM_ENVS", "1024"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))

    from deep_rl_grasping_tpu.envs import curriculum as curr_mod
    from deep_rl_grasping_tpu.envs.grasp_env import BatchedGraspEnv, GraspEnv
    from deep_rl_grasping_tpu.algos.sac import SAC
    from deep_rl_grasping_tpu.utils import config as cfg_util

    cfg = cfg_util.load_config(os.path.join(os.path.dirname(__file__), "configs", "gripper_grasp.yaml"))
    env = GraspEnv(cfg)
    benv = BatchedGraspEnv(env, num_envs)
    sac = SAC(env.obs_shape, env.action_dim, cfg)

    key = jax.random.PRNGKey(0)
    k_env, k_algo, k_run = jax.random.split(key, 3)
    curriculum = benv.init_curriculum()
    algo_state = sac.init(k_algo)

    @functools.partial(jax.jit, static_argnums=5)
    def rollout(states, obs, curriculum, actor_params, key, n):
        def body(carry, _):
            states, obs, cur, k = carry
            k, ka = jax.random.split(k)
            actions = sac.act(actor_params, obs, ka)
            states, obs, r, d, info, cur = benv.step(states, actions, cur)
            return (states, obs, cur, k), r.sum()

        (states, obs, cur, _), rs = jax.lax.scan(
            body, (states, obs, curriculum, key), None, length=n
        )
        return states, obs, cur, rs.sum()

    states, obs = jax.jit(benv.reset)(k_env, curriculum)
    # warmup/compile
    n_inner = 5
    states, obs, curriculum, _ = rollout(
        states, obs, curriculum, algo_state.actor_params, k_run, n_inner
    )
    jax.block_until_ready(obs)

    t0 = time.perf_counter()
    total = 0
    for i in range(iters):
        states, obs, curriculum, s = rollout(
            states, obs, curriculum, algo_state.actor_params, k_run, n_inner
        )
        total += n_inner * num_envs
    jax.block_until_ready(obs)
    dt = time.perf_counter() - t0
    steps_per_s = total / dt

    print(
        json.dumps(
            {
                "metric": "env_steps_per_s",
                "value": round(steps_per_s, 1),
                "unit": "env steps/s (physics+render+policy, full depth task)",
                "vs_baseline": round(steps_per_s / BASELINE_STEPS_PER_S, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
