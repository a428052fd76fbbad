"""Measure the scripted BRANCHED expert's grasp rate on the BDQ config.

The BDQ run seeds 50k demo frames through scripted.scripted_branched_action
(trainer.seed_demos); if the discretized (8-bins-per-branch) expert can't
grasp, demo seeding is dead weight. Obs pipeline is stripped (no encoder)
— the expert reads sim state, so physics/grasp fidelity is unchanged.

Usage: python scripts_dev/probe_branched_expert.py [--lam 0.0] [--envs 64]
"""
import sys, os
sys.path.insert(0, '/root/repo')
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
import argparse
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_platforms", "cpu")
from deep_rl_grasping_tpu.utils import jax_cache
jax_cache.setup()  # CPU runs get a host-fingerprinted cache dir

p = argparse.ArgumentParser()
p.add_argument('--envs', type=int, default=64)
p.add_argument('--steps', type=int, default=300)
p.add_argument('--lam', type=float, default=0.0)
args = p.parse_args()

from deep_rl_grasping_tpu.envs.grasp_env import GraspEnv, BatchedGraspEnv
from deep_rl_grasping_tpu.envs import scripted
from deep_rl_grasping_tpu.utils import config as cfg_util
from deep_rl_grasping_tpu.training.trainer import make_algo

config = cfg_util.load_config('configs/bdq_simplified.yaml')
config['sensor'].pop('encoder_dir', None)   # cheap obs; expert is state-based
env = GraspEnv(config)
# make_algo('BDQ') flips branched decode + pad count the same way training does
make_algo(config, env, 'BDQ')
B = args.envs
benv = BatchedGraspEnv(env, B)
cur = benv.init_curriculum().replace(lam=jnp.asarray(args.lam, jnp.float32))
states, obs = jax.jit(benv.reset)(jax.random.PRNGKey(0), cur)


@jax.jit
def rollout(states, key):
    def body(carry, _):
        states, k, nd, ns = carry
        k, ka = jax.random.split(k)
        keys = jax.random.split(ka, B)
        actions = jax.vmap(
            lambda s, kk: scripted.scripted_branched_action(env, s, kk)
        )(states, keys)
        states, obs, rewards, dones, infos, _ = benv.step(states, actions, cur)
        return (states, k, nd + dones.sum(), ns + (dones & infos['is_success']).sum()), None

    (states, _, nd, ns), _ = jax.lax.scan(
        body, (states, key, jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32)),
        None, length=args.steps)
    return nd, ns


nd, ns = rollout(states, jax.random.PRNGKey(1))
nd, ns = int(nd), int(ns)
print(f"lam={args.lam}: {ns}/{nd} episodes succeeded "
      f"({100.0 * ns / max(nd, 1):.1f}%)", flush=True)
