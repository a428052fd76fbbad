"""Diagnose the scripted expert's lambda=0 grasp rate on the flagship env.

Categorizes each finished episode:
  success           — lifted
  fail_never_closed — never triggered a close (navigation failure)
  fail_no_detect    — closed but finger-stall detection never fired (missed)
  fail_dropped      — was detected holding at some point, then lost it
"""
import sys, os
sys.path.insert(0, '/root/repo')
import argparse
import jax, jax.numpy as jnp, numpy as np
from deep_rl_grasping_tpu.utils import jax_cache
jax_cache.setup()  # CPU runs get a host-fingerprinted cache dir

p = argparse.ArgumentParser()
p.add_argument('--noise', type=float, default=0.1)
p.add_argument('--p_random', type=float, default=0.1)
p.add_argument('--envs', type=int, default=256)
p.add_argument('--steps', type=int, default=300)
p.add_argument('--config', type=str, default='configs/sac_full_flagship.yaml')
p.add_argument('--lam', type=float, default=0.0)
args = p.parse_args()

from deep_rl_grasping_tpu.envs.grasp_env import GraspEnv, BatchedGraspEnv
from deep_rl_grasping_tpu.envs import scripted
from deep_rl_grasping_tpu.utils import config as cfg_util

config = cfg_util.load_config(args.config)
env = GraspEnv(config)
B = args.envs
benv = BatchedGraspEnv(env, B)
cur = benv.init_curriculum()
cur = cur.replace(lam=jnp.asarray(args.lam, jnp.float32))
key = jax.random.PRNGKey(0)
states, obs = benv.reset(key, cur)

def run(states, key, NOISE, PRAND):
    def body(carry, _):
        states, k, closed_ever, det_ever = carry
        k, ka = jax.random.split(k)
        keys = jax.random.split(ka, B)
        actions = jax.vmap(
            lambda s, kk: scripted.scripted_full_action(
                env, s, kk, noise=NOISE, p_random=PRAND)
        )(states, keys)
        states, obs, rewards, dones, infos, _ = benv.step(states, actions, cur)
        # latches on the post-step state; done envs were auto-reset so their
        # info reflects the finished episode while the state is fresh.
        now_closed = states.sim.gripper.gripper_close
        now_det = jax.vmap(env.object_detected)(states.sim)
        closed_ever = closed_ever | now_closed
        det_ever = det_ever | now_det
        succ = dones & infos['is_success']
        failed = dones & ~infos['is_success']
        f_nc = failed & ~closed_ever
        f_nd = failed & closed_ever & ~det_ever
        f_dr = failed & det_ever
        out = (succ.sum(), f_nc.sum(), f_nd.sum(), f_dr.sum(),
               jnp.where(dones, infos['episode_step'], 0).sum())
        closed_ever = jnp.where(dones, now_closed, closed_ever)
        det_ever = jnp.where(dones, now_det, det_ever)
        return (states, k, closed_ever, det_ever), out

    init = (states, key, jnp.zeros(B, bool), jnp.zeros(B, bool))
    _, outs = jax.lax.scan(body, init, None, length=args.steps)
    return jax.tree.map(lambda x: x.sum(), outs)


run_jit = jax.jit(run)
grid = [(args.noise, args.p_random)]
if os.environ.get('PROBE_GRID'):
    grid = [tuple(map(float, pair.split(',')))
            for pair in os.environ['PROBE_GRID'].split(';')]
for i, (nz, pr) in enumerate(grid):
    succ, f_nc, f_nd, f_dr, steps = run_jit(
        states, jax.random.PRNGKey(1 + i),
        jnp.asarray(nz, jnp.float32), jnp.asarray(pr, jnp.float32))
    succ, f_nc, f_nd, f_dr = int(succ), int(f_nc), int(f_nd), int(f_dr)
    tot = succ + f_nc + f_nd + f_dr
    print(f"noise={nz} p_random={pr} lam={args.lam} episodes={tot}")
    print(f"  success:            {succ:5d}  ({100.0*succ/max(tot,1):.1f}%)")
    print(f"  fail_never_closed:  {f_nc:5d}  ({100.0*f_nc/max(tot,1):.1f}%)")
    print(f"  fail_no_detect:     {f_nd:5d}  ({100.0*f_nd/max(tot,1):.1f}%)")
    print(f"  fail_dropped:       {f_dr:5d}  ({100.0*f_dr/max(tot,1):.1f}%)")
    print(f"  mean ep len: {float(steps)/max(tot,1):.1f}", flush=True)
