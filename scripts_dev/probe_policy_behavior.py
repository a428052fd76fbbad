"""Behavioral diagnosis of a trained SAC checkpoint on the flagship env.

Loads the learner bundle from a run dir, rolls the policy out at a given
lambda, and classifies every finished episode:
  success           — lifted
  fail_never_closed — never triggered a close (navigation failure)
  fail_no_detect    — closed but finger-stall detection never fired (missed)
  fail_dropped      — was detected holding at some point, then lost it
plus navigation stats: xy distance from gripper to the nearest alive object
at the moment the close latch first fires, and the episode-end height.
"""
import sys, os
sys.path.insert(0, '/root/repo')
import argparse
import jax, jax.numpy as jnp, numpy as np
from deep_rl_grasping_tpu.utils import jax_cache
jax_cache.setup()  # CPU runs get a host-fingerprinted cache dir

p = argparse.ArgumentParser()
p.add_argument('--model_dir', type=str, default='out/sac_full_flagship_r3')
p.add_argument('--envs', type=int, default=256)
p.add_argument('--steps', type=int, default=300)
p.add_argument('--lam', type=float, default=0.125)
p.add_argument('--stochastic', action='store_true')
args = p.parse_args()

from deep_rl_grasping_tpu.envs.grasp_env import GraspEnv, BatchedGraspEnv
from deep_rl_grasping_tpu.training.trainer import Trainer
from deep_rl_grasping_tpu.training import callbacks as cb
from deep_rl_grasping_tpu.training.train import _bundle
from deep_rl_grasping_tpu.algos import normalize as norm_mod
from deep_rl_grasping_tpu.sim import physics
from deep_rl_grasping_tpu.utils import config as cfg_util

config = cfg_util.load_config(os.path.join(args.model_dir, 'config.yaml'))
trainer = Trainer(config, algo=config.get('algorithm', 'sac').upper())
state = jax.jit(trainer.init_state)(jax.random.PRNGKey(0))
ckpt = cb.Checkpointer(args.model_dir)
bundle = ckpt.restore(_bundle(state))
algo_state = bundle['algo_state']
normalizer = state.normalizer.replace(
    obs_rms=bundle['obs_rms'], ret_rms=bundle['ret_rms'])
print('restored step', int(np.asarray(algo_state.step)),
      'alpha', float(np.exp(np.asarray(algo_state.log_alpha))))

env = trainer.env
B = args.envs
benv = BatchedGraspEnv(env, B)
cur = benv.init_curriculum()
cur = cur.replace(lam=jnp.asarray(args.lam, jnp.float32))
states, obs = benv.reset(jax.random.PRNGKey(0), cur)
det = not args.stochastic

def nearest_xy_dist(sim):
    g = sim.gripper
    alive = sim.objects.alive
    d = jnp.linalg.norm(sim.objects.pos[:, :2] - g.q[:2][None], axis=1)
    return jnp.min(jnp.where(alive, d, 1e9))

def run(states, obs, key):
    def body(carry, _):
        states, obs, k, closed_ever, det_ever, close_dist = carry
        k, ka = jax.random.split(k)
        obs_in = (norm_mod.normalize_obs(normalizer, obs)
                  if trainer.normalize else obs)
        actions = trainer._act(algo_state, obs_in, ka, deterministic=det,
                               frames=jnp.asarray(10**9, jnp.int32))
        states, obs, rewards, dones, infos, _ = benv.step(states, actions, cur)
        now_closed = states.sim.gripper.gripper_close
        now_det = jax.vmap(env.object_detected)(states.sim)
        just_closed = now_closed & ~closed_ever
        nd = jax.vmap(nearest_xy_dist)(states.sim)
        close_dist = jnp.where(just_closed, nd, close_dist)
        closed_ever = closed_ever | now_closed
        det_ever = det_ever | now_det
        succ = dones & infos['is_success']
        failed = dones & ~infos['is_success']
        f_nc = failed & ~closed_ever
        f_nd = failed & closed_ever & ~det_ever
        f_dr = failed & det_ever
        # histogram of close-distance for failures that closed
        cd = jnp.where(failed & closed_ever, close_dist, -1.0)
        out = (succ.sum(), f_nc.sum(), f_nd.sum(), f_dr.sum(),
               jnp.where(dones, infos['episode_step'], 0).sum(),
               # close-dist stats over this step's failures
               jnp.where(cd >= 0, cd, 0.0).sum(), (cd >= 0).sum(),
               (cd > 0.03).sum(),
               # success close dist
               jnp.where(succ & closed_ever, close_dist, 0.0).sum(),
               (succ & closed_ever).sum())
        closed_ever = jnp.where(dones, now_closed, closed_ever)
        det_ever = jnp.where(dones, now_det, det_ever)
        close_dist = jnp.where(dones, 1e9, close_dist)
        return (states, obs, k, closed_ever, det_ever, close_dist), out

    init = (states, obs, key, jnp.zeros(B, bool), jnp.zeros(B, bool),
            jnp.full((B,), 1e9))
    _, outs = jax.lax.scan(body, init, None, length=args.steps)
    return jax.tree.map(lambda x: x.sum(), outs)

res = jax.jit(run)(states, obs, jax.random.PRNGKey(5))
(succ, f_nc, f_nd, f_dr, steps, cd_sum, cd_n, cd_far, scd_sum, scd_n) = [
    float(x) for x in res]
tot = succ + f_nc + f_nd + f_dr
print(f"lam={args.lam} det={det} episodes={int(tot)}")
print(f"  success:            {int(succ):5d}  ({100*succ/max(tot,1):.1f}%)")
print(f"  fail_never_closed:  {int(f_nc):5d}  ({100*f_nc/max(tot,1):.1f}%)")
print(f"  fail_no_detect:     {int(f_nd):5d}  ({100*f_nd/max(tot,1):.1f}%)")
print(f"  fail_dropped:       {int(f_dr):5d}  ({100*f_dr/max(tot,1):.1f}%)")
print(f"  mean ep len: {steps/max(tot,1):.1f}")
print(f"  failures-that-closed: mean xy dist at close "
      f"{cd_sum/max(cd_n,1)*1000:.1f} mm  (n={int(cd_n)}, "
      f">3cm: {int(cd_far)})")
print(f"  successes: mean xy dist at close {scd_sum/max(scd_n,1)*1000:.1f} mm"
      f" (n={int(scd_n)})", flush=True)
