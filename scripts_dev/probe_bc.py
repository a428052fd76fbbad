"""Behavior-cloning ceiling probe: can the SAC actor architecture reproduce
the scripted expert from depth observations alone?

Collects expert frames with Trainer.seed_demos, supervised-trains ONLY the
actor (tanh-mean MSE to the expert action), then evaluates deterministically.
  BC success >= 90%  -> perception + architecture suffice; flagship gap is RL
                        dynamics (add BC/demo auxiliary loss to SAC).
  BC success ~ 70%   -> the depth obs itself is the ceiling (partial
                        observability / render issue).
"""
import sys, os
sys.path.insert(0, '/root/repo')
import argparse
import jax, jax.numpy as jnp, numpy as np
import optax
from deep_rl_grasping_tpu.utils import jax_cache
jax_cache.setup()  # CPU runs get a host-fingerprinted cache dir

p = argparse.ArgumentParser()
p.add_argument('--config', type=str, default='configs/sac_full_flagship.yaml')
p.add_argument('--frames', type=int, default=100000)
p.add_argument('--bc_steps', type=int, default=20000)
p.add_argument('--batch', type=int, default=256)
p.add_argument('--lr', type=float, default=3e-4)
p.add_argument('--eval_lam', type=float, default=0.125)
p.add_argument('--layers', type=str, default=None,
               help='comma-separated MLP widths overriding SAC.layers '
                    '(e.g. 256,256) — capacity probe for latent obs')
args = p.parse_args()

from deep_rl_grasping_tpu.training.trainer import Trainer
from deep_rl_grasping_tpu.algos import normalize as norm_mod, replay as replay_mod
from deep_rl_grasping_tpu.utils import config as cfg_util

config = cfg_util.load_config(args.config)
if args.layers:
    config['SAC']['layers'] = [int(x) for x in args.layers.split(',')]
trainer = Trainer(config, algo='SAC')
state = jax.jit(trainer.init_state)(jax.random.PRNGKey(0))
state, nd, ns = jax.jit(lambda s: trainer.seed_demos(s, args.frames))(state)
print(f"demos: {int(nd)} episodes, {100*float(ns)/max(float(nd),1):.1f}% success",
      flush=True)

algo = trainer.algo
actor_params = state.algo_state.actor_params
tx = optax.adam(args.lr)
opt = tx.init(actor_params)
buffer, normalizer = state.buffer, state.normalizer

def bc_step(carry, k):
    params, opt = carry
    ks, _ = jax.random.split(k)
    batch = replay_mod.sample(buffer, ks, args.batch)
    obs = norm_mod.normalize_obs(normalizer, batch['obs'])
    def loss_fn(p):
        mean, log_std = algo.actor.apply({'params': p}, obs)
        a = jnp.tanh(mean)
        return jnp.mean((a - batch['action'])**2)
    loss, grads = jax.value_and_grad(loss_fn)(params)
    up, opt = tx.update(grads, opt, params)
    params = optax.apply_updates(params, up)
    return (params, opt), loss

@jax.jit
def bc_train(params, opt, key):
    keys = jax.random.split(key, args.bc_steps)
    (params, opt), losses = jax.lax.scan(bc_step, (params, opt), keys)
    return params, opt, losses

actor_params, opt, losses = bc_train(actor_params, opt, jax.random.PRNGKey(1))
losses = np.asarray(losses)
print(f"BC loss: start {losses[:100].mean():.4f} -> end {losses[-100:].mean():.4f}",
      flush=True)

algo_state = state.algo_state.replace(actor_params=actor_params)

# deterministic eval at the requested lambda via the behavior classifier
from deep_rl_grasping_tpu.envs.grasp_env import BatchedGraspEnv
env = trainer.env
B = 256
benv = BatchedGraspEnv(env, B)
cur = benv.init_curriculum().replace(lam=jnp.asarray(args.eval_lam, jnp.float32))
states, obs = benv.reset(jax.random.PRNGKey(2), cur)

def rollout(states, obs, key):
    def body(carry, _):
        states, obs, k, n_done, n_succ = carry
        k, ka = jax.random.split(k)
        obs_in = norm_mod.normalize_obs(normalizer, obs)
        actions = algo.act(algo_state.actor_params, obs_in, ka, True)
        states, obs, r, dones, infos, _ = benv.step(states, actions, cur)
        return (states, obs, k,
                n_done + dones.sum(dtype=jnp.int32),
                n_succ + (dones & infos['is_success']).sum(dtype=jnp.int32)), None
    (states, obs, _, n_done, n_succ), _ = jax.lax.scan(
        body, (states, obs, key, jnp.asarray(0, jnp.int32),
               jnp.asarray(0, jnp.int32)), None, length=300)
    return n_done, n_succ

n_done, n_succ = jax.jit(rollout)(states, obs, jax.random.PRNGKey(3))
n_done, n_succ = int(n_done), int(n_succ)
print(f"BC policy @ lam={args.eval_lam}: {n_succ}/{n_done} = "
      f"{100.0*n_succ/max(n_done,1):.1f}% success", flush=True)
