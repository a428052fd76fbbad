"""On-policy training loop (PPO / TRPO).

The reference runs PPO2/TRPO through stable-baselines' Python runner one
frame at a time (sb_helper.py:129-156). Here a rollout of `n_steps` x B envs
is collected by a device-side scan, GAE is computed in the same program, and
the policy update (minibatched PPO epochs / the full TRPO CG + line search)
runs back-to-back without leaving the chip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from deep_rl_grasping_tpu.algos import normalize as norm_mod
from deep_rl_grasping_tpu.algos.ppo import PPO
from deep_rl_grasping_tpu.algos.trpo import TRPO
from deep_rl_grasping_tpu.envs import curriculum as curr_mod
from deep_rl_grasping_tpu.envs.grasp_env import BatchedGraspEnv, GraspEnv
from deep_rl_grasping_tpu.training.trainer import EvalMixin, _maybe_load_encoder
from deep_rl_grasping_tpu.utils import config as cfg_util


@struct.dataclass
class OnPolicyLoopState:
    env_states: object
    obs: jnp.ndarray
    curriculum: curr_mod.CurriculumState
    algo_state: object
    normalizer: norm_mod.NormalizerState
    key: jnp.ndarray
    global_step: jnp.ndarray
    ep_count: jnp.ndarray
    ep_success_sum: jnp.ndarray
    ep_return_sum: jnp.ndarray


class OnPolicyTrainer(EvalMixin):
    def __init__(self, config, algo="PPO", num_envs=None, pmean_axis=None):
        self.config = cfg_util.load_config(config)
        self.algo_name = algo.upper()
        self.pmean_axis = pmean_axis
        self.env = GraspEnv(self.config, encoder_fn=_maybe_load_encoder(self.config))
        self.num_envs = int(num_envs or self.config["tpu"].get("num_envs", 128))
        self.benv = BatchedGraspEnv(self.env, self.num_envs, pmean_axis=pmean_axis)
        self.normalize = bool(self.config.get("normalize", False))
        cls = {"PPO": PPO, "TRPO": TRPO}[self.algo_name]
        self.algo = cls(
            self.env.obs_shape,
            self.env.num_actions if self.env.discrete else self.env.action_dim,
            self.config,
            discrete=self.env.discrete,
            pmean_axis=pmean_axis,
        )

    def init_state(self, key) -> OnPolicyLoopState:
        k_env, k_algo, k_loop = jax.random.split(key, 3)
        curriculum = self.benv.init_curriculum()
        env_states, obs = self.benv.reset(k_env, curriculum)
        return OnPolicyLoopState(
            env_states=env_states,
            obs=obs,
            curriculum=curriculum,
            algo_state=self.algo.init(k_algo),
            normalizer=norm_mod.NormalizerState.init(
                self.env.obs_shape, self.num_envs
            ),
            key=k_loop,
            global_step=jnp.asarray(0, jnp.int32),
            ep_count=jnp.asarray(0, jnp.int32),
            ep_success_sum=jnp.asarray(0.0, jnp.float32),
            ep_return_sum=jnp.asarray(0.0, jnp.float32),
        )

    def _norm_obs(self, normalizer, obs):
        return norm_mod.normalize_obs(normalizer, obs) if self.normalize else obs

    def _act(self, algo_state, obs, key, deterministic=False):
        """Policy action only (EvalMixin hook; the rollout uses algo.act's
        full (action, logp, value) triple)."""
        action, _, _ = self.algo.act(algo_state.params, obs, key, deterministic)
        return action

    def train_iteration(self, state: OnPolicyLoopState):
        """Collect n_steps x B frames, compute GAE, update the policy."""
        T = self.algo.n_steps

        def rollout_body(carry, _):
            env_states, obs, cur, normalizer, k = carry
            k, ka = jax.random.split(k)
            obs_in = self._norm_obs(normalizer, obs)
            action, logp, value = self.algo.act(
                state.algo_state.params, obs_in, ka
            )
            env_states, next_obs, reward, done, info, cur = self.benv.step(
                env_states, action, cur
            )
            normalizer = norm_mod.update_batch(
                normalizer, obs, reward, done,
                gamma=self.algo.gamma, training=self.normalize,
            )
            r_out = (
                norm_mod.normalize_reward(normalizer, reward)
                if self.normalize
                else reward
            )
            out = dict(
                obs=obs_in, action=action, logp=logp, value=value,
                reward=r_out, done=done,
                success=(done & info["is_success"]),
                ep_ret=jnp.where(done, info["episode_return"], 0.0),
            )
            return (env_states, next_obs, cur, normalizer, k), out

        key, k_roll, k_upd = jax.random.split(state.key, 3)
        (env_states, obs, cur, normalizer, _), traj = jax.lax.scan(
            rollout_body,
            (state.env_states, state.obs, state.curriculum, state.normalizer, k_roll),
            None,
            length=T,
        )
        last_value = self.algo.value(
            state.algo_state.params, self._norm_obs(normalizer, obs)
        )
        adv, ret = self.algo.gae(
            traj["reward"], traj["value"], traj["done"], last_value
        )
        flat = lambda x: x.reshape((-1,) + x.shape[2:])
        batch = dict(
            obs=flat(traj["obs"]),
            action=flat(traj["action"]),
            logp=flat(traj["logp"]),
            value=flat(traj["value"]),
            advantage=flat(adv),
            **{"return": flat(ret)},
        )

        algo_state = state.algo_state
        if self.algo_name == "PPO":
            N = batch["obs"].shape[0]
            mb = N // self.algo.n_minibatches

            def epoch_body(carry, k_epoch):
                algo_state = carry
                perm = jax.random.permutation(k_epoch, N)

                def mb_body(algo_state, i):
                    idx = jax.lax.dynamic_slice_in_dim(perm, i * mb, mb)
                    sub = {k: v[idx] for k, v in batch.items()}
                    algo_state, m = self.algo.update(algo_state, sub, None)
                    return algo_state, m

                algo_state, ms = jax.lax.scan(
                    mb_body, algo_state, jnp.arange(self.algo.n_minibatches)
                )
                return algo_state, jax.tree.map(lambda x: x[-1], ms)

            algo_state, metrics = jax.lax.scan(
                epoch_body, algo_state,
                jax.random.split(k_upd, self.algo.n_epochs),
            )
            metrics = jax.tree.map(lambda x: x[-1], metrics)
        else:  # TRPO: one natural-gradient step on the full rollout
            algo_state, metrics = self.algo.update(algo_state, batch, k_upd)

        new_state = OnPolicyLoopState(
            env_states=env_states,
            obs=obs,
            curriculum=cur,
            algo_state=algo_state,
            normalizer=normalizer,
            key=key,
            global_step=state.global_step + T * self.num_envs,
            ep_count=state.ep_count + traj["done"].sum(dtype=jnp.int32),
            ep_success_sum=state.ep_success_sum
            + traj["success"].sum(dtype=jnp.float32),
            ep_return_sum=state.ep_return_sum + traj["ep_ret"].sum(),
        )
        return new_state, metrics
