"""Training orchestration: the SBPolicy equivalent (sb_helper.py:56-248).

The reference glues a single gym env to stable-baselines' TF1 graphs and
steps them one frame at a time through Python. Here the entire
collect -> store -> sample -> update cycle is one jit-compiled program
stepping `num_envs` environments in parallel on device; the host loop only
handles logging, evaluation cadence, and checkpoints.

Scaling semantics: the reference performs 1 gradient step per env frame
(sb SAC train_freq=1). With B parallel envs one "iteration" produces B
frames and performs `updates_per_step` gradient steps of `batch_size`; the
effective replay ratio is configurable rather than implicitly 64 (see
config `tpu.updates_per_step`).
"""

from __future__ import annotations

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from deep_rl_grasping_tpu.algos import normalize as norm_mod
from deep_rl_grasping_tpu.algos import replay as replay_mod
from deep_rl_grasping_tpu.algos.bdq import BDQ
from deep_rl_grasping_tpu.algos.ddpg import DDPG
from deep_rl_grasping_tpu.algos.dqn import DQN
from deep_rl_grasping_tpu.algos.sac import SAC
from deep_rl_grasping_tpu.envs import curriculum as curr_mod
from deep_rl_grasping_tpu.envs.grasp_env import BatchedGraspEnv, GraspEnv
from deep_rl_grasping_tpu.utils import config as cfg_util


@struct.dataclass
class LoopState:
    env_states: object
    obs: jnp.ndarray
    curriculum: curr_mod.CurriculumState
    buffer: replay_mod.ReplayBuffer
    algo_state: object
    normalizer: norm_mod.NormalizerState
    key: jnp.ndarray
    global_step: jnp.ndarray  # () int64-ish frames collected
    ep_count: jnp.ndarray
    ep_return_sum: jnp.ndarray
    ep_success_sum: jnp.ndarray
    ep_len_sum: jnp.ndarray


def _maybe_load_encoder(config):
    """Attach the trained autoencoder for encoder-latent observations
    (EncodedDepthImgSensor equivalent; reference sensor.py:186-196 loads
    weights from config sensor.encoder_dir)."""
    if config.get("depth_observation") or config.get("full_observation"):
        return None
    enc_dir = config.get("sensor", {}).get("encoder_dir")
    if not enc_dir:
        return None
    import os

    from deep_rl_grasping_tpu.utils import config as cfg_util

    path = cfg_util.resolve_path(enc_dir)
    if not os.path.exists(os.path.join(path, "weights.npz")):
        return None
    from deep_rl_grasping_tpu.training.train_encoder import load_trained_encoder

    encode_fn, _ = load_trained_encoder(path)
    return encode_fn


def make_algo(config, env: GraspEnv, algo_name, pmean_axis=None):
    algo_name = algo_name.upper()
    obs_shape = env.obs_shape
    if algo_name == "SAC":
        return SAC(obs_shape, env.action_dim, config, pmean_axis=pmean_axis)
    if algo_name == "DQN":
        return DQN(obs_shape, env.num_actions, config, pmean_axis=pmean_axis)
    if algo_name == "BDQ":
        env.branched_actions = True
        num_branches = 3 if env.simplified else 5
        return BDQ(obs_shape, num_branches, config, pmean_axis=pmean_axis)
    if algo_name == "DDPG":
        return DDPG(obs_shape, env.action_dim, config, pmean_axis=pmean_axis)
    raise ValueError(f"unknown off-policy algo {algo_name}")


class EvalMixin:
    """Shared evaluation harness (EvalCallback / run_agent equivalent,
    base_callbacks.py:16-117 + utils.py:10-44): episodes on the validation
    or test env at lambda=1 with the fixed eval seed (simulation.py:91-100).
    `stochastic` mirrors run_agent's flag (train_stable_baselines.py:97-107):
    sample from the policy instead of taking its mode/argmax."""

    def evaluate(self, algo_state, normalizer, n_episodes=10, key=None,
                 validate=True, stochastic=False):
        cache_key = (n_episodes, validate, stochastic)
        if not hasattr(self, "_eval_cache"):
            self._eval_cache = {}
        if cache_key in self._eval_cache:
            run, key_default = self._eval_cache[cache_key]
            return run(algo_state, normalizer, key_default if key is None else key)
        eval_env = GraspEnv(self.config, evaluate=True, validate=validate,
                            encoder_fn=self.env.encoder_fn)
        eval_env.branched_actions = self.env.branched_actions
        benv = BatchedGraspEnv(eval_env, n_episodes)
        curriculum = benv.init_curriculum()
        key = jax.random.PRNGKey(1) if key is None else key

        def run(algo_state, normalizer, key):
            states, obs = benv.reset(key, curriculum)
            B = n_episodes

            def body(carry, i):
                states, obs, cur, done_once, ret, length, succ, k = carry
                k, ka = jax.random.split(k)
                obs_in = (
                    norm_mod.normalize_obs(normalizer, obs)
                    if self.normalize
                    else obs
                )
                actions = self._act(
                    algo_state, obs_in, ka, deterministic=not stochastic
                )
                states, obs, rewards, dones, infos, cur = benv.step(
                    states, actions, cur
                )
                first_done = dones & ~done_once
                ret = jnp.where(first_done, infos["episode_return"], ret)
                length = jnp.where(first_done, infos["episode_step"], length)
                succ = jnp.where(first_done, infos["is_success"], succ)
                done_once = done_once | dones
                return (states, obs, cur, done_once, ret, length, succ, k), None

            init = (
                states, obs, curriculum,
                jnp.zeros(B, bool), jnp.zeros(B), jnp.zeros(B, jnp.int32),
                jnp.zeros(B, bool), key,
            )
            (states, obs, cur, done_once, ret, length, succ, _), _ = jax.lax.scan(
                body, init, None, length=eval_env.time_horizon
            )
            return dict(
                mean_return=jnp.where(done_once, ret, 0.0).sum()
                / jnp.maximum(done_once.sum(), 1),
                mean_length=jnp.where(done_once, length, 0).sum()
                / jnp.maximum(done_once.sum(), 1),
                success_rate=jnp.where(done_once, succ, False).sum()
                / jnp.maximum(done_once.sum(), 1),
                episodes=done_once.sum(),
            )

        run_jit = jax.jit(run)
        self._eval_cache[cache_key] = (run_jit, jax.random.PRNGKey(1))
        return run_jit(algo_state, normalizer, key)


class Trainer(EvalMixin):
    def __init__(self, config, algo="SAC", model_dir=None, num_envs=None,
                 pmean_axis=None):
        self.config = cfg_util.load_config(config)
        self.algo_name = algo.upper()
        self.model_dir = model_dir
        self.pmean_axis = pmean_axis
        self.env = GraspEnv(self.config, encoder_fn=_maybe_load_encoder(self.config))
        self.num_envs = int(num_envs or self.config["tpu"].get("num_envs", 128))
        self.benv = BatchedGraspEnv(self.env, self.num_envs, pmean_axis=pmean_axis)
        self.algo = make_algo(self.config, self.env, self.algo_name, pmean_axis)
        self.normalize = bool(self.config.get("normalize", False))
        tpu_cfg = self.config["tpu"]
        self.updates_per_step = int(tpu_cfg.get("updates_per_step", 1))
        algo_cfg = self.config.get(self.algo_name, {})
        self.buffer_size = int(algo_cfg.get("buffer_size", 200_000))
        self.batch_size = int(algo_cfg.get("batch_size", 256))
        self.learning_starts = int(algo_cfg.get("learning_starts", 1000))
        # n-step returns (config <ALGO>.n_step): multi-step targets speed up
        # propagation of the sparse terminal reward; 1 = classic TD(0).
        self.n_step = int(algo_cfg.get("n_step", 1))
        self.prioritized = bool(getattr(self.algo, "prioritized", False))

        if self.env.discrete or self.algo_name == "BDQ":
            if self.algo_name == "BDQ":
                act_shape = (self.algo.num_branches,)
            else:
                act_shape = ()
            act_dtype = jnp.int32
        else:
            act_shape = (self.env.action_dim,)
            act_dtype = jnp.float32
        self.act_shape = act_shape
        self.act_dtype = act_dtype

    # ------------------------------------------------------------------ init

    def init_state(self, key) -> LoopState:
        k_env, k_algo, k_loop = jax.random.split(key, 3)
        curriculum = self.benv.init_curriculum()
        env_states, obs = self.benv.reset(k_env, curriculum)
        buffer = replay_mod.create(
            self.buffer_size,
            self.env.obs_shape,
            self.act_shape,
            batch_stride=self.num_envs,
            action_dtype=self.act_dtype,
        )
        algo_state = self.algo.init(k_algo)
        normalizer = norm_mod.NormalizerState.init(self.env.obs_shape, self.num_envs)
        return LoopState(
            env_states=env_states,
            obs=obs,
            curriculum=curriculum,
            buffer=buffer,
            algo_state=algo_state,
            normalizer=normalizer,
            key=k_loop,
            global_step=jnp.asarray(0, jnp.int32),
            ep_count=jnp.asarray(0, jnp.int32),
            ep_return_sum=jnp.asarray(0.0, jnp.float32),
            ep_success_sum=jnp.asarray(0.0, jnp.float32),
            ep_len_sum=jnp.asarray(0.0, jnp.float32),
        )

    # ------------------------------------------------------------------ demos

    def seed_demos(self, state: LoopState, n_frames: int) -> LoopState:
        """Pre-fill the replay buffer with scripted-expert transitions.

        SAC on the full task cannot amplify the ~3-4% random-grasp success
        floor of this env (the policy narrows before the critic ever sees
        enough terminal rewards); seeding the buffer with scripted
        descend-close-lift episodes (envs/scripted.py) gives the critic a
        dense success signal to propagate. Normalizer stats fold the demo
        frames in; the curriculum window is left untouched (demo successes
        must not advance lambda — the policy hasn't earned it).
        """
        from deep_rl_grasping_tpu.envs import scripted

        if self.env.discrete:
            raise ValueError("demo seeding supports continuous tasks only")
        expert = (
            scripted.scripted_simplified_action
            if self.env.simplified
            else scripted.scripted_full_action
        )
        steps = max(n_frames // self.num_envs, 1)

        def body(carry, _):
            env_states, obs, buffer, normalizer, key = carry
            key, ka = jax.random.split(key)
            keys = jax.random.split(ka, self.num_envs)
            actions = jax.vmap(lambda s, k: expert(self.env, s, k))(
                env_states, keys
            )
            env_states, next_obs, rewards, dones, infos, _cur = self.benv.step(
                env_states, actions, state.curriculum
            )
            normalizer = norm_mod.update_batch(
                normalizer, obs, rewards, dones,
                gamma=self.algo.gamma, training=self.normalize,
            )
            buffer = replay_mod.insert(buffer, obs, actions, rewards, dones)
            n_succ = (dones & infos["is_success"]).sum(dtype=jnp.float32)
            n_done = dones.sum(dtype=jnp.float32)
            return (env_states, next_obs, buffer, normalizer, key), (
                n_done, n_succ,
            )

        (env_states, obs, buffer, normalizer, key), (nd, ns) = jax.lax.scan(
            body,
            (state.env_states, state.obs, state.buffer, state.normalizer,
             state.key),
            None,
            length=steps,
        )
        return state.replace(
            env_states=env_states, obs=obs, buffer=buffer,
            normalizer=normalizer, key=key,
        ), nd.sum(), ns.sum()

    # ------------------------------------------------------------------ core

    def _policy_params(self, algo_state):
        if self.algo_name in ("SAC", "DDPG"):
            return algo_state.actor_params
        return algo_state.params

    def _act(self, algo_state, obs, key, deterministic=False):
        params = self._policy_params(algo_state)
        if self.algo_name in ("SAC", "DDPG"):
            return self.algo.act(params, obs, key, deterministic)
        eps = jnp.where(
            deterministic, 0.0, self.algo.epsilon(algo_state.step)
        )
        return self.algo.act(params, obs, key, eps)

    def train_step(self, state: LoopState) -> tuple:
        """One collect+update iteration (jit/scan-able)."""
        key, k_act, k_sample, k_upd = jax.random.split(state.key, 4)
        if self.normalize:
            obs_in = norm_mod.normalize_obs(state.normalizer, state.obs)
        else:
            obs_in = state.obs
        actions = self._act(state.algo_state, obs_in, k_act)
        env_states, next_obs, rewards, dones, infos, curriculum = self.benv.step(
            state.env_states, actions, state.curriculum
        )
        normalizer = norm_mod.update_batch(
            state.normalizer, state.obs, rewards, dones,
            gamma=self.algo.gamma, training=self.normalize,
        )
        buffer = replay_mod.insert(state.buffer, state.obs, actions, rewards, dones)

        can_learn = buffer.size >= jnp.maximum(
            self.learning_starts, self.batch_size + self.num_envs
        )

        def update_once(algo_state, buffer, k):
            ks, ku = jax.random.split(k)
            if self.prioritized:
                batch = replay_mod.sample_prioritized(
                    buffer, ks, self.batch_size,
                    n_step=self.n_step, gamma=self.algo.gamma,
                )
            else:
                batch = replay_mod.sample(
                    buffer, ks, self.batch_size,
                    n_step=self.n_step, gamma=self.algo.gamma,
                )
            if self.normalize:
                batch["obs"] = norm_mod.normalize_obs(normalizer, batch["obs"])
                batch["next_obs"] = norm_mod.normalize_obs(normalizer, batch["next_obs"])
                batch["reward"] = norm_mod.normalize_reward(normalizer, batch["reward"])
            new_algo_state, metrics, td_abs = self.algo.update(algo_state, batch, ku)
            if self.prioritized:
                buffer = replay_mod.update_priorities(buffer, batch["idx"], td_abs)
            # Freeze updates until the buffer has warmed up.
            algo_state = jax.tree.map(
                lambda new, old: jnp.where(can_learn, new, old),
                new_algo_state,
                algo_state,
            )
            return algo_state, buffer, metrics

        upd_keys = jax.random.split(k_upd, self.updates_per_step)
        if self.prioritized:
            # Priorities change each update, so the buffer must ride the carry.
            def do_update(carry, k):
                a, b, m = update_once(carry[0], carry[1], k)
                return (a, b), m

            (algo_state, buffer), metrics = jax.lax.scan(
                do_update, (state.algo_state, buffer), upd_keys
            )
        else:
            # Keep the multi-GB obs ring OUT of the scan carry: a carried
            # loop-invariant array forces XLA to materialize extra copies of
            # it (double/triple-buffering the carry blew HBM at 500k frames).
            # Closed over, it lowers to a loop-invariant input with no copy.
            def do_update(algo_state, k):
                a, _, m = update_once(algo_state, buffer, k)
                return a, m

            algo_state, metrics = jax.lax.scan(
                do_update, state.algo_state, upd_keys
            )
        metrics = jax.tree.map(lambda m: m[-1], metrics)

        new_state = LoopState(
            env_states=env_states,
            obs=next_obs,
            curriculum=curriculum,
            buffer=buffer,
            algo_state=algo_state,
            normalizer=normalizer,
            key=key,
            global_step=state.global_step + self.num_envs,
            ep_count=state.ep_count + dones.sum(dtype=jnp.int32),
            ep_return_sum=state.ep_return_sum
            + jnp.where(dones, infos["episode_return"], 0.0).sum(),
            ep_success_sum=state.ep_success_sum
            + (dones & infos["is_success"]).sum(dtype=jnp.float32),
            ep_len_sum=state.ep_len_sum
            + jnp.where(dones, infos["episode_step"], 0).sum().astype(jnp.float32),
        )
        return new_state, metrics

    def train_chunk(self, state: LoopState, n_steps: int):
        """Scan `n_steps` iterations on device; returns final state+metrics."""

        def body(s, _):
            s, m = self.train_step(s)
            return s, m

        state, metrics = jax.lax.scan(body, state, None, length=n_steps)
        last_metrics = jax.tree.map(lambda m: m[-1], metrics)
        return state, last_metrics


