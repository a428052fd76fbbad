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


# Episode-outcome ring carried in LoopState: the host drains it each
# iteration to write ONE monitor row PER EPISODE (the reference's Monitor
# CSV format), instead of aggregate-per-flush rows that hide the episode
# distribution. Sized for the largest episode burst between host drains.
MONITOR_RING = 4096


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
    ep_ring: jnp.ndarray      # (MONITOR_RING, 3) per-episode (r, l, s)
    ep_ring_n: jnp.ndarray    # () int32 episodes ever written
    # Protected expert-demonstration ring (SACfD-style, Vecerik et al. 2017 /
    # Nair et al. 2018): demos live in their own buffer that policy data
    # never overwrites, and each update batch oversamples it by
    # tpu.demo_fraction. None when demo oversampling is disabled.
    demo_buffer: object = None


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
        algo = BDQ(obs_shape, num_branches, config, pmean_axis=pmean_axis)
        # The env's branched decode must use the BDQ block's pad count, not
        # robot.num_actions_pad — the reference's BDQ_8pads config has
        # robot:num_actions_pad 4 but BDQ:num_actions_pad 8, and the bdq_sb
        # fork discretized from its own hyperparameter.
        import dataclasses

        env.actuator_spec = dataclasses.replace(
            env.actuator_spec, num_actions_pad=algo.num_actions_pad
        )
        return algo
    if algo_name == "DDPG":
        return DDPG(obs_shape, env.action_dim, config, pmean_axis=pmean_axis)
    raise ValueError(f"unknown off-policy algo {algo_name}")


class EvalMixin:
    """Shared evaluation harness (EvalCallback / run_agent equivalent,
    base_callbacks.py:16-117 + utils.py:10-44): episodes on the validation
    or test env at lambda=1 with the fixed eval seed (simulation.py:91-100).
    `stochastic` mirrors run_agent's flag (train_stable_baselines.py:97-107):
    sample from the policy instead of taking its mode/argmax.

    Protocol vs the reference: the reference runs 100 *sequential* episodes
    drawing objects from one fixed RandomState(1) stream; here `n_episodes`
    envs run in parallel, each episode seeded from the same fixed
    PRNGKey(1) — so the object/scene sequence is identical across every
    eval during and after training (comparable eval curves), while the
    ACTION key varies per call (matters only for stochastic evals). The
    step loop early-exits once every env has finished its first episode
    instead of scanning the full time horizon."""

    def evaluate(self, algo_state, normalizer, n_episodes=10, key=None,
                 validate=True, stochastic=False, lam=None):
        """lam: workspace-curriculum lambda for the eval scenes (default
        1.0, the protocol difficulty). Passing the TRAINING lambda gives a
        decayed-policy diagnostic on the distribution the policy actually
        trained on (VERDICT r3: an eval measured only at lambda=1 is
        uninformative while the curriculum is still ramping). Traced, so
        any value reuses the cached compile."""
        cache_key = (n_episodes, validate, stochastic)
        if not hasattr(self, "_eval_cache"):
            self._eval_cache = {}
        lam_val = jnp.asarray(1.0 if lam is None else lam, jnp.float32)
        if cache_key in self._eval_cache:
            run, n_calls = self._eval_cache[cache_key]
            self._eval_cache[cache_key] = (run, n_calls + 1)
            return run(algo_state, normalizer,
                       jax.random.PRNGKey(n_calls) if key is None else key,
                       lam_val)
        eval_env = GraspEnv(self.config, evaluate=True, validate=validate,
                            encoder_fn=self.env.encoder_fn)
        eval_env.branched_actions = self.env.branched_actions
        # BDQ overrides the actuator pad count on the TRAIN env (make_algo:
        # BDQ.num_actions_pad wins over robot.num_actions_pad); the fresh
        # eval env must decode with the same bins or every branched action
        # lands on the wrong bin (observed: train sr 0.89, eval 0.0).
        eval_env.actuator_spec = self.env.actuator_spec
        self._last_eval_env = eval_env  # introspection (tests)
        benv = BatchedGraspEnv(eval_env, n_episodes)
        curriculum = benv.init_curriculum()
        key = jax.random.PRNGKey(0) if key is None else key
        # Fixed scene sequence (simulation.py:91-100 RandomState(1)).
        scene_key = jax.random.PRNGKey(1)

        def run(algo_state, normalizer, key, lam_val):
            cur0 = curriculum.replace(lam=lam_val)
            states, obs = benv.reset(scene_key, cur0)
            B = n_episodes
            # Cleared-objects-per-episode (table clearing): initial alive
            # count minus the post-step count when the episode first ends.
            init_alive = states.sim.objects.alive.astype(jnp.int32).sum(-1)

            def cond(carry):
                _, _, _, done_once, _, _, _, _, _, t = carry
                return (~jnp.all(done_once)) & (t < eval_env.time_horizon)

            def body(carry):
                (states, obs, cur, done_once, ret, length, succ, cleared,
                 k, t) = carry
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
                cleared = jnp.where(
                    first_done, init_alive - infos["objects_alive"], cleared
                )
                done_once = done_once | dones
                return (states, obs, cur, done_once, ret, length, succ,
                        cleared, k, t + 1)

            init = (
                states, obs, cur0,
                jnp.zeros(B, bool), jnp.zeros(B), jnp.zeros(B, jnp.int32),
                jnp.zeros(B, bool), jnp.zeros(B, jnp.int32),
                key, jnp.asarray(0, jnp.int32),
            )
            (states, obs, cur, done_once, ret, length, succ, cleared, _,
             _) = jax.lax.while_loop(cond, body, init)
            n_done = jnp.maximum(done_once.sum(), 1)
            return dict(
                mean_return=jnp.where(done_once, ret, 0.0).sum() / n_done,
                mean_length=jnp.where(done_once, length, 0).sum() / n_done,
                success_rate=jnp.where(done_once, succ, False).sum() / n_done,
                mean_cleared=jnp.where(done_once, cleared, 0).sum() / n_done,
                episodes=done_once.sum(),
            )

        run_jit = jax.jit(run)
        self._eval_cache[cache_key] = (run_jit, 1)
        return run_jit(algo_state, normalizer, key, lam_val)


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
        tpu_cfg = self.config["tpu"]
        self.updates_per_step = int(tpu_cfg.get("updates_per_step", 1))
        # Batched-update mode (tpu.update_batch_scale = K): fold K small
        # sequential gradient steps into one K-times-larger step, keeping
        # sampled-transitions-per-env-frame (the reference's replay-ratio
        # currency, sb SAC train_freq=1 / sb_helper.py:120-128) exactly
        # constant. The MXU is badly underutilized at batch 256 (the
        # flagship's 128 sequential updates per iteration run ~1 ms each);
        # one batch-2048 step costs far less than eight batch-256 steps.
        # Mutates the algo config block BEFORE the algo is built so
        # batch-derived internals (SAC.bc_tail) stay consistent.
        # Step-size note: fewer, larger steps usually want a higher LR —
        # that stays an explicit config decision (<ALGO>.step_size).
        self.update_batch_scale = int(tpu_cfg.get("update_batch_scale", 1) or 1)
        if self.update_batch_scale > 1:
            if self.updates_per_step % self.update_batch_scale:
                raise ValueError(
                    "tpu.update_batch_scale must divide tpu.updates_per_step"
                )
            algo_block = dict(self.config.get(self.algo_name, {}))
            algo_block["batch_size"] = (
                int(algo_block.get("batch_size", 256)) * self.update_batch_scale
            )
            self.config[self.algo_name] = algo_block
            self.updates_per_step //= self.update_batch_scale
        self.algo = make_algo(self.config, self.env, self.algo_name, pmean_axis)
        self.normalize = bool(self.config.get("normalize", False))
        # Fixed reward scaling (config `reward_scale`): the learner sees
        # reward * scale instead of VecNormalize's return-variance division.
        # On the full task the running sigma is dominated by the -200/step
        # penalty returns (|ret| ~ 3e4), so normalize_reward's /sigma + clip
        # provably erased the +10000 terminal by 400k frames (round-2
        # flagship collapse); a fixed scale keeps the terminal/penalty ratio
        # intact at a critic-friendly magnitude. Overrides reward
        # normalization when set; obs normalization is unaffected.
        self.reward_scale = float(self.config.get("reward_scale", 0) or 0)
        algo_cfg = self.config.get(self.algo_name, {})
        self.buffer_size = int(algo_cfg.get("buffer_size", 200_000))
        self.batch_size = int(algo_cfg.get("batch_size", 256))
        self.learning_starts = int(algo_cfg.get("learning_starts", 1000))
        # n-step returns (config <ALGO>.n_step): multi-step targets speed up
        # propagation of the sparse terminal reward; 1 = classic TD(0).
        self.n_step = int(algo_cfg.get("n_step", 1))
        self.prioritized = bool(getattr(self.algo, "prioritized", False))
        # Demo oversampling (tpu.demo_fraction in (0,1)): that fraction of
        # every update batch is drawn from the protected demo ring instead
        # of the main replay. Pairs with <ALGO>.bc_weight (the Q-filtered
        # behavior-cloning term in SAC's actor loss).
        self.demo_fraction = float(tpu_cfg.get("demo_fraction", 0) or 0)
        self.demo_batch = int(round(self.batch_size * self.demo_fraction))
        # Recency stratification (tpu.recent_fraction of the NON-demo batch
        # rows drawn from the newest tpu.recent_window frames; see
        # replay.sample). Counters stale-distribution drift under the
        # workspace curriculum on large rings.
        self.recent_fraction = float(tpu_cfg.get("recent_fraction", 0) or 0)
        self.recent_window = int(tpu_cfg.get("recent_window", 0) or 0)
        # Tie the SAC target-entropy anneal to curriculum progress
        # (tpu.entropy_anneal_lambda): the anneal fraction becomes
        # min(frames_frac, lambda), so exploration never collapses to the
        # final target while the curriculum is still ramping. The r4
        # flagship annealed to -5 by 400k frames while still at lambda=0.5
        # on the harder object library; exploration died mid-curriculum and
        # the policy decayed instead of adapting at lambda=0.875.
        self.entropy_anneal_lambda = bool(tpu_cfg.get("entropy_anneal_lambda"))
        # Floor on the lambda cap (round-5 fix): with a bare min(frac,
        # lambda) the anneal deadlocks at lambda=0 — the target stays at
        # the initial (hot) entropy, the stochastic window sr ceilings
        # under the curriculum threshold, and lambda can never rise (r5b:
        # 1.26M frames parked at lambda=0 with the DETERMINISTIC eval at
        # 1.0 throughout). frac <= floor + (1-floor)*lambda lets the
        # anneal reach `floor` of its range on frames alone, while the
        # final cold stretch stays curriculum-gated (the r4 fix).
        self.entropy_anneal_floor = float(
            tpu_cfg.get("entropy_anneal_floor", 0.5)
        )
        if self.demo_batch > 0 and not int(tpu_cfg.get("demo_frames", 0)):
            raise ValueError(
                "tpu.demo_fraction > 0 requires tpu.demo_frames > 0 "
                "(the demo ring is filled by scripted-expert seeding)"
            )
        self.demo_capacity = int(
            tpu_cfg.get("demo_capacity", tpu_cfg.get("demo_frames", 0))
        )

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
        demo_buffer = None
        if self.demo_batch > 0:
            demo_buffer = replay_mod.create(
                self.demo_capacity,
                self.env.obs_shape,
                self.act_shape,
                batch_stride=self.num_envs,
                action_dtype=self.act_dtype,
            )
        return LoopState(
            demo_buffer=demo_buffer,
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
            ep_ring=jnp.zeros((MONITOR_RING, 3), jnp.float32),
            ep_ring_n=jnp.asarray(0, jnp.int32),
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

        if self.algo_name == "BDQ":
            expert = scripted.scripted_branched_action
        elif self.env.discrete:
            expert = scripted.scripted_discrete_action
        elif self.env.simplified:
            expert = scripted.scripted_simplified_action
        else:
            expert = scripted.scripted_full_action
        steps = max(n_frames // self.num_envs, 1)

        def body(carry, _):
            env_states, obs, buffer, demo_buffer, normalizer, key = carry
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
            if demo_buffer is not None:
                demo_buffer = replay_mod.insert(
                    demo_buffer, obs, actions, rewards, dones
                )
            n_succ = (dones & infos["is_success"]).sum(dtype=jnp.float32)
            n_done = dones.sum(dtype=jnp.float32)
            return (env_states, next_obs, buffer, demo_buffer, normalizer,
                    key), (n_done, n_succ)

        (env_states, obs, buffer, demo_buffer, normalizer, key), (nd, ns) = (
            jax.lax.scan(
                body,
                (state.env_states, state.obs, state.buffer, state.demo_buffer,
                 state.normalizer, state.key),
                None,
                length=steps,
            )
        )
        return state.replace(
            env_states=env_states, obs=obs, buffer=buffer,
            demo_buffer=demo_buffer, normalizer=normalizer, key=key,
        ), nd.sum(), ns.sum()

    # ------------------------------------------------------------------ core

    def _policy_params(self, algo_state):
        if self.algo_name in ("SAC", "DDPG"):
            return algo_state.actor_params
        return algo_state.params

    def _act(self, algo_state, obs, key, deterministic=False, frames=None):
        params = self._policy_params(algo_state)
        if self.algo_name in ("SAC", "DDPG"):
            return self.algo.act(params, obs, key, deterministic)
        # epsilon anneals over ENV FRAMES (exploration_fraction *
        # total_timesteps is a frame count in the reference, bdq config
        # block): use the loop's global_step, not the gradient-step counter
        # (updates_per_step decouples the two by up to 128x).
        eps_step = algo_state.step if frames is None else frames
        eps = jnp.where(
            deterministic, 0.0, self.algo.epsilon(eps_step)
        )
        return self.algo.act(params, obs, key, eps)

    def _target_entropy_at(self, frames, lam=None):
        """Annealed SAC target entropy at `frames` env frames (None when
        the anneal is not configured — static target applies). With
        tpu.entropy_anneal_lambda the anneal fraction is additionally
        capped by the curriculum lambda (see __init__)."""
        a = self.algo
        if (self.algo_name != "SAC" or a.target_entropy_final is None
                or a.target_entropy_anneal <= 0):
            return None
        frac = jnp.clip(
            frames.astype(jnp.float32) / a.target_entropy_anneal, 0.0, 1.0
        )
        if self.entropy_anneal_lambda and lam is not None:
            f = self.entropy_anneal_floor
            frac = jnp.minimum(frac, f + (1.0 - f) * lam)
        return a.target_entropy + frac * (
            float(a.target_entropy_final) - a.target_entropy
        )

    def _scale_batch_reward(self, batch, normalizer):
        """Learner-side reward transform (see reward_scale above)."""
        if self.reward_scale:
            batch["reward"] = batch["reward"] * self.reward_scale
        elif self.normalize:
            batch["reward"] = norm_mod.normalize_reward(normalizer, batch["reward"])
        return batch

    def train_step(self, state: LoopState) -> tuple:
        """One collect+update iteration (jit/scan-able)."""
        key, k_act, k_sample, k_upd = jax.random.split(state.key, 4)
        if self.normalize:
            obs_in = norm_mod.normalize_obs(state.normalizer, state.obs)
        else:
            obs_in = state.obs
        actions = self._act(state.algo_state, obs_in, k_act,
                            frames=state.global_step)
        target_entropy = self._target_entropy_at(
            state.global_step, lam=state.curriculum.lam
        )
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

        demo_buffer = state.demo_buffer

        def update_once(algo_state, buffer, k):
            ks, ku = jax.random.split(k)
            if self.prioritized:
                batch = replay_mod.sample_prioritized(
                    buffer, ks, self.batch_size,
                    n_step=self.n_step, gamma=self.algo.gamma,
                )
            elif self.demo_batch > 0:
                # SACfD-style mixed batch: (batch - demo_batch) uniform from
                # the main ring + demo_batch from the protected demo ring;
                # `is_demo` marks the demo rows for the BC actor term.
                ks1, ks2 = jax.random.split(ks)
                n_main = self.batch_size - self.demo_batch
                main = replay_mod.sample(
                    buffer, ks1, n_main,
                    n_step=self.n_step, gamma=self.algo.gamma,
                    recent_batch=int(round(n_main * self.recent_fraction)),
                    recent_window=self.recent_window,
                )
                demo = replay_mod.sample(
                    demo_buffer, ks2, self.demo_batch,
                    n_step=self.n_step, gamma=self.algo.gamma,
                )
                batch = jax.tree.map(
                    lambda a, b: jnp.concatenate([a, b], 0), main, demo
                )
                batch["is_demo"] = jnp.concatenate(
                    [jnp.zeros(self.batch_size - self.demo_batch, bool),
                     jnp.ones(self.demo_batch, bool)]
                )
                # Guard against an unseeded demo ring (its zero frames must
                # not train the critic): zero those rows' loss weights.
                demo_ok = demo_buffer.size >= (
                    (self.n_step + 1) * demo_buffer.batch_stride
                )
                batch["weight"] = jnp.where(
                    batch["is_demo"] & ~demo_ok, 0.0, batch["weight"]
                )
                batch["is_demo"] = batch["is_demo"] & demo_ok
            else:
                batch = replay_mod.sample(
                    buffer, ks, self.batch_size,
                    n_step=self.n_step, gamma=self.algo.gamma,
                    recent_batch=int(round(self.batch_size * self.recent_fraction)),
                    recent_window=self.recent_window,
                )
            if self.normalize:
                batch["obs"] = norm_mod.normalize_obs(normalizer, batch["obs"])
                batch["next_obs"] = norm_mod.normalize_obs(normalizer, batch["next_obs"])
            batch = self._scale_batch_reward(batch, normalizer)
            if target_entropy is not None:
                new_algo_state, metrics, td_abs = self.algo.update(
                    algo_state, batch, ku, target_entropy=target_entropy
                )
            else:
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

        # Per-episode monitor ring: scatter this step's finished episodes
        # (same last-W-kept scheme as the curriculum window).
        R = MONITOR_RING
        d32 = dones.astype(jnp.int32)
        offset = jnp.cumsum(d32) - d32
        n_new = d32.sum()
        pos = (state.ep_ring_n + offset) % R
        pos = jnp.where(dones & (offset >= n_new - R), pos, R)
        rows = jnp.stack(
            [infos["episode_return"],
             infos["episode_step"].astype(jnp.float32),
             infos["is_success"].astype(jnp.float32)], -1,
        )
        ep_ring = state.ep_ring.at[pos].set(rows, mode="drop")

        new_state = LoopState(
            demo_buffer=state.demo_buffer,
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
            ep_ring=ep_ring,
            ep_ring_n=state.ep_ring_n + n_new,
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


