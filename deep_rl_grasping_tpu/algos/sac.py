"""Soft Actor-Critic in JAX.

First-party replacement for stable-baselines SAC (wired in
sb_helper.py:104-128; hyperparameters from the config's SAC block: layers,
buffer_size, batch_size, step_size/learning rate, discount_factor). Matches
sb defaults where the config is silent: tau 0.005, entropy coefficient
auto-tuned toward target entropy -dim(A), twin Q with min backup,
1 gradient step per env step (scaled by batch collection on TPU).

The whole update is one jit-compiled program over HBM-resident batches; the
actor/critic MXU matmuls run in bfloat16 with f32 parameters (models/
networks.py).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from deep_rl_grasping_tpu.models.networks import SACActor, SACCritic


@struct.dataclass
class SACState:
    actor_params: Any
    actor_opt: Any
    critic_params: Any
    critic_opt: Any
    target_critic_params: Any
    log_alpha: jnp.ndarray
    alpha_opt: Any
    step: jnp.ndarray


class SAC:
    def __init__(self, obs_shape, action_dim, config, image_obs=None,
                 pmean_axis=None):
        # pmean_axis: mesh axis name for data-parallel gradient averaging
        # (set by parallel/train_dp.py when running under shard_map).
        self.pmean_axis = pmean_axis
        c = config.get("SAC", {})
        self.gamma = float(config.get("discount_factor", 0.99))
        self.tau = 0.005
        self.lr = float(c.get("step_size", 3e-4))
        self.batch_size = int(c.get("batch_size", 256))
        self.layers = tuple(c.get("layers", [64, 64]))
        self.action_dim = int(action_dim)
        # Default target entropy is the SAC-paper -dim(A); configurable
        # because the reference's TF1 SAC never actually reaches that
        # equilibrium — its ent_coef decays to ~0 before the policy
        # narrows, so it explores with a wide sigma for the whole run
        # (SAC_depth_1mbuffer/logs.csv: entropy stays ~+3.5 at alpha 8e-4).
        # Matching that exploration floor needs a higher target here.
        self.target_entropy = float(c.get("target_entropy", -float(action_dim)))
        # Optional linear anneal of the target entropy over env frames:
        # start wide (exploration the curriculum needs to cross its 0.7
        # threshold) and finish narrow (precision the full-difficulty task
        # needs). The trainer converts global_step to the current value and
        # passes it to update(); None disables.
        self.target_entropy_final = c.get("target_entropy_final")
        self.target_entropy_anneal = float(c.get("target_entropy_anneal", 0) or 0)
        # Divergence guard: clamp the Bellman target to the feasible return
        # band (round-2 flagship collapse: q_target_mean drifted to -427
        # while the max reward in the buffer was ~0 — a fixed point the
        # clamp makes unreachable). Config SAC.q_clip: [lo, hi] in the
        # learner's reward units (i.e. post reward_scale).
        q_clip = c.get("q_clip")
        self.q_clip = None if q_clip is None else (float(q_clip[0]), float(q_clip[1]))
        # Q-filtered behavior cloning on demonstration rows (SAC.bc_weight;
        # SACfD-style, Nair et al. 2018 "Overcoming Exploration in RL with
        # Demonstrations"): the actor loss gains
        #   bc_weight * E_demo[ 1{Q(s,a_demo) > Q(s,a_pi)} * ||tanh(mu)-a||^2 ]
        # — clone the expert only where the critic still rates the expert's
        # action above the policy's, so BC accelerates early learning but
        # cannot hold the policy below expert level once it surpasses it.
        self.bc_weight = float(c.get("bc_weight", 0) or 0)
        # Static demo-tail size: the trainer's mixed batches place the
        # demo_fraction * batch_size demonstration rows LAST (concatenated
        # after the uniform rows), so the BC term's extra actor/critic
        # applies only need that tail slice — at the flagship's 25% the
        # extra forward-pass cost drops 4x vs running them on the full
        # batch. 0 = unknown layout; compute on the full batch.
        demo_frac = float(config.get("tpu", {}).get("demo_fraction", 0) or 0)
        self.bc_tail = int(round(self.batch_size * demo_frac))
        if image_obs is None:
            image_obs = len(obs_shape) == 3
        self.image_obs = image_obs
        self.obs_shape = tuple(obs_shape)

        self.actor = SACActor(self.action_dim, self.layers, self.image_obs)
        self.critic = SACCritic(self.layers, self.image_obs)
        # Optional linear LR decay over GRADIENT steps (SAC.lr_decay_steps,
        # optionally delayed by SAC.lr_decay_begin, floored at
        # SAC.lr_final_scale * step_size, default 0.1x). Million-step Adam
        # runs at a fixed 3e-4 drift once the task is learned — both the
        # r3b (sr 0.97 -> 0.83 past 800k) and r4 (0.77 -> 0.35) flagships
        # decayed late; annealing the step size is the standard SAC remedy.
        # Gradient steps == env frames at the flagship's 1-update-per-frame
        # ratio; under tpu.update_batch_scale they differ by that factor.
        decay_steps = int(c.get("lr_decay_steps", 0) or 0)
        if decay_steps > 0:
            schedule = optax.linear_schedule(
                init_value=self.lr,
                end_value=self.lr * float(c.get("lr_final_scale", 0.1)),
                transition_steps=decay_steps,
                transition_begin=int(c.get("lr_decay_begin", 0) or 0),
            )
        else:
            schedule = self.lr
        self.actor_tx = optax.adam(schedule)
        self.critic_tx = optax.adam(schedule)
        self.alpha_tx = optax.adam(schedule)

    # ------------------------------------------------------------------ init

    def init(self, key) -> SACState:
        ka, kc = jax.random.split(key)
        dummy_obs = jnp.zeros((1,) + self.obs_shape)
        dummy_act = jnp.zeros((1, self.action_dim))
        actor_params = self.actor.init(ka, dummy_obs)["params"]
        critic_params = self.critic.init(kc, dummy_obs, dummy_act)["params"]
        return SACState(
            actor_params=actor_params,
            actor_opt=self.actor_tx.init(actor_params),
            critic_params=critic_params,
            critic_opt=self.critic_tx.init(critic_params),
            target_critic_params=critic_params,
            log_alpha=jnp.asarray(0.0, jnp.float32),
            alpha_opt=self.alpha_tx.init(jnp.asarray(0.0, jnp.float32)),
            step=jnp.asarray(0, jnp.int32),
        )

    # ------------------------------------------------------------------ act

    def _dist(self, params, obs):
        mean, log_std = self.actor.apply({"params": params}, obs)
        return mean, log_std

    def sample_action(self, params, obs, key):
        """Squashed-Gaussian sample + log prob."""
        mean, log_std = self._dist(params, obs)
        std = jnp.exp(log_std)
        eps = jax.random.normal(key, mean.shape)
        pre_tanh = mean + std * eps
        action = jnp.tanh(pre_tanh)
        log_prob = (
            -0.5 * (eps**2 + 2 * log_std + jnp.log(2 * jnp.pi))
        ).sum(-1)
        log_prob -= jnp.log(1 - action**2 + 1e-6).sum(-1)
        return action, log_prob

    def act(self, params, obs, key, deterministic=False):
        mean, log_std = self._dist(params, obs)
        if deterministic:
            return jnp.tanh(mean)
        std = jnp.exp(log_std)
        return jnp.tanh(mean + std * jax.random.normal(key, mean.shape))

    def _pmean(self, tree):
        if self.pmean_axis is None:
            return tree
        return jax.lax.pmean(tree, self.pmean_axis)

    # ------------------------------------------------------------------ update

    def update(self, state: SACState, batch, key, target_entropy=None):
        """One SAC gradient step on (obs, action, reward, next_obs, done).

        `target_entropy` overrides the static target (the trainer passes the
        annealed value computed from global env frames)."""
        if target_entropy is None:
            target_entropy = self.target_entropy
        k1, k2 = jax.random.split(key)
        alpha = jnp.exp(state.log_alpha)

        next_action, next_logp = self.sample_action(
            state.actor_params, batch["next_obs"], k1
        )
        q_next = self.critic.apply(
            {"params": state.target_critic_params}, batch["next_obs"], next_action
        ).min(-1)
        disc = batch.get("discount",
                         self.gamma * (1.0 - batch["done"].astype(jnp.float32)))
        target = batch["reward"] + disc * (q_next - alpha * next_logp)
        if self.q_clip is not None:
            target = jnp.clip(target, self.q_clip[0], self.q_clip[1])
        target = jax.lax.stop_gradient(target)

        def critic_loss_fn(params):
            qs = self.critic.apply({"params": params}, batch["obs"], batch["action"])
            td = qs - target[:, None]
            loss = jnp.mean(batch["weight"][:, None] * td**2)
            return loss, jnp.abs(td).mean(-1)

        (critic_loss, td_abs), critic_grads = jax.value_and_grad(
            critic_loss_fn, has_aux=True
        )(state.critic_params)
        critic_grads = self._pmean(critic_grads)
        cu, critic_opt = self.critic_tx.update(
            critic_grads, state.critic_opt, state.critic_params
        )
        critic_params = optax.apply_updates(state.critic_params, cu)

        use_bc = self.bc_weight > 0 and "is_demo" in batch

        def actor_loss_fn(params):
            a, logp = self.sample_action(params, batch["obs"], k2)
            q = self.critic.apply({"params": critic_params}, batch["obs"], a).min(-1)
            loss = jnp.mean(alpha * logp - q)
            bc_loss = jnp.asarray(0.0)
            if use_bc:
                # Demo rows are the batch's static tail (trainer layout);
                # restrict the extra forward passes to it when known.
                t = (self.bc_tail
                     if 0 < self.bc_tail < batch["obs"].shape[0]
                     and batch["obs"].shape[0] == self.batch_size
                     else batch["obs"].shape[0])
                obs_t = batch["obs"][-t:]
                act_t = batch["action"][-t:]
                mean, _ = self.actor.apply({"params": params}, obs_t)
                q_demo = self.critic.apply(
                    {"params": critic_params}, obs_t, act_t
                ).min(-1)
                mask = (
                    batch["is_demo"][-t:]
                    & (q_demo > jax.lax.stop_gradient(q[-t:]))
                ).astype(jnp.float32) * batch["weight"][-t:]
                se = ((jnp.tanh(mean) - act_t) ** 2).sum(-1)
                bc_loss = (mask * se).sum() / jnp.maximum(mask.sum(), 1.0)
                loss = loss + self.bc_weight * bc_loss
                # Diagnostic: fraction of demo rows whose expert action the
                # critic still rates above the policy's (the BC gate). 0
                # means BC is silently off — the critic believes the policy
                # beats the 96%-success expert everywhere.
                n_demo = batch["is_demo"][-t:].astype(jnp.float32).sum()
                bc_gate = (mask > 0).astype(jnp.float32).sum() / jnp.maximum(
                    n_demo, 1.0
                )
            else:
                bc_gate = jnp.asarray(0.0)
            return loss, (logp, bc_loss, bc_gate)

        (actor_loss, (logp, bc_loss, bc_gate)), actor_grads = jax.value_and_grad(
            actor_loss_fn, has_aux=True
        )(state.actor_params)
        actor_grads = self._pmean(actor_grads)
        au, actor_opt = self.actor_tx.update(
            actor_grads, state.actor_opt, state.actor_params
        )
        actor_params = optax.apply_updates(state.actor_params, au)

        def alpha_loss_fn(log_alpha):
            return -jnp.mean(
                log_alpha * jax.lax.stop_gradient(logp + target_entropy)
            )

        alpha_loss, alpha_grad = jax.value_and_grad(alpha_loss_fn)(state.log_alpha)
        alpha_grad = self._pmean(alpha_grad)
        alu, alpha_opt = self.alpha_tx.update(
            alpha_grad, state.alpha_opt, state.log_alpha
        )
        log_alpha = optax.apply_updates(state.log_alpha, alu)

        target_params = jax.tree.map(
            lambda t, p: (1 - self.tau) * t + self.tau * p,
            state.target_critic_params,
            critic_params,
        )
        new_state = SACState(
            actor_params=actor_params,
            actor_opt=actor_opt,
            critic_params=critic_params,
            critic_opt=critic_opt,
            target_critic_params=target_params,
            log_alpha=log_alpha,
            alpha_opt=alpha_opt,
            step=state.step + 1,
        )
        metrics = dict(
            critic_loss=critic_loss,
            actor_loss=actor_loss,
            bc_loss=bc_loss,
            bc_gate=bc_gate,
            alpha_loss=alpha_loss,
            alpha=alpha,
            entropy=-logp.mean(),
            td_abs=td_abs.mean(),
            # divergence diagnostics: critic value on replay vs policy
            # actions, Bellman target, and the normalized reward scale
            q_target_mean=target.mean(),
            reward_mean=batch["reward"].mean(),
            reward_max=batch["reward"].max(),
            done_frac=batch["done"].astype(jnp.float32).mean(),
        )
        return new_state, metrics, td_abs
