"""DQN in JAX (prioritized replay, target network).

Replaces stable-baselines DQN (sb_helper.py:157-168; config DQN block:
learning_rate, batch_size, prioritized_replay). Defaults follow sb: gamma
from discount_factor, target net update every 500 steps (sb default), double
DQN off (sb 2.10 default), epsilon-greedy exploration annealed over
exploration_fraction of total steps.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from deep_rl_grasping_tpu.models.networks import QNetwork


@struct.dataclass
class DQNState:
    params: Any
    opt_state: Any
    target_params: Any
    step: jnp.ndarray


class DQN:
    def __init__(self, obs_shape, num_actions, config, image_obs=None,
                 pmean_axis=None):
        self.pmean_axis = pmean_axis
        c = config.get("DQN", {})
        self.gamma = float(config.get("discount_factor", 0.99))
        self.lr = float(c.get("learning_rate", 1e-3))
        self.batch_size = int(c.get("batch_size", 32))
        self.prioritized = bool(c.get("prioritized_replay", True))
        self.target_update_freq = int(c.get("target_network_update_freq", 500))
        self.exploration_fraction = float(c.get("exploration_fraction", 0.1))
        self.exploration_final_eps = float(c.get("exploration_final_eps", 0.02))
        self.total_timesteps = int(c.get("total_timesteps", 1_000_000))
        self.num_actions = int(num_actions)
        self.obs_shape = tuple(obs_shape)
        if image_obs is None:
            image_obs = len(obs_shape) == 3
        self.net = QNetwork(
            self.num_actions, layers=tuple(c.get("layers", [64, 64])),
            image_obs=image_obs, dueling=True,
        )
        self.tx = optax.adam(self.lr)

    def init(self, key) -> DQNState:
        params = self.net.init(key, jnp.zeros((1,) + self.obs_shape))["params"]
        return DQNState(
            params=params,
            opt_state=self.tx.init(params),
            target_params=params,
            step=jnp.asarray(0, jnp.int32),
        )

    def epsilon(self, step):
        frac = jnp.minimum(
            step / jnp.maximum(self.exploration_fraction * self.total_timesteps, 1),
            1.0,
        )
        return 1.0 + frac * (self.exploration_final_eps - 1.0)

    def act(self, params, obs, key, epsilon=0.0):
        q = self.net.apply({"params": params}, obs)
        greedy = jnp.argmax(q, axis=-1)
        ke, ka = jax.random.split(key)
        rand = jax.random.randint(ka, greedy.shape, 0, self.num_actions)
        explore = jax.random.uniform(ke, greedy.shape) < epsilon
        return jnp.where(explore, rand, greedy).astype(jnp.int32)

    def update(self, state: DQNState, batch, key=None):
        q_next = self.net.apply({"params": state.target_params}, batch["next_obs"])
        disc = batch.get("discount",
                         self.gamma * (1.0 - batch["done"].astype(jnp.float32)))
        target = batch["reward"] + disc * q_next.max(-1)
        target = jax.lax.stop_gradient(target)
        a = batch["action"].astype(jnp.int32).reshape(-1)

        def loss_fn(params):
            q = self.net.apply({"params": params}, batch["obs"])
            q_sa = jnp.take_along_axis(q, a[:, None], -1)[:, 0]
            td = q_sa - target
            # Huber loss, importance-weighted (sb deepq build_train)
            loss = jnp.mean(batch["weight"] * optax.huber_loss(q_sa, target))
            return loss, jnp.abs(td)

        (loss, td_abs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        if self.pmean_axis is not None:
            grads = jax.lax.pmean(grads, self.pmean_axis)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        step = state.step + 1
        target_params = jax.tree.map(
            lambda t, p: jnp.where(step % self.target_update_freq == 0, p, t),
            state.target_params,
            params,
        )
        new_state = DQNState(
            params=params, opt_state=opt_state, target_params=target_params, step=step
        )
        return new_state, dict(loss=loss, td_abs=td_abs.mean()), td_abs
