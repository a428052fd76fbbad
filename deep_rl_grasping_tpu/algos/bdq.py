"""Branch Dueling Q-Network (BDQ) — the thesis's core algorithm.

The reference trained BDQ through an external stable-baselines fork
(`bdq_sb` submodule, not vendored; interface preserved in
sb_helper.py:202-226 and the config BDQ blocks). This is a first-party JAX
implementation of Tavakoli et al. 2018 ("Action Branching Architectures for
Deep Reinforcement Learning") as configured by the reference:

* network: shared trunk + per-branch dueling advantage heads + state value
  (layers [[64,64],[32],[32]], models/networks.py BDQNetwork)
* one branch per action dimension with `num_actions_pad` bins each
  (simplified env: 3 branches = dx, dy, dyaw; actuator.py:126-147 decodes
  the flat Discrete(3*pads) index; we act per-branch and flatten)
* TD target: mean over branches of the per-branch max of the target net
  (the paper's "mean" aggregation), shared across branch losses
* epsilon-greedy, prioritized replay optional, target update freq 1000

Action convention: the env consumes the reference's flat Discrete(B*pads)
encoding — branch b's bin i maps to action b*pads + i, and the env applies
every branch's delta? No: the reference's flat space moves ONE branch per
step. BDQ instead selects a bin in EVERY branch simultaneously; the env
supports this via composite decoding (branched=True), matching how the
bdq_sb fork drove the simplified env.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from deep_rl_grasping_tpu.models.networks import BDQNetwork


@struct.dataclass
class BDQState:
    params: Any
    opt_state: Any
    target_params: Any
    step: jnp.ndarray


class BDQ:
    def __init__(self, obs_shape, num_branches, config, image_obs=None,
                 pmean_axis=None):
        self.pmean_axis = pmean_axis
        c = config.get("BDQ", {})
        self.gamma = float(config.get("discount_factor", 0.99))
        self.lr = float(c.get("learning_rate", 1e-4))
        self.batch_size = int(c.get("batch_size", 64))
        self.prioritized = bool(c.get("prioritized_replay", False))
        self.target_update_freq = int(c.get("target_network_update_freq", 1000))
        self.exploration_fraction = float(c.get("exploration_fraction", 0.3))
        self.exploration_final_eps = float(c.get("exploration_final_eps", 0.1))
        self.total_timesteps = int(c.get("total_timesteps", 4_000_000))
        self.num_actions_pad = int(c.get("num_actions_pad", 33))
        layers = c.get("layers", [[64, 64], [32], [32]])
        self.num_branches = int(num_branches)
        self.obs_shape = tuple(obs_shape)
        if image_obs is None:
            image_obs = len(obs_shape) == 3
        self.net = BDQNetwork(
            num_branches=self.num_branches,
            num_actions_pad=self.num_actions_pad,
            trunk_layers=tuple(layers[0]),
            branch_layers=tuple(layers[1]),
            value_layers=tuple(layers[2]),
            image_obs=image_obs,
        )
        self.tx = optax.adam(self.lr)

    def init(self, key) -> BDQState:
        params = self.net.init(key, jnp.zeros((1,) + self.obs_shape))["params"]
        return BDQState(
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
        """Per-branch epsilon-greedy. Returns (..., B) int32 bins."""
        q = self.net.apply({"params": params}, obs)  # (..., B, P)
        greedy = jnp.argmax(q, axis=-1)
        ke, ka = jax.random.split(key)
        rand = jax.random.randint(ka, greedy.shape, 0, self.num_actions_pad)
        explore = jax.random.uniform(ke, greedy.shape) < epsilon
        return jnp.where(explore, rand, greedy).astype(jnp.int32)

    def update(self, state: BDQState, batch, key=None):
        """batch["action"]: (N, B) int32 per-branch bins."""
        q_next = self.net.apply(
            {"params": state.target_params}, batch["next_obs"]
        )  # (N, B, P)
        # Mean-over-branches of per-branch max (paper's TD target)
        disc = batch.get("discount",
                         self.gamma * (1.0 - batch["done"].astype(jnp.float32)))
        y = batch["reward"] + disc * q_next.max(-1).mean(-1)
        y = jax.lax.stop_gradient(y)
        a = batch["action"].astype(jnp.int32)  # (N, B)

        def loss_fn(params):
            q = self.net.apply({"params": params}, batch["obs"])  # (N, B, P)
            q_sa = jnp.take_along_axis(q, a[..., None], -1)[..., 0]  # (N, B)
            td = q_sa - y[:, None]
            loss = jnp.mean(batch["weight"][:, None] * optax.huber_loss(q_sa, y[:, None]))
            return loss, jnp.abs(td).mean(-1)

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
        new_state = BDQState(
            params=params, opt_state=opt_state, target_params=target_params, step=step
        )
        return new_state, dict(loss=loss, td_abs=td_abs.mean()), td_abs
