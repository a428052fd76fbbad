"""PPO (clipped surrogate) in JAX.

Replaces stable-baselines PPO2 (sb_helper.py:138-156; config PPO block:
learning_rate, n_steps, total_timesteps). sb defaults filled in: 4 epochs,
clip 0.2, GAE lambda 0.95, value coef 0.5, entropy coef 0.01. On-policy
collection maps perfectly onto the batched env: `n_steps` scan iterations of
B parallel envs per update.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax import struct

from deep_rl_grasping_tpu.models.networks import MLP, AugmentedNatureCNN


class ActorCritic(nn.Module):
    action_dim: int
    discrete: bool = False
    layers: Sequence[int] = (64, 64)
    image_obs: bool = False

    @nn.compact
    def __call__(self, obs):
        if self.image_obs:
            h = AugmentedNatureCNN(num_direct_features=1)(obs)
        else:
            h = obs
        pi = MLP(tuple(self.layers))(h)
        vf = MLP(tuple(self.layers))(h)
        logits_or_mean = nn.Dense(self.action_dim)(pi)
        value = nn.Dense(1)(vf)[..., 0]
        if self.discrete:
            return logits_or_mean, None, value
        log_std = self.param(
            "log_std", nn.initializers.zeros, (self.action_dim,)
        )
        return logits_or_mean, log_std, value


@struct.dataclass
class PPOState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


class PPO:
    def __init__(self, obs_shape, action_dim, config, discrete=False,
                 image_obs=None, pmean_axis=None):
        c = config.get("PPO", {})
        self.gamma = float(config.get("discount_factor", 0.99))
        self.lr = float(c.get("learning_rate", 3e-4))
        self.n_steps = int(c.get("n_steps", 128))
        self.n_epochs = int(c.get("n_epochs", 4))
        self.n_minibatches = int(c.get("n_minibatches", 4))
        self.clip = float(c.get("clip_range", 0.2))
        self.gae_lambda = float(c.get("lam", 0.95))
        self.vf_coef = float(c.get("vf_coef", 0.5))
        self.ent_coef = float(c.get("ent_coef", 0.01))
        self.layers = tuple(c.get("layers", [64, 64]))
        self.discrete = discrete
        self.action_dim = int(action_dim)
        self.obs_shape = tuple(obs_shape)
        self.pmean_axis = pmean_axis
        if image_obs is None:
            image_obs = len(obs_shape) == 3
        self.net = ActorCritic(
            self.action_dim, discrete, self.layers, image_obs
        )
        self.tx = optax.chain(
            optax.clip_by_global_norm(0.5), optax.adam(self.lr)
        )

    def init(self, key) -> PPOState:
        params = self.net.init(key, jnp.zeros((1,) + self.obs_shape))["params"]
        return PPOState(
            params=params, opt_state=self.tx.init(params),
            step=jnp.asarray(0, jnp.int32),
        )

    # --------------------------------------------------------------- policy

    def _logp_entropy(self, logits, log_std, action):
        if self.discrete:
            logp_all = jax.nn.log_softmax(logits)
            logp = jnp.take_along_axis(
                logp_all, action[..., None].astype(jnp.int32), -1
            )[..., 0]
            ent = -(jnp.exp(logp_all) * logp_all).sum(-1)
            return logp, ent
        std = jnp.exp(log_std)
        logp = (
            -0.5 * (((action - logits) / std) ** 2 + 2 * log_std + jnp.log(2 * jnp.pi))
        ).sum(-1)
        ent = (log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e)).sum(-1)
        ent = jnp.broadcast_to(ent, logp.shape)
        return logp, ent

    def act(self, params, obs, key, deterministic=False):
        logits, log_std, value = self.net.apply({"params": params}, obs)
        if self.discrete:
            action = jnp.where(
                deterministic,
                jnp.argmax(logits, -1),
                jax.random.categorical(key, logits),
            ).astype(jnp.int32)
        else:
            noise = jax.random.normal(key, logits.shape) * jnp.exp(log_std)
            action = jnp.where(deterministic, logits, logits + noise)
            action = jnp.clip(action, -1.0, 1.0)
        logp, _ = self._logp_entropy(logits, log_std, action)
        return action, logp, value

    def value(self, params, obs):
        return self.net.apply({"params": params}, obs)[2]

    # --------------------------------------------------------------- learn

    def gae(self, rewards, values, dones, last_value):
        """rewards/values/dones: (T, B); returns (advantages, returns)."""

        def scan_fn(carry, xs):
            adv_next, v_next = carry
            r, v, d = xs
            nonterm = 1.0 - d.astype(jnp.float32)
            delta = r + self.gamma * v_next * nonterm - v
            adv = delta + self.gamma * self.gae_lambda * nonterm * adv_next
            return (adv, v), adv

        (_, _), advs = jax.lax.scan(
            scan_fn,
            (jnp.zeros_like(last_value), last_value),
            (rewards, values, dones),
            reverse=True,
        )
        return advs, advs + values

    def update(self, state: PPOState, batch, key):
        """batch: dict of flattened rollout arrays (N = T*B rows):
        obs, action, logp, advantage, return, value."""
        adv = batch["advantage"]
        adv = (adv - adv.mean()) / (adv.std() + 1e-8)

        def loss_fn(params):
            logits, log_std, value = self.net.apply({"params": params}, batch["obs"])
            logp, ent = self._logp_entropy(logits, log_std, batch["action"])
            ratio = jnp.exp(logp - batch["logp"])
            pg1 = ratio * adv
            pg2 = jnp.clip(ratio, 1 - self.clip, 1 + self.clip) * adv
            pg_loss = -jnp.minimum(pg1, pg2).mean()
            v_clip = batch["value"] + jnp.clip(
                value - batch["value"], -self.clip, self.clip
            )
            vf_loss = 0.5 * jnp.maximum(
                (value - batch["return"]) ** 2, (v_clip - batch["return"]) ** 2
            ).mean()
            ent_loss = -ent.mean()
            total = pg_loss + self.vf_coef * vf_loss + self.ent_coef * ent_loss
            return total, dict(pg_loss=pg_loss, vf_loss=vf_loss, entropy=ent.mean())

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        if self.pmean_axis is not None:
            grads = jax.lax.pmean(grads, self.pmean_axis)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            PPOState(params=params, opt_state=opt_state, step=state.step + 1),
            dict(loss=loss, **aux),
        )
