"""DDPG in JAX.

Replaces stable-baselines DDPG (sb_helper.py:169-176). The reference used
AdaptiveParamNoiseSpec for exploration; parameter noise is awkward to keep
deterministic under jit across replicas, so exploration uses the equivalent
Gaussian action noise with a comparable effective scale (sigma 0.1),
annealed never (sb default). Everything else follows sb defaults: tau 0.005
(sb 0.001? sb ddpg uses 0.001 — kept), actor/critic lr 1e-4/1e-3, batch 128.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax import struct

from deep_rl_grasping_tpu.models.networks import MLP, AugmentedNatureCNN


class DeterministicActor(nn.Module):
    action_dim: int
    layers: Sequence[int] = (64, 64)
    image_obs: bool = False

    @nn.compact
    def __call__(self, obs):
        h = AugmentedNatureCNN()(obs) if self.image_obs else obs
        h = MLP(tuple(self.layers))(h)
        return jnp.tanh(nn.Dense(self.action_dim)(h))


class SingleCritic(nn.Module):
    layers: Sequence[int] = (64, 64)
    image_obs: bool = False

    @nn.compact
    def __call__(self, obs, action):
        h = AugmentedNatureCNN()(obs) if self.image_obs else obs
        x = jnp.concatenate([h, action], -1)
        return nn.Dense(1)(MLP(tuple(self.layers))(x))[..., 0]


@struct.dataclass
class DDPGState:
    actor_params: Any
    actor_opt: Any
    critic_params: Any
    critic_opt: Any
    target_actor_params: Any
    target_critic_params: Any
    step: jnp.ndarray


class DDPG:
    def __init__(self, obs_shape, action_dim, config, image_obs=None,
                 pmean_axis=None):
        c = config.get("DDPG", {})
        self.gamma = float(config.get("discount_factor", 0.99))
        self.actor_lr = float(c.get("actor_lr", 1e-4))
        self.critic_lr = float(c.get("critic_lr", 1e-3))
        self.batch_size = int(c.get("batch_size", 128))
        self.tau = float(c.get("tau", 0.001))
        self.noise_sigma = float(c.get("noise_sigma", 0.1))
        self.action_dim = int(action_dim)
        self.obs_shape = tuple(obs_shape)
        self.prioritized = False
        self.pmean_axis = pmean_axis
        if image_obs is None:
            image_obs = len(obs_shape) == 3
        # DDPG.layers: head width matters for encoder-latent obs — the BC
        # capacity probe (out/probe_latents, scripts_dev/probe_bc.py) showed
        # [64,64] cannot untangle the 100-d AE code.
        layers = tuple(c.get("layers", (64, 64)))
        self.actor = DeterministicActor(
            self.action_dim, layers=layers, image_obs=image_obs
        )
        self.critic = SingleCritic(layers=layers, image_obs=image_obs)
        self.actor_tx = optax.adam(self.actor_lr)
        self.critic_tx = optax.adam(self.critic_lr)

    def init(self, key) -> DDPGState:
        ka, kc = jax.random.split(key)
        dummy_obs = jnp.zeros((1,) + self.obs_shape)
        dummy_act = jnp.zeros((1, self.action_dim))
        actor_params = self.actor.init(ka, dummy_obs)["params"]
        critic_params = self.critic.init(kc, dummy_obs, dummy_act)["params"]
        return DDPGState(
            actor_params=actor_params,
            actor_opt=self.actor_tx.init(actor_params),
            critic_params=critic_params,
            critic_opt=self.critic_tx.init(critic_params),
            target_actor_params=actor_params,
            target_critic_params=critic_params,
            step=jnp.asarray(0, jnp.int32),
        )

    def act(self, params, obs, key, deterministic=False):
        a = self.actor.apply({"params": params}, obs)
        noise = jax.random.normal(key, a.shape) * self.noise_sigma
        return jnp.where(deterministic, a, jnp.clip(a + noise, -1.0, 1.0))

    def _pmean(self, tree):
        if self.pmean_axis is None:
            return tree
        return jax.lax.pmean(tree, self.pmean_axis)

    def update(self, state: DDPGState, batch, key=None):
        a_next = self.actor.apply(
            {"params": state.target_actor_params}, batch["next_obs"]
        )
        q_next = self.critic.apply(
            {"params": state.target_critic_params}, batch["next_obs"], a_next
        )
        disc = batch.get("discount",
                         self.gamma * (1.0 - batch["done"].astype(jnp.float32)))
        target = batch["reward"] + disc * q_next
        target = jax.lax.stop_gradient(target)

        def critic_loss_fn(params):
            q = self.critic.apply({"params": params}, batch["obs"], batch["action"])
            td = q - target
            return jnp.mean(batch["weight"] * td**2), jnp.abs(td)

        (closs, td_abs), cgrads = jax.value_and_grad(critic_loss_fn, has_aux=True)(
            state.critic_params
        )
        cgrads = self._pmean(cgrads)
        cu, critic_opt = self.critic_tx.update(cgrads, state.critic_opt, state.critic_params)
        critic_params = optax.apply_updates(state.critic_params, cu)

        def actor_loss_fn(params):
            a = self.actor.apply({"params": params}, batch["obs"])
            q = self.critic.apply({"params": critic_params}, batch["obs"], a)
            return -q.mean()

        aloss, agrads = jax.value_and_grad(actor_loss_fn)(state.actor_params)
        agrads = self._pmean(agrads)
        au, actor_opt = self.actor_tx.update(agrads, state.actor_opt, state.actor_params)
        actor_params = optax.apply_updates(state.actor_params, au)

        polyak = lambda t, p: jax.tree.map(
            lambda a, b: (1 - self.tau) * a + self.tau * b, t, p
        )
        new_state = DDPGState(
            actor_params=actor_params,
            actor_opt=actor_opt,
            critic_params=critic_params,
            critic_opt=critic_opt,
            target_actor_params=polyak(state.target_actor_params, actor_params),
            target_critic_params=polyak(state.target_critic_params, critic_params),
            step=state.step + 1,
        )
        return new_state, dict(critic_loss=closs, actor_loss=aloss), td_abs
