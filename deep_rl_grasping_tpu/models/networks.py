"""Policy / value network architectures in Flax.

First-party replacements for the TF1 graphs the reference builds through
stable-baselines:

* `NatureCNN` / `AugmentedNatureCNN` — the custom feature extractor
  (training/custom_obs_policy.py:15-43): the last obs channel carries direct
  features (actuator width stuffed into pixel [0,0], robot.py:199-205), the
  remaining channels go through the Nature CNN (32/64/64 convs -> FC 512),
  and the direct features are concatenated to the output.
* `MLP` — the [64, 64] trunk used by MLP policies (config layers key).
* `SACActor` / `SACCritic` — stable-baselines SAC policy/critic shapes
  (squashed Gaussian actor, twin Q).
* `BDQNetwork` — Branch Dueling Q-Network (the thesis algorithm; config
  layers [[64,64],[32],[32]]: shared trunk, per-branch advantage heads, one
  state-value head; Q_d = V + A_d - mean(A_d)).
* `QNetwork` — DQN (dueling optional).

Convolutions and dense layers run in bfloat16 on the MXU with float32
parameters/outputs (TPU-native mixed precision); the tiny heads stay f32.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

# MXU-friendly compute dtype; params stay float32.
CDTYPE = jnp.bfloat16


class NatureCNN(nn.Module):
    """DQN-Nature feature extractor (conv 32x8s4, 64x4s2, 64x3s1 -> FC 512)."""

    features: int = 512

    @nn.compact
    def __call__(self, x):
        x = x.astype(CDTYPE)
        x = nn.relu(nn.Conv(32, (8, 8), strides=(4, 4), padding="VALID", dtype=CDTYPE)(x))
        x = nn.relu(nn.Conv(64, (4, 4), strides=(2, 2), padding="VALID", dtype=CDTYPE)(x))
        x = nn.relu(nn.Conv(64, (3, 3), strides=(1, 1), padding="VALID", dtype=CDTYPE)(x))
        x = x.reshape(x.shape[:-3] + (-1,))
        x = nn.relu(nn.Dense(self.features, dtype=CDTYPE)(x))
        return x.astype(jnp.float32)


class AugmentedNatureCNN(nn.Module):
    """Nature CNN over channels [:-1] + direct features from channel -1
    (custom_obs_policy.py:15-43)."""

    num_direct_features: int = 1
    features: int = 512

    @nn.compact
    def __call__(self, x):
        direct = x[..., -1].reshape(x.shape[:-3] + (-1,))[
            ..., : self.num_direct_features
        ]
        img = x[..., :-1]
        feats = NatureCNN(self.features)(img)
        return jnp.concatenate([feats, direct.astype(jnp.float32)], axis=-1)


class MLP(nn.Module):
    layers: Sequence[int]
    activate_final: bool = True

    @nn.compact
    def __call__(self, x):
        x = x.astype(CDTYPE)
        for i, h in enumerate(self.layers):
            x = nn.Dense(h, dtype=CDTYPE)(x)
            if i < len(self.layers) - 1 or self.activate_final:
                x = nn.relu(x)
        return x.astype(jnp.float32)


def make_torso(obs_shape, layers, image_obs):
    """Feature extractor matching sb policy selection (sb_helper.py:86-96):
    CNN (augmented when the obs carries the actuator pad channel) for image
    obs, MLP otherwise."""
    if image_obs:
        return AugmentedNatureCNN(num_direct_features=1)
    return MLP(tuple(layers))


LOG_STD_MIN = -20.0
LOG_STD_MAX = 2.0


class SACActor(nn.Module):
    """Squashed-Gaussian policy head (stable-baselines SAC policy shape)."""

    action_dim: int
    layers: Sequence[int] = (64, 64)
    image_obs: bool = False

    @nn.compact
    def __call__(self, obs):
        h = make_torso(None, self.layers, self.image_obs)(obs)
        if self.image_obs:
            h = MLP(tuple(self.layers))(h)
        mean = nn.Dense(self.action_dim)(h)
        log_std = nn.Dense(self.action_dim)(h)
        log_std = jnp.clip(log_std, LOG_STD_MIN, LOG_STD_MAX)
        return mean, log_std


class SACCritic(nn.Module):
    """Twin Q network."""

    layers: Sequence[int] = (64, 64)
    image_obs: bool = False

    @nn.compact
    def __call__(self, obs, action):
        feats = make_torso(None, self.layers, self.image_obs)(obs)
        x = jnp.concatenate([feats, action], axis=-1)
        qs = []
        for _ in range(2):
            h = MLP(tuple(self.layers))(x)
            qs.append(nn.Dense(1)(h)[..., 0])
        return jnp.stack(qs, axis=-1)  # (..., 2)


class QNetwork(nn.Module):
    """DQN head (optionally dueling) on MLP or CNN torso."""

    num_actions: int
    layers: Sequence[int] = (64, 64)
    image_obs: bool = False
    dueling: bool = True

    @nn.compact
    def __call__(self, obs):
        h = make_torso(None, self.layers, self.image_obs)(obs)
        if self.image_obs:
            h = MLP(tuple(self.layers))(h)
        adv = nn.Dense(self.num_actions)(nn.relu(nn.Dense(64)(h)))
        if not self.dueling:
            return adv
        val = nn.Dense(1)(nn.relu(nn.Dense(64)(h)))
        return val + adv - adv.mean(axis=-1, keepdims=True)


class BDQNetwork(nn.Module):
    """Branch Dueling Q-Network (thesis core; SURVEY.md §2.14).

    layers = [trunk_layers, branch_layers, value_layers], e.g.
    [[64,64],[32],[32]] (config/gripper_grasp.yaml BDQ block).
    Output: (..., num_branches, num_actions_pad) of Q values with the
    per-branch dueling aggregation Q_d(s,a) = V(s) + A_d(s,a) - mean_a A_d.
    """

    num_branches: int
    num_actions_pad: int
    trunk_layers: Sequence[int] = (64, 64)
    branch_layers: Sequence[int] = (32,)
    value_layers: Sequence[int] = (32,)
    image_obs: bool = False

    @nn.compact
    def __call__(self, obs):
        if self.image_obs:
            h = AugmentedNatureCNN(num_direct_features=1)(obs)
        else:
            h = obs
        trunk = MLP(tuple(self.trunk_layers))(h)
        v = nn.Dense(1)(MLP(tuple(self.value_layers))(trunk))  # (...,1)
        advs = []
        for _ in range(self.num_branches):
            a = nn.Dense(self.num_actions_pad)(
                MLP(tuple(self.branch_layers))(trunk)
            )
            advs.append(a)
        adv = jnp.stack(advs, axis=-2)  # (..., B, P)
        q = v[..., None] + adv - adv.mean(axis=-1, keepdims=True)
        return q
