"""Observation wrappers.

`append_time_feature` ports TimeFeatureWrapper (training/wrapper.py:5-54,
from arXiv:1712.00378): append the remaining-time fraction 1 - t/T to flat
observations (constant 1.0 in test mode). As a pure function it composes
with the batched env; `TimeFeatureGymWrapper` provides the host-side
wrapper for the gym adapter.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def append_time_feature(obs, episode_step, max_steps, test_mode=False):
    """obs (..., D) + remaining-time feature -> (..., D+1)."""
    t = 1.0 - episode_step.astype(jnp.float32) / max_steps
    if test_mode:
        t = jnp.ones_like(t)
    return jnp.concatenate([obs, t[..., None]], axis=-1)


class TimeFeatureGymWrapper:
    """Host-side equivalent for GymGraspEnv."""

    def __init__(self, env, max_steps=None, test_mode=False):
        self.env = env
        self._max_steps = max_steps or env.env.time_horizon
        self._test_mode = test_mode
        self._t = 0
        low = np.append(np.broadcast_to(env.observation_space.low,
                                        env.observation_space.shape).reshape(-1), 0.0)
        self.observation_space = type(env.observation_space)(
            low=float(low.min()), high=1.0,
            shape=(int(np.prod(env.observation_space.shape)) + 1,),
        )
        self.action_space = env.action_space

    def _augment(self, obs):
        feat = 1.0 if self._test_mode else 1.0 - self._t / self._max_steps
        return np.append(np.asarray(obs).reshape(-1), np.float32(feat))

    def reset(self):
        self._t = 0
        return self._augment(self.env.reset())

    def step(self, action):
        self._t += 1
        obs, r, d, info = self.env.step(action)
        return self._augment(obs), r, d, info

    def __getattr__(self, name):
        return getattr(self.env, name)
