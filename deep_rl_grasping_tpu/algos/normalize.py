"""On-device observation / reward normalization.

Replaces stable-baselines' VecNormalize (wired in sb_helper.py:75-76,101-103,
117-119): running mean/var over observations (per element) and a running
variance of discounted returns for reward scaling, clip 10. State is a small
pytree carried in the train state; `update_batch` folds a whole env batch of
frames at once (Chan parallel variance update), and under pmap/shard_map the
moments can be `psum`'d so every device shares one normalizer.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

CLIP_OBS = 10.0
CLIP_REWARD = 10.0
EPS = 1e-8


@struct.dataclass
class RunningMeanStd:
    mean: jnp.ndarray
    var: jnp.ndarray
    count: jnp.ndarray

    @classmethod
    def init(cls, shape):
        return cls(
            mean=jnp.zeros(shape, jnp.float32),
            var=jnp.ones(shape, jnp.float32),
            count=jnp.asarray(1e-4, jnp.float32),
        )


def rms_update(rms: RunningMeanStd, batch):
    """Fold a batch (leading axis = samples) into the running moments."""
    b = batch.reshape((-1,) + rms.mean.shape).astype(jnp.float32)
    bc = b.shape[0]
    bm = b.mean(0)
    bv = b.var(0)
    delta = bm - rms.mean
    tot = rms.count + bc
    mean = rms.mean + delta * bc / tot
    m_a = rms.var * rms.count
    m_b = bv * bc
    m2 = m_a + m_b + delta**2 * rms.count * bc / tot
    return RunningMeanStd(mean=mean, var=m2 / tot, count=tot)


@struct.dataclass
class NormalizerState:
    obs_rms: RunningMeanStd
    ret_rms: RunningMeanStd
    returns: jnp.ndarray  # (B,) running discounted return per env

    @classmethod
    def init(cls, obs_shape, num_envs):
        return cls(
            obs_rms=RunningMeanStd.init(obs_shape),
            ret_rms=RunningMeanStd.init(()),
            returns=jnp.zeros((num_envs,), jnp.float32),
        )


def update_batch(state: NormalizerState, obs, reward, done, gamma=0.99,
                 training=True):
    """Update running stats with one env-batch step; returns new state."""
    if not training:
        return state
    returns = state.returns * gamma * (1.0 - done.astype(jnp.float32)) + reward
    return NormalizerState(
        obs_rms=rms_update(state.obs_rms, obs),
        ret_rms=rms_update(state.ret_rms, returns),
        returns=returns,
    )


def normalize_obs(state: NormalizerState, obs):
    z = (obs - state.obs_rms.mean) / jnp.sqrt(state.obs_rms.var + EPS)
    return jnp.clip(z, -CLIP_OBS, CLIP_OBS)


def normalize_reward(state: NormalizerState, reward):
    return jnp.clip(
        reward / jnp.sqrt(state.ret_rms.var + EPS), -CLIP_REWARD, CLIP_REWARD
    )
