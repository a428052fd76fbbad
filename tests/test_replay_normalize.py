"""Unit tests: replay buffers and the VecNormalize equivalent."""

import jax
import jax.numpy as jnp
import numpy as np

from deep_rl_grasping_tpu.algos import normalize as nm
from deep_rl_grasping_tpu.algos import replay


def test_insert_and_sample_roundtrip():
    buf = replay.create(64, (3,), (2,), batch_stride=4, obs_dtype=jnp.float32)
    for t in range(8):
        obs = jnp.full((4, 3), float(t))
        act = jnp.full((4, 2), float(t))
        rew = jnp.full((4,), float(t))
        done = jnp.zeros((4,), bool)
        buf = replay.insert(buf, obs, act, rew, done)
    assert int(buf.size) == 32
    batch = replay.sample(buf, jax.random.PRNGKey(0), 16)
    # next_obs must be exactly one env-step after obs
    np.testing.assert_allclose(
        np.asarray(batch["next_obs"][:, 0]), np.asarray(batch["obs"][:, 0]) + 1.0
    )
    np.testing.assert_allclose(
        np.asarray(batch["reward"]), np.asarray(batch["obs"][:, 0])
    )


def test_ring_wraparound():
    buf = replay.create(16, (1,), (1,), batch_stride=4, obs_dtype=jnp.float32)
    for t in range(10):  # 40 frames > capacity 16
        buf = replay.insert(
            buf,
            jnp.full((4, 1), float(t)),
            jnp.zeros((4, 1)),
            jnp.full((4,), float(t)),
            jnp.zeros((4,), bool),
        )
    assert int(buf.size) == 16
    batch = replay.sample(buf, jax.random.PRNGKey(1), 32)
    # only the last 4 insert rounds (t=6..9) survive; sampleable obs are t=6..8
    assert set(np.asarray(batch["obs"][:, 0]).tolist()) <= {6.0, 7.0, 8.0}
    np.testing.assert_allclose(
        np.asarray(batch["next_obs"][:, 0]), np.asarray(batch["obs"][:, 0]) + 1.0
    )


def test_prioritized_sampling_prefers_high_priority():
    buf = replay.create(64, (1,), (1,), batch_stride=4, obs_dtype=jnp.float32)
    for t in range(16):
        buf = replay.insert(
            buf,
            jnp.full((4, 1), float(t)),
            jnp.zeros((4, 1)),
            jnp.zeros((4,)),
            jnp.zeros((4,), bool),
        )
    # Give huge priority to slots holding obs==3.0
    pri = jnp.where(buf.obs[:, 0] == 3.0, 1000.0, 0.001)
    buf = buf.replace(priority=pri)
    batch = replay.sample_prioritized(buf, jax.random.PRNGKey(2), 32, alpha=1.0)
    frac = float(np.mean(np.asarray(batch["obs"][:, 0]) == 3.0))
    assert frac > 0.8, f"high-priority fraction too low: {frac}"
    assert np.all(np.asarray(batch["weight"]) <= 1.0 + 1e-6)


def test_priority_update():
    buf = replay.create(16, (1,), (1,), batch_stride=4, obs_dtype=jnp.float32)
    buf = replay.insert(
        buf, jnp.zeros((4, 1)), jnp.zeros((4, 1)), jnp.zeros((4,)), jnp.zeros((4,), bool)
    )
    buf = replay.update_priorities(buf, jnp.array([0, 1]), jnp.array([2.0, -3.0]))
    np.testing.assert_allclose(np.asarray(buf.priority[:2]), [2.0 + 1e-6, 3.0 + 1e-6])


def test_running_mean_std_matches_numpy():
    rms = nm.RunningMeanStd.init((3,))
    data = np.random.default_rng(0).normal(2.0, 3.0, size=(10, 32, 3)).astype(np.float32)
    for chunk in data:
        rms = nm.rms_update(rms, jnp.asarray(chunk))
    flat = data.reshape(-1, 3)
    np.testing.assert_allclose(np.asarray(rms.mean), flat.mean(0), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(rms.var), flat.var(0), rtol=1e-3)


def test_normalize_obs_clip():
    state = nm.NormalizerState.init((2,), 4)
    state = state.replace(
        obs_rms=nm.RunningMeanStd(
            mean=jnp.zeros(2), var=jnp.full((2,), 1e-4), count=jnp.asarray(100.0)
        )
    )
    z = nm.normalize_obs(state, jnp.array([100.0, -100.0]))
    np.testing.assert_allclose(np.asarray(z), [10.0, -10.0])


def test_reward_normalization_scales_by_return_std():
    state = nm.NormalizerState.init((2,), 8)
    rng = np.random.default_rng(1)
    for _ in range(50):
        r = jnp.asarray(rng.normal(0, 100.0, 8).astype(np.float32))
        d = jnp.zeros((8,), bool)
        state = nm.update_batch(state, jnp.zeros((8, 2)), r, d, gamma=0.9)
    scaled = nm.normalize_reward(state, jnp.asarray(100.0))
    assert 0.01 < float(scaled) < 2.0
