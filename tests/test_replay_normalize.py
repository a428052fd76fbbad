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


def test_nstep_returns_hand_computed():
    """n-step gather: reward accumulation truncated at (and including) the
    first terminal, discount zeroing, and next-index striding — against
    hand-computed values (the flagship trains with n_step=3)."""
    B, gamma = 2, 0.9
    buf = replay.create(32, (1,), (1,), batch_stride=B, obs_dtype=jnp.float32)
    # env 0: rewards 1,2,3,4 no terminal; env 1: rewards 10,20,30,40 with a
    # terminal at t=1.
    rews = [(1.0, 10.0), (2.0, 20.0), (3.0, 30.0), (4.0, 40.0)]
    dones = [(False, False), (False, True), (False, False), (False, False)]
    for t in range(4):
        obs = jnp.asarray([[float(t)], [100.0 + t]])
        act = jnp.zeros((B, 1))
        buf = replay.insert(
            buf, obs, act, jnp.asarray(rews[t]), jnp.asarray(dones[t])
        )
    # Slot t=0 for both envs: ring index 0 (env 0) and 1 (env 1).
    idx = jnp.asarray([0, 1], jnp.int32)
    r, d, nxt, disc = replay._nstep_gather(buf, idx, n_step=3, gamma=gamma)
    # env 0: 1 + .9*2 + .81*3 = 5.23, no terminal, disc = .9^3, next = t3
    np.testing.assert_allclose(float(r[0]), 1 + 0.9 * 2 + 0.81 * 3, rtol=1e-6)
    assert not bool(d[0])
    np.testing.assert_allclose(float(disc[0]), 0.9**3, rtol=1e-6)
    assert float(buf.obs[nxt[0], 0]) == 3.0
    # env 1: 10 + .9*20 = 28, truncated at the terminal inside the window;
    # episode ended -> done, discount 0.
    np.testing.assert_allclose(float(r[1]), 10 + 0.9 * 20, rtol=1e-6)
    assert bool(d[1])
    np.testing.assert_allclose(float(disc[1]), 0.0)


def test_nstep_valid_range_shrinks():
    """Frames without n written successors must not be sampleable."""
    B = 4
    buf = replay.create(64, (1,), (1,), batch_stride=B, obs_dtype=jnp.float32)
    for t in range(5):
        buf = replay.insert(
            buf, jnp.full((B, 1), float(t)), jnp.zeros((B, 1)),
            jnp.zeros((B,)), jnp.zeros((B,), bool),
        )
    # 20 frames written; with n_step=3 only the first 2 batches (t=0,1)
    # have 3 successors.
    assert int(replay._valid_range(buf, n_step=3)) == 2 * B
    batch = replay.sample(buf, jax.random.PRNGKey(0), 64, n_step=3, gamma=0.99)
    assert float(batch["obs"].max()) <= 1.0


def test_recency_stratified_sampling():
    """recent_batch rows must come from the newest recent_window frames;
    the remaining rows stay uniform over the whole valid range."""
    buf = replay.create(400, (1,), (1,), batch_stride=4, obs_dtype=jnp.float32)
    for t in range(80):  # 320 frames, no wraparound
        buf = replay.insert(
            buf,
            jnp.full((4, 1), float(t)),
            jnp.zeros((4, 1)),
            jnp.zeros((4,)),
            jnp.zeros((4,), bool),
        )
    batch = replay.sample(
        buf, jax.random.PRNGKey(0), 64, recent_batch=32, recent_window=40
    )
    vals = np.asarray(batch["obs"][:, 0])
    # Valid range is t=0..78 (the newest insert lacks successors). The
    # stratified tail (last 32 rows) must lie within the newest 40 frames
    # = 10 insert rounds: t in [69, 78].
    assert vals[32:].min() >= 69.0
    assert vals[32:].max() <= 78.0
    # The uniform head should still reach old data (overwhelmingly likely:
    # P(all 32 uniform draws land in the newest 13% of the ring) ~ 1e-28).
    assert vals[:32].min() < 69.0
    # next_obs stride still holds for stratified rows
    np.testing.assert_allclose(
        np.asarray(batch["next_obs"][:, 0]), vals + 1.0
    )


def test_recency_window_clamped_to_valid_range():
    """A recent_window larger than the buffer content must degrade to
    uniform sampling over the valid range, not index garbage."""
    buf = replay.create(64, (1,), (1,), batch_stride=4, obs_dtype=jnp.float32)
    for t in range(4):
        buf = replay.insert(
            buf,
            jnp.full((4, 1), float(t)),
            jnp.zeros((4, 1)),
            jnp.zeros((4,)),
            jnp.zeros((4,), bool),
        )
    batch = replay.sample(
        buf, jax.random.PRNGKey(0), 16, recent_batch=8, recent_window=10_000
    )
    vals = np.asarray(batch["obs"][:, 0])
    assert vals.min() >= 0.0 and vals.max() <= 2.0  # valid t = 0..2


def test_ring_snapshot_restore_roundtrip():
    """snapshot() keeps the newest K frames; restore_snapshot() rebuilds a
    ring whose samples come only from those frames, with the seam rows
    (last batch_stride) forced terminal so nothing bootstraps across the
    save/restore boundary."""
    buf = replay.create(64, (3,), (2,), batch_stride=4, obs_dtype=jnp.float32)
    for t in range(20):  # 80 frames -> wraps the 64-slot ring
        obs = jnp.full((4, 3), float(t))
        act = jnp.full((4, 2), float(t))
        rew = jnp.full((4,), float(t))
        buf = replay.insert(buf, obs, act, rew, jnp.zeros((4,), bool))
    snap = replay.snapshot(buf, 16)  # newest 16 frames = t in {16..19}
    assert int(snap["n"]) == 16
    np.testing.assert_allclose(
        np.asarray(snap["reward"]).reshape(4, 4)[:, 0], [16, 17, 18, 19]
    )
    fresh = replay.create(64, (3,), (2,), batch_stride=4, obs_dtype=jnp.float32)
    restored = replay.restore_snapshot(fresh, snap)
    assert int(restored.size) == 16 and int(restored.ptr) == 16
    # seam: last stride rows marked done
    assert bool(np.all(np.asarray(restored.done[12:16])))
    assert not bool(np.any(np.asarray(restored.done[:12])))
    batch = replay.sample(restored, jax.random.PRNGKey(1), 32)
    vals = np.asarray(batch["obs"][:, 0])
    assert vals.min() >= 16.0 and vals.max() <= 19.0
    # post-restore inserts continue the ring seamlessly
    restored = replay.insert(
        restored, jnp.full((4, 3), 20.0), jnp.full((4, 2), 20.0),
        jnp.full((4,), 20.0), jnp.zeros((4,), bool),
    )
    assert int(restored.ptr) == 20 and int(restored.size) == 20


def test_ring_snapshot_partial_fill():
    """Early-run snapshot (size < rows): restore keeps only written rows."""
    buf = replay.create(64, (3,), (2,), batch_stride=4, obs_dtype=jnp.float32)
    buf = replay.insert(
        buf, jnp.ones((4, 3)), jnp.ones((4, 2)), jnp.ones((4,)),
        jnp.zeros((4,), bool),
    )
    snap = replay.snapshot(buf, 16)
    assert int(snap["n"]) == 4
    restored = replay.restore_snapshot(
        replay.create(64, (3,), (2,), batch_stride=4, obs_dtype=jnp.float32),
        snap,
    )
    assert int(restored.size) == 4
