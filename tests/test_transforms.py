"""Unit tests for the JAX transform math against numpy references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_rl_grasping_tpu.utils import transforms as tr


def _np_quat_matrix(q):
    # Gohlke-style quaternion -> matrix, [x,y,z,w]
    x, y, z, w = q
    n = np.dot(q, q)
    q2 = np.array(q) * np.sqrt(2.0 / n)
    q2 = np.outer(q2, q2)
    return np.array(
        [
            [1.0 - q2[1, 1] - q2[2, 2], q2[0, 1] - q2[2, 3], q2[0, 2] + q2[1, 3]],
            [q2[0, 1] + q2[2, 3], 1.0 - q2[0, 0] - q2[2, 2], q2[1, 2] - q2[0, 3]],
            [q2[0, 2] - q2[1, 3], q2[1, 2] + q2[0, 3], 1.0 - q2[0, 0] - q2[1, 1]],
        ]
    )


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_quat_matrix_matches_reference_convention(rng):
    for _ in range(20):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        R = tr.quat_to_matrix(jnp.asarray(q, jnp.float32))
        np.testing.assert_allclose(np.asarray(R), _np_quat_matrix(q), atol=1e-5)


def test_quat_matrix_roundtrip(rng):
    for _ in range(50):
        q = rng.normal(size=4).astype(np.float32)
        q /= np.linalg.norm(q)
        R = tr.quat_to_matrix(jnp.asarray(q))
        q2 = np.asarray(tr.matrix_to_quat(R))
        # q and -q are the same rotation
        if np.dot(q, q2) < 0:
            q2 = -q2
        np.testing.assert_allclose(q, q2, atol=1e-5)


def test_quat_rotate_matches_matrix(rng):
    q = rng.normal(size=4).astype(np.float32)
    q /= np.linalg.norm(q)
    v = rng.normal(size=3).astype(np.float32)
    out = tr.quat_rotate(jnp.asarray(q), jnp.asarray(v))
    expect = _np_quat_matrix(q) @ v
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)


def test_quat_from_euler_roll_pi():
    # init orientation of the gripper (robot.py:59)
    q = tr.quat_from_euler(np.pi, 0.0, 0.0)
    np.testing.assert_allclose(np.asarray(q), [1.0, 0.0, 0.0, 0.0], atol=1e-6)


def test_quat_yaw_roundtrip(rng):
    for yaw in [-2.0, -0.3, 0.0, 0.7, 3.0]:
        q = tr.quat_from_euler(0.0, 0.0, yaw)
        assert abs(float(tr.quat_to_yaw(q)) - yaw) < 1e-5


def test_random_quaternion_is_unit(rng):
    u = jnp.asarray(rng.uniform(size=(100, 3)), jnp.float32)
    q = tr.random_quaternion(u)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(q), axis=-1), np.ones(100), atol=1e-5
    )


def test_pose_roundtrip(rng):
    t = rng.normal(size=3).astype(np.float32)
    q = rng.normal(size=4).astype(np.float32)
    q /= np.linalg.norm(q)
    T = tr.from_pose(jnp.asarray(t), jnp.asarray(q))
    t2, q2 = tr.to_pose(T)
    np.testing.assert_allclose(np.asarray(t2), t, atol=1e-6)
    Tinv = tr.transform_inv(T)
    np.testing.assert_allclose(np.asarray(Tinv) @ np.asarray(T), np.eye(4), atol=1e-5)


def test_vmap_compatibility(rng):
    qs = rng.normal(size=(32, 4)).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=-1, keepdims=True)
    Rs = jax.vmap(tr.quat_to_matrix)(jnp.asarray(qs))
    assert Rs.shape == (32, 3, 3)
    qs2 = jax.vmap(tr.matrix_to_quat)(Rs)
    assert qs2.shape == (32, 4)
