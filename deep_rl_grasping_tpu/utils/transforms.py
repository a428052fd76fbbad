"""Quaternion / rigid-transform math as pure JAX functions.

TPU-native replacement for the subset of the vendored Gohlke library the
reference actually uses (reference: manipulation_main/common/transformations.py
and transform_utils.py): quaternion<->matrix, euler conversions, random
quaternions, pose composition. Everything here is elementwise math on small
arrays, written so it can be `vmap`ped over env batches and fused by XLA.

Quaternion convention: [x, y, z, w] (matches the reference / ROS).
All functions accept float32 arrays and broadcast over leading axes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# This framework's geometry math must not silently run in bf16: the JAX build
# in this image defaults matmuls to low precision even on CPU. Small 3x3/4x4
# contractions are VPU work anyway, so HIGHEST costs nothing here.
einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)
matmul = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)


def quat_identity(dtype=jnp.float32):
    return jnp.array([0.0, 0.0, 0.0, 1.0], dtype=dtype)


def quat_normalize(q, eps=1e-12):
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_mul(q1, q2):
    """Hamilton product q1 ∘ q2 (apply q2 first, then q1). [x,y,z,w]."""
    x1, y1, z1, w1 = jnp.split(q1, 4, axis=-1)
    x2, y2, z2, w2 = jnp.split(q2, 4, axis=-1)
    return jnp.concatenate(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.array([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_rotate(q, v):
    """Rotate vector(s) v by unit quaternion q."""
    u = q[..., :3]
    w = q[..., 3:4]
    # v' = v + 2 w (u x v) + 2 u x (u x v)
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_rotate_inv(q, v):
    return quat_rotate(quat_conj(q), v)


def quat_to_matrix(q):
    """Unit quaternion -> 3x3 rotation matrix (broadcasts over leading dims)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(m):
    """3x3 rotation matrix -> unit quaternion [x,y,z,w]. Branch-free (Shepperd
    via the 4-candidate trick, safe under jit)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    # Four squared-magnitude candidates (4q_i^2 = 1 + sum of diag signs)
    qw2 = jnp.maximum(0.0, 1 + m00 + m11 + m22)
    qx2 = jnp.maximum(0.0, 1 + m00 - m11 - m22)
    qy2 = jnp.maximum(0.0, 1 - m00 + m11 - m22)
    qz2 = jnp.maximum(0.0, 1 - m00 - m11 + m22)
    qw = 0.5 * jnp.sqrt(qw2)
    qx = 0.5 * jnp.sqrt(qx2)
    qy = 0.5 * jnp.sqrt(qy2)
    qz = 0.5 * jnp.sqrt(qz2)
    # Resolve signs against the largest component, using the off-diagonals.
    cands = jnp.stack(
        [
            jnp.stack([qx, jnp.copysign(qy, m01 + m10), jnp.copysign(qz, m02 + m20), jnp.copysign(qw, m21 - m12)], -1),
            jnp.stack([jnp.copysign(qx, m01 + m10), qy, jnp.copysign(qz, m12 + m21), jnp.copysign(qw, m02 - m20)], -1),
            jnp.stack([jnp.copysign(qx, m02 + m20), jnp.copysign(qy, m12 + m21), qz, jnp.copysign(qw, m10 - m01)], -1),
            jnp.stack([jnp.copysign(qx, m21 - m12), jnp.copysign(qy, m02 - m20), jnp.copysign(qz, m10 - m01), qw], -1),
        ],
        axis=-2,
    )  # (..., 4 candidates, 4)
    mags = jnp.stack([qx2, qy2, qz2, qw2], axis=-1)
    idx = jnp.argmax(mags, axis=-1)
    q = jnp.take_along_axis(cands, idx[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    return quat_normalize(q)


def quat_from_euler(roll, pitch, yaw):
    """Static-axes xyz euler angles ('sxyz') -> quaternion [x,y,z,w].

    Matches transformations.quaternion_from_euler(ai, aj, ak) in the reference.
    """
    roll, pitch, yaw = jnp.asarray(roll), jnp.asarray(pitch), jnp.asarray(yaw)
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    return jnp.stack(
        [
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
            cr * cp * cy + sr * sp * sy,
        ],
        axis=-1,
    )


def quat_to_yaw(q):
    """Extract the z (yaw) euler angle, static-xyz convention."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))


def quat_about_axis(angle, axis):
    """Quaternion for rotation of `angle` about (not necessarily unit) axis."""
    axis = jnp.asarray(axis, jnp.float32)
    n = jnp.linalg.norm(axis, axis=-1, keepdims=True)
    u = axis / jnp.maximum(n, 1e-12)
    angle = jnp.asarray(angle)[..., None]
    return jnp.concatenate(
        [u * jnp.sin(angle * 0.5), jnp.cos(angle * 0.5)], axis=-1
    )


def random_quaternion(u3):
    """Uniform random unit quaternion from 3 uniforms in [0,1) (Shoemake).

    Matches transformations.random_quaternion(rand) element layout [x,y,z,w].
    """
    r1 = jnp.sqrt(1.0 - u3[..., 0])
    r2 = jnp.sqrt(u3[..., 0])
    t1 = 2.0 * jnp.pi * u3[..., 1]
    t2 = 2.0 * jnp.pi * u3[..., 2]
    return jnp.stack(
        [
            jnp.sin(t1) * r1,
            jnp.cos(t1) * r1,
            jnp.sin(t2) * r2,
            jnp.cos(t2) * r2,
        ],
        axis=-1,
    )


def random_unit_vector(u3):
    """Unit vector from 3 uniforms in [-1, 1]."""
    v = u3 / jnp.maximum(jnp.linalg.norm(u3, axis=-1, keepdims=True), 1e-12)
    return v


# ----------------------------------------------------------------------------
# Homogeneous transforms (4x4), used by the sensor extrinsics path.
# ----------------------------------------------------------------------------

def from_pose(translation, quat):
    """(t, q[x,y,z,w]) -> 4x4 homogeneous matrix."""
    t = jnp.asarray(translation, jnp.float32)
    R = quat_to_matrix(jnp.asarray(quat, jnp.float32))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def to_pose(T):
    """4x4 homogeneous matrix -> (t, q[x,y,z,w])."""
    return T[..., :3, 3], matrix_to_quat(T[..., :3, :3])


def transform_inv(T):
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -einsum("...ij,...j->...i", Rt, t)
    top = jnp.concatenate([Rt, ti[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)
