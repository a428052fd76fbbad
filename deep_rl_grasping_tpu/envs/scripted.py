"""Scripted grasp experts as pure JAX policies.

Device-side ports of the reference's scripted data-collection policy
(scripts/collect_dataset.py:16-110: biased-random descend, close at grasp
height, lift) generalized to the full 5-DoF task: servo toward the nearest
alive object, close when centered at grasp height, then lift. Used for

* autoencoder dataset collection (training/collect_dataset.py), and
* replay-buffer demonstration seeding (training/trainer.py seed_demos):
  SAC on the full task cannot bootstrap off the ~3-4% random-grasp floor
  the way the reference's TF1 run could, so the buffer is pre-filled with
  scripted successes that the critic propagates.

All functions are vmap/jit-safe (no host control flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deep_rl_grasping_tpu.sim.types import PAD_CENTER_DEPTH, PAD_HALF_EXTENTS


def scripted_full_action(env, state, key, noise=0.1, p_random=0.1):
    """Expert action for the full 5-d continuous task.

    Mirrors the host-side probe policy (scripts_dev/probe_full_task.py):
    move over the nearest alive object, descend when centered, close at
    grasp height, lift while holding. `noise` jitters the move dims;
    `p_random` replaces the whole action with a uniform sample (episode
    diversity for the replay buffer).
    """
    g = state.sim.gripper
    obj = state.sim.objects
    mt = env.actuator_spec.max_translation

    d2 = jnp.sum((obj.pos[:, :2] - g.q[:2]) ** 2, axis=-1)
    d2 = jnp.where(obj.alive, d2, jnp.inf)
    k = jnp.argmin(d2)
    tx, ty = obj.pos[k, 0], obj.pos[k, 1]

    yaw = g.q[3]
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    wx, wy = tx - g.q[0], ty - g.q[1]
    # Hand frame is flipped (roll=pi): local +z = world down, local y flips
    # (robot.py:251-262 frame composition).
    ldx = cy * wx + sy * wy
    ldy = -(-sy * wx + cy * wy)
    dx = jnp.clip(ldx / mt, -1.0, 1.0)
    dy = jnp.clip(ldy / mt, -1.0, 1.0)

    floor_q2 = env.sim_params.support_z + PAD_CENTER_DEPTH + PAD_HALF_EXTENTS[2]
    near_xy = (jnp.abs(wx) < 0.005) & (jnp.abs(wy) < 0.005)
    low = g.q[2] < floor_q2 + 0.01
    closed = g.gripper_close

    do_close = (~closed) & near_xy & low
    oc = jnp.where(do_close, -1.0, 0.0)
    dz = jnp.where(closed, -1.0, jnp.where(near_xy, 1.0, 0.0))
    dx = jnp.where(closed, 0.0, dx)
    dy = jnp.where(closed, 0.0, dy)

    k_n, k_r, k_p = jax.random.split(key, 3)
    move = jnp.stack([dx, dy, dz, jnp.zeros_like(dx)])
    move = jnp.clip(
        move + noise * jax.random.normal(k_n, (4,)), -1.0, 1.0
    )
    a = jnp.concatenate([move, oc[None]])
    rand_a = jax.random.uniform(k_r, (5,), minval=-1.0, maxval=1.0)
    use_rand = jax.random.uniform(k_p, ()) < p_random
    return jnp.where(use_rand, rand_a, a)


def scripted_simplified_action(env, state, key, noise=0.15, p_random=0.1):
    """Expert for the simplified 3-d task (auto-descend handles z; the
    grasp attempt triggers at 0.07 m): steer xy toward the nearest object.
    Used for AE dataset collection parity (collect_dataset.py policy)."""
    g = state.sim.gripper
    obj = state.sim.objects
    mt = env.actuator_spec.max_translation

    d2 = jnp.sum((obj.pos[:, :2] - g.q[:2]) ** 2, axis=-1)
    d2 = jnp.where(obj.alive, d2, jnp.inf)
    k = jnp.argmin(d2)
    wx = obj.pos[k, 0] - g.q[0]
    wy = obj.pos[k, 1] - g.q[1]
    yaw = g.q[3]
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    ldx = cy * wx + sy * wy
    ldy = -(-sy * wx + cy * wy)
    a = jnp.stack(
        [
            jnp.clip(ldx / mt, -1.0, 1.0),
            jnp.clip(ldy / mt, -1.0, 1.0),
            jnp.zeros(()),
        ]
    )
    k_n, k_r, k_p = jax.random.split(key, 3)
    a = jnp.clip(a + noise * jax.random.normal(k_n, (3,)), -1.0, 1.0)
    rand_a = jax.random.uniform(k_r, (3,), minval=-1.0, maxval=1.0)
    use_rand = jax.random.uniform(k_p, ()) < p_random
    return jnp.where(use_rand, rand_a, a)
