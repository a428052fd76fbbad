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

from deep_rl_grasping_tpu.sim import physics
from deep_rl_grasping_tpu.sim.types import PAD_CENTER_DEPTH, PAD_HALF_EXTENTS


def _yaw_align(env, state, k):
    """Yaw action in [-1, 1] aligning the pinch axis with the target
    object's minor horizontal axis; also returns the physical error.

    The diversified random_urdfs stand-ins (sim/objects.py) include rods
    and plates whose long axis must lie BETWEEN the pads: the pinch axis
    (gripper local x, physics.pad_frames) has to be perpendicular to the
    object's horizontal major axis. The major axis comes from the
    radius^3-weighted second moment of the object's world-frame sphere
    centers; round compounds (anisotropy below the gate) get no yaw
    command, preserving the round-3 expert behavior on blobs/blocks.

    The servo feedback variable is the COMMANDED yaw (-ee_angle,
    grasp_env._compose_move_target) — the physical joint q[3] lags its
    position servo, and feeding the lagging value back while commands
    accumulate in ee_angle is integrator windup (measured: envs with a
    large initial error oscillated at the action limit forever and never
    passed the alignment gate). The physical error is returned separately
    for the grasp-quality gate.

    Returns:
      (dyaw_action in [-1, 1], physical alignment error in radians)
    """
    centers, radii, mask = physics.world_spheres(state.sim, env.sim_params)
    c = centers[k, :, :2]
    r = radii[k]
    w = mask[k].astype(jnp.float32) * r**3
    wsum = jnp.maximum(w.sum(), 1e-9)
    mu = (w[:, None] * c).sum(0) / wsum
    d = c - mu
    cov = (w[:, None, None] * (d[:, :, None] * d[:, None, :])).sum(0) / wsum
    # Solid-sphere self-covariance enters the trace only: it shrinks the
    # anisotropy ratio for big-sphere compounds without moving the axis.
    self_tr = 2.0 * (w * r**2 / 5.0).sum() / wsum
    gap = jnp.hypot(cov[0, 0] - cov[1, 1], 2.0 * cov[0, 1])
    aniso = gap / jnp.maximum(cov[0, 0] + cov[1, 1] + self_tr, 1e-12)
    theta_maj = 0.5 * jnp.arctan2(2.0 * cov[0, 1], cov[0, 0] - cov[1, 1])
    # Pinch perpendicular to the major axis; symmetric mod pi.
    want = theta_maj + jnp.pi / 2.0

    def wrap(e):  # wrap to [-pi/2, pi/2): the pinch is symmetric mod pi
        return jnp.mod(e + jnp.pi / 2.0, jnp.pi) - jnp.pi / 2.0

    isotropic = aniso <= 0.15
    perr = jnp.where(isotropic, 0.0, wrap(want - state.sim.gripper.q[3]))
    cerr = jnp.where(
        isotropic, 0.0, wrap(want + state.sim.gripper.ee_angle)
    )
    act = jnp.clip(-cerr / env.actuator_spec.max_yaw_rotation, -1.0, 1.0)
    return act, perr


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

    # Recover from spurious closes: a p_random action can command `close`
    # mid-approach (a[4] < 0 half the time), latching an empty grip the
    # old expert never released — it then "lifted" nothing until the time
    # limit (measured: 78% success, 21% closed-but-empty episodes, 3x mean
    # episode length). An empty closed gripper (width <= grasp-detection
    # tolerance) is reopened so the approach resumes.
    width = physics.gripper_width(g.q)
    empty_closed = closed & (width <= 0.005)
    holding = closed & ~empty_closed

    # Only close once the pinch axis is physically aligned with the
    # object's minor axis — a misaligned close on a rod/plate just squeezes
    # its long axis and pops it out. Descent is NOT gated on alignment:
    # the yaw servo converges during the descent, and stalling the
    # approach just burns the time horizon.
    yaw_act, yaw_perr = _yaw_align(env, state, k)
    dyaw = jnp.where(closed, 0.0, yaw_act)
    aligned = jnp.abs(yaw_perr) < 0.25  # rad (~14 deg) physical error
    do_close = (~closed) & near_xy & low & aligned
    oc = jnp.where(do_close, -1.0, jnp.where(empty_closed, 1.0, 0.0))
    dz = jnp.where(holding, -1.0, jnp.where(near_xy, 1.0, 0.0))
    dx = jnp.where(closed, 0.0, dx)
    dy = jnp.where(closed, 0.0, dy)

    # Exploration must not sabotage the grasp itself: with unconditional
    # noise + p_random the expert measured 85.7% at lambda=0 (13.5% of
    # episodes closed off-center and never latched; random actions while
    # holding can emit `open` and drop the object). Gating both on the
    # engagement phase (centered-or-holding) restores the 99.7% noiseless
    # ceiling while keeping approach-phase diversity for the replay
    # (measured by scripts_dev/probe_expert_rate.py).
    engaged = closed | near_xy
    k_n, k_r, k_p = jax.random.split(key, 3)
    eff_noise = jnp.where(engaged, 0.0, noise)
    move = jnp.stack([dx, dy, dz, dyaw])
    move = jnp.clip(
        move + eff_noise * jax.random.normal(k_n, (4,)), -1.0, 1.0
    )
    a = jnp.concatenate([move, oc[None]])
    rand_a = jax.random.uniform(k_r, (5,), minval=-1.0, maxval=1.0)
    use_rand = (jax.random.uniform(k_p, ()) < p_random) & ~engaged
    return jnp.where(use_rand, rand_a, a)


def scripted_branched_action(env, state, key, noise=0.1, p_random=0.1):
    """Expert for BDQ's composite discrete actions: quantize the continuous
    expert per branch into `num_actions_pad` bins (the same linear
    discretization decode_branched_action inverts)."""
    pads = env.actuator_spec.num_actions_pad
    if env.simplified:
        a = scripted_simplified_action(env, state, key, noise, p_random)
    else:
        a = scripted_full_action(env, state, key, noise, p_random)
    bins = jnp.round((a + 1.0) / 2.0 * (pads - 1)).astype(jnp.int32)
    return jnp.clip(bins, 0, pads - 1)


def scripted_discrete_action(env, state, key, noise=0.1, p_random=0.1):
    """Expert for flat discrete action spaces.

    Simplified Discrete(3*pads): move the dominant branch one quantized
    step. Full Discrete(11): dominant-axis row of the reference lookup
    table (actuator.py:106-115; open=9, close=10)."""
    pads = env.actuator_spec.num_actions_pad
    if env.simplified:
        a = scripted_simplified_action(env, state, key, noise, p_random)
        branch = jnp.argmax(jnp.abs(a))
        idx = jnp.round((a[branch] + 1.0) / 2.0 * (pads - 1)).astype(jnp.int32)
        return branch.astype(jnp.int32) * pads + jnp.clip(idx, 0, pads - 1)
    a = scripted_full_action(env, state, key, noise, p_random)
    axis = jnp.argmax(jnp.abs(a[:4]))
    # rows: +x=1,-x=2,+y=3,-y=4,+z=5,-z=6,+yaw=7,-yaw=8
    move_row = 1 + 2 * axis + (a[axis] < 0).astype(jnp.int32)
    toggle = jnp.abs(a[4]) > 0.5
    toggle_row = jnp.where(a[4] > 0, 9, 10)
    return jnp.where(toggle, toggle_row, move_row).astype(jnp.int32)


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
            # Align the pinch axis while auto-descending (rods/plates).
            _yaw_align(env, state, k)[0],
        ]
    )
    k_n, k_r, k_p = jax.random.split(key, 3)
    a = jnp.clip(a + noise * jax.random.normal(k_n, (3,)), -1.0, 1.0)
    rand_a = jax.random.uniform(k_r, (3,), minval=-1.0, maxval=1.0)
    use_rand = jax.random.uniform(k_p, ()) < p_random
    return jnp.where(use_rand, rand_a, a)
