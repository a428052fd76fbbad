"""On-device scene sampling: the TPU replacement for URDF-reload resets.

Reference behavior (simulation/scene.py:8-59, base_scene.py:7-47): every
episode reset reloads plane/table/tray URDFs, samples 1-6 objects from the
configured dataset, drops each from z=0.1 with 0.4 s of settling per object
plus 1 s at the end (~800 Bullet substeps per reset).

TPU redesign: object types are indices into the ObjectLibrary; poses are
sampled directly in a *near-settled* configuration — uniform xy in the
curriculum extent, uniform random orientation, z chosen so the compound's
lowest sphere touches the support surface — followed by a short settle run.
This keeps auto-reset inside the jitted step cheap (no host, no asset IO) and
preserves the reference's object distribution (positions/orientations/counts).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deep_rl_grasping_tpu.sim import physics
from deep_rl_grasping_tpu.sim.types import (
    FINGER_OPEN,
    GripperState,
    ObjectState,
    SimParams,
    SimState,
)
from deep_rl_grasping_tpu.utils import transforms


def sample_objects(
    key,
    params: SimParams,
    type_ids: jnp.ndarray,
    max_slots: int,
    min_objects,
    max_objects,
    extent,
) -> ObjectState:
    """Sample object slots for one env.

    type_ids: (M,) candidate library ids (dataset split, base_scene.py:32-43).
    min/max_objects, extent: scalars (may be traced — curriculum-dependent).
    """
    k_n, k_t, k_xy, k_q, k_z = jax.random.split(key, 5)
    n = jax.random.randint(k_n, (), min_objects, max_objects + 1)
    alive = jnp.arange(max_slots) < n
    t_idx = jax.random.randint(k_t, (max_slots,), 0, type_ids.shape[0])
    obj_type = type_ids[t_idx].astype(jnp.int32)
    xy = jax.random.uniform(k_xy, (max_slots, 2), minval=-extent, maxval=extent)
    quat = transforms.random_quaternion(jax.random.uniform(k_q, (max_slots, 3)))
    # Rest height: lowest sphere point touches the support surface.
    R = physics.quat_to_matrix(quat)  # (K,3,3)
    local = params.centers[obj_type]  # (K,S,3)
    radii = params.radii[obj_type]  # (K,S)
    world_z = jnp.einsum("kij,ksj->ksi", R, local)[..., 2]
    smask = radii > 0.0
    lowest = jnp.min(jnp.where(smask, world_z - radii, jnp.inf), axis=-1)
    rest_z = params.support_z - lowest + 1e-4

    # Pile placement. The reference drops objects one at a time with 0.4 s
    # of settling each (scene.py:26-33), so small extents (1 cm at lambda=0
    # with 3 objects) produce stacks, never interpenetration. Spawning all
    # objects at rest height simultaneously instead creates deep overlaps
    # whose correction impulses eject them out of the workspace. Emulate
    # the sequential drop analytically: place slots in order, lifting each
    # just enough that its bounding sphere clears every earlier one.
    bound = params.bound_radius[obj_type]  # (K,)
    z_list = []
    for k in range(max_slots):
        zk = rest_z[k]
        for i in range(k):
            d2 = jnp.sum((xy[k] - xy[i]) ** 2)
            rr = bound[k] + bound[i]
            overlap = (d2 < rr * rr) & alive[i]
            lift = jnp.sqrt(jnp.maximum(rr * rr - d2, 0.0))
            zk = jnp.maximum(zk, jnp.where(overlap, z_list[i] + lift + 1e-3, -jnp.inf))
        z_list.append(zk)
    z = jnp.stack(z_list)
    pos = jnp.concatenate([xy, z[:, None]], axis=-1)
    zeros3 = jnp.zeros((max_slots, 3))
    return ObjectState(
        pos=pos, quat=quat, linvel=zeros3, angvel=zeros3,
        obj_type=obj_type, alive=alive,
    )


def init_gripper(initial_height) -> GripperState:
    """Gripper spawned at (0, 0, h), yaw 0, fingers open (robot.py:124-136)."""
    q = jnp.array([0.0, 0.0, 0.0, 0.0, FINGER_OPEN, FINGER_OPEN])
    q = q.at[2].set(initial_height)
    target = q[:4]
    return GripperState(
        q=q,
        qd=jnp.zeros(6),
        target=target,
        finger_target=jnp.asarray(FINGER_OPEN),
        gripper_close=jnp.asarray(False),
        ee_angle=jnp.asarray(0.0),
    )


def reset_scene(
    key,
    params: SimParams,
    type_ids: jnp.ndarray,
    max_slots: int,
    min_objects,
    max_objects,
    extent,
    initial_height,
    settle_substeps: int = 48,
) -> SimState:
    """Fresh episode state: sampled objects + short settle + gripper spawn."""
    objects = sample_objects(
        key, params, type_ids, max_slots, min_objects, max_objects, extent
    )
    # Settle with the gripper parked far above so it cannot interfere.
    # Velocities are zeroed between phases ("cooling"): stacked spawns
    # slump into resting piles instead of toppling with enough momentum to
    # fling objects several cm out of the spawn extent. The reference's
    # per-object 0.4 s sequential settle has the same gentle outcome
    # (scene.py:26-33); episode-level grasp success depends on objects
    # staying inside the gripper's narrow capture region at lambda=0.
    parked = init_gripper(1.0)
    state = SimState(gripper=parked, objects=objects)
    if settle_substeps > 0:
        phases = min(4, settle_substeps)
        per = settle_substeps // phases
        for _ in range(phases):
            state = physics.run(state, params, per)
            state = state.replace(
                objects=state.objects.replace(
                    linvel=jnp.zeros_like(state.objects.linvel),
                    angvel=jnp.zeros_like(state.objects.angvel),
                )
            )
    state = SimState(
        gripper=init_gripper(initial_height),
        objects=state.objects.replace(
            linvel=jnp.zeros_like(state.objects.linvel),
            angvel=jnp.zeros_like(state.objects.angvel),
        ),
    )
    return state
