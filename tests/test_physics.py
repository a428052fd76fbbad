"""Physics engine tests against analytic expectations.

The reference has no physics unit tests (it trusts Bullet); these cover the
behaviors the env contract depends on: free fall, resting contact, the
position servo, finger-stall grasp detection, and friction-carried lifting.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_rl_grasping_tpu.sim import objects, physics, scene
from deep_rl_grasping_tpu.sim.types import (
    FINGER_CLOSED,
    FINGER_OPEN,
    GripperState,
    ObjectState,
    SimState,
    make_sim_params,
)

pytestmark = pytest.mark.physics  # heavy tier: real solver/env steps

CUBE = 1  # wooden block 'cube' library id (3 cm, ~20 g)


@pytest.fixture(scope="module")
def params():
    lib = objects.get_library(spheres_per_object=8)
    return make_sim_params(lib, scene_type="OnFloor")


def single_object_state(params, pos, obj_type=CUBE, gripper_height=1.0):
    K = 1
    return SimState(
        gripper=scene.init_gripper(gripper_height),
        objects=ObjectState(
            pos=jnp.asarray([pos], jnp.float32),
            quat=jnp.asarray([[0.0, 0.0, 0.0, 1.0]], jnp.float32),
            linvel=jnp.zeros((K, 3)),
            angvel=jnp.zeros((K, 3)),
            obj_type=jnp.asarray([obj_type], jnp.int32),
            alive=jnp.asarray([True]),
        ),
    )


def test_free_fall(params):
    state = single_object_state(params, [0.0, 0.0, 0.5])
    n = 24
    out = jax.jit(lambda s: physics.run(s, params, n))(state)
    t = n * params.dt
    expected_drop = 0.5 * 9.81 * t**2
    drop = 0.5 - float(out.objects.pos[0, 2])
    # damping makes it slightly less than ballistic
    assert 0.7 * expected_drop < drop < 1.05 * expected_drop


def test_object_rests_on_floor(params):
    lib = objects.get_library(8)
    # start resting: lowest sphere exactly on the floor
    r = float(lib.radii[CUBE].max())
    z0 = params.support_z + r
    state = single_object_state(params, [0.0, 0.0, z0])
    out = jax.jit(lambda s: physics.run(s, params, 240))(state)
    z = float(out.objects.pos[0, 2])
    assert abs(z - z0) < 0.01, f"object sank/floated: {z} vs {z0}"
    assert float(jnp.linalg.norm(out.objects.linvel[0])) < 0.05


def test_dropped_object_settles(params):
    state = single_object_state(params, [0.0, 0.0, params.support_z + 0.1])
    out = jax.jit(lambda s: physics.run(s, params, 480))(state)
    z = float(out.objects.pos[0, 2])
    # resting with some sphere radius above the floor, not through it
    assert params.support_z < z < params.support_z + 0.05
    assert float(jnp.linalg.norm(out.objects.linvel[0])) < 0.05


def test_gripper_servo_tracks_target(params):
    state = single_object_state(params, [1.0, 1.0, 0.0], gripper_height=0.25)
    g = state.gripper.replace(target=jnp.array([0.02, -0.01, 0.22, 0.1]))
    state = state.replace(gripper=g)
    out = jax.jit(lambda s: physics.run(s, params, 24))(state)
    q = np.asarray(out.gripper.q)
    np.testing.assert_allclose(q[:4], [0.02, -0.01, 0.22, 0.1], atol=3e-3)


def test_fingers_close_free(params):
    state = single_object_state(params, [1.0, 1.0, 0.0], gripper_height=0.25)
    g = state.gripper.replace(finger_target=jnp.asarray(FINGER_CLOSED))
    state = state.replace(gripper=g)
    out = jax.jit(lambda s: physics.run(s, params, 48))(state)
    width = float(physics.gripper_width(out.gripper.q))
    assert width < 0.005, f"fingers failed to close, width={width}"


def test_finger_stall_on_grasped_object(params):
    """Closing on a 3 cm cube must stall the fingers at ~3 cm width
    (grasp detection contract, robot.py:295-297)."""
    lib = objects.get_library(8)
    r = float(lib.radii[CUBE].max())
    z_obj = params.support_z + r
    # gripper positioned so pads straddle the object
    h = z_obj + 0.19  # pad center depth 0.187 below base
    state = single_object_state(params, [0.0, 0.0, z_obj], gripper_height=h)
    g = state.gripper.replace(
        target=jnp.array([0.0, 0.0, h, 0.0]),
        finger_target=jnp.asarray(FINGER_CLOSED),
    )
    state = state.replace(gripper=g)
    out = jax.jit(lambda s: physics.run(s, params, 48))(state)
    width = float(physics.gripper_width(out.gripper.q))
    assert width > 0.02, f"fingers crushed through object, width={width}"
    assert width < 0.06, f"fingers did not close onto object, width={width}"


def test_grasp_and_lift(params):
    """Squeeze the cube then raise the gripper: friction must carry it."""
    lib = objects.get_library(8)
    r = float(lib.radii[CUBE].max())
    z_obj = params.support_z + r
    h = z_obj + 0.19
    state = single_object_state(params, [0.0, 0.0, z_obj], gripper_height=h)
    g = state.gripper.replace(
        target=jnp.array([0.0, 0.0, h, 0.0]),
        finger_target=jnp.asarray(FINGER_CLOSED),
    )
    state = state.replace(gripper=g)
    state = jax.jit(lambda s: physics.run(s, params, 48))(state)

    def lift_step(s, dz):
        g = s.gripper.replace(target=s.gripper.target.at[2].add(dz))
        return physics.run(s.replace(gripper=g), params, 24)

    lift = jax.jit(lambda s: jax.lax.fori_loop(
        0, 8, lambda i, s: lift_step(s, 0.02), s))
    out = lift(state)
    rise_grip = float(out.gripper.q[2]) - h
    rise_obj = float(out.objects.pos[0, 2]) - z_obj
    assert rise_grip > 0.1, f"gripper failed to lift: {rise_grip}"
    assert rise_obj > 0.5 * rise_grip, (
        f"object slipped: obj +{rise_obj:.3f} vs grip +{rise_grip:.3f}"
    )


def test_scene_reset_places_objects_on_support(params):
    lib = objects.get_library(8)
    type_ids = jnp.asarray(lib.random_urdf_ids())
    key = jax.random.PRNGKey(0)
    state = jax.jit(
        lambda k: scene.reset_scene(
            k, params, type_ids, max_slots=5, min_objects=3, max_objects=5,
            extent=0.1, initial_height=0.25, settle_substeps=48,
        )
    )(key)
    alive = np.asarray(state.objects.alive)
    assert alive.sum() >= 3
    z = np.asarray(state.objects.pos[:, 2])[alive]
    assert np.all(z > params.support_z - 0.01)
    assert np.all(z < params.support_z + 0.12)


def test_vmapped_batch_step(params):
    lib = objects.get_library(8)
    type_ids = jnp.asarray(lib.random_urdf_ids())
    keys = jax.random.split(jax.random.PRNGKey(1), 16)
    reset = jax.vmap(
        lambda k: scene.reset_scene(
            k, params, type_ids, 5, 1, 5, 0.1, 0.25, settle_substeps=8
        )
    )
    states = jax.jit(reset)(keys)
    stepped = jax.jit(jax.vmap(lambda s: physics.run(s, params, 24)))(states)
    assert stepped.objects.pos.shape == (16, 5, 3)
    assert bool(jnp.all(jnp.isfinite(stepped.objects.pos)))


def test_rolling_object_stops(params):
    """Rolling resistance (SimParams.rolling_damping): a sphere-compound
    spinning on the floor must stop rolling within a few control steps —
    the reference's mesh objects stop on their flat faces, and a rod that
    rolls forever is a moving grasp target the task never intends
    (round-5 fidelity fix). With damping disabled it keeps rolling."""
    import dataclasses

    # resting on the floor, spinning about x at 6 rad/s (the magnitude a
    # spawn slump imparts), which rolls it along -y
    lib_r = float(jnp.max(params.radii[CUBE]))
    z0 = params.support_z + lib_r
    state = single_object_state(params, [0.0, 0.0, z0])
    state = state.replace(
        objects=state.objects.replace(
            angvel=jnp.asarray([[6.0, 0.0, 0.0]], jnp.float32)
        )
    )
    n = 48  # 3 control steps' worth of dt80 substeps
    out = jax.jit(lambda s: physics.run(s, params, n))(state)
    w = float(jnp.abs(out.objects.angvel[0]).max())
    v = float(jnp.abs(out.objects.linvel[0]).max())
    assert w < 0.5 and v < 0.02, (w, v)

    free = dataclasses.replace(params, rolling_damping=0.0)
    out2 = jax.jit(lambda s: physics.run(s, free, n))(state)
    w2 = float(jnp.abs(out2.objects.angvel[0]).max())
    # without the fix only air damping acts — at least 3x more residual spin
    assert w2 > 3.0 * w, (w2, w)
