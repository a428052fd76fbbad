"""Parity: fused Pallas solver kernel vs the XLA physics path.

The kernel (ops/solver_pallas.py) mirrors sim/physics.py pass-for-pass, so
states must agree to float tolerance after multi-substep runs, including the
grasp-critical finger-squeeze behavior. Runs in interpret mode on the CPU
test mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_rl_grasping_tpu.ops import solver_pallas
from deep_rl_grasping_tpu.sim import objects as objlib
from deep_rl_grasping_tpu.sim import physics, scene
from deep_rl_grasping_tpu.sim.types import FINGER_CLOSED, SimState, make_sim_params

pytestmark = pytest.mark.physics  # heavy tier: real solver/env steps



@pytest.fixture(scope="module")
def params():
    lib = objlib.get_library(8)
    return make_sim_params(lib, scene_type="OnFloor")


def _make_states(params, B, key, height=0.15):
    def one(k):
        objects = scene.sample_objects(
            k, params, jnp.arange(6, 106, dtype=jnp.int32), 3,
            2, 3, jnp.asarray(0.03),
        )
        g = scene.init_gripper(height)
        return SimState(gripper=g, objects=objects)

    return jax.vmap(one)(jax.random.split(key, B))


def _assert_close(ref: SimState, out: SimState, tol):
    np.testing.assert_allclose(
        np.asarray(out.gripper.q), np.asarray(ref.gripper.q), atol=tol,
        err_msg="gripper q",
    )
    np.testing.assert_allclose(
        np.asarray(out.gripper.qd), np.asarray(ref.gripper.qd), atol=20 * tol,
        err_msg="gripper qd",
    )
    np.testing.assert_allclose(
        np.asarray(out.objects.pos), np.asarray(ref.objects.pos), atol=tol,
        err_msg="object pos",
    )
    np.testing.assert_allclose(
        np.asarray(out.objects.quat), np.asarray(ref.objects.quat),
        atol=10 * tol, err_msg="object quat",
    )


def test_freefall_settle_parity(params):
    """Objects dropped above the floor: gravity, plane contacts, stacking."""
    B = 4
    states = _make_states(params, B, jax.random.PRNGKey(0))
    # raise objects slightly so the first substeps are ballistic
    states = states.replace(
        objects=states.objects.replace(
            pos=states.objects.pos + jnp.array([0.0, 0.0, 0.01])
        )
    )
    n = 12
    ref = jax.vmap(lambda s: physics.run(s, params, n))(states)
    out = solver_pallas.run_batched_sim(
        states, params, n, block_e=B, interpret=True
    )
    _assert_close(ref, out, 2e-4)


def test_servo_move_parity(params):
    """Gripper servos driving toward a pose target."""
    B = 4
    states = _make_states(params, B, jax.random.PRNGKey(1))
    g = states.gripper
    tgt = jnp.tile(jnp.asarray([0.02, -0.015, 0.09, 0.4]), (B, 1))
    states = states.replace(gripper=g.replace(target=tgt))
    n = 24
    ref = jax.vmap(lambda s: physics.run(s, params, n))(states)
    out = solver_pallas.run_batched_sim(
        states, params, n, block_e=B, interpret=True
    )
    _assert_close(ref, out, 5e-4)


def test_grasp_squeeze_parity(params):
    """Closing the fingers onto objects at grasp height: the stiff two-pad
    squeeze with motor rows is the behavior the RL task depends on."""
    B = 4
    states = _make_states(params, B, jax.random.PRNGKey(2), height=0.08)
    g = states.gripper
    tgt = g.q[:, :4]
    states = states.replace(
        gripper=g.replace(
            target=tgt,
            finger_target=jnp.full((B,), FINGER_CLOSED),
            gripper_close=jnp.ones((B,), bool),
        )
    )
    n = 48
    ref = jax.vmap(lambda s: physics.run(s, params, n))(states)
    out = solver_pallas.run_batched_sim(
        states, params, n, block_e=B, interpret=True
    )
    _assert_close(ref, out, 2e-3)
    # widths must agree so grasp detection (width > 5 mm) is identical
    w_ref = jax.vmap(physics.gripper_width)(ref.gripper.q)
    w_out = jax.vmap(physics.gripper_width)(out.gripper.q)
    np.testing.assert_allclose(
        np.asarray(w_out), np.asarray(w_ref), atol=1e-3
    )


@pytest.fixture(scope="module")
def table_params():
    lib = objlib.get_library(8)
    return make_sim_params(lib, scene_type="OnTable")


def test_tray_wall_contact_parity(table_params):
    """OnTable (the default full-task scene, has_tray=True): objects thrown
    outward against the tray walls must bounce/settle identically through
    the kernel's wall-contact branch (round-2 advisor gap: the branch ran
    default-on on TPU with zero numerical validation)."""
    params = table_params
    B = 4
    states = _make_states(params, B, jax.random.PRNGKey(4))
    obj = states.objects
    # Park each alive object near a different wall and launch it outward.
    k = obj.pos.shape[1]
    edge = params.tray_half - 0.03
    dirs = jnp.array([[1.0, 0.0], [-1.0, 0.0], [0.0, 1.0], [0.0, -1.0]])
    d = jnp.broadcast_to(dirs[jnp.arange(k) % 4], (B, k, 2))
    pos = obj.pos.at[:, :, :2].set(d * edge * 0.7)
    vel = obj.linvel.at[:, :, :2].set(d * 0.8)
    states = states.replace(objects=obj.replace(pos=pos, linvel=vel))
    n = 36
    ref = jax.vmap(lambda s: physics.run(s, params, n))(states)
    out = solver_pallas.run_batched_sim(
        states, params, n, block_e=B, interpret=True
    )
    # All objects must have been stopped by the walls (inside the tray).
    inside = jnp.all(
        jnp.abs(np.asarray(ref.objects.pos)[:, :, :2]) < params.tray_half + 0.05
    )
    assert inside, "test setup: objects escaped the tray in the reference path"
    _assert_close(ref, out, 2e-3)


def test_tray_grasp_squeeze_parity(table_params):
    """Finger squeeze at grasp height inside the tray (wall branch active)."""
    params = table_params
    B = 4
    # grasp height relative to the tray floor (support_z -0.19 vs -0.196)
    states = _make_states(params, B, jax.random.PRNGKey(5), height=0.08)
    g = states.gripper
    states = states.replace(
        gripper=g.replace(
            target=g.q[:, :4],
            finger_target=jnp.full((B,), FINGER_CLOSED),
            gripper_close=jnp.ones((B,), bool),
        )
    )
    n = 48
    ref = jax.vmap(lambda s: physics.run(s, params, n))(states)
    out = solver_pallas.run_batched_sim(
        states, params, n, block_e=B, interpret=True
    )
    _assert_close(ref, out, 2e-3)
    w_ref = jax.vmap(physics.gripper_width)(ref.gripper.q)
    w_out = jax.vmap(physics.gripper_width)(out.gripper.q)
    np.testing.assert_allclose(np.asarray(w_out), np.asarray(w_ref), atol=1e-3)


def test_batch_padding(params):
    """Batch sizes that don't divide block_e round-trip unchanged."""
    B = 3
    states = _make_states(params, B, jax.random.PRNGKey(3))
    n = 4
    ref = jax.vmap(lambda s: physics.run(s, params, n))(states)
    out = solver_pallas.run_batched_sim(
        states, params, n, block_e=4, interpret=True
    )
    _assert_close(ref, out, 2e-4)


@pytest.mark.parametrize(
    "opts",
    [
        dict(oo_point_mass_tangent=True),
        dict(oo_pass_stride=2),
        dict(oo_point_mass_tangent=True, oo_pass_stride=2),
    ],
    ids=["pm_tangent", "stride2", "pm+stride"],
)
def test_objobj_knob_parity(params, opts):
    """The object-object cost knobs (SimParams.oo_point_mass_tangent /
    oo_pass_stride) change the solve in BOTH paths identically: XLA and
    Pallas must still agree to float tolerance with the knobs on."""
    import dataclasses

    p = dataclasses.replace(params, **opts)
    B = 4
    states = _make_states(p, B, jax.random.PRNGKey(3))
    n = 12
    ref = jax.vmap(lambda s: physics.run(s, p, n))(states)
    out = solver_pallas.run_batched_sim(states, p, n, block_e=B, interpret=True)
    _assert_close(ref, out, 2e-4)


def test_objobj_knobs_stay_physical(params):
    """With both knobs on, settled objects neither explode nor sink: the
    approximation only touches friction effective masses / pass cadence,
    so resting contact (normal rows) must stay resolved."""
    import dataclasses

    p = dataclasses.replace(
        params, oo_point_mass_tangent=True, oo_pass_stride=2
    )
    B = 4
    states = _make_states(p, B, jax.random.PRNGKey(7))
    out = jax.vmap(lambda s: physics.run(s, p, 48))(states)
    z = np.asarray(out.objects.pos[..., 2])
    alive = np.asarray(out.objects.alive)
    r_max = float(np.max(np.asarray(p.radii)))
    # every alive object's COM is above the support and below a sane bound
    assert np.all(z[alive] > p.support_z - 1e-3)
    assert np.all(z[alive] < p.support_z + 10 * r_max)
    v = np.asarray(out.objects.linvel)
    assert np.all(np.abs(v[alive]) < 4.0)


def test_pinch_damping_parity(params):
    """SimParams.pinch_damping (in-hand spin resistance): XLA and Pallas
    paths agree with the knob on, driving a close-and-squeeze sequence so
    both-pad contacts actually occur."""
    import dataclasses

    p = dataclasses.replace(params, pinch_damping=0.2)
    B = 4
    states = _make_states(p, B, jax.random.PRNGKey(11), height=0.11)
    states = states.replace(
        gripper=states.gripper.replace(
            finger_target=jnp.full((B,), FINGER_CLOSED)
        )
    )
    n = 16
    ref = jax.vmap(lambda s: physics.run(s, p, n))(states)
    out = solver_pallas.run_batched_sim(states, p, n, block_e=B, interpret=True)
    _assert_close(ref, out, 2e-4)
