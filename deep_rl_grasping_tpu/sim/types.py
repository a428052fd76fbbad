"""State and parameter pytrees for the batched rigid-body world.

The reference keeps simulation state inside the Bullet C++ engine and crosses
the FFI boundary per query (simulation/model.py, simulation/simulation.py).
Here the whole world is a JAX pytree living in HBM; one env's state is a set
of small arrays and a batch of envs is the same pytree with a leading axis
added by `vmap`.

Gripper model (reference: models/gripper/wsg50_one_motor_gripper_new.sdf,
flying WSG-50): reduced coordinates q = [x, y, z, yaw, f_left, f_right].
The virtual world prismatic/revolute joints of the SDF collapse into the
world-frame pose DOFs; the two finger prismatic joints keep the SDF's
[-0.01, 0.05] limits and the `width = (0.05-f_l)+(0.05-f_r)` convention
(robot.py:279-284).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

# Finger joint geometry (from the WSG-50 SDF link poses):
FINGER_LIMIT_LOW = -0.01
FINGER_LIMIT_HIGH = 0.05
FINGER_OPEN = 0.0
FINGER_CLOSED = 0.05
# Finger link origin offset from gripper base along local x (SDF: +-0.062),
# pad box half extents, and pad center depth below the base.
PAD_X_OFFSET = 0.062
PAD_HALF_EXTENTS = (0.010, 0.010, 0.075)
PAD_CENTER_DEPTH = 0.187  # pads span [0.112, 0.262] below the base link
# Gripper body box (for rendering/visibility): base housing above the fingers.
BASE_HALF_EXTENTS = (0.025, 0.025, 0.055)
BASE_CENTER_DEPTH = 0.055


@struct.dataclass
class GripperState:
    q: jnp.ndarray        # (6,) [x, y, z, yaw, f_l, f_r]
    qd: jnp.ndarray       # (6,)
    target: jnp.ndarray   # (4,) servo targets for x, y, z, yaw
    finger_target: jnp.ndarray  # () scalar: FINGER_OPEN or FINGER_CLOSED
    gripper_close: jnp.ndarray  # () bool latch (actuator.py _gripper_open inverse)
    ee_angle: jnp.ndarray       # () accumulated endEffectorAngle (robot.py:258)


@struct.dataclass
class ObjectState:
    pos: jnp.ndarray      # (K, 3) COM position, world
    quat: jnp.ndarray     # (K, 4) [x,y,z,w]
    linvel: jnp.ndarray   # (K, 3)
    angvel: jnp.ndarray   # (K, 3) world frame
    obj_type: jnp.ndarray  # (K,) int32 index into ObjectLibrary
    alive: jnp.ndarray    # (K,) bool


@struct.dataclass
class SimState:
    gripper: GripperState
    objects: ObjectState


@struct.dataclass
class SimParams:
    """Static physics parameters (one copy, closed over by jit)."""
    dt: float = struct.field(pytree_node=False, default=1.0 / 240.0)
    solver_iterations: int = struct.field(pytree_node=False, default=8)
    # Support surface height: tray floor (OnTable, tray placed at -0.19,
    # scene.py:19-20) or plane (OnFloor, -0.196, scene.py:39).
    support_z: float = 0.0
    has_tray: bool = struct.field(pytree_node=False, default=False)
    # Tray inner half-size and wall parameters (pybullet tray.urdf, 1.2 scale)
    tray_half: float = 0.21
    tray_wall_height: float = 0.062
    friction: float = 1.0
    baumgarte: float = 0.2
    slop: float = 1e-4
    relaxation: float = 0.35
    gravity: float = -9.81
    lin_damping: float = 0.2
    ang_damping: float = 1.0
    # Gripper effective masses per DOF [x, y, z, yaw(inertia), f_l, f_r]
    dof_mass: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.array([6.0, 6.0, 6.0, 0.1, 0.4, 0.4], jnp.float32)
    )
    # Servo force caps. Reference model.py:69-74 passes force=100 everywhere;
    # fingers here use 50 N (real WSG-50 grip force is ~80 N): the lighter
    # motor impulse is fully cancelled by contacts each substep, eliminating
    # slow crush-through on held objects (still >50x any object's weight).
    dof_force: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.array([100.0, 100.0, 100.0, 20.0, 50.0, 50.0], jnp.float32)
    )
    # Servo velocity caps: Bullet position motors implicitly bound speed;
    # uncapped dead-beat servos tunnel fingers through objects in a couple
    # of substeps. Finger cap ~ WSG-50 jaw speed (0.35 m/s closes 5 cm well
    # within the 0.2 s gripper schedule).
    dof_vmax: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.array([1.5, 1.5, 1.5, 6.0, 0.25, 0.25], jnp.float32)
    )
    # Cap on the Baumgarte separation velocity so deep penetrations are
    # resolved over a few substeps instead of one explosive impulse.
    max_bias_velocity: float = 1.0
    # Fraction of the previous substep's contact impulses applied as the
    # initial guess (contact slots have stable identity across substeps).
    warm_start: float = 0.95
    # Inner alternations of (finger motors, left pad, right pad) per solver
    # iteration — resolves the stiff two-pad squeeze subsystem.
    pad_inner_iterations: int = struct.field(pytree_node=False, default=14)
    # Rolling resistance at static (floor/tray) contacts, as a per-substep
    # angular-velocity damping factor applied to objects with an active
    # static contact. Fidelity fix (round 5): the reference's mesh objects
    # stop rolling on their flat faces, but our sphere-compound stand-ins
    # are perfectly round — a settled rod picks up ~6 rad/s during the
    # spawn slump and then rolls >10 cm across the floor with nothing but
    # air damping to stop it (a moving grasp target the reference never
    # has). Bullet exposes the same mitigation as contact rolling_friction.
    # 0.1/substep => a rolling rod stops within ~2 control steps at dt80;
    # airborne/tumbling objects are unaffected (no static contact).
    rolling_damping: float = struct.field(pytree_node=False, default=0.1)
    # In-hand spin resistance (round-5, default OFF pending a trained-run
    # validation): an object pinched between BOTH pads damps its angular
    # velocity toward the gripper's yaw rotation. Sphere compounds rotate
    # freely about the grip axis on perfectly-round contact paths where a
    # real box/plate's flat faces would lock — measured ceiling: the
    # scripted expert itself only holds block 58% / plate 78% at lambda=1
    # while blob/rod/bent are 98-100% (out/class_probe_expert.log).
    pinch_damping: float = struct.field(pytree_node=False, default=0.0)
    # Object-object cost knobs (docs/KERNEL_BREAKDOWN.md: the objobj
    # category was 57% of the fused kernel). Both are expert-fidelity-gated
    # before any production config flips them (docs/PHYSICS_SCHEDULE.md).
    #
    # oo_point_mass_tangent: approximate the FRICTION effective masses of
    # object-object contacts as 1/m_i + 1/m_j, dropping the rotational
    # r x d . I^-1 (r x d) terms (the normal row keeps the exact mass).
    # Rationale: objobj friction only has to damp relative sliding between
    # resting/colliding objects — grasp fidelity lives in the pad rows,
    # which stay exact. Dropping the positive rotational terms
    # underestimates w (overshoots the tangent impulse), but the friction
    # cone projection bounds it by mu*lam_n each pass.
    oo_point_mass_tangent: bool = struct.field(pytree_node=False, default=False)
    # oo_pass_stride: solve the object-object rows every Nth solver
    # iteration (always on iteration 0; warm start unaffected). Objobj
    # couplings are soft (resting piles) vs the stiff pad pinch, so their
    # Gauss-Seidel residual tolerates fewer sweeps.
    oo_pass_stride: int = struct.field(pytree_node=False, default=1)
    pad_omega: float = 0.4
    pad_bias_scale: float = 0.1
    # Object library (dense arrays, set at build time)
    centers: jnp.ndarray = None     # (T, S, 3)
    radii: jnp.ndarray = None       # (T, S)
    # Coarse LOD used ONLY for object-object narrow phase (objects.py
    # _coarse_fit): enclosing-sphere clusters of the fine compound. Pads
    # and statics keep the fine set — grasp fidelity lives there; the
    # (NP,S,S,E) pair planes were 57% of the fused kernel at S=8.
    oo_centers: jnp.ndarray = None  # (T, SC, 3)
    oo_radii: jnp.ndarray = None    # (T, SC)
    inv_mass: jnp.ndarray = None    # (T,)
    inv_inertia: jnp.ndarray = None  # (T, 3) principal, body frame
    color: jnp.ndarray = None       # (T, 3)
    bound_radius: jnp.ndarray = None  # (T,)


def make_sim_params(library, scene_type="OnTable", **overrides):
    support_z = -0.19 if scene_type == "OnTable" else -0.196
    return SimParams(
        support_z=support_z,
        has_tray=(scene_type == "OnTable"),
        centers=jnp.asarray(library.centers),
        radii=jnp.asarray(library.radii),
        oo_centers=jnp.asarray(library.oo_centers),
        oo_radii=jnp.asarray(library.oo_radii),
        inv_mass=jnp.asarray(library.inv_mass),
        inv_inertia=jnp.asarray(library.inv_inertia),
        color=jnp.asarray(library.color),
        bound_radius=jnp.asarray(library.bound_radius),
        **overrides,
    )
