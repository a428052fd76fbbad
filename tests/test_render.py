"""Renderer property tests: depth metric correctness, segmentation ids,
camera pose composition, FOV visibility — the contracts the env relies on
(sensor.py semantics; golden-image tests are self-referential so properties
are checked instead)."""

import jax
import jax.numpy as jnp
import numpy as np

from deep_rl_grasping_tpu.render import raycast
from deep_rl_grasping_tpu.sim import objects, physics, scene
from deep_rl_grasping_tpu.sim.types import ObjectState, SimState, make_sim_params

H = W = 64
INTR = jnp.array([69.76, 77.25, 32.19, 32.0])


def _lookdown_camera(height):
    """Camera at (0,0,height) looking straight down (OpenCV axes)."""
    cam_R = jnp.array([[1.0, 0.0, 0.0], [0.0, -1.0, 0.0], [0.0, 0.0, -1.0]])
    return jnp.array([0.0, 0.0, height]), cam_R


def _state_with_objects(params, pos, types, gripper_height=5.0):
    K = len(pos)
    return SimState(
        gripper=scene.init_gripper(gripper_height),
        objects=ObjectState(
            pos=jnp.asarray(pos, jnp.float32),
            quat=jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0]), (K, 1)),
            linvel=jnp.zeros((K, 3)),
            angvel=jnp.zeros((K, 3)),
            obj_type=jnp.asarray(types, jnp.int32),
            alive=jnp.ones(K, bool),
        ),
    )


def test_depth_is_metric_z():
    """A plane at distance d straight below the camera must give depth == d
    at the optical center (the reference recovers exactly this metric depth
    from the GL z-buffer, sensor.py:140)."""
    lib = objects.get_library(8)
    params = make_sim_params(lib, scene_type="OnFloor")
    state = _state_with_objects(params, [[10.0, 10.0, 0.0]], [1])
    cam_pos, cam_R = _lookdown_camera(params.support_z + 0.5)
    rgb, depth, mask = raycast.render(
        state, params, cam_pos, cam_R, INTR, H, W
    )
    cy, cx = 32, 32
    assert abs(float(depth[cy, cx]) - 0.5) < 1e-3
    # off-center pixels see the plane farther away but still Z_c == 0.5
    # (metric depth is along the camera axis, not the ray)
    assert abs(float(depth[5, 5]) - 0.5) < 1e-3


def test_object_appears_with_correct_id_onfloor():
    lib = objects.get_library(8)
    params = make_sim_params(lib, scene_type="OnFloor")
    state = _state_with_objects(
        params, [[0.0, 0.0, params.support_z + 0.03]], [1]
    )
    cam_pos, cam_R = _lookdown_camera(params.support_z + 0.5)
    _, depth, mask = raycast.render(state, params, cam_pos, cam_R, INTR, H, W)
    mask = np.asarray(mask)
    assert (mask == 1).sum() > 10, "object slot 0 -> id 1 not visible"
    assert (mask == 0).sum() > 100, "floor (id 0) should dominate"
    # object must be closer than the floor
    obj_depth = np.asarray(depth)[mask == 1].min()
    floor_depth = np.asarray(depth)[mask == 0].min()
    assert obj_depth < floor_depth


def test_segmentation_ids_ontable():
    lib = objects.get_library(8)
    params = make_sim_params(lib, scene_type="OnTable")
    state = _state_with_objects(
        params, [[0.0, 0.0, params.support_z + 0.03]], [1]
    )
    cam_pos, cam_R = _lookdown_camera(params.support_z + 0.5)
    _, _, mask = raycast.render(state, params, cam_pos, cam_R, INTR, H, W)
    mask = np.asarray(mask)
    # tray floor id 2, object slot0 -> id 3 (encoder filter contract,
    # sensor.py:210-217)
    assert (mask == 2).sum() > 100
    assert (mask == 3).sum() > 10


def test_gripper_visible_in_wrist_view():
    """With the real extrinsics the finger pads appear in frame (the FOV
    check counts on plane+gripper always visible, robot.py:27-28)."""
    from deep_rl_grasping_tpu.utils import transforms

    lib = objects.get_library(8)
    params = make_sim_params(lib, scene_type="OnFloor")
    state = _state_with_objects(params, [[10.0, 10.0, 0.0]], [1],
                                gripper_height=0.25)
    t_rc = jnp.array([0.0, 0.0573, 0.0451])
    q_rc = transforms.quat_normalize(jnp.array([0.0, -0.1305, 0.9914, 0.0]))
    R_rc = transforms.quat_to_matrix(q_rc)
    cam_pos, cam_R = raycast.camera_pose_from_gripper(
        state.gripper.q, t_rc, R_rc
    )
    _, _, mask = raycast.render(state, params, cam_pos, cam_R, INTR, H, W)
    gripper_id = state.objects.pos.shape[0] + 1
    assert (np.asarray(mask) == gripper_id).sum() > 5, "gripper not in frame"
    assert (np.asarray(mask) == 0).sum() > 100, "floor not in frame"


def test_object_visible_helper():
    lib = objects.get_library(8)
    params = make_sim_params(lib, scene_type="OnFloor")
    state = _state_with_objects(
        params, [[0.0, 0.0, params.support_z + 0.03]], [1]
    )
    cam_pos, cam_R = _lookdown_camera(params.support_z + 0.5)
    _, _, mask = raycast.render(state, params, cam_pos, cam_R, INTR, H, W)
    assert bool(raycast.object_visible(mask, params, 1))
    # empty view
    state2 = _state_with_objects(params, [[10.0, 10.0, 0.0]], [1])
    _, _, mask2 = raycast.render(state2, params, cam_pos, cam_R, INTR, H, W)
    assert not bool(raycast.object_visible(mask2, params, 1))


def test_rgb_range_and_shading():
    lib = objects.get_library(8)
    params = make_sim_params(lib, scene_type="OnFloor")
    state = _state_with_objects(
        params, [[0.0, 0.0, params.support_z + 0.03]], [1]
    )
    cam_pos, cam_R = _lookdown_camera(params.support_z + 0.5)
    rgb, _, _ = raycast.render(state, params, cam_pos, cam_R, INTR, H, W)
    rgb = np.asarray(rgb)
    assert rgb.shape == (H, W, 3)
    assert rgb.min() >= 0.0 and rgb.max() <= 1.0
    assert rgb.std() > 0.01, "image should not be flat"


def test_camera_randomization_changes_view():
    """Domain randomization (sensor.py:52-80) must actually perturb the
    rendered depth."""
    from deep_rl_grasping_tpu.envs.grasp_env import GraspEnv

    env = GraspEnv("tests/configs/test_continuous.yaml")
    env.randomize = {"focal_length": 4, "optical_center": 2,
                     "translation": 0.002, "rotation": 0.0349}
    t1 = env._randomized_camera(jax.random.PRNGKey(0))
    t2 = env._randomized_camera(jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(t1[2]), np.asarray(t2[2]))
    assert not np.allclose(np.asarray(t1[0]), np.asarray(t2[0]))
