"""Batched ray-cast RGB / depth / segmentation renderer.

TPU-native replacement for PyBullet's TinyRenderer (C++ software rasterizer,
reference sensor.py:110-145). The reference builds an OpenGL projection from
OpenCV intrinsics, rasterizes, then *undoes* the z-buffer to recover metric
depth (`far*near / (far-(far-near)*zbuf)`, sensor.py:140). Here rays are cast
directly from the pinhole model, which produces that same metric depth Z_c
with no rasterizer round-trip, and every (pixel x primitive) test is an
independent fused VPU op — ideal for `vmap` over thousands of envs.

Scene primitives per env: the support plane, K sphere-compound objects,
3 gripper boxes (2 finger pads + housing), and 4 tray walls (OnTable).
Segmentation ids reproduce the reference's PyBullet body-id layout
(robot.py:27 FOV check, sensor.py:210-217 encoder masking):
  OnFloor:  plane=0, object slot k -> 1+k, gripper=K+1
  OnTable:  plane=0, table=1, tray=2, object slot k -> 3+k, gripper=K+3
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from deep_rl_grasping_tpu.sim import physics
from deep_rl_grasping_tpu.sim.types import (
    BASE_CENTER_DEPTH,
    BASE_HALF_EXTENTS,
    PAD_CENTER_DEPTH,
    PAD_HALF_EXTENTS,
    SimParams,
    SimState,
)

_einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)

GRIPPER_COLOR = jnp.array([0.35, 0.35, 0.38], jnp.float32)
SURFACE_COLOR = jnp.array([0.55, 0.5, 0.45], jnp.float32)
TRAY_COLOR = jnp.array([0.35, 0.45, 0.35], jnp.float32)


def camera_rays(height, width, intrinsics):
    """Unnormalized camera-frame ray directions with z = 1 (OpenCV axes:
    x right, y down, z forward). Ray parameter t == metric depth Z_c."""
    fx, fy, cx, cy = intrinsics
    u = jnp.arange(width, dtype=jnp.float32) + 0.5
    v = jnp.arange(height, dtype=jnp.float32) + 0.5
    x = (u[None, :] - cx) / fx
    y = (v[:, None] - cy) / fy
    d = jnp.stack(
        [jnp.broadcast_to(x, (height, width)),
         jnp.broadcast_to(y, (height, width)),
         jnp.ones((height, width))],
        axis=-1,
    )
    return d.reshape(-1, 3)  # (HW, 3)


def _ray_plane(o, d, plane_z):
    """t for rays vs z = plane_z. Returns (t, valid)."""
    dz = d[:, 2]
    t = (plane_z - o[2]) / jnp.where(jnp.abs(dz) < 1e-9, 1e-9, dz)
    return t, t > 0


def _ray_spheres(o, d, centers, radii):
    """Rays (HW,3) vs spheres (P,3),(P,). Returns t (HW,P), valid (HW,P)."""
    oc = o[None, :] - centers  # (P,3)
    a = jnp.sum(d * d, axis=-1)  # (HW,)
    b = 2.0 * _einsum("ri,pi->rp", d, oc)
    c = jnp.sum(oc * oc, axis=-1)[None, :] - (radii**2)[None, :]
    disc = b * b - 4.0 * a[:, None] * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t = (-b - sq) / (2.0 * a[:, None])
    return t, (disc > 0) & (t > 0)


def _ray_box(o, d, box_center, box_R, half_extents):
    """Slab test: rays vs one OBB. Returns t (HW,), valid (HW,), normal (HW,3)."""
    he = jnp.asarray(half_extents, jnp.float32)
    ol = _einsum("ji,j->i", box_R, o - box_center)  # (3,)
    dl = _einsum("ji,ri->rj", box_R, d)  # (HW,3)
    dl_safe = jnp.where(jnp.abs(dl) < 1e-9, 1e-9, dl)
    t1 = (-he[None] - ol[None]) / dl_safe
    t2 = (he[None] - ol[None]) / dl_safe
    tlo = jnp.minimum(t1, t2)
    thi = jnp.maximum(t1, t2)
    tmin = jnp.max(tlo, axis=-1)
    tmax = jnp.min(thi, axis=-1)
    valid = (tmin < tmax) & (tmax > 0)
    t = jnp.where(tmin > 0, tmin, tmax)
    # entry face normal (world)
    ax = jnp.argmax(tlo, axis=-1)
    sign = -jnp.sign(jnp.take_along_axis(dl, ax[:, None], 1)[:, 0])
    n_local = jax.nn.one_hot(ax, 3) * sign[:, None]
    n_world = _einsum("ij,rj->ri", box_R, n_local)
    return t, valid, n_world


def render(
    state: SimState,
    params: SimParams,
    cam_pos,
    cam_R,
    intrinsics,
    height,
    width,
    near=0.02,
    far=2.0,
):
    """Render one env. Returns rgb (H,W,3) float [0,1], depth (H,W) metric,
    mask (H,W) int32 segmentation ids.

    cam_pos: (3,) camera origin, world. cam_R: (3,3) camera-to-world rotation
    (OpenCV axes). intrinsics: (fx, fy, cx, cy).
    """
    HW = height * width
    d_cam = camera_rays(height, width, intrinsics)  # (HW,3)
    d = _einsum("ij,rj->ri", cam_R, d_cam)  # world dirs, z_cam component == t
    o = cam_pos

    K = state.objects.pos.shape[0]
    gripper_id = (K + 3) if params.has_tray else (K + 1)
    obj_id0 = 3 if params.has_tray else 1

    # Colors are resolved AFTER the depth argmin through an id-indexed LUT:
    # a (HW, P, 3) per-pixel-per-primitive color buffer is pure waste (it
    # OOM'd HBM at 128 envs x chunked train step) since every primitive's
    # color is a function of its segmentation id alone.
    ts, ids, shades = [], [], []

    def headlight(n_world):
        # Lambert w.r.t. the viewing direction (headlight at the camera).
        ndotl = -jnp.sum(n_world * d, axis=-1) / jnp.maximum(
            jnp.linalg.norm(d, axis=-1), 1e-9
        )
        return 0.35 + 0.65 * jnp.clip(ndotl, 0.0, 1.0)

    # --- support surface ---
    t_p, v_p = _ray_plane(o, d, params.support_z)
    hit = o[None] + t_p[:, None] * d
    if params.has_tray:
        in_tray = (jnp.abs(hit[:, 0]) < params.tray_half) & (
            jnp.abs(hit[:, 1]) < params.tray_half
        )
        plane_ids = jnp.where(in_tray, 2, 1)
    else:
        plane_ids = jnp.zeros(HW, jnp.int32)
    ts.append(jnp.where(v_p, t_p, jnp.inf)[:, None])
    ids.append(plane_ids[:, None])
    shades.append(headlight(jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (HW, 3)))[:, None])

    # --- objects (sphere compounds) ---
    centers, radii, smask = physics.world_spheres(state, params)
    flat_c = centers.reshape(K * radii.shape[1], 3)
    flat_r = jnp.where(smask, radii, 0.0).reshape(-1)
    t_s, v_s = _ray_spheres(o, d, flat_c, flat_r)  # (HW, K*S)
    v_s = v_s & (flat_r > 0)[None, :]
    hit_s = o[None, None] + t_s[..., None] * d[:, None, :]
    n_s = (hit_s - flat_c[None]) / jnp.maximum(flat_r[None, :, None], 1e-9)
    slot = jnp.repeat(jnp.arange(K), radii.shape[1])
    ts.append(jnp.where(v_s, t_s, jnp.inf))
    ids.append(jnp.broadcast_to((obj_id0 + slot)[None], (HW, slot.shape[0])))
    sh = 0.35 + 0.65 * jnp.clip(
        -jnp.sum(n_s * d[:, None, :], -1)
        / jnp.maximum(jnp.linalg.norm(d, axis=-1), 1e-9)[:, None],
        0.0,
        1.0,
    )
    shades.append(sh)

    # --- gripper boxes ---
    base, Rg, pads, axes = physics.pad_frames(state.gripper.q)
    boxes = [
        (pads[0], PAD_HALF_EXTENTS),
        (pads[1], PAD_HALF_EXTENTS),
        (base - jnp.array([0.0, 0.0, BASE_CENTER_DEPTH]), BASE_HALF_EXTENTS),
    ]
    for bc, he in boxes:
        t_b, v_b, n_b = _ray_box(o, d, bc, Rg, he)
        ts.append(jnp.where(v_b, t_b, jnp.inf)[:, None])
        ids.append(jnp.full((HW, 1), gripper_id, jnp.int32))
        shades.append(headlight(n_b)[:, None])

    # --- tray walls ---
    if params.has_tray:
        th, wh = params.tray_half, params.tray_wall_height
        wall_c = [
            jnp.array([th + 0.02, 0.0, params.support_z + wh / 2]),
            jnp.array([-(th + 0.02), 0.0, params.support_z + wh / 2]),
            jnp.array([0.0, th + 0.02, params.support_z + wh / 2]),
            jnp.array([0.0, -(th + 0.02), params.support_z + wh / 2]),
        ]
        wall_he = [
            (0.02, th + 0.04, wh / 2),
            (0.02, th + 0.04, wh / 2),
            (th + 0.04, 0.02, wh / 2),
            (th + 0.04, 0.02, wh / 2),
        ]
        eye = jnp.eye(3)
        for bc, he in zip(wall_c, wall_he):
            t_w, v_w, n_w = _ray_box(o, d, bc, eye, he)
            ts.append(jnp.where(v_w, t_w, jnp.inf)[:, None])
            ids.append(jnp.full((HW, 1), 2, jnp.int32))
            shades.append(headlight(n_w)[:, None])

    t_all = jnp.concatenate(ts, axis=1)  # (HW, P)
    id_all = jnp.concatenate(ids, axis=1)
    sh_all = jnp.concatenate(shades, axis=1)

    t_clipped = jnp.where(t_all < near, jnp.inf, t_all)
    best = jnp.argmin(t_clipped, axis=1)
    take = lambda arr: jnp.take_along_axis(arr, best[:, None], 1)[:, 0]
    depth = jnp.minimum(take(t_clipped), far)
    no_hit = ~jnp.isfinite(take(t_clipped))
    # No-hit: reference depth saturates at far; mask id -1 (pybullet convention)
    mask = jnp.where(no_hit, -1, take(id_all))
    shade = jnp.where(no_hit, 0.0, take(sh_all))
    # id -> color LUT (seg ids fully determine color; see note above).
    obj_cols = params.color[state.objects.obj_type]  # (K, 3)
    if params.has_tray:
        # ids: 1 surface, 2 tray (floor-in-tray + walls), 3..K+2 objects,
        # K+3 gripper (index 0 unused).
        lut = jnp.concatenate(
            [SURFACE_COLOR[None], SURFACE_COLOR[None], TRAY_COLOR[None],
             obj_cols, GRIPPER_COLOR[None]], axis=0)
    else:
        # ids: 0 surface, 1..K objects, K+1 gripper.
        lut = jnp.concatenate(
            [SURFACE_COLOR[None], obj_cols, GRIPPER_COLOR[None]], axis=0)
    rgb = lut[jnp.maximum(mask, 0)] * shade[:, None]
    return (
        rgb.reshape(height, width, 3),
        depth.reshape(height, width),
        mask.reshape(height, width),
    )


def camera_pose_from_gripper(gripper_q, t_rc, R_rc):
    """Compose the wrist camera pose from the gripper pose and extrinsics
    (reference sensor.py:82-88: h_world_robot . h_robot_camera).

    The robot (link 3) world rotation is Rz(yaw) . Rx(pi) — the hand points
    down (robot.py:59 spawns with roll pi).
    """
    yaw = gripper_q[3]
    Rz = physics.yaw_rotation(yaw)
    Rx_pi = jnp.array(
        [[1.0, 0.0, 0.0], [0.0, -1.0, 0.0], [0.0, 0.0, -1.0]], jnp.float32
    )
    R_wr = _einsum("ij,jk->ik", Rz, Rx_pi)
    cam_pos = gripper_q[:3] + _einsum("ij,j->i", R_wr, t_rc)
    cam_R = _einsum("ij,jk->ik", R_wr, R_rc)
    return cam_pos, cam_R


def object_visible(mask, params: SimParams, num_slots):
    """FOV check used by the reset loop (robot.py:19-30): at least one object
    pixel present (reference: len(unique(mask)) > 2 with plane+gripper
    always visible)."""
    obj_id0 = 3 if params.has_tray else 1
    return jnp.any((mask >= obj_id0) & (mask < obj_id0 + num_slots))
