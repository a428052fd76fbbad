"""Pallas TPU kernel: fused depth + segmentation ray-caster.

The XLA renderer (render/raycast.py) materializes a (pixels x primitives)
tensor per env in HBM between the intersection and the argmin-reduce. This
kernel keeps the whole working set in VMEM: one grid step renders one env's
64x64 image, looping over sphere primitives in registers and reducing
in-place — no HBM intermediates, no per-op dispatch overhead.

Geometry is pre-gathered per env OUTSIDE the kernel (world-space sphere
centers/radii/ids, gripper boxes), so the kernel sees only dense arrays:

  spheres:     centers (B, P, 3), radii (B, P), ids (B, P)
  gripper:     box centers (B, 3, 3), shared yaw rotation (B, 3, 3)
  camera:      origin (B, 3), cam-to-world R (B, 3, 3), intrinsics (B, 4)

Returns depth (B, H, W) metric Z_c and seg ids (B, H, W) int32 with the
same id conventions as raycast.render. Use `interpret=True` for CPU tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deep_rl_grasping_tpu.sim import physics
from deep_rl_grasping_tpu.sim.types import (
    BASE_CENTER_DEPTH,
    BASE_HALF_EXTENTS,
    PAD_HALF_EXTENTS,
)

NEG_BIG = 1e9


def _raster_kernel(
    sph_c_ref, sph_r_ref, sph_id_ref,
    box_c_ref, box_R_ref,
    cam_o_ref, cam_R_ref, intr_ref,
    depth_ref, seg_ref, *maybe_shade_ref,
    PH, PW, W, E, P, num_boxes, box_he, box_ids,
    plane_z, near, far, plane_seg_mode, tray_half, walls, with_shade,
):
    # Pixels are packed (PH, PW) with PW=128 (one full vreg of lanes; the
    # natural (64, 64) layout leaves half the VPU idle), and E envs render
    # per grid step to amortize the per-step DMA/loop overhead. Pixel
    # coordinates are recovered from the linear index.
    lin = (
        jax.lax.broadcasted_iota(jnp.int32, (PH, PW), 0) * PW
        + jax.lax.broadcasted_iota(jnp.int32, (PH, PW), 1)
    )
    px = (lin % W).astype(jnp.float32)
    py = (lin // W).astype(jnp.float32)

    for e in range(E):
        # ---- rays -------------------------------------------------------
        fx = intr_ref[e, 0, 0]
        fy = intr_ref[e, 0, 1]
        cx = intr_ref[e, 0, 2]
        cy = intr_ref[e, 0, 3]
        u = (px + 0.5 - cx) / fx
        v = (py + 0.5 - cy) / fy
        R = cam_R_ref[e]  # (3,3) cam->world
        # world ray dirs; ray parameter t == camera-frame Z (z_cam=1 rays)
        dx = R[0, 0] * u + R[0, 1] * v + R[0, 2]
        dy = R[1, 0] * u + R[1, 1] * v + R[1, 2]
        dz = R[2, 0] * u + R[2, 1] * v + R[2, 2]
        ox = cam_o_ref[e, 0, 0]
        oy = cam_o_ref[e, 0, 1]
        oz = cam_o_ref[e, 0, 2]

        best_t = jnp.full((PH, PW), jnp.inf, jnp.float32)
        best_id = jnp.full((PH, PW), -1, jnp.int32)
        a = dx * dx + dy * dy + dz * dz
        if with_shade:
            # Headlight Lambert: shade = 0.35 + 0.65*clip(-n.d/|d|, 0, 1)
            # (same model as render/raycast.py:133-138). Tracked alongside
            # the depth argmin so the RGB LUT gather outside the kernel
            # only needs (seg, shade).
            best_sh = jnp.zeros((PH, PW), jnp.float32)
            inv_dn = jax.lax.rsqrt(a)

        # ---- support plane ----------------------------------------------
        dz_safe = jnp.where(jnp.abs(dz) < 1e-9, 1e-9, dz)
        t_p = (plane_z - oz) / dz_safe
        valid = (t_p > near) & (t_p < far)
        if plane_seg_mode == "table":
            hx = ox + t_p * dx
            hy = oy + t_p * dy
            in_tray = (jnp.abs(hx) < tray_half) & (jnp.abs(hy) < tray_half)
            pid = jnp.where(in_tray, 2, 1)
        else:
            pid = jnp.zeros((PH, PW), jnp.int32)
        take = valid & (t_p < best_t)
        best_t = jnp.where(take, t_p, best_t)
        best_id = jnp.where(take, pid, best_id)
        if with_shade:
            # plane normal +z -> n.d = dz
            sh_p = 0.35 + 0.65 * jnp.clip(-dz * inv_dn, 0.0, 1.0)
            best_sh = jnp.where(take, sh_p, best_sh)

        # ---- spheres (loop over primitive slots) ------------------------

        # Static unroll over primitive slots: Mosaic cannot prove alignment
        # of dynamic lane-indexed scalar loads, and P is small (K*S ~ 40).
        for i in range(P):
            cxs = sph_c_ref[e, i, 0]
            cys = sph_c_ref[e, i, 1]
            czs = sph_c_ref[e, i, 2]
            r = sph_r_ref[e, 0, i]
            ocx = ox - cxs
            ocy = oy - cys
            ocz = oz - czs
            b = 2.0 * (dx * ocx + dy * ocy + dz * ocz)
            c0 = ocx * ocx + ocy * ocy + ocz * ocz - r * r
            disc = b * b - 4.0 * a * c0
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            t = (-b - sq) / (2.0 * a)
            ok = (disc > 0) & (t > near) & (r > 0) & (t < best_t)
            best_t = jnp.where(ok, t, best_t)
            best_id = jnp.where(ok, sph_id_ref[e, 0, i], best_id)
            if with_shade:
                # n = (hit - c)/r; n.d = (oc.d + t*|d|^2)/r
                r_safe = jnp.maximum(r, 1e-9)
                nd = (0.5 * b + t * a) / r_safe
                sh_s = 0.35 + 0.65 * jnp.clip(-nd * inv_dn, 0.0, 1.0)
                best_sh = jnp.where(ok, sh_s, best_sh)

        # ---- gripper boxes (slab test, unrolled; shared rotation) -------
        Rg = box_R_ref[e]  # (3,3) box-to-world

        for bi in range(num_boxes):
            hex_, hey, hez = box_he[bi]
            bcx = box_c_ref[e, bi, 0]
            bcy = box_c_ref[e, bi, 1]
            bcz = box_c_ref[e, bi, 2]
            # origin/dir in box frame (R^T @ v)
            rox = Rg[0, 0] * (ox - bcx) + Rg[1, 0] * (oy - bcy) + Rg[2, 0] * (oz - bcz)
            roy = Rg[0, 1] * (ox - bcx) + Rg[1, 1] * (oy - bcy) + Rg[2, 1] * (oz - bcz)
            roz = Rg[0, 2] * (ox - bcx) + Rg[1, 2] * (oy - bcy) + Rg[2, 2] * (oz - bcz)
            rdx = Rg[0, 0] * dx + Rg[1, 0] * dy + Rg[2, 0] * dz
            rdy = Rg[0, 1] * dx + Rg[1, 1] * dy + Rg[2, 1] * dz
            rdz = Rg[0, 2] * dx + Rg[1, 2] * dy + Rg[2, 2] * dz

            def slab(o1, d1, he):
                d_safe = jnp.where(jnp.abs(d1) < 1e-9, 1e-9, d1)
                ta = (-he - o1) / d_safe
                tb = (he - o1) / d_safe
                return jnp.minimum(ta, tb), jnp.maximum(ta, tb)

            lo1, hi1 = slab(rox, rdx, hex_)
            lo2, hi2 = slab(roy, rdy, hey)
            lo3, hi3 = slab(roz, rdz, hez)
            tmin = jnp.maximum(jnp.maximum(lo1, lo2), lo3)
            tmax = jnp.minimum(jnp.minimum(hi1, hi2), hi3)
            t = jnp.where(tmin > 0, tmin, tmax)
            ok = (tmin < tmax) & (tmax > 0) & (t > near) & (t < best_t)
            best_t = jnp.where(ok, t, best_t)
            best_id = jnp.where(ok, box_ids[bi], best_id)
            if with_shade:
                # entry-face normal: axis of the max slab-entry; the face
                # normal opposes the ray, so |n.d| = |rd_axis| and
                # -n.d/|d| = |rd_axis|/|d| (rotation preserves |d|).
                nd_abs = jnp.where(
                    (lo1 >= lo2) & (lo1 >= lo3), jnp.abs(rdx),
                    jnp.where(lo2 >= lo3, jnp.abs(rdy), jnp.abs(rdz)),
                )
                sh_b = 0.35 + 0.65 * jnp.clip(nd_abs * inv_dn, 0.0, 1.0)
                best_sh = jnp.where(ok, sh_b, best_sh)

        # ---- tray walls (axis-aligned slabs, static geometry; id 2 like
        # the tray floor — mirrors render/raycast.py:192-209) -------------
        for (wcx, wcy, wcz, whx, why, whz) in walls:

            def wslab(o1, d1, c1, he):
                d_safe = jnp.where(jnp.abs(d1) < 1e-9, 1e-9, d1)
                ta = (-he - (o1 - c1)) / d_safe
                tb = (he - (o1 - c1)) / d_safe
                return jnp.minimum(ta, tb), jnp.maximum(ta, tb)

            lo1, hi1 = wslab(ox, dx, wcx, whx)
            lo2, hi2 = wslab(oy, dy, wcy, why)
            lo3, hi3 = wslab(oz, dz, wcz, whz)
            tmin = jnp.maximum(jnp.maximum(lo1, lo2), lo3)
            tmax = jnp.minimum(jnp.minimum(hi1, hi2), hi3)
            t = jnp.where(tmin > 0, tmin, tmax)
            ok = (tmin < tmax) & (tmax > 0) & (t > near) & (t < best_t)
            best_t = jnp.where(ok, t, best_t)
            best_id = jnp.where(ok, 2, best_id)
            if with_shade:
                nd_abs = jnp.where(
                    (lo1 >= lo2) & (lo1 >= lo3), jnp.abs(dx),
                    jnp.where(lo2 >= lo3, jnp.abs(dy), jnp.abs(dz)),
                )
                sh_w = 0.35 + 0.65 * jnp.clip(nd_abs * inv_dn, 0.0, 1.0)
                best_sh = jnp.where(ok, sh_w, best_sh)

        depth_ref[e] = jnp.minimum(
            jnp.where(jnp.isfinite(best_t), best_t, far), far
        )
        seg_ref[e] = best_id
        if with_shade:
            maybe_shade_ref[0][e] = best_sh


@functools.partial(
    jax.jit,
    static_argnames=("H", "W", "plane_seg_mode", "plane_z", "near", "far",
                     "tray_half", "wall_height", "gripper_id", "interpret",
                     "with_shade"),
)
def raster_depth_seg(
    sph_centers, sph_radii, sph_ids,
    box_centers, box_R,
    cam_origin, cam_R, intrinsics,
    *, H=64, W=64, plane_seg_mode="floor", plane_z=-0.196, near=0.02,
    far=2.0, tray_half=0.21, wall_height=0.062, gripper_id=6,
    interpret=False, with_shade=False,
):
    """Batched fused render. sph_* leading dim B; see module docstring.
    with_shade=True additionally returns the per-pixel headlight shade of
    the winning primitive (for RGB assembly via an id->color LUT)."""
    B, P, _ = sph_centers.shape
    num_boxes = box_centers.shape[1]
    box_he = (PAD_HALF_EXTENTS, PAD_HALF_EXTENTS, BASE_HALF_EXTENTS)[:num_boxes]
    box_ids = tuple([gripper_id] * num_boxes)

    # Pixel packing: (H*W) -> (PH, 128) fills all VPU lanes (a (64, 64)
    # image block wastes half of each 128-lane vreg). E envs per grid step
    # amortize the per-step overhead; fall back gracefully for small/odd B.
    if (H * W) % 128 == 0:
        PH, PW = (H * W) // 128, 128
    else:
        PH, PW = H, W
    E = next(e for e in (4, 2, 1) if B % e == 0)
    # VMEM guard (ADVICE r3): the kernel body is fully unrolled E times and
    # holds ~(2 + with_shade) f32/i32 accumulators + ray registers per
    # pixel block; keep the output blocks well under the ~16 MB/core VMEM.
    n_out = 3 if with_shade else 2
    assert E * PH * PW * 4 * n_out <= 4 * 1024 * 1024, (
        f"raster block E={E} H={H} W={W} exceeds the VMEM budget; "
        "lower E or the image size"
    )

    # Tray wall OBBs are world-axis-aligned and static per scene type:
    # (cx, cy, cz, hx, hy, hz), matching render/raycast.py:192-204.
    if plane_seg_mode == "table":
        th, wh = tray_half, wall_height
        wz = plane_z + wh / 2
        walls = (
            (th + 0.02, 0.0, wz, 0.02, th + 0.04, wh / 2),
            (-(th + 0.02), 0.0, wz, 0.02, th + 0.04, wh / 2),
            (0.0, th + 0.02, wz, th + 0.04, 0.02, wh / 2),
            (0.0, -(th + 0.02), wz, th + 0.04, 0.02, wh / 2),
        )
    else:
        walls = ()

    kernel = functools.partial(
        _raster_kernel,
        PH=PH, PW=PW, W=W, E=E, P=P, num_boxes=num_boxes, box_he=box_he,
        box_ids=box_ids, plane_z=plane_z, near=near, far=far,
        plane_seg_mode=plane_seg_mode, tray_half=tray_half, walls=walls,
        with_shade=with_shade,
    )
    grid = (B // E,)
    # 2D per-env inputs carry a singleton middle axis: Mosaic requires the
    # last two block dims to be tile-aligned OR equal to the full array
    # dims, and a (E, P) block over (B, P) violates that for the batch dim.
    in_specs = [
        pl.BlockSpec((E, P, 3), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((E, 1, P), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((E, 1, P), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((E, num_boxes, 3), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((E, 3, 3), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((E, 1, 3), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((E, 3, 3), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((E, 1, 4), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
    ]
    block = pl.BlockSpec((E, PH, PW), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    out_specs = (block,) * n_out
    out_shape = (
        jax.ShapeDtypeStruct((B, PH, PW), jnp.float32),
        jax.ShapeDtypeStruct((B, PH, PW), jnp.int32),
    )
    if with_shade:
        out_shape = out_shape + (jax.ShapeDtypeStruct((B, PH, PW), jnp.float32),)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(
        sph_centers, sph_radii[:, None], sph_ids[:, None],
        box_centers, box_R, cam_origin[:, None], cam_R,
        intrinsics[:, None],
    )
    return tuple(o.reshape(B, H, W) for o in out)


def render_batch_pallas(states, params, cam_pos, cam_R, intrinsics,
                        H=64, W=64, near=0.02, far=2.0, interpret=False,
                        with_rgb=False):
    """Adapter: batched SimState -> fused depth+seg render.

    states: SimState with leading batch dim B. Returns (depth, seg) shaped
    (B, H, W) with raycast.render's segmentation id layout; with_rgb=True
    returns (rgb, depth, seg) where rgb is (B, H, W, 3) float [0,1]
    assembled from the kernel's shade channel through the same id->color
    LUT as render/raycast.py:221-232.
    """
    B, K = states.objects.pos.shape[:2]
    centers, radii, mask = jax.vmap(
        lambda s: physics.world_spheres(s, params)
    )(states)
    S = radii.shape[-1]
    obj_id0 = 3 if params.has_tray else 1
    slot_ids = obj_id0 + jnp.repeat(jnp.arange(K), S)[None].repeat(B, 0)
    flat_c = centers.reshape(B, K * S, 3)
    flat_r = jnp.where(mask, radii, 0.0).reshape(B, K * S)

    def gboxes(q):
        base, Rg, pads, axes = physics.pad_frames(q)
        base_box = base - jnp.array([0.0, 0.0, BASE_CENTER_DEPTH])
        return jnp.stack([pads[0], pads[1], base_box]), Rg

    box_c, box_R = jax.vmap(gboxes)(states.gripper.q)
    gripper_id = (K + 3) if params.has_tray else (K + 1)
    out = raster_depth_seg(
        flat_c, flat_r, slot_ids.astype(jnp.int32),
        box_c, box_R, cam_pos, cam_R, intrinsics,
        H=H, W=W,
        plane_seg_mode="table" if params.has_tray else "floor",
        plane_z=float(params.support_z), near=near, far=far,
        tray_half=float(params.tray_half),
        wall_height=float(params.tray_wall_height),
        gripper_id=int(gripper_id),
        interpret=interpret, with_shade=with_rgb,
    )
    if not with_rgb:
        return out
    depth, seg, shade = out
    from deep_rl_grasping_tpu.render.raycast import (
        GRIPPER_COLOR, SURFACE_COLOR, TRAY_COLOR,
    )

    obj_cols = params.color[states.objects.obj_type]  # (B, K, 3)
    ones = jnp.ones((B, 1, 1))
    if params.has_tray:
        lut = jnp.concatenate(
            [SURFACE_COLOR * ones, SURFACE_COLOR * ones, TRAY_COLOR * ones,
             obj_cols, GRIPPER_COLOR * ones], axis=1)
    else:
        lut = jnp.concatenate(
            [SURFACE_COLOR * ones, obj_cols, GRIPPER_COLOR * ones], axis=1)
    shade = jnp.where(seg < 0, 0.0, shade)
    rgb = jnp.take_along_axis(
        lut, jnp.maximum(seg, 0).reshape(B, -1, 1), axis=1
    ).reshape(B, H, W, 3) * shade[..., None]
    return rgb, depth, seg
