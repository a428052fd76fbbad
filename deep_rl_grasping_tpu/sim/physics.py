"""Batched impulse-based rigid-body physics for the flying-gripper grasp world.

TPU-native replacement for the Bullet engine the reference drives through
pybullet (reference: simulation/simulation.py:37-75 — dt = 1/240, 150 solver
iterations, cone friction, gravity -9.81; model.py:69-74 — position-servo
joint motors with 100 N force cap).

Design (single env; the env layer `vmap`s everything):

* Gripper: reduced coordinates q = [x, y, z, yaw, f_l, f_r] with per-DOF
  force-capped position servos (time-optimal velocity profile), replacing the
  SDF's virtual world joints + POSITION_CONTROL motors.
* Objects: free 6-DoF rigid bodies whose collision shape is a sphere compound
  from the ObjectLibrary.
* Contacts: sphere-vs-plane, sphere-vs-finger-pad (OBB), sphere-vs-sphere,
  and optional tray walls — all fixed-size masked arrays, no data-dependent
  shapes, so the whole substep compiles to one fused XLA program.
* Solver: projected Jacobi iterations (block PGS with under-relaxation) on
  normal + 2 friction directions with Baumgarte stabilization and a friction
  cone clamp. Jacobi (not Gauss-Seidel) keeps every contact update data
  parallel on the VPU; the relaxation factor trades convergence speed for
  parallelism. The grasp-critical behavior — fingers stalling on a squeezed
  object (robot.py:295-297's detection) and friction carrying the object
  while lifting — emerges from the capped finger servo re-applying force each
  substep against unbounded normal impulses.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)

from deep_rl_grasping_tpu.sim.types import (
    FINGER_LIMIT_HIGH,
    FINGER_LIMIT_LOW,
    PAD_CENTER_DEPTH,
    PAD_HALF_EXTENTS,
    PAD_X_OFFSET,
    GripperState,
    ObjectState,
    SimParams,
    SimState,
)

_EZ = jnp.array([0.0, 0.0, 1.0], jnp.float32)


def yaw_rotation(yaw):
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack(
        [jnp.stack([c, -s, z], -1), jnp.stack([s, c, z], -1), jnp.stack([z, z, o], -1)],
        -2,
    )


def quat_to_matrix(q):
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
        -1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def world_spheres(state: SimState, params: SimParams):
    """World-space sphere centers/radii/mask for all object slots.

    Returns centers (K, S, 3), radii (K, S), mask (K, S).
    """
    obj = state.objects
    R = quat_to_matrix(obj.quat)  # (K,3,3)
    local = params.centers[obj.obj_type]  # (K,S,3)
    centers = obj.pos[:, None, :] + _einsum("kij,ksj->ksi", R, local)
    radii = params.radii[obj.obj_type]  # (K,S)
    mask = (radii > 0.0) & obj.alive[:, None]
    return centers, radii, mask


def pad_frames(q):
    """Finger pad centers, rotation, and drive axes in world frame.

    The gripper base link is at (x, y, z) with the hand pointing down
    (model spawned with roll=pi, robot.py:59); pads sit PAD_CENTER_DEPTH
    below the base, offset +-(PAD_X_OFFSET - f) along the gripper's local
    x axis (WSG-50 SDF finger links at x=+-0.062 with prismatic travel f).
    """
    base = q[:3]
    yaw = q[3]
    R = yaw_rotation(yaw)
    ex = R[:, 0]
    f_l, f_r = q[4], q[5]
    c_l = base - ex * (PAD_X_OFFSET - f_l) - _EZ * PAD_CENTER_DEPTH
    c_r = base + ex * (PAD_X_OFFSET - f_r) - _EZ * PAD_CENTER_DEPTH
    # Drive axes: direction the pad moves as the finger coordinate increases.
    axis_l = ex
    axis_r = -ex
    return base, R, jnp.stack([c_l, c_r]), jnp.stack([axis_l, axis_r])


def _sphere_box_contact(center, radius, box_center, box_R, half_extents,
                        inside_axis=None, inside_sign=None):
    """Closest-point contact between a sphere and an OBB.

    Returns (normal pointing box->sphere, penetration >= 0 when touching,
    contact point, touching flag).

    inside_axis / inside_sign: recovery direction when the sphere center is
    INSIDE the box. The default (least-penetration face) is wrong for thin
    one-sided geometry: a finger pad must always push captured spheres back
    toward the jaw (fixed axis AND sign), otherwise a deeply squeezed sphere
    whose center crosses the pad's mid-plane gets ejected out the *back* of
    the pad — which is how end-on sphere chains were being extruded through
    closing fingers.
    """
    d = center - box_center
    local = _einsum("ji,j->i", box_R, d)
    he = jnp.asarray(half_extents, jnp.float32)
    clamped = jnp.clip(local, -he, he)
    delta = local - clamped
    dist = jnp.linalg.norm(delta)
    outside = dist > 1e-9
    n_out = jnp.where(outside, delta / jnp.maximum(dist, 1e-9), 0.0)
    depth_axes = he - jnp.abs(local)
    if inside_axis is None:
        ax = jnp.argmin(depth_axes)
    else:
        ax = inside_axis
    if inside_sign is None:
        sign = jnp.sign(local[ax]) + (local[ax] == 0.0)
    else:
        sign = jnp.asarray(inside_sign, jnp.float32)
    n_in = jax.nn.one_hot(ax, 3) * sign
    n_local = jnp.where(outside, n_out, n_in)
    pen_in = radius + he[ax] - sign * local[ax]
    pen = jnp.where(outside, radius - dist, pen_in)
    n_world = _einsum("ij,j->i", box_R, n_local)
    point = center - n_world * radius
    return n_world, pen, point, pen > 0.0


def _tangent_basis(n):
    a = jnp.where(jnp.abs(n[..., 0:1]) < 0.9, jnp.array([1.0, 0.0, 0.0]), jnp.array([0.0, 1.0, 0.0]))
    t1 = jnp.cross(n, a)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-9)
    t2 = jnp.cross(n, t1)
    return t1, t2


def _collect_contacts(state: SimState, params: SimParams):
    """Build fixed-size contact arrays.

    Every potential contact slot is emitted with an `active` mask; shapes are
    static functions of (K objects, S spheres).
    Fields: point (N,3), normal b->a (N,3), pen (N,), ia (N,), b_kind (N,)
    [0 static, 1 left pad, 2 right pad, 3 object], ib (N,), active (N,).
    """
    centers, radii, smask = world_spheres(state, params)  # (K,S,..)
    K, S = radii.shape
    base, Rg, pads, axes = pad_frames(state.gripper.q)

    pts, nrms, pens, ias, bkinds, ibs, acts = [], [], [], [], [], [], []

    flat_c = centers.reshape(K * S, 3)
    flat_r = radii.reshape(K * S)
    flat_m = smask.reshape(K * S)
    flat_ia = jnp.repeat(jnp.arange(K), S)

    # --- sphere vs support plane ---
    pen_p = params.support_z - (flat_c[:, 2] - flat_r)
    n_p = jnp.broadcast_to(_EZ, (K * S, 3))
    pt_p = flat_c - flat_r[:, None] * n_p
    pts.append(pt_p); nrms.append(n_p); pens.append(pen_p)
    ias.append(flat_ia); bkinds.append(jnp.zeros(K * S, jnp.int32))
    ibs.append(jnp.zeros(K * S, jnp.int32)); acts.append(flat_m & (pen_p > 0))

    # --- sphere vs tray walls (4 static OBBs) ---
    if params.has_tray:
        th = params.tray_half
        wh = params.tray_wall_height
        wall_c = jnp.array(
            [
                [th + 0.02, 0.0, 0.0],
                [-(th + 0.02), 0.0, 0.0],
                [0.0, th + 0.02, 0.0],
                [0.0, -(th + 0.02), 0.0],
            ],
            jnp.float32,
        ) + jnp.array([0.0, 0.0, params.support_z + wh * 0.5])[None]
        wall_he = jnp.array(
            [
                [0.02, th + 0.04, wh * 0.5],
                [0.02, th + 0.04, wh * 0.5],
                [th + 0.04, 0.02, wh * 0.5],
                [th + 0.04, 0.02, wh * 0.5],
            ],
            jnp.float32,
        )
        eye = jnp.eye(3, dtype=jnp.float32)
        for w in range(4):
            thin_ax = 0 if w < 2 else 1
            # push escaped spheres back toward the tray center
            wall_sign = [-1.0, 1.0, -1.0, 1.0][w]
            n_w, pen_w, pt_w, touch_w = jax.vmap(
                lambda c, r, w=w, a=thin_ax, sg=wall_sign: _sphere_box_contact(
                    c, r, wall_c[w], eye, wall_he[w], inside_axis=a, inside_sign=sg
                )
            )(flat_c, flat_r)
            pts.append(pt_w); nrms.append(n_w); pens.append(pen_w)
            ias.append(flat_ia)
            bkinds.append(jnp.zeros(K * S, jnp.int32))
            ibs.append(jnp.zeros(K * S, jnp.int32))
            acts.append(flat_m & touch_w)


    # --- sphere vs finger pads ---
    for pad_idx in range(2):
        n_b, pen_b, pt_b, touch = jax.vmap(
            lambda c, r, sgn=(1.0 if pad_idx == 0 else -1.0): _sphere_box_contact(
                c, r, pads[pad_idx], Rg, PAD_HALF_EXTENTS,
                inside_axis=0, inside_sign=sgn,
            )
        )(flat_c, flat_r)
        pts.append(pt_b); nrms.append(n_b); pens.append(pen_b)
        ias.append(flat_ia)
        bkinds.append(jnp.full(K * S, pad_idx + 1, jnp.int32))
        ibs.append(jnp.zeros(K * S, jnp.int32))
        acts.append(flat_m & touch)

    # --- sphere vs sphere (object pairs i < j) ---
    # Uses the coarse LOD set (params.oo_centers/oo_radii, SC <= S spheres
    # per object): object-object resolution only needs gross shape to keep
    # clutter apart, and the SxS pair planes dominated the solver cost.
    if K > 1:
        obj = state.objects
        Rm = quat_to_matrix(obj.quat)
        oo_local = params.oo_centers[obj.obj_type]          # (K,SC,3)
        c2 = obj.pos[:, None, :] + _einsum("kij,ksj->ksi", Rm, oo_local)
        r2 = params.oo_radii[obj.obj_type]                  # (K,SC)
        m2 = (r2 > 0.0) & obj.alive[:, None]
        SC = r2.shape[1]
        ii, jj = jnp.triu_indices(K, k=1)
        # (P, SC, SC) pairwise between object ii's and jj's coarse spheres
        ci = c2[ii][:, :, None, :]  # (P,SC,1,3)
        cj = c2[jj][:, None, :, :]  # (P,1,SC,3)
        d = ci - cj
        dist = jnp.linalg.norm(d, axis=-1)  # (P,SC,SC)
        rsum = r2[ii][:, :, None] + r2[jj][:, None, :]
        pen_ss = rsum - dist
        n_ss = d / jnp.maximum(dist, 1e-9)[..., None]  # from j to i
        pt_ss = cj + n_ss * (r2[jj][:, None, :, None] + 0.5 * (dist - rsum)[..., None] + 0.0)
        m_ss = m2[ii][:, :, None] & m2[jj][:, None, :]
        P = ii.shape[0]
        pts.append(pt_ss.reshape(P * SC * SC, 3))
        nrms.append(n_ss.reshape(P * SC * SC, 3))
        pens.append(pen_ss.reshape(P * SC * SC))
        ias.append(jnp.repeat(ii, SC * SC))
        bkinds.append(jnp.full(P * SC * SC, 3, jnp.int32))
        ibs.append(jnp.repeat(jj, SC * SC))
        acts.append((m_ss & (pen_ss > 0)).reshape(P * SC * SC))

    # Category boundaries for the sequential solve: statics (plane+walls),
    # left pad, right pad, object-object.
    n_static = K * S * (1 + (4 if params.has_tray else 0))
    n_pad = K * S
    bounds = [0, n_static, n_static + n_pad, n_static + 2 * n_pad]
    total = sum(a.shape[0] for a in pens)
    bounds.append(total)
    return dict(
        point=jnp.concatenate(pts),
        normal=jnp.concatenate(nrms),
        pen=jnp.concatenate(pens),
        ia=jnp.concatenate(ias),
        b_kind=jnp.concatenate(bkinds),
        ib=jnp.concatenate(ibs),
        active=jnp.concatenate(acts),
        bounds=tuple(bounds),
    )


def _gripper_jacobian(contacts, base, axes):
    """G (N, 6, 3): per-DOF world-velocity contribution at each contact point
    for contacts whose b side is a finger pad (zeroed otherwise)."""
    N = contacts["point"].shape[0]
    p = contacts["point"]
    is_l = (contacts["b_kind"] == 1)[:, None]
    is_r = (contacts["b_kind"] == 2)[:, None]
    is_pad = is_l | is_r
    r = p - base[None]
    g_x = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), (N, 3))
    g_y = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), (N, 3))
    g_z = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (N, 3))
    g_yaw = jnp.cross(jnp.broadcast_to(_EZ, (N, 3)), r)
    g_fl = jnp.where(is_l, axes[0][None], 0.0)
    g_fr = jnp.where(is_r, axes[1][None], 0.0)
    pad_mask = is_pad.astype(jnp.float32)
    G = jnp.stack(
        [g_x * pad_mask, g_y * pad_mask, g_z * pad_mask, g_yaw * pad_mask, g_fl, g_fr],
        axis=1,
    )
    return G


def _solve_contacts(state, params, contacts, V, W, qd, inv_I_world,
                    warm_lams=None, motor_plan=None):
    """Projected Jacobi impulse solver. Returns updated (V, W, qd)."""
    K = V.shape[0]
    N = contacts["point"].shape[0]
    n = contacts["normal"]
    p = contacts["point"]
    ia = contacts["ia"]
    ib = contacts["ib"]
    is_obj_b = contacts["b_kind"] == 3
    active = contacts["active"]
    actf = active.astype(jnp.float32)

    base, Rg, pads, axes = pad_frames(state.gripper.q)
    G = _gripper_jacobian(contacts, base, axes)  # (N,6,3)

    t1, t2 = _tangent_basis(n)
    dirs = jnp.stack([n, t1, t2], axis=1)  # (N,3dirs,3)

    r_a = p - state.objects.pos[ia]
    r_b = p - state.objects.pos[ib]
    inv_m_a = params.inv_mass[state.objects.obj_type][ia]
    inv_m_b = params.inv_mass[state.objects.obj_type][ib] * is_obj_b
    iI_a = inv_I_world[ia]  # (N,3,3)
    iI_b = inv_I_world[ib]

    inv_dof_mass = 1.0 / params.dof_mass  # (6,)

    def w_dir(d):
        ra_x_d = jnp.cross(r_a, d)
        rb_x_d = jnp.cross(r_b, d)
        w = inv_m_a + _einsum("ni,nij,nj->n", ra_x_d, iI_a, ra_x_d)
        w = w + (inv_m_b + _einsum("ni,nij,nj->n", rb_x_d, iI_b, rb_x_d)) * is_obj_b
        Jg = _einsum("ngi,ni->ng", G, d)  # (N,6)
        w = w + _einsum("ng,g->n", Jg * Jg, inv_dof_mass)
        return jnp.maximum(w, 1e-9)

    w_n = w_dir(n)
    w_t1 = w_dir(t1)
    w_t2 = w_dir(t2)
    if params.oo_point_mass_tangent:
        # Point-mass tangent approximation for object-object friction rows
        # only (see SimParams.oo_point_mass_tangent). Pad/static rows and
        # every normal row keep the exact effective mass.
        w_pm = jnp.maximum(inv_m_a + inv_m_b, 1e-9)
        w_t1 = jnp.where(is_obj_b, w_pm, w_t1)
        w_t2 = jnp.where(is_obj_b, w_pm, w_t2)

    bias = jnp.minimum(
        params.baumgarte / params.dt
        * jnp.maximum(contacts["pen"] - params.slop, 0.0),
        params.max_bias_velocity,
    )
    mu = params.friction
    omega = params.relaxation

    def rel_vel(V, W, qd, s, e):
        v_a = V[ia[s:e]] + jnp.cross(W[ia[s:e]], r_a[s:e])
        v_b_obj = (V[ib[s:e]] + jnp.cross(W[ib[s:e]], r_b[s:e])) * is_obj_b[s:e, None]
        v_b_pad = _einsum("ngi,g->ni", G[s:e], qd)
        return v_a - v_b_obj - v_b_pad

    def apply_impulse(V, W, qd, P, s, e):
        """Apply world impulses P (slice,3): +P to object a, -P to b."""
        Pm = P * actf[s:e, None]
        dV_a = Pm * inv_m_a[s:e, None]
        dW_a = _einsum("nij,nj->ni", iI_a[s:e], jnp.cross(r_a[s:e], Pm))
        V = V + jax.ops.segment_sum(dV_a, ia[s:e], num_segments=K)
        W = W + jax.ops.segment_sum(dW_a, ia[s:e], num_segments=K)
        Pb = Pm * is_obj_b[s:e, None]
        dV_b = Pb * inv_m_b[s:e, None]
        dW_b = _einsum("nij,nj->ni", iI_b[s:e], jnp.cross(r_b[s:e], Pb))
        V = V - jax.ops.segment_sum(dV_b, ib[s:e], num_segments=K)
        W = W - jax.ops.segment_sum(dW_b, ib[s:e], num_segments=K)
        dqd = -_einsum("ngi,ni->ng", G[s:e], Pm) * inv_dof_mass[None]
        qd = qd + dqd.sum(0)
        return V, W, qd

    def solve_category(V, W, qd, lam, s, e, om=None, bias_scale=1.0):
        """One projected-impulse pass over contacts [s:e) (Jacobi within)."""
        om = omega if om is None else om
        lam_n, lam_t1, lam_t2 = lam
        v = rel_vel(V, W, qd, s, e)
        v_n = jnp.sum(v * n[s:e], -1)
        dl_n = (bias_scale * bias[s:e] - v_n) / w_n[s:e] * om
        lam_n_new = jnp.maximum(lam_n + dl_n, 0.0)
        dl_n = lam_n_new - lam_n
        v_t1 = jnp.sum(v * t1[s:e], -1)
        v_t2 = jnp.sum(v * t2[s:e], -1)
        lt1 = lam_t1 - v_t1 / w_t1[s:e] * om
        lt2 = lam_t2 - v_t2 / w_t2[s:e] * om
        t_norm = jnp.sqrt(lt1**2 + lt2**2)
        scale = jnp.minimum(1.0, mu * lam_n_new / jnp.maximum(t_norm, 1e-9))
        lt1 = lt1 * scale
        lt2 = lt2 * scale
        P = (
            dl_n[:, None] * n[s:e]
            + (lt1 - lam_t1)[:, None] * t1[s:e]
            + (lt2 - lam_t2)[:, None] * t2[s:e]
        )
        V, W, qd = apply_impulse(V, W, qd, P, s, e)
        return V, W, qd, (lam_n_new, lt1, lt2)

    def solve_friction(V, W, qd, lam, s, e, om):
        """Tangent-only projected pass for [s:e) given fixed normal lam."""
        lam_n, lam_t1, lam_t2 = lam
        v = rel_vel(V, W, qd, s, e)
        v_t1 = jnp.sum(v * t1[s:e], -1)
        v_t2 = jnp.sum(v * t2[s:e], -1)
        lt1 = lam_t1 - v_t1 / w_t1[s:e] * om
        lt2 = lam_t2 - v_t2 / w_t2[s:e] * om
        t_norm = jnp.sqrt(lt1**2 + lt2**2)
        scale = jnp.minimum(1.0, mu * lam_n / jnp.maximum(t_norm, 1e-9))
        lt1 = lt1 * scale
        lt2 = lt2 * scale
        P = (lt1 - lam_t1)[:, None] * t1[s:e] + (lt2 - lam_t2)[:, None] * t2[s:e]
        V, W, qd = apply_impulse(V, W, qd, P, s, e)
        return V, W, qd, (lam_n, lt1, lt2)

    def solve_pads_coupled(V, W, qd, lamL, lamR, sL, eL, sR, eR):
        """Exact 2x2 block solve of the opposing-pad normal rows.

        Pad slots are aligned (left slot i and right slot i are the same
        object sphere, _collect_contacts layout), and the pinch couples the
        two rows through the light object between them: Gauss-Seidel
        alternation contracts at rate ~(w_LR^2 / (w_LL*w_RR)) per sweep,
        which for a 0.1 kg object between 0.4 kg-effective fingers is
        ~0.65 — tens of sweeps to converge, and any residual lets the
        finger servo creep through the object (measured: a held rod's
        width drifted 7 mm -> 0 during one lift step at 6 pad passes,
        tripping the empty-grip reopen). Solving the coupled 2x2 LCP
        per sphere (Box2D-style 4-case enumeration) removes that
        contraction entirely; friction stays per-contact.
        """
        nL, nR = n[sL:eL], n[sR:eR]
        lamLn, lamLt1, lamLt2 = lamL
        lamRn, lamRt1, lamRt2 = lamR
        vL = jnp.sum(rel_vel(V, W, qd, sL, eL) * nL, -1)
        vR = jnp.sum(rel_vel(V, W, qd, sR, eR) * nR, -1)
        # Cross effective mass w_LR = J_L M^-1 J_R^T: through the shared
        # object body and through the shared gripper base DOFs.
        rxnL = jnp.cross(r_a[sL:eL], nL)
        rxnR = jnp.cross(r_a[sR:eR], nR)
        w_obj = inv_m_a[sL:eL] * jnp.sum(nL * nR, -1) + _einsum(
            "ni,nij,nj->n", rxnL, iI_a[sL:eL], rxnR
        )
        JgL = _einsum("ngi,ni->ng", G[sL:eL], nL)
        JgR = _einsum("ngi,ni->ng", G[sR:eR], nR)
        w_dof = _einsum("ng,g,ng->n", JgL, inv_dof_mass, JgR)
        both = actf[sL:eL] * actf[sR:eR]
        w_lr = (w_obj + w_dof) * both  # decouples to two 1-D solves if one side inactive
        w_ll = w_n[sL:eL]
        w_rr = w_n[sR:eR]
        bL = params.pad_bias_scale * bias[sL:eL] - vL
        bR = params.pad_bias_scale * bias[sR:eR] - vR
        det = jnp.maximum(w_ll * w_rr - w_lr * w_lr, 1e-4 * w_ll * w_rr)
        # case A: both rows active
        dA_L = (w_rr * bL - w_lr * bR) / det
        dA_R = (w_ll * bR - w_lr * bL) / det
        lamA_L, lamA_R = lamLn + dA_L, lamRn + dA_R
        okA = (lamA_L >= 0.0) & (lamA_R >= 0.0)
        # case B: left clamps to zero
        dB_L = -lamLn
        dB_R = (bR - w_lr * dB_L) / w_rr
        lamB_R = lamRn + dB_R
        okB = (lamB_R >= 0.0) & (w_ll * dB_L + w_lr * dB_R - bL >= 0.0)
        # case C: right clamps to zero
        dC_R = -lamRn
        dC_L = (bL - w_lr * dC_R) / w_ll
        lamC_L = lamLn + dC_L
        okC = (lamC_L >= 0.0) & (w_lr * dC_L + w_rr * dC_R - bR >= 0.0)
        # case D: both clamp to zero
        zero = jnp.zeros_like(lamLn)
        newL = jnp.where(okA, lamA_L, jnp.where(okB, zero, jnp.where(okC, lamC_L, zero)))
        newR = jnp.where(okA, lamA_R, jnp.where(okB, lamB_R, zero))
        # Mass splitting across spheres: each 2x2 block assumes it alone
        # must produce the full velocity correction, so n parallel sphere
        # contacts on the same (object, pad) overshoot n-fold when applied
        # Jacobi-style (measured: a 4-sphere rod was ejected ~1 m by one
        # close). Damping each block's impulse by 1/n_active makes the
        # joint update exact for identical rows and contractive otherwise.
        iaL = ia[sL:eL]
        cntL = jax.ops.segment_sum(actf[sL:eL], iaL, num_segments=K)[iaL]
        iaR = ia[sR:eR]
        cntR = jax.ops.segment_sum(actf[sR:eR], iaR, num_segments=K)[iaR]
        newL = lamLn + (newL - lamLn) / jnp.maximum(cntL, 1.0)
        newR = lamRn + (newR - lamRn) / jnp.maximum(cntR, 1.0)
        V, W, qd = apply_impulse(V, W, qd, (newL - lamLn)[:, None] * nL, sL, eL)
        V, W, qd = apply_impulse(V, W, qd, (newR - lamRn)[:, None] * nR, sR, eR)
        V, W, qd, lamL = solve_friction(
            V, W, qd, (newL, lamLt1, lamLt2), sL, eL, params.pad_omega
        )
        V, W, qd, lamR = solve_friction(
            V, W, qd, (newR, lamRt1, lamRt2), sR, eR, params.pad_omega
        )
        return V, W, qd, lamL, lamR

    # Category-sequential Gauss-Seidel: statics, left pad, right pad,
    # object-object solved one after another inside each iteration.
    # Sequential ordering is what makes the two-sided finger squeeze
    # converge (pure Jacobi lets the fingers creep through the object);
    # within a category the contacts are independent enough for relaxed
    # Jacobi on the VPU.
    bnds = contacts["bounds"]
    cats = [
        (bnds[i], bnds[i + 1])
        for i in range(len(bnds) - 1)
        if bnds[i + 1] > bnds[i]
    ]

    v_des, motor_cap = motor_plan
    dof_mass = params.dof_mass

    def solve_motor(qd, lam_m):
        """Clamped motor rows: exact 1-D projection per gripper DOF."""
        lam_new = jnp.clip(lam_m + (v_des - qd) * dof_mass, -motor_cap, motor_cap)
        qd = qd + (lam_new - lam_m) / dof_mass
        return qd, lam_new

    # Category roles: cats[0] statics, cats[1] left pad, cats[2] right pad,
    # cats[3] (optional) object-object.
    def iteration(carry, _, do_oo=True):
        V, W, qd, lam_m, lams = carry
        lams = list(lams)
        V, W, qd, lams[0] = solve_category(V, W, qd, lams[0], *cats[0])
        # The two-pad squeeze is a light body shuttling between two heavy
        # force-capped actuators — plain GS converges at the mass-ratio
        # rate. Give the (motor, padL, padR) subsystem its own inner loop
        # with near-unity relaxation; the rows are few so this is cheap.
        def pad_pass(carry, _):
            V, W, qd, lam_m, lamL, lamR = carry
            qd, lam_m = solve_motor(qd, lam_m)
            V, W, qd, lamL, lamR = solve_pads_coupled(
                V, W, qd, lamL, lamR, *cats[1], *cats[2]
            )
            return (V, W, qd, lam_m, lamL, lamR), None

        (V, W, qd, lam_m, lams[1], lams[2]), _ = jax.lax.scan(
            pad_pass, (V, W, qd, lam_m, lams[1], lams[2]), None,
            length=params.pad_inner_iterations,
        )
        if do_oo:
            for ci in range(3, len(cats)):
                V, W, qd, lams[ci] = solve_category(V, W, qd, lams[ci], *cats[ci])
        return (V, W, qd, lam_m, tuple(lams)), None

    # Warm start: contact slots have stable identity (slot = sphere x
    # category), so the previous substep's impulses are a near-perfect
    # initial guess. Apply them up front, then iterate. This is what lets
    # friction fully converge while lifting a squeezed object (without it,
    # tangential impulses rebuild from zero each substep and the object
    # slips ~1 mm/substep out of the grasp).
    if warm_lams is None:
        lam0 = tuple(
            (jnp.zeros(e - s), jnp.zeros(e - s), jnp.zeros(e - s)) for s, e in cats
        )
    else:
        lam0 = []
        for (s, e), lam in zip(cats, warm_lams):
            ln, lt1_, lt2_, n_old = lam
            # gate by contact-direction continuity (cos^2, clamped at 0):
            # a contact whose normal rotated since last substep must not
            # receive yesterday's impulse along today's direction.
            cont = jnp.clip(jnp.sum(n_old * n[s:e], -1), 0.0, 1.0) ** 2
            scale = params.warm_start * actf[s:e] * cont
            ln, lt1_, lt2_ = ln * scale, lt1_ * scale, lt2_ * scale
            P0 = ln[:, None] * n[s:e] + lt1_[:, None] * t1[s:e] + lt2_[:, None] * t2[s:e]
            V, W, qd = apply_impulse(V, W, qd, P0, s, e)
            lam0.append((ln, lt1_, lt2_))
        lam0 = tuple(lam0)
    lam_m0 = jnp.zeros(6)
    if params.oo_pass_stride > 1:
        # Strided object-object passes: the iteration count is small and
        # static, so unroll (mirrors the Pallas kernel's unrolled form).
        carry = (V, W, qd, lam_m0, lam0)
        for it in range(params.solver_iterations):
            carry, _ = iteration(
                carry, None, do_oo=(it % params.oo_pass_stride == 0)
            )
        V, W, qd, _, lams = carry
    else:
        (V, W, qd, _, lams), _ = jax.lax.scan(
            iteration, (V, W, qd, lam_m0, lam0), None,
            length=params.solver_iterations,
        )
    # In-hand spin resistance (SimParams.pinch_damping): objects with
    # active contacts on BOTH finger pads damp their angular velocity
    # toward the gripper's yaw rate (relative spin only — a held object
    # still co-rotates with the wrist).
    if params.pinch_damping > 0:
        def _cat_touch(ci):
            s, e = cats[ci]
            return (
                jax.ops.segment_sum(
                    active[s:e].astype(jnp.float32), ia[s:e], num_segments=K
                )
                > 0
            )
        pinched = _cat_touch(1) & _cat_touch(2)
        w_grip = jnp.array([0.0, 0.0, 1.0]) * qd[3]
        W = jnp.where(
            pinched[:, None],
            W - params.pinch_damping * (W - w_grip[None]),
            W,
        )

    # Rolling resistance at static contacts (SimParams.rolling_damping):
    # sphere compounds are perfectly round, so without this a settled rod
    # rolls indefinitely on the flat floor (the reference's meshes stop on
    # their faces; Bullet's analogue is contact rolling_friction).
    if params.rolling_damping > 0:
        is_static = (contacts["b_kind"] == 0) & active
        touch = (
            jax.ops.segment_sum(
                is_static.astype(jnp.float32), ia, num_segments=K
            )
            > 0
        )
        W = W * jnp.where(touch, 1.0 - params.rolling_damping, 1.0)[:, None]

    # attach this substep's contact normals for warm-start gating
    lams = tuple(
        lam + (n[s:e],) for (s, e), lam in zip(cats, lams)
    )
    return V, W, qd, lams


def _servo_plan(q, target, finger_target, params):
    """Position-servo plan per DOF: desired velocity + motor impulse cap.

    Mirrors Bullet POSITION_CONTROL with max force (model.py:69-74): drive at
    the largest velocity that can still brake to rest at the target given the
    force cap. The motor is solved as a clamped constraint row INSIDE the
    contact solver (like Bullet's joint motors living in the same LCP): an
    unconditional velocity overwrite would re-accelerate stalled fingers
    into the held object every substep and the contacts would have to
    rebuild the full opposing impulse from scratch, causing slow crushing.
    """
    # The z motor must not drive below the fingertip-floor stop: a target
    # under the clamp would keep pushing down at full force and friction-drag
    # any held object out of the jaw.
    floor_q2 = params.support_z + PAD_CENTER_DEPTH + PAD_HALF_EXTENTS[2]
    target = target.at[2].set(jnp.maximum(target[2], floor_q2))
    full_target = jnp.concatenate([target, jnp.array([finger_target, finger_target])])
    err = full_target - q
    a_max = params.dof_force / params.dof_mass
    # Braking capacity: gravity eats into the z DOF's force budget, so plan
    # the approach with the worst-case (downhill) deceleration.
    g_load = jnp.array([0.0, 0.0, -params.gravity, 0.0, 0.0, 0.0], jnp.float32)
    a_brake = jnp.maximum(0.8 * a_max - g_load, 0.5)
    v_stop = jnp.sqrt(2.0 * a_brake * jnp.abs(err))
    v_des = jnp.sign(err) * jnp.minimum(
        jnp.minimum(jnp.abs(err) / params.dt, v_stop), params.dof_vmax
    )
    cap = params.dof_force * params.dt  # max motor impulse per substep
    return v_des, cap


def substep(state: SimState, params: SimParams, warm_lams=None):
    g = state.gripper
    obj = state.objects
    dt = params.dt

    # 1. Free-velocity update: gravity + damping; servos become motor rows
    # inside the solver.
    qd = g.qd.at[2].add(params.gravity * dt)  # gravity on the z DOF subtree
    motor_plan = _servo_plan(g.q, g.target, g.finger_target, params)

    V = obj.linvel + _EZ * (params.gravity * dt)
    V = V * (1.0 - params.lin_damping * dt)
    W = obj.angvel * (1.0 - params.ang_damping * dt)

    # 2. Contacts + impulse solve.
    R = quat_to_matrix(obj.quat)
    inv_I_world = _einsum(
        "kij,kj,klj->kil", R, params.inv_inertia[obj.obj_type], R
    )
    contacts = _collect_contacts(state, params)
    V, W, qd, lams = _solve_contacts(
        state, params, contacts, V, W, qd, inv_I_world, warm_lams, motor_plan
    )

    # 3. Integrate.
    alive_f = obj.alive[:, None].astype(jnp.float32)
    V = jnp.clip(V, -4.0, 4.0) * alive_f
    W = jnp.clip(W, -50.0, 50.0) * alive_f
    pos = obj.pos + V * dt
    dq = jnp.concatenate([W, jnp.zeros((W.shape[0], 1))], axis=-1)
    # quat update: q' = q + dt/2 * omega_quat * q  ([x,y,z,w] convention)
    ow = dq[:, :3]
    qv = obj.quat[:, :3]
    qw = obj.quat[:, 3:4]
    dquat = jnp.concatenate(
        [qw * ow + jnp.cross(ow, qv), -jnp.sum(ow * qv, -1, keepdims=True)], -1
    )
    quat = obj.quat + 0.5 * dt * dquat
    quat = quat / jnp.maximum(jnp.linalg.norm(quat, axis=-1, keepdims=True), 1e-9)

    q = g.q + qd * dt
    # Finger limits (SDF: [-0.01, 0.05]); zero velocity at the stops.
    f = jnp.clip(q[4:6], FINGER_LIMIT_LOW, FINGER_LIMIT_HIGH)
    qd = qd.at[4:6].set(jnp.where(f != q[4:6], 0.0, qd[4:6]))
    q = q.at[4:6].set(f)
    # Fingertips rest on the support surface: the z servo stalls there
    # (drives SimplifiedReward's stall-FAIL, rewards.py:81-84, and keeps
    # the hand from punching through the tray as Bullet's finger collision
    # shapes would prevent).
    floor_q2 = params.support_z + PAD_CENTER_DEPTH + PAD_HALF_EXTENTS[2]
    hit_floor = q[2] < floor_q2
    q = q.at[2].set(jnp.maximum(q[2], floor_q2))
    qd = qd.at[2].set(jnp.where(hit_floor, jnp.maximum(qd[2], 0.0), qd[2]))

    new_state = SimState(
        gripper=GripperState(
            q=q, qd=qd, target=g.target, finger_target=g.finger_target,
            gripper_close=g.gripper_close, ee_angle=g.ee_angle,
        ),
        objects=ObjectState(
            pos=pos, quat=quat, linvel=V, angvel=W,
            obj_type=obj.obj_type, alive=obj.alive,
        ),
    )
    return new_state, lams


def run(state: SimState, params: SimParams, n_substeps: int) -> SimState:
    """Advance the world `n_substeps` x dt (reference World.run, simulation.py:49).

    Contact impulses are warm-started across substeps within the run.
    """
    state, lams = substep(state, params, None)

    def body(carry, _):
        s, lams = carry
        s, lams = substep(s, params, lams)
        return (s, lams), None

    (state, _), _ = jax.lax.scan(
        body, (state, lams), None, length=n_substeps - 1
    )
    return state


FINGER_CLOSED_WIDTH = 0.05


def gripper_width(q):
    """Opening width, reference formula (robot.py:279-284)."""
    return (FINGER_CLOSED_WIDTH - q[4]) + (FINGER_CLOSED_WIDTH - q[5])
