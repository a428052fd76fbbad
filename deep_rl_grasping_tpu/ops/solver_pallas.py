"""Fused Pallas TPU kernel for the contact-solver substep loop.

Replaces the XLA lowering of `physics.run` (sim/physics.py) in the hot path.
The XLA program for one substep is ~4-5k small HLO ops whose per-op dispatch
and HBM round-trips dominate (ops/SOLVER_PLAN.md profile: ~40 ms per batched
substep at 1024 envs with VPU utilization of a few percent). This kernel runs
the WHOLE `n_substeps` loop in one `pallas_call`: all state lives in VMEM and
every arithmetic op is a full-lane VPU instruction.

Layout: the env batch rides the LANE axis. The grid is over env blocks of
BLOCK_E lanes; every physical quantity is an array `(slots..., BLOCK_E)` and
3-vectors are stored as separate x/y/z component planes, so cross/dot
products lower to plain elementwise VPU ops with zero layout waste. Contact
scatter/gather is free: slot -> object maps are static (slot = sphere x
category; object pairs come from a static triu list), so `segment_sum`
becomes a sum over static axes and pair scatter becomes unrolled adds.

The math mirrors sim/physics.py pass-for-pass (statics -> inner x (motor,
left pad, right pad) -> object-object per solver iteration; warm-start
impulses gated by normal continuity; one-sided pad recovery; Baumgarte
clamps; servo plans; finger limits and the fingertip floor stop), so parity
with the XLA path is tested numerically (tests/test_solver_pallas.py).

Reference being replaced: Bullet's btSequentialImpulseConstraintSolver driven
at 1/240 s via pybullet stepSimulation (reference simulation/simulation.py:37-75).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deep_rl_grasping_tpu.sim.types import (
    FINGER_LIMIT_HIGH,
    FINGER_LIMIT_LOW,
    PAD_CENTER_DEPTH,
    PAD_HALF_EXTENTS,
    PAD_X_OFFSET,
    SimParams,
    SimState,
)

# 3-vectors are tuples (x, y, z) of (..., E) arrays.


def _cross(a, b):
    ax, ay, az = a
    bx, by, bz = b
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _scale(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def _add(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _norm(a, eps=1e-9):
    return jnp.sqrt(jnp.maximum(_dot(a, a), eps * eps))


def _tangent_basis(n):
    """Matches physics._tangent_basis componentwise."""
    use_x = jnp.abs(n[0]) < 0.9
    a = (
        jnp.where(use_x, 1.0, 0.0),
        jnp.where(use_x, 0.0, 1.0),
        jnp.zeros_like(n[0]),
    )
    t1 = _cross(n, a)
    t1 = _scale(t1, 1.0 / jnp.maximum(_norm(t1), 1e-9))
    t2 = _cross(n, t1)
    return t1, t2


def _iI_apply(iI, v):
    """Apply symmetric inverse inertia given planes (xx,yy,zz,xy,xz,yz)."""
    xx, yy, zz, xy, xz, yz = iI
    return (
        xx * v[0] + xy * v[1] + xz * v[2],
        xy * v[0] + yy * v[1] + yz * v[2],
        xz * v[0] + yz * v[1] + zz * v[2],
    )


def _iI_quad(iI, v):
    return _dot(v, _iI_apply(iI, v))


def _f(x):
    return x.astype(jnp.float32)


def _make_kernel(sp: dict, K, S, SC, n_substeps, ablate=frozenset()):
    """sp: plain-python scalar params snapshot (hashable/static).

    ablate: perf-attribution switches used ONLY by
    scripts_dev/kernel_breakdown.py (never in training): a frozenset of
    {"statics", "pads", "objobj", "warm"} section names whose passes (and
    any constants DCE'd with them) are skipped, so on-chip timing deltas
    attribute the kernel's cycles per contact category
    (docs/KERNEL_BREAKDOWN.md). The finer-grained "<name>_pass" switches
    ("statics_pass", "pads_pass", "objobj_pass") skip only the per-
    solver-iteration solve passes while KEEPING the category's per-substep
    geometry, constants, and warm start, splitting each category's cost
    into iterate-rate vs substep-rate work."""
    dt = sp["dt"]
    has_tray = sp["has_tray"]
    P_list = [(i, j) for i in range(K) for j in range(i + 1, K)]
    NP = len(P_list)
    mu = sp["friction"]
    omega = sp["relaxation"]
    pad_he = np.asarray(PAD_HALF_EXTENTS, np.float32)
    dof_mass = np.asarray(sp["dof_mass"], np.float32)
    dof_force = np.asarray(sp["dof_force"], np.float32)
    dof_vmax = np.asarray(sp["dof_vmax"], np.float32)
    inv_dof_mass = 1.0 / dof_mass
    motor_cap = dof_force * dt
    floor_q2 = sp["support_z"] + PAD_CENTER_DEPTH + PAD_HALF_EXTENTS[2]
    bias_coef = sp["baumgarte"] / dt
    NS = 1 + (4 if has_tray else 0)

    if has_tray:
        th = sp["tray_half"]
        wh = sp["tray_wall_height"]
        wall_c = np.array(
            [
                [th + 0.02, 0.0, sp["support_z"] + wh * 0.5],
                [-(th + 0.02), 0.0, sp["support_z"] + wh * 0.5],
                [0.0, th + 0.02, sp["support_z"] + wh * 0.5],
                [0.0, -(th + 0.02), sp["support_z"] + wh * 0.5],
            ],
            np.float32,
        )
        wall_he = np.array(
            [
                [0.02, th + 0.04, wh * 0.5],
                [0.02, th + 0.04, wh * 0.5],
                [th + 0.04, 0.02, wh * 0.5],
                [th + 0.04, 0.02, wh * 0.5],
            ],
            np.float32,
        )
        wall_ax = [0, 0, 1, 1]
        wall_sign = [-1.0, 1.0, -1.0, 1.0]

    a_max = dof_force / dof_mass
    g_load = np.array([0.0, 0.0, -sp["gravity"], 0.0, 0.0, 0.0], np.float32)
    a_brake = np.maximum(0.8 * a_max - g_load, 0.5)

    def kernel(q_ref, qd_ref, tgt_ref, ftgt_ref,
               pos_ref, quat_ref, lin_ref, ang_ref, alive_ref,
               cent_ref, rad_ref, cent2_ref, rad2_ref, invm_ref, invI_ref,
               q_out, qd_out, pos_out, quat_out, lin_out, ang_out):
        # Everything vector-valued is component-major: Mosaic only lowers
        # 2D gathers, so middle-dim integer slices like pos[:, c] are out;
        # leading-dim slices are plain contiguous loads. Object 3-vectors
        # (pos, vel) live as tuples of (K,E) planes inside the substep.
        q0 = tuple(q_ref[d, :] for d in range(6))
        qd0 = tuple(qd_ref[d, :] for d in range(6))
        target = tuple(tgt_ref[d, :] for d in range(4))
        ftgt = ftgt_ref[0, :]
        pos0 = tuple(pos_ref[c] for c in range(3))      # (K,E) x3
        quat0 = tuple(quat_ref[c] for c in range(4))    # (K,E) x4
        V0 = tuple(lin_ref[c] for c in range(3))
        W0 = tuple(ang_ref[c] for c in range(3))
        alive = alive_ref[...]    # (K,E) f32
        cent_l = cent_ref[...]    # (3,K,S,E)
        radii = rad_ref[...]      # (K,S,E)
        cent2_l = cent2_ref[...]  # (3,K,SC,E) coarse object-object LOD
        radii2 = rad2_ref[...]    # (K,SC,E)
        inv_m = invm_ref[...]     # (K,E)
        inv_I_diag = tuple(invI_ref[c] for c in range(3))  # (K,E) x3
        E = q0[0].shape[-1]

        smask = _f(radii > 0.0) * alive[:, None, :]
        smask2 = _f(radii2 > 0.0) * alive[:, None, :]
        inv_m_flat = inv_m[:, None, :]

        def one_substep(carry):
            (q, qd, pos, quat, V, W,
             lam_st, lam_pl, lam_pr, lam_oo,
             no_pl, no_pr, no_oo, first) = carry
            q = list(q)
            qd = list(qd)

            # ---- 1. free-velocity update + servo plan
            qd[2] = qd[2] + sp["gravity"] * dt
            ld = 1.0 - sp["lin_damping"] * dt
            V = (V[0] * ld, V[1] * ld, (V[2] + sp["gravity"] * dt) * ld)
            ad = 1.0 - sp["ang_damping"] * dt
            W = (W[0] * ad, W[1] * ad, W[2] * ad)

            tz = jnp.maximum(target[2], floor_q2)
            full_target = (target[0], target[1], tz, target[3], ftgt, ftgt)
            v_des = []
            for d in range(6):
                err = full_target[d] - q[d]
                v_stop = jnp.sqrt(2.0 * a_brake[d] * jnp.abs(err))
                v_des.append(
                    jnp.sign(err)
                    * jnp.minimum(
                        jnp.minimum(jnp.abs(err) / dt, v_stop), dof_vmax[d]
                    )
                )

            # ---- rotation matrices + world inverse inertia planes (K,E)
            qx, qy, qz_, qw = quat
            R = {
                (0, 0): 1 - 2 * (qy * qy + qz_ * qz_),
                (0, 1): 2 * (qx * qy - qw * qz_),
                (0, 2): 2 * (qx * qz_ + qw * qy),
                (1, 0): 2 * (qx * qy + qw * qz_),
                (1, 1): 1 - 2 * (qx * qx + qz_ * qz_),
                (1, 2): 2 * (qy * qz_ - qw * qx),
                (2, 0): 2 * (qx * qz_ - qw * qy),
                (2, 1): 2 * (qy * qz_ + qw * qx),
                (2, 2): 1 - 2 * (qx * qx + qy * qy),
            }
            d0, d1, d2 = inv_I_diag

            def iI_plane(i, j):
                return (
                    R[(i, 0)] * d0 * R[(j, 0)]
                    + R[(i, 1)] * d1 * R[(j, 1)]
                    + R[(i, 2)] * d2 * R[(j, 2)]
                )

            iI = (
                iI_plane(0, 0), iI_plane(1, 1), iI_plane(2, 2),
                iI_plane(0, 1), iI_plane(0, 2), iI_plane(1, 2),
            )
            iI_k = tuple(p[:, None, :] for p in iI)  # (K,1,E)

            # ---- world sphere centers (K,S,E) components
            cw = tuple(
                pos[c][:, None, :]
                + R[(c, 0)][:, None, :] * cent_l[0]
                + R[(c, 1)][:, None, :] * cent_l[1]
                + R[(c, 2)][:, None, :] * cent_l[2]
                for c in range(3)
            )
            # coarse object-object LOD centers (K,SC,E)
            cw2 = tuple(
                pos[c][:, None, :]
                + R[(c, 0)][:, None, :] * cent2_l[0]
                + R[(c, 1)][:, None, :] * cent2_l[1]
                + R[(c, 2)][:, None, :] * cent2_l[2]
                for c in range(3)
            )

            # ---- gripper frame
            yaw = q[3]
            cy, sy = jnp.cos(yaw), jnp.sin(yaw)
            ex = (cy, sy, jnp.zeros_like(cy))
            ey = (-sy, cy, jnp.zeros_like(cy))
            base = (q[0], q[1], q[2])
            c_l = (
                base[0] - ex[0] * (PAD_X_OFFSET - q[4]),
                base[1] - ex[1] * (PAD_X_OFFSET - q[4]),
                base[2] - PAD_CENTER_DEPTH,
            )
            c_r = (
                base[0] + ex[0] * (PAD_X_OFFSET - q[5]),
                base[1] + ex[1] * (PAD_X_OFFSET - q[5]),
                base[2] - PAD_CENTER_DEPTH,
            )
            axis_l, axis_r = ex, (-ex[0], -ex[1], -ex[2])

            # ======================================================= contacts
            # statics: (NS,K,S,E)
            pen_pl_ = sp["support_z"] - (cw[2] - radii)
            zs = jnp.zeros_like(pen_pl_)
            stat_n = [(zs, zs, jnp.ones_like(pen_pl_))]
            stat_pen = [pen_pl_]
            stat_pt = [(cw[0], cw[1], cw[2] - radii)]
            stat_act = [smask * _f(pen_pl_ > 0.0)]
            if has_tray:
                for wdx in range(4):
                    bc, he = wall_c[wdx], wall_he[wdx]
                    lx, ly, lz = cw[0] - bc[0], cw[1] - bc[1], cw[2] - bc[2]
                    clx = jnp.clip(lx, -he[0], he[0])
                    cly = jnp.clip(ly, -he[1], he[1])
                    clz = jnp.clip(lz, -he[2], he[2])
                    dx, dy, dz = lx - clx, ly - cly, lz - clz
                    dist = jnp.sqrt(dx * dx + dy * dy + dz * dz)
                    outside = dist > 1e-9
                    inv = 1.0 / jnp.maximum(dist, 1e-9)
                    ax, sg = wall_ax[wdx], wall_sign[wdx]
                    n_in = [0.0, 0.0, 0.0]
                    n_in[ax] = sg
                    nx = jnp.where(outside, dx * inv, n_in[0])
                    ny = jnp.where(outside, dy * inv, n_in[1])
                    nz = jnp.where(outside, dz * inv, n_in[2])
                    l_ax = (lx, ly, lz)[ax]
                    pen = jnp.where(
                        outside, radii - dist, radii + he[ax] - sg * l_ax
                    )
                    stat_n.append((nx, ny, nz))
                    stat_pen.append(pen)
                    stat_pt.append(
                        (cw[0] - nx * radii, cw[1] - ny * radii,
                         cw[2] - nz * radii)
                    )
                    stat_act.append(smask * _f(pen > 0.0))
            st_n = tuple(jnp.stack([n[c] for n in stat_n]) for c in range(3))
            st_pen = jnp.stack(stat_pen)
            st_pt = tuple(jnp.stack([p[c] for p in stat_pt]) for c in range(3))
            st_act = jnp.stack(stat_act)

            # pads: (K,S,E)
            def pad_contact(c_pad, sign):
                rel = (
                    cw[0] - c_pad[0][None, None, :],
                    cw[1] - c_pad[1][None, None, :],
                    cw[2] - c_pad[2][None, None, :],
                )
                exb = tuple(e[None, None, :] for e in ex)
                eyb = tuple(e[None, None, :] for e in ey)
                lx = _dot(rel, exb)
                ly = _dot(rel, eyb)
                lz = rel[2]
                clx = jnp.clip(lx, -pad_he[0], pad_he[0])
                cly = jnp.clip(ly, -pad_he[1], pad_he[1])
                clz = jnp.clip(lz, -pad_he[2], pad_he[2])
                dx, dy, dz = lx - clx, ly - cly, lz - clz
                dist = jnp.sqrt(dx * dx + dy * dy + dz * dz)
                outside = dist > 1e-9
                inv = 1.0 / jnp.maximum(dist, 1e-9)
                nlx = jnp.where(outside, dx * inv, sign)
                nly = jnp.where(outside, dy * inv, 0.0)
                nlz = jnp.where(outside, dz * inv, 0.0)
                pen = jnp.where(
                    outside, radii - dist, radii + pad_he[0] - sign * lx
                )
                n = (
                    exb[0] * nlx + eyb[0] * nly,
                    exb[1] * nlx + eyb[1] * nly,
                    exb[2] * nlx + eyb[2] * nly + nlz,
                )
                pt = (cw[0] - n[0] * radii, cw[1] - n[1] * radii,
                      cw[2] - n[2] * radii)
                return n, pen, pt, smask * _f(pen > 0.0)

            pl_n, pl_pen, pl_pt, pl_act = pad_contact(c_l, 1.0)
            pr_n, pr_pen, pr_pt, pr_act = pad_contact(c_r, -1.0)

            # object pairs: (NP,SC,SC,E) — coarse LOD set
            ii = [p[0] for p in P_list]
            jj = [p[1] for p in P_list]
            ci = tuple(jnp.stack([c[i] for i in ii])[:, :, None, :] for c in cw2)
            cj = tuple(jnp.stack([c[j] for j in jj])[:, None, :, :] for c in cw2)
            dvec = _sub(ci, cj)
            dist = _norm(dvec)
            r_i = jnp.stack([radii2[i] for i in ii])[:, :, None, :]
            r_j = jnp.stack([radii2[j] for j in jj])[:, None, :, :]
            rsum = r_i + r_j
            oo_pen = rsum - dist
            oo_n = _scale(dvec, 1.0 / jnp.maximum(dist, 1e-9))
            oo_pt = _add(cj, _scale(oo_n, r_j + 0.5 * (dist - rsum)))
            m_i = jnp.stack([smask2[i] for i in ii])[:, :, None, :]
            m_j = jnp.stack([smask2[j] for j in jj])[:, None, :, :]
            oo_act = m_i * m_j * _f(oo_pen > 0.0)

            # ================================================= solve setup
            # Per-category constants. Tangent bases and friction effective
            # masses are recomputed inside each pass for the object pairs to
            # bound VMEM (the (NP,S,S,E) planes dominate).
            def obj_slot_vel(V, W, r):
                Vk = tuple(V[c][:, None, :] for c in range(3))
                Wk = tuple(W[c][:, None, :] for c in range(3))
                return _add(Vk, _cross(Wk, r))

            # statics constants
            st_r = tuple(st_pt[c] - pos[c][None, :, None, :] for c in range(3))
            st_bias = jnp.minimum(
                bias_coef * jnp.maximum(st_pen - sp["slop"], 0.0),
                sp["max_bias_velocity"],
            )

            def w_obj_dir(r, d, iI_b, invm_b):
                rxd = _cross(r, d)
                return jnp.maximum(invm_b + _iI_quad(iI_b, rxd), 1e-9)

            # pad constants (per pad): gripper jacobian along a direction
            def pad_geo(pt):
                rbx = pt[0] - base[0][None, None, :]
                rby = pt[1] - base[1][None, None, :]
                return rbx, rby

            pl_rb = pad_geo(pl_pt)
            pr_rb = pad_geo(pr_pt)
            pl_r = tuple(pl_pt[c] - pos[c][:, None, :] for c in range(3))
            pr_r = tuple(pr_pt[c] - pos[c][:, None, :] for c in range(3))
            pl_bias = jnp.minimum(
                bias_coef * jnp.maximum(pl_pen - sp["slop"], 0.0),
                sp["max_bias_velocity"],
            )
            pr_bias = jnp.minimum(
                bias_coef * jnp.maximum(pr_pen - sp["slop"], 0.0),
                sp["max_bias_velocity"],
            )
            oo_bias = jnp.minimum(
                bias_coef * jnp.maximum(oo_pen - sp["slop"], 0.0),
                sp["max_bias_velocity"],
            )

            def pad_jac(d, rb, axis):
                rbx, rby = rb
                axb = tuple(a[None, None, :] for a in axis)
                return (
                    d[0], d[1], d[2],
                    -rby * d[0] + rbx * d[1],   # (ez x r) . d
                    _dot(axb, d),
                )

            def pad_w(d, r, rb, axis, fdof):
                jac = pad_jac(d, rb, axis)
                w = w_obj_dir(r, d, iI_k, inv_m_flat)
                w = (
                    w
                    + jac[0] * jac[0] * inv_dof_mass[0]
                    + jac[1] * jac[1] * inv_dof_mass[1]
                    + jac[2] * jac[2] * inv_dof_mass[2]
                    + jac[3] * jac[3] * inv_dof_mass[3]
                    + jac[4] * jac[4] * inv_dof_mass[fdof]
                )
                return jnp.maximum(w, 1e-9), jac

            # object-pair broadcast views
            oo_pos_i = tuple(
                jnp.stack([pos[c][i] for i in ii])[:, None, None, :]
                for c in range(3)
            )
            oo_pos_j = tuple(
                jnp.stack([pos[c][j] for j in jj])[:, None, None, :]
                for c in range(3)
            )
            oo_ra = _sub(oo_pt, oo_pos_i)
            oo_rb = _sub(oo_pt, oo_pos_j)
            oo_iI_i = tuple(
                jnp.stack([p[i] for i in ii])[:, None, None, :] for p in iI
            )
            oo_iI_j = tuple(
                jnp.stack([p[j] for j in jj])[:, None, None, :] for p in iI
            )
            oo_invm_i = jnp.stack([inv_m[i] for i in ii])[:, None, None, :]
            oo_invm_j = jnp.stack([inv_m[j] for j in jj])[:, None, None, :]

            def oo_w(d):
                rxd_a = _cross(oo_ra, d)
                rxd_b = _cross(oo_rb, d)
                return jnp.maximum(
                    oo_invm_i + _iI_quad(oo_iI_i, rxd_a)
                    + oo_invm_j + _iI_quad(oo_iI_j, rxd_b),
                    1e-9,
                )

            # ---------------------------------------------- impulse helpers
            def apply_obj(V, W, P, act, r, sum_axes):
                Pm = _scale(P, act)
                dV = tuple((p * inv_m_flat).sum(sum_axes) for p in Pm)
                tq = _cross(r, Pm)
                dW = tuple(t.sum(sum_axes) for t in _iI_apply(iI_k, tq))
                return _add(V, dV), _add(W, dW)

            def apply_pair(V, W, P, act, r_a, r_b):
                # Static accumulation per object (no scatter: Pallas TPU has
                # no scatter-add lowering; the pair list is static anyway).
                Pm = _scale(P, act)
                E_ = Pm[0].shape[-1]
                zero3 = [jnp.zeros((E_,), jnp.float32) for _ in range(3)]
                dV = [list(zero3) for _ in range(K)]
                dW = [list(zero3) for _ in range(K)]
                for pi, (i, j) in enumerate(P_list):
                    Pp = tuple(p[pi].sum((0, 1)) for p in Pm)
                    tq_a = tuple(
                        t.sum((0, 1))
                        for t in _cross(
                            tuple(r[pi] for r in r_a),
                            tuple(p[pi] for p in Pm),
                        )
                    )
                    tq_b = tuple(
                        t.sum((0, 1))
                        for t in _cross(
                            tuple(r[pi] for r in r_b),
                            tuple(p[pi] for p in Pm),
                        )
                    )
                    dW_a = _iI_apply(tuple(p[i] for p in iI), tq_a)
                    dW_b = _iI_apply(tuple(p[j] for p in iI), tq_b)
                    for c in range(3):
                        dV[i][c] = dV[i][c] + Pp[c] * inv_m[i]
                        dV[j][c] = dV[j][c] - Pp[c] * inv_m[j]
                        dW[i][c] = dW[i][c] + dW_a[c]
                        dW[j][c] = dW[j][c] - dW_b[c]
                V = tuple(
                    V[c] + jnp.stack([dV[k][c] for k in range(K)])
                    for c in range(3)
                )
                W = tuple(
                    W[c] + jnp.stack([dW[k][c] for k in range(K)])
                    for c in range(3)
                )
                return V, W

            def project(lam, v_n, v_t1, v_t2, w_n, w_t1, w_t2, bias,
                        om, bias_scale):
                lam_n, lam_t1, lam_t2 = lam
                dl_n = (bias_scale * bias - v_n) / w_n * om
                lam_n_new = jnp.maximum(lam_n + dl_n, 0.0)
                dl_n = lam_n_new - lam_n
                lt1 = lam_t1 - v_t1 / w_t1 * om
                lt2 = lam_t2 - v_t2 / w_t2 * om
                t_norm = jnp.sqrt(lt1 * lt1 + lt2 * lt2)
                scale = jnp.minimum(
                    1.0, mu * lam_n_new / jnp.maximum(t_norm, 1e-9)
                )
                lt1 = lt1 * scale
                lt2 = lt2 * scale
                return (lam_n_new, lt1, lt2), (dl_n, lt1 - lam_t1, lt2 - lam_t2)

            # ---------------------------------------------------- passes
            # Statics solve constants — substep-invariant, hoisted out of
            # the solver_iterations loop (same rationale as pad_solve_consts).
            st_t1, st_t2 = _tangent_basis(st_n)
            iI_b = tuple(p[None] for p in iI_k)
            invm_b = inv_m_flat[None]
            st_w_n = w_obj_dir(st_r, st_n, iI_b, invm_b)
            st_w_t1 = w_obj_dir(st_r, st_t1, iI_b, invm_b)
            st_w_t2 = w_obj_dir(st_r, st_t2, iI_b, invm_b)

            def pass_statics(V, W, lam):
                t1, t2 = st_t1, st_t2
                w_n, w_t1, w_t2 = st_w_n, st_w_t1, st_w_t2
                Vk = tuple(V[c][None, :, None, :] for c in range(3))
                Wk = tuple(W[c][None, :, None, :] for c in range(3))
                v = _add(Vk, _cross(Wk, st_r))
                lam, dP = project(
                    lam, _dot(v, st_n), _dot(v, t1), _dot(v, t2),
                    w_n, w_t1, w_t2, st_bias, omega, 1.0,
                )
                P = _add(
                    _add(_scale(st_n, dP[0]), _scale(t1, dP[1])),
                    _scale(t2, dP[2]),
                )
                Pm = _scale(P, st_act)
                dV = tuple((p * inv_m_flat[None]).sum((0, 2)) for p in Pm)
                tq = _cross(st_r, Pm)
                dW = tuple(
                    t.sum((0, 2)) for t in _iI_apply(iI_b, tq)
                )
                return _add(V, dV), _add(W, dW), lam

            # Pad solve constants are invariant across the whole
            # solver_iterations x pad_inner_iterations nest (they depend
            # only on substep-level geometry, never on V/W/qd), but the
            # nest executes pass_pad 2 x solver_iterations x
            # pad_inner_iterations (= 112x with default params) times per
            # substep — hoisting the tangent bases, effective masses and
            # jacobians out of the loops roughly halves the pad passes' op
            # count, the kernel's dominant instruction stream. VMEM cost:
            # 24 extra (K,S,E) planes per pad (~1 MB/pad at E=128).
            def pad_solve_consts(n, r, rb, axis, fdof):
                t1, t2 = _tangent_basis(n)
                w_n, jac_n = pad_w(n, r, rb, axis, fdof)
                w_t1, jac_t1 = pad_w(t1, r, rb, axis, fdof)
                w_t2, jac_t2 = pad_w(t2, r, rb, axis, fdof)
                return (t1, t2, w_n, w_t1, w_t2, jac_n, jac_t1, jac_t2)

            pl_consts = pad_solve_consts(pl_n, pl_r, pl_rb, axis_l, 4)
            pr_consts = pad_solve_consts(pr_n, pr_r, pr_rb, axis_r, 5)

            def pad_vb(qd, jac, fdof):
                """Gripper-side velocity along a pad jacobian."""
                return (
                    jac[0] * qd[0][None, None, :]
                    + jac[1] * qd[1][None, None, :]
                    + jac[2] * qd[2][None, None, :]
                    + jac[3] * qd[3][None, None, :]
                    + jac[4] * qd[fdof][None, None, :]
                )

            # Cross effective mass of the aligned left/right pad normal rows
            # w_LR = J_L M^-1 J_R^T (physics.solve_pads_coupled): coupling
            # through the shared object body plus the shared gripper base
            # DOFs (0..3; the finger DOFs 4/5 are disjoint, so no finger
            # cross term). Substep-invariant, hoisted like pad_solve_consts.
            _jacL_n = pl_consts[5]
            _jacR_n = pr_consts[5]
            _rxnL = _cross(pl_r, pl_n)
            _rxnR = _cross(pr_r, pr_n)
            _w_lr_free = (
                inv_m_flat * _dot(pl_n, pr_n)
                + _dot(_rxnL, _iI_apply(iI_k, _rxnR))
                + _jacL_n[0] * _jacR_n[0] * inv_dof_mass[0]
                + _jacL_n[1] * _jacR_n[1] * inv_dof_mass[1]
                + _jacL_n[2] * _jacR_n[2] * inv_dof_mass[2]
                + _jacL_n[3] * _jacR_n[3] * inv_dof_mass[3]
            )
            # Decouples to two independent 1-D solves if either side inactive.
            pad_w_lr = _w_lr_free * pl_act * pr_act
            # Mass splitting counts: active sphere contacts per (object, pad)
            # — each 2x2 block's impulse is damped by 1/n_active so parallel
            # blocks on the same object don't jointly overshoot
            # (physics.solve_pads_coupled mass-splitting note).
            pad_cntL = jnp.maximum(pl_act.sum(1, keepdims=True), 1.0)
            pad_cntR = jnp.maximum(pr_act.sum(1, keepdims=True), 1.0)

            def pad_friction(V, W, qd, lam, act, r, consts, fdof, om):
                """Tangent-only projected pass given a fixed normal lam
                (physics.solve_friction)."""
                (t1, t2, _, w_t1, w_t2, _, jac_t1, jac_t2) = consts
                lam_n, lam_t1, lam_t2 = lam
                v = obj_slot_vel(V, W, r)
                v_t1 = _dot(v, t1) - pad_vb(qd, jac_t1, fdof)
                v_t2 = _dot(v, t2) - pad_vb(qd, jac_t2, fdof)
                lt1 = lam_t1 - v_t1 / w_t1 * om
                lt2 = lam_t2 - v_t2 / w_t2 * om
                t_norm = jnp.sqrt(lt1 * lt1 + lt2 * lt2)
                scale = jnp.minimum(
                    1.0, mu * lam_n / jnp.maximum(t_norm, 1e-9)
                )
                lt1 = lt1 * scale
                lt2 = lt2 * scale
                dP1 = lt1 - lam_t1
                dP2 = lt2 - lam_t2
                P = _add(_scale(t1, dP1), _scale(t2, dP2))
                V, W = apply_obj(V, W, P, act, r, 1)
                qd = list(qd)
                for d, idx in ((0, 0), (1, 1), (2, 2), (3, 3), (4, fdof)):
                    dq = -(jac_t1[d] * dP1 + jac_t2[d] * dP2)
                    qd[idx] = qd[idx] + (dq * act).sum((0, 1)) * inv_dof_mass[idx]
                return V, W, qd, (lam_n, lt1, lt2)

            def pass_pads_coupled(V, W, qd, lamL, lamR):
                """Exact 2x2 block solve of the opposing-pad normal rows
                (Box2D-style 4-case LCP enumeration), componentwise identical
                to physics.solve_pads_coupled: kills the slow Gauss-Seidel
                contraction of the pinch (light object between two fingers)
                that let the finger servo creep through held objects."""
                lamLn, lamLt1, lamLt2 = lamL
                lamRn, lamRt1, lamRt2 = lamR
                jacL_n = pl_consts[5]
                jacR_n = pr_consts[5]
                w_ll = pl_consts[2]
                w_rr = pr_consts[2]
                vL = _dot(obj_slot_vel(V, W, pl_r), pl_n) - pad_vb(
                    qd, jacL_n, 4
                )
                vR = _dot(obj_slot_vel(V, W, pr_r), pr_n) - pad_vb(
                    qd, jacR_n, 5
                )
                bL = sp["pad_bias_scale"] * pl_bias - vL
                bR = sp["pad_bias_scale"] * pr_bias - vR
                w_lr = pad_w_lr
                det = jnp.maximum(
                    w_ll * w_rr - w_lr * w_lr, 1e-4 * w_ll * w_rr
                )
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
                zero = jnp.zeros_like(lamLn)
                newL = jnp.where(
                    okA, lamA_L,
                    jnp.where(okB, zero, jnp.where(okC, lamC_L, zero)),
                )
                newR = jnp.where(okA, lamA_R, jnp.where(okB, lamB_R, zero))
                newL = lamLn + (newL - lamLn) / pad_cntL
                newR = lamRn + (newR - lamRn) / pad_cntR
                dPL = newL - lamLn
                dPR = newR - lamRn
                V, W = apply_obj(V, W, _scale(pl_n, dPL), pl_act, pl_r, 1)
                qd = list(qd)
                for d, idx in ((0, 0), (1, 1), (2, 2), (3, 3), (4, 4)):
                    qd[idx] = qd[idx] + (
                        -(jacL_n[d] * dPL) * pl_act
                    ).sum((0, 1)) * inv_dof_mass[idx]
                V, W = apply_obj(V, W, _scale(pr_n, dPR), pr_act, pr_r, 1)
                for d, idx in ((0, 0), (1, 1), (2, 2), (3, 3), (4, 5)):
                    qd[idx] = qd[idx] + (
                        -(jacR_n[d] * dPR) * pr_act
                    ).sum((0, 1)) * inv_dof_mass[idx]
                V, W, qd, lamL = pad_friction(
                    V, W, qd, (newL, lamLt1, lamLt2), pl_act, pl_r,
                    pl_consts, 4, sp["pad_omega"],
                )
                V, W, qd, lamR = pad_friction(
                    V, W, qd, (newR, lamRt1, lamRt2), pr_act, pr_r,
                    pr_consts, 5, sp["pad_omega"],
                )
                return V, W, qd, lamL, lamR

            def pass_pad(V, W, qd, lam, n, pen_bias, act, r, consts, fdof,
                         om, bias_scale, warm_vals=None):
                (t1, t2, w_n, w_t1, w_t2, jac_n, jac_t1, jac_t2) = consts
                if warm_vals is None:
                    v = obj_slot_vel(V, W, r)

                    def vb(jac):
                        return (
                            jac[0] * qd[0][None, None, :]
                            + jac[1] * qd[1][None, None, :]
                            + jac[2] * qd[2][None, None, :]
                            + jac[3] * qd[3][None, None, :]
                            + jac[4] * qd[fdof][None, None, :]
                        )

                    lam, dP = project(
                        lam,
                        _dot(v, n) - vb(jac_n),
                        _dot(v, t1) - vb(jac_t1),
                        _dot(v, t2) - vb(jac_t2),
                        w_n, w_t1, w_t2, pen_bias, om, bias_scale,
                    )
                else:
                    lam, dP = warm_vals, warm_vals
                P = _add(
                    _add(_scale(n, dP[0]), _scale(t1, dP[1])),
                    _scale(t2, dP[2]),
                )
                V, W = apply_obj(V, W, P, act, r, 1)
                qd = list(qd)
                for d, idx in ((0, 0), (1, 1), (2, 2), (3, 3), (4, fdof)):
                    dq = -(
                        jac_n[d] * dP[0] + jac_t1[d] * dP[1] + jac_t2[d] * dP[2]
                    )
                    qd[idx] = qd[idx] + (dq * act).sum((0, 1)) * inv_dof_mass[idx]
                return V, W, qd, lam

            # Object-pair solve constants — the (NP,S,S,E) planes are the
            # kernel's largest shapes; their bases/effective masses are
            # substep-invariant and executed solver_iterations times.
            oo_t1, oo_t2 = _tangent_basis(oo_n)
            oo_w_n = oo_w(oo_n)
            if sp["oo_point_mass_tangent"]:
                # Point-mass friction masses (SimParams.oo_point_mass_tangent):
                # two of the three (NP,SC,SC,E) effective-mass planes collapse
                # to one broadcastable (NP,1,1,E) plane — this was the single
                # largest substep-rate cost in the kernel
                # (docs/KERNEL_BREAKDOWN.md objobj 57%).
                oo_w_t1 = oo_w_t2 = jnp.maximum(oo_invm_i + oo_invm_j, 1e-9)
            else:
                oo_w_t1 = oo_w(oo_t1)
                oo_w_t2 = oo_w(oo_t2)

            def pass_objobj(V, W, lam):
                t1, t2 = oo_t1, oo_t2
                w_n, w_t1, w_t2 = oo_w_n, oo_w_t1, oo_w_t2
                Vi = tuple(
                    jnp.stack([V[c][i] for i in ii])[:, None, None, :]
                    for c in range(3)
                )
                Wi = tuple(
                    jnp.stack([W[c][i] for i in ii])[:, None, None, :]
                    for c in range(3)
                )
                Vj = tuple(
                    jnp.stack([V[c][j] for j in jj])[:, None, None, :]
                    for c in range(3)
                )
                Wj = tuple(
                    jnp.stack([W[c][j] for j in jj])[:, None, None, :]
                    for c in range(3)
                )
                v = _sub(
                    _add(Vi, _cross(Wi, oo_ra)), _add(Vj, _cross(Wj, oo_rb))
                )
                lam, dP = project(
                    lam, _dot(v, oo_n), _dot(v, t1), _dot(v, t2),
                    w_n, w_t1, w_t2, oo_bias, omega, 1.0,
                )
                P = _add(
                    _add(_scale(oo_n, dP[0]), _scale(t1, dP[1])),
                    _scale(t2, dP[2]),
                )
                V, W = apply_pair(V, W, P, oo_act, oo_ra, oo_rb)
                return V, W, lam

            # ---------------------------------------------------- warm start
            gate = 1.0 - first

            def gated(lam, n_old, n_new, act):
                cont = jnp.clip(_dot(n_old, n_new), 0.0, 1.0) ** 2
                s = gate * sp["warm_start"] * act * cont
                return (lam[0] * s, lam[1] * s, lam[2] * s)

            # Statics normals are slot-constant (plane) or near-constant
            # (tray walls), so their warm start skips the stored-normal
            # continuity gate (saves 3 (NS,K,S,E) VMEM planes; physics.py
            # gates against the previous normal, identical for the plane).
            if not ({"warm", "statics"} & ablate):
                lam_w = tuple(
                    l * (gate * sp["warm_start"] * st_act) for l in lam_st
                )
                t1s, t2s = st_t1, st_t2
                Pw = _add(
                    _add(_scale(st_n, lam_w[0]), _scale(t1s, lam_w[1])),
                    _scale(t2s, lam_w[2]),
                )
                Pwm = _scale(Pw, st_act)
                dV = tuple((p * inv_m_flat[None]).sum((0, 2)) for p in Pwm)
                tq = _cross(st_r, Pwm)
                dW = tuple(
                    t.sum((0, 2))
                    for t in _iI_apply(tuple(p[None] for p in iI_k), tq)
                )
                V = _add(V, dV)
                W = _add(W, dW)
                lam_st = lam_w
            else:
                lam_st = tuple(jnp.zeros_like(l) for l in lam_st)

            if not ({"warm", "pads"} & ablate):
                lam_w = gated(lam_pl, no_pl, pl_n, pl_act)
                V, W, qd, lam_pl = pass_pad(
                    V, W, qd, lam_w, pl_n, pl_bias, pl_act, pl_r, pl_consts,
                    4, omega, 1.0, warm_vals=lam_w,
                )
                lam_w = gated(lam_pr, no_pr, pr_n, pr_act)
                V, W, qd, lam_pr = pass_pad(
                    V, W, qd, lam_w, pr_n, pr_bias, pr_act, pr_r, pr_consts,
                    5, omega, 1.0, warm_vals=lam_w,
                )
            else:
                lam_pl = tuple(jnp.zeros_like(l) for l in lam_pl)
                lam_pr = tuple(jnp.zeros_like(l) for l in lam_pr)

            if not ({"warm", "objobj"} & ablate):
                lam_w = gated(lam_oo, no_oo, oo_n, oo_act)
                t1o, t2o = oo_t1, oo_t2
                Pw = _add(
                    _add(_scale(oo_n, lam_w[0]), _scale(t1o, lam_w[1])),
                    _scale(t2o, lam_w[2]),
                )
                V, W = apply_pair(V, W, Pw, oo_act, oo_ra, oo_rb)
                lam_oo = lam_w
            else:
                lam_oo = tuple(jnp.zeros_like(l) for l in lam_oo)

            # ---------------------------------------------------- solve
            def solve_motor(qd, lam_m):
                qd = list(qd)
                lam_new = []
                for d in range(6):
                    ln = jnp.clip(
                        lam_m[d] + (v_des[d] - qd[d]) * dof_mass[d],
                        -motor_cap[d], motor_cap[d],
                    )
                    qd[d] = qd[d] + (ln - lam_m[d]) * inv_dof_mass[d]
                    lam_new.append(ln)
                return qd, lam_new

            lam_m = [jnp.zeros_like(q[0]) for _ in range(6)]

            def solver_iteration(c, do_oo=True):
                V, W, qd, lam_m, lam_st, lam_pl, lam_pr, lam_oo = c
                if not ({"statics", "statics_pass"} & ablate):
                    V, W, lam_st = pass_statics(V, W, lam_st)

                def pad_iter(pi, c2):
                    V, W, qd, lam_m, lam_pl, lam_pr = c2
                    qd, lam_m = solve_motor(qd, lam_m)
                    if not ({"pads", "pads_pass"} & ablate):
                        V, W, qd, lam_pl, lam_pr = pass_pads_coupled(
                            V, W, qd, lam_pl, lam_pr
                        )
                    return (V, W, qd, lam_m, lam_pl, lam_pr)

                V, W, qd, lam_m, lam_pl, lam_pr = jax.lax.fori_loop(
                    0, sp["pad_inner_iterations"], pad_iter,
                    (V, W, qd, lam_m, lam_pl, lam_pr),
                )
                if do_oo and not ({"objobj", "objobj_pass"} & ablate):
                    V, W, lam_oo = pass_objobj(V, W, lam_oo)
                return (V, W, qd, lam_m, lam_st, lam_pl, lam_pr, lam_oo)

            carry_it = (V, W, list(qd), lam_m, lam_st, lam_pl, lam_pr,
                        lam_oo)
            stride = sp["oo_pass_stride"]
            if stride > 1:
                # Strided object-object passes (SimParams.oo_pass_stride):
                # unroll the small static iteration count so the skip
                # compiles away (mirrors physics._solve_contacts).
                for it in range(sp["solver_iterations"]):
                    carry_it = solver_iteration(
                        carry_it, do_oo=(it % stride == 0)
                    )
            else:
                carry_it = jax.lax.fori_loop(
                    0, sp["solver_iterations"],
                    lambda it, c: solver_iteration(c), carry_it,
                )
            (V, W, qd, lam_m, lam_st, lam_pl, lam_pr, lam_oo) = carry_it

            # In-hand spin resistance (mirrors physics._solve_contacts;
            # SimParams.pinch_damping): damp toward the gripper yaw rate.
            if sp["pinch_damping"] > 0:
                pinched = _f(
                    (pl_act.sum(1) > 0.0) & (pr_act.sum(1) > 0.0)
                )  # (K,E)
                c = sp["pinch_damping"] * pinched
                W = (
                    W[0] - c * W[0],
                    W[1] - c * W[1],
                    W[2] - c * (W[2] - qd[3][None, :]),
                )

            # Rolling resistance at static contacts (mirrors
            # physics._solve_contacts; SimParams.rolling_damping).
            if sp["rolling_damping"] > 0:
                touch = _f(st_act.sum((0, 2)) > 0.0)  # (K,E)
                roll = 1.0 - sp["rolling_damping"] * touch
                W = tuple(w * roll for w in W)

            # ---------------------------------------------------- integrate
            V = tuple(jnp.clip(v, -4.0, 4.0) * alive for v in V)
            W = tuple(jnp.clip(w, -50.0, 50.0) * alive for w in W)
            pos = tuple(pos[c] + V[c] * dt for c in range(3))
            ox, oy, oz = W
            qxx, qyy, qzz, qww = quat
            dqx = qww * ox + (oy * qzz - oz * qyy)
            dqy = qww * oy + (oz * qxx - ox * qzz)
            dqz = qww * oz + (ox * qyy - oy * qxx)
            dqw = -(ox * qxx + oy * qyy + oz * qzz)
            nq = [
                qxx + 0.5 * dt * dqx, qyy + 0.5 * dt * dqy,
                qzz + 0.5 * dt * dqz, qww + 0.5 * dt * dqw,
            ]
            qn = jnp.maximum(
                jnp.sqrt(
                    nq[0] * nq[0] + nq[1] * nq[1]
                    + nq[2] * nq[2] + nq[3] * nq[3]
                ),
                1e-9,
            )
            quat = tuple(c / qn for c in nq)

            qd = list(qd)
            q = [q[d] + qd[d] * dt for d in range(6)]
            for d in (4, 5):
                fcl = jnp.clip(q[d], FINGER_LIMIT_LOW, FINGER_LIMIT_HIGH)
                qd[d] = jnp.where(fcl != q[d], 0.0, qd[d])
                q[d] = fcl
            hit = q[2] < floor_q2
            q[2] = jnp.maximum(q[2], floor_q2)
            qd[2] = jnp.where(hit, jnp.maximum(qd[2], 0.0), qd[2])

            return (tuple(q), tuple(qd), pos, quat, V, W,
                    lam_st, lam_pl, lam_pr, lam_oo,
                    pl_n, pr_n, oo_n, jnp.zeros_like(first))

        zst = tuple(jnp.zeros((NS, K, S, E), jnp.float32) for _ in range(3))
        zpd = tuple(jnp.zeros((K, S, E), jnp.float32) for _ in range(3))
        zoo = tuple(jnp.zeros((NP, SC, SC, E), jnp.float32) for _ in range(3))
        carry = (
            q0, qd0, pos0, quat0, V0, W0,
            zst, zpd, zpd, zoo, zpd, zpd, zoo,
            jnp.ones((), jnp.float32),
        )
        carry = jax.lax.fori_loop(
            0, n_substeps, lambda i, c: one_substep(c), carry
        )
        q, qd, pos, quat, V, W = carry[:6]
        for d in range(6):
            q_out[d, :] = q[d]
            qd_out[d, :] = qd[d]
        for c in range(3):
            pos_out[c] = pos[c]
            lin_out[c] = V[c]
            ang_out[c] = W[c]
        for c in range(4):
            quat_out[c] = quat[c]

    return kernel


# ------------------------------------------------------------------ wrapper


def _scalar_params(params: SimParams) -> dict:
    return dict(
        dt=float(params.dt),
        has_tray=bool(params.has_tray),
        support_z=float(params.support_z),
        tray_half=float(params.tray_half),
        tray_wall_height=float(params.tray_wall_height),
        friction=float(params.friction),
        baumgarte=float(params.baumgarte),
        slop=float(params.slop),
        relaxation=float(params.relaxation),
        gravity=float(params.gravity),
        lin_damping=float(params.lin_damping),
        ang_damping=float(params.ang_damping),
        max_bias_velocity=float(params.max_bias_velocity),
        warm_start=float(params.warm_start),
        pad_omega=float(params.pad_omega),
        pad_bias_scale=float(params.pad_bias_scale),
        pad_inner_iterations=int(params.pad_inner_iterations),
        solver_iterations=int(params.solver_iterations),
        dof_mass=tuple(np.asarray(params.dof_mass, np.float32).tolist()),
        dof_force=tuple(np.asarray(params.dof_force, np.float32).tolist()),
        dof_vmax=tuple(np.asarray(params.dof_vmax, np.float32).tolist()),
        oo_point_mass_tangent=bool(params.oo_point_mass_tangent),
        oo_pass_stride=int(params.oo_pass_stride),
        rolling_damping=float(params.rolling_damping),
        pinch_damping=float(params.pinch_damping),
    )


def run_batch(gq, gqd, gtarget, gftgt, opos, oquat, olin, oang, oalive,
              centers, radii, oo_centers, oo_radii, inv_mass, inv_inertia,
              params: SimParams, n_substeps: int, block_e: int = 128,
              interpret: bool = False, ablate: frozenset = frozenset()):
    """Run `n_substeps` fused solver substeps on a batch of envs.

    Inputs are env-first (B, ...); the wrapper transposes to the env-last
    lane layout, pads B up to a multiple of block_e, and grids over env
    blocks. Returns (q, qd, pos, quat, linvel, angvel), env-first.
    """
    B = gq.shape[0]
    K = opos.shape[1]
    S = radii.shape[2]
    SC = oo_radii.shape[2]
    Bp = max(((B + block_e - 1) // block_e) * block_e, block_e)

    def to_lanes(x):
        x = jnp.moveaxis(jnp.asarray(x, jnp.float32), 0, -1)
        pad = [(0, 0)] * (x.ndim - 1) + [(0, Bp - B)]
        return jnp.pad(x, pad)

    cm = lambda x: jnp.swapaxes(x, 1, 2)  # (B,K,C) -> (B,C,K)
    inputs = [
        to_lanes(gq), to_lanes(gqd), to_lanes(gtarget),
        to_lanes(gftgt[:, None]),
        # component-major object vectors: see the 2D-gather note in kernel
        to_lanes(cm(opos)), to_lanes(cm(oquat)), to_lanes(cm(olin)),
        to_lanes(cm(oang)),
        to_lanes(oalive.astype(jnp.float32)),
        to_lanes(jnp.transpose(centers, (0, 3, 1, 2))),
        to_lanes(radii),
        to_lanes(jnp.transpose(oo_centers, (0, 3, 1, 2))),
        to_lanes(oo_radii),
        to_lanes(inv_mass),
        to_lanes(cm(inv_inertia)),
    ]
    kernel = _make_kernel(
        _scalar_params(params), K, S, SC, n_substeps, ablate
    )

    def spec(shape):
        nd = len(shape)
        return pl.BlockSpec(
            shape,
            lambda i, nd=nd: (0,) * (nd - 1) + (i,),
            memory_space=pltpu.VMEM,
        )

    shapes = [
        (6, block_e), (6, block_e), (4, block_e), (1, block_e),
        (3, K, block_e), (4, K, block_e), (3, K, block_e), (3, K, block_e),
        (K, block_e),
        (3, K, S, block_e), (K, S, block_e),
        (3, K, SC, block_e), (K, SC, block_e),
        (K, block_e), (3, K, block_e),
    ]
    out_shapes = [
        (6, block_e), (6, block_e), (3, K, block_e), (4, K, block_e),
        (3, K, block_e), (3, K, block_e),
    ]
    outs = pl.pallas_call(
        kernel,
        grid=(Bp // block_e,),
        in_specs=[spec(s) for s in shapes],
        out_specs=tuple(spec(s) for s in out_shapes),
        out_shape=tuple(
            jax.ShapeDtypeStruct(s[:-1] + (Bp,), jnp.float32)
            for s in out_shapes
        ),
        # The object-pair planes put peak VMEM slightly above the default
        # 16M scoped limit for tray scenes; v5e has headroom above that.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*inputs)

    def from_lanes(x):
        return jnp.moveaxis(x[..., :B], -1, 0)

    q_o, qd_o, pos_o, quat_o, lin_o, ang_o = (from_lanes(o) for o in outs)
    # back to env-first (B,K,C) object vectors
    cm_back = lambda x: jnp.swapaxes(x, 1, 2)
    return (
        q_o, qd_o, cm_back(pos_o), cm_back(quat_o),
        cm_back(lin_o), cm_back(ang_o),
    )


def run_batched_sim(states: SimState, params: SimParams, n_substeps: int,
                    block_e: int = 128, interpret: bool = False,
                    ablate: frozenset = frozenset()) -> SimState:
    """Batched replacement for vmap(physics.run) over a leading env axis."""
    g = states.gripper
    o = states.objects
    q, qd, pos, quat, lin, ang = run_batch(
        g.q, g.qd, g.target, g.finger_target,
        o.pos, o.quat, o.linvel, o.angvel, o.alive,
        params.centers[o.obj_type], params.radii[o.obj_type],
        params.oo_centers[o.obj_type], params.oo_radii[o.obj_type],
        params.inv_mass[o.obj_type], params.inv_inertia[o.obj_type],
        params=params, n_substeps=n_substeps, block_e=block_e,
        interpret=interpret, ablate=ablate,
    )
    return SimState(
        gripper=g.replace(q=q, qd=qd),
        objects=o.replace(pos=pos, quat=quat, linvel=lin, angvel=ang),
    )
