"""Lane-major Pallas mega-kernel: one physics step per kernel call.

The XLA pipeline streams ~40 small (B, k) arrays through HBM between
hundreds of fusions; with the Newton solver already kernel-ized the
remaining ~1.8 ms/step at B=2048 is kinematics/dynamics/collision traffic.
This module generates a single kernel per model that advances a block of
128 samples entirely in VMEM:

  inputs : qpos (nq, B), qvel (nv, B), ctrl (nu, B)
  outputs: qpos', qvel', plus exactly the products the task reward stacks
           consume (site_xpos/site_xmat, body x/xd views, contact dist/pos)

All model constants (tree topology, joint frames, inertias, contact
parameters) are baked into the kernel as Python floats at trace time —
they are scalars per body/joint, so they become immediate operands of the
(B,)-lane vector ops instead of memory traffic.

Everything here mirrors the reference XLA modules (kinematics.py,
smooth.py, collision.py, constraint.py, solver.py) with the component
axes unrolled in Python and the sample axis on the vector lanes; the XLA
path remains the source of truth and the CPU interpret-mode tests assert
equality.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from dial_mpc_tpu.physics import solver_pallas
from dial_mpc_tpu.physics.model import (
    BOX,
    CAPSULE,
    DSBL_EULERDAMP,
    PLANE,
    SPHERE,
    Model,
)

BLOCK = 512
FREE, BALL, SLIDE, HINGE = 0, 1, 2, 3
_DEBUG_SINK = None

# ---------------------------------------------------------------------------
# lane algebra: vec3 = [x, y, z] of (B,) arrays; quat = [w, x, y, z]
# ---------------------------------------------------------------------------


def v3(x, y, z):
    return [x, y, z]


def vadd(a, b):
    return [a[i] + b[i] for i in range(len(a))]


def vsub(a, b):
    return [a[i] - b[i] for i in range(len(a))]


def vscale(a, s):
    return [a[i] * s for i in range(len(a))]


def vdot(a, b):
    s = a[0] * b[0]
    for i in range(1, len(a)):
        s = s + a[i] * b[i]
    return s


def vcross(a, b):
    return [
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    ]


def vnorm(a, eps=1e-15):
    return jnp.sqrt(jnp.maximum(vdot(a, a), eps))


def vnormalize(a, eps=1e-15):
    n = vnorm(a, eps)
    return [a[i] / n for i in range(len(a))], n


def quat_mul(u, v):
    return [
        u[0] * v[0] - u[1] * v[1] - u[2] * v[2] - u[3] * v[3],
        u[0] * v[1] + u[1] * v[0] + u[2] * v[3] - u[3] * v[2],
        u[0] * v[2] - u[1] * v[3] + u[2] * v[0] + u[3] * v[1],
        u[0] * v[3] + u[1] * v[2] - u[2] * v[1] + u[3] * v[0],
    ]


def quat_rot(v, q):
    """Rotate vec3 v by quat q (world = q * body)."""
    u = [q[1], q[2], q[3]]
    uv = vcross(u, v)
    uuv = vcross(u, uv)
    return [v[i] + 2.0 * (q[0] * uv[i] + uuv[i]) for i in range(3)]


def quat_normalize(q):
    n = jnp.sqrt(q[0] * q[0] + q[1] * q[1] + q[2] * q[2] + q[3] * q[3])
    return [q[i] / jnp.maximum(n, 1e-15) for i in range(4)]


def quat_to_mat(q):
    """3x3 rotation as list-of-lists of lanes."""
    w, x, y, z = q
    return [
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ]


def mat_col(R, j):
    return [R[0][j], R[1][j], R[2][j]]


def mat_vec(R, v):
    return [vdot(R[i], v) for i in range(3)]


def motion_cross(v, m):
    """Spatial [ang; lin] cross product; v, m are 6-lists of lanes."""
    va, vl = v[:3], v[3:]
    ma, ml = m[:3], m[3:]
    ang = vcross(va, ma)
    lin = vadd(vcross(va, ml), vcross(vl, ma))
    return ang + lin


def force_cross(v, f):
    va, vl = v[:3], v[3:]
    fa, fl_ = f[:3], f[3:]
    ang = vadd(vcross(va, fa), vcross(vl, fl_))
    lin = vcross(va, fl_)
    return ang + lin


def _const(mj_arr):
    """Static model constant -> python float(s) baked into the kernel."""
    return np.asarray(jax.device_get(mj_arr)).astype(np.float64)


# ---------------------------------------------------------------------------
# kernel generation
# ---------------------------------------------------------------------------


def _build_step_kernel(m: Model, block: int):
    """Generate the per-block step kernel for model m (constants baked)."""
    nq, nv, nu = m.nq, m.nv, m.nu
    nbody, njnt, nsite, ncon = m.nbody, m.njnt, m.nsite, m.ncon

    # ---- static host-side copies of all model constants ----
    body_pos = _const(m.body_pos)
    body_quat = _const(m.body_quat)
    body_ipos = _const(m.body_ipos)
    body_iquat = _const(m.body_iquat)
    body_mass = _const(m.body_mass)
    body_inertia = _const(m.body_inertia)
    body_invw = _const(m.body_invweight0)
    jnt_pos = _const(m.jnt_pos)
    jnt_axis = _const(m.jnt_axis)
    jnt_range = _const(m.jnt_range)
    jnt_solref = _const(m.jnt_solref)
    jnt_solimp = _const(m.jnt_solimp)
    jnt_margin = _const(m.jnt_margin)
    qpos0 = _const(m.qpos0)
    dof_armature = _const(m.dof_armature)
    dof_damping = _const(m.dof_damping)
    dof_invw = _const(m.dof_invweight0)
    dof_frictionloss = _const(m.dof_frictionloss)
    dof_solref = _const(m.dof_solref)
    dof_solimp = _const(m.dof_solimp)
    geom_pos = _const(m.geom_pos)
    geom_quat = _const(m.geom_quat)
    geom_size = _const(m.geom_size)
    site_pos = _const(m.site_pos)
    site_quat = _const(m.site_quat)
    site_bodyid = np.asarray(jax.device_get(m.site_bodyid))
    geom_bodyid = m.geom_bodyid_static
    act_gear = _const(m.actuator_gear)
    act_gain = _const(m.actuator_gainprm)
    act_bias = _const(m.actuator_biasprm)
    act_cr = _const(m.actuator_ctrlrange)
    act_crl = _const(m.actuator_ctrllimited)
    act_fr = _const(m.actuator_forcerange)
    act_frl = _const(m.actuator_forcelimited)
    act_dofadr = np.asarray(jax.device_get(m.actuator_dofadr))
    con_fri = _const(m.con_friction)
    con_solref = _const(m.con_solref)
    con_solimp = _const(m.con_solimp)
    con_inclm = _const(m.con_includemargin)
    con_dim = np.asarray(jax.device_get(m.con_dim))
    con_geom = np.asarray(jax.device_get(m.con_geom))
    gravity = _const(m.opt.gravity)
    timestep = float(_const(m.opt.timestep))
    impratio = float(_const(m.opt.impratio))
    anc_mask = _const(m.dof_ancestor_mask)
    chain_mask = _const(m.body_chain_mask)

    elliptic = m.opt.cone == 1
    eulerdamp = not (m.opt.disableflags & DSBL_EULERDAMP)

    # dof -> (joint, within-joint index) for qpos integration
    MJ_MINVAL = 1e-15

    def impedance(solimp, pos):
        d0, dmax, width, mid, power = solimp
        x = jnp.abs(pos) / max(width, MJ_MINVAL)
        ya = x**power / max(mid ** (power - 1.0), MJ_MINVAL)
        yb = 1.0 - (1.0 - x) ** power / max((1.0 - mid) ** (power - 1.0), MJ_MINVAL)
        y = jnp.where(x < mid, ya, yb)
        imp = jnp.clip(d0 + y * (dmax - d0), 1e-4, 0.9999)
        return jnp.where(x > 1.0, dmax, imp)

    def kbi(solref, solimp, pos, vel):
        imp = impedance(solimp, pos)
        dmax = solimp[1]
        timeconst = max(solref[0], 2.0 * timestep)
        dampratio = solref[1]
        b = 2.0 / max(dmax * timeconst, MJ_MINVAL)
        k = 1.0 / max(
            dmax * dmax * timeconst * timeconst * dampratio * dampratio, MJ_MINVAL
        )
        if solref[0] <= 0:
            k = -solref[0] / max(dmax * dmax, MJ_MINVAL)
        if solref[1] <= 0:
            b = -solref[1] / max(dmax, MJ_MINVAL)
        aref = -b * vel - k * imp * pos
        return imp, aref

    def make_frame(n):
        """mju_makeFrame rows [n; t1; t2] (collision.py:make_frame)."""
        ref_y = jnp.abs(n[1]) < 0.5
        ref = [jnp.zeros_like(n[0]), jnp.where(ref_y, 1.0, 0.0), jnp.where(ref_y, 0.0, 1.0)]
        t2, _ = vnormalize(vcross(n, ref))
        t1 = vcross(t2, n)
        return [n, t1, t2]

    def axis_frame(n, axis):
        """Plane-capsule frame with t1 = projected capsule axis."""
        t1r = vsub(axis, vscale(n, vdot(axis, n)))
        t1, norm = vnormalize(t1r)
        t2 = vcross(n, t1)
        fallback = make_frame(n)
        ok = norm > 1e-10
        return [
            [jnp.where(ok, a, b) for a, b in zip(row, frow)]
            for row, frow in zip([n, t1, t2], fallback)
        ]

    def step_lanes(qp, qv, ct, want_outs=True):
        """One physics step on lane lists; returns (qp', qv', outs dict).

        want_outs=False skips building the output-only products (sites,
        maximal-coordinate views) — used by intermediate substeps of the
        fused n_frames kernel, whose carry is only (qpos, qvel)."""
        zero = jnp.zeros_like(qp[0])
        one = jnp.ones_like(qp[0])

        def cv(x):  # bake a python constant as an immediate
            return x * one if not isinstance(x, (int, float)) else float(x)

        # ---- kinematics (kinematics.py:22-111) ----
        xpos = [[zero, zero, zero]]
        xquat = [[one, zero, zero, zero]]
        xanchor = [None] * njnt
        xaxis = [None] * njnt
        for b in range(1, nbody):
            p = m.body_parentid[b]
            pos = vadd(xpos[p], quat_rot(list(body_pos[b]), xquat[p]))
            quat = quat_mul(xquat[p], list(body_quat[b]))
            jadr, jnum = m.body_jntadr[b], m.body_jntnum[b]
            for k in range(jnum):
                j = jadr + k
                jt = m.jnt_type[j]
                qadr = m.jnt_qposadr[j]
                if jt == FREE:
                    pos = [qp[qadr], qp[qadr + 1], qp[qadr + 2]]
                    quat = quat_normalize(
                        [qp[qadr + 3], qp[qadr + 4], qp[qadr + 5], qp[qadr + 6]]
                    )
                    xanchor[j] = pos
                    xaxis[j] = [cv(a) for a in jnt_axis[j]]
                elif jt == SLIDE:
                    axis = quat_rot(list(jnt_axis[j]), quat)
                    xanchor[j] = vadd(pos, quat_rot(list(jnt_pos[j]), quat))
                    xaxis[j] = axis
                    pos = vadd(pos, vscale(axis, qp[qadr] - qpos0[qadr]))
                elif jt == HINGE:
                    anchor = vadd(pos, quat_rot(list(jnt_pos[j]), quat))
                    angle = qp[qadr] - qpos0[qadr]
                    s, c = jnp.sin(angle * 0.5), jnp.cos(angle * 0.5)
                    qloc = [c, jnt_axis[j][0] * s, jnt_axis[j][1] * s, jnt_axis[j][2] * s]
                    quat = quat_mul(quat, qloc)
                    pos = vsub(anchor, quat_rot(list(jnt_pos[j]), quat))
                    xanchor[j] = anchor
                    xaxis[j] = quat_rot(list(jnt_axis[j]), quat)
                else:
                    raise NotImplementedError("ball joints")
            xpos.append(pos)
            xquat.append(quat_normalize(quat))

        xmat = [quat_to_mat(q) for q in xquat]
        xipos = [
            vadd(xpos[b], quat_rot(list(body_ipos[b]), xquat[b]))
            for b in range(nbody)
        ]
        ximat = [quat_to_mat(quat_mul(xquat[b], list(body_iquat[b]))) for b in range(nbody)]

        # geom / site frames (collidable geoms + all sites)
        geom_x = {}
        geom_R = {}
        for (g1, g2, t1, t2, condim, conadr, conmax) in m.pair_table:
            for g in (g1, g2):
                if g in geom_x:
                    continue
                b = geom_bodyid[g]
                geom_x[g] = vadd(xpos[b], quat_rot(list(geom_pos[g]), xquat[b]))
                geom_R[g] = quat_to_mat(quat_mul(xquat[b], list(geom_quat[g])))
        site_x = []
        site_R = []
        if want_outs:
            for s in range(nsite):
                b = int(site_bodyid[s])
                site_x.append(vadd(xpos[b], quat_rot(list(site_pos[s]), xquat[b])))
                site_R.append(quat_to_mat(quat_mul(xquat[b], list(site_quat[s]))))

        # ---- com quantities (kinematics.py:120-173) ----
        wsum = [vscale(xipos[b], float(body_mass[b])) for b in range(nbody)]
        msum = [float(body_mass[b]) for b in range(nbody)]
        wsum_acc = [list(w) for w in wsum]
        msum_acc = list(msum)
        for b in range(nbody - 1, 0, -1):
            p = m.body_parentid[b]
            wsum_acc[p] = vadd(wsum_acc[p], wsum_acc[b])
            msum_acc[p] = msum_acc[p] + msum_acc[b]
        subtree_com = [
            vscale(wsum_acc[b], 1.0 / max(msum_acc[b], 1e-15)) for b in range(nbody)
        ]

        # spatial inertia of each body about its tree root's subtree com
        def spatial_inertia(mass, Iw, c):
            # returns 6x6 list-of-lists: [[I + m c^ c^T, m c^],[m c^T, m 1]]
            cx = [
                [zero, -c[2], c[1]],
                [c[2], zero, -c[0]],
                [-c[1], c[0], zero],
            ]
            mcx = [[mass * cx[i][j] for j in range(3)] for i in range(3)]
            # I + m cx cx^T
            tl = [
                [
                    Iw[i][j]
                    + mass * (cx[i][0] * cx[j][0] + cx[i][1] * cx[j][1] + cx[i][2] * cx[j][2])
                    for j in range(3)
                ]
                for i in range(3)
            ]
            M6 = [[None] * 6 for _ in range(6)]
            for i in range(3):
                for j in range(3):
                    M6[i][j] = tl[i][j]
                    M6[i][3 + j] = mcx[i][j]
                    M6[3 + i][j] = mcx[j][i]
                    M6[3 + i][3 + j] = mass * (1.0 if i == j else 0.0) * one
            return M6

        cinert = []
        for b in range(nbody):
            root = m.body_rootid[b]
            offset = vsub(xipos[b], subtree_com[root])
            # world-aligned rotational inertia: R diag(I) R^T
            R = ximat[b]
            I3 = body_inertia[b]
            Iw = [
                [
                    R[i][0] * I3[0] * R[j][0]
                    + R[i][1] * I3[1] * R[j][1]
                    + R[i][2] * I3[2] * R[j][2]
                    for j in range(3)
                ]
                for i in range(3)
            ]
            cinert.append(spatial_inertia(float(body_mass[b]), Iw, offset))

        cdof = [None] * nv
        for j in range(njnt):
            jt = m.jnt_type[j]
            b = m.jnt_bodyid[j]
            da = m.jnt_dofadr[j]
            o = subtree_com[m.body_rootid[b]]
            if jt == FREE:
                for i in range(3):
                    e = [zero, zero, zero]
                    e[i] = one
                    cdof[da + i] = [zero, zero, zero] + e
                for i in range(3):
                    ax = mat_col(xmat[b], i)
                    lin = vcross(ax, vsub(o, xpos[b]))
                    cdof[da + 3 + i] = ax + lin
            elif jt == SLIDE:
                cdof[da] = [zero, zero, zero] + xaxis[j]
            elif jt == HINGE:
                ax = xaxis[j]
                lin = vcross(ax, vsub(o, xanchor[j]))
                cdof[da] = ax + lin

        # ---- crb mass matrix (smooth.py:19-37) ----
        crb_acc = [[[cinert[b][i][j] for j in range(6)] for i in range(6)] for b in range(nbody)]
        for b in range(nbody - 1, 0, -1):
            p = m.body_parentid[b]
            if p > 0:
                for i in range(6):
                    for j in range(6):
                        crb_acc[p][i][j] = crb_acc[p][i][j] + crb_acc[b][i][j]

        def m6v(M6, v):
            return [vdot(M6[i], v) for i in range(6)]

        F = [m6v(crb_acc[m.dof_bodyid[i]], cdof[i]) for i in range(nv)]
        # M is symmetric: compute j <= i once and alias the mirror.
        # M_mask is the static tree sparsity (dofs couple only along
        # ancestor chains); the Cholesky solves below and the Newton solve
        # skip masked-out entries entirely, and eliminating children-first
        # (reverse dof order) factorizes the tree pattern with no fill-in.
        M_mask = [
            [bool(anc_mask[i][j] or anc_mask[j][i]) or i == j for j in range(nv)]
            for i in range(nv)
        ]
        M_perm = list(range(nv))[::-1]
        Mrows = [[None] * nv for _ in range(nv)]
        for i in range(nv):
            for j in range(i + 1):
                if M_mask[i][j]:
                    # CRB: M[i][j] = cdof[j]^T (crb[body(i)] cdof[i]), j <= i
                    val = vdot(F[i], cdof[j])
                    Mrows[i][j] = val
                    Mrows[j][i] = val
                else:
                    Mrows[i][j] = zero
                    Mrows[j][i] = zero
            Mrows[i][i] = Mrows[i][i] + float(dof_armature[i])

        # ---- com_vel (kinematics.py:176-209) ----
        cvel = [[zero] * 6]
        cdof_dot = [None] * nv
        for b in range(1, nbody):
            p = m.body_parentid[b]
            v6 = list(cvel[p])
            jadr, jnum = m.body_jntadr[b], m.body_jntnum[b]
            for k in range(jnum):
                j = jadr + k
                jt = m.jnt_type[j]
                da = m.jnt_dofadr[j]
                if jt == FREE:
                    for i in range(3):
                        cdof_dot[da + i] = [zero] * 6
                    for i in range(3):
                        v6 = [v6[x] + cdof[da + i][x] * qv[da + i] for x in range(6)]
                        # note: translation dofs accumulate before rotation
                    for i in range(3):
                        cdof_dot[da + 3 + i] = motion_cross(v6, cdof[da + 3 + i])
                    for i in range(3):
                        v6 = [v6[x] + cdof[da + 3 + i][x] * qv[da + 3 + i] for x in range(6)]
                else:
                    cdof_dot[da] = motion_cross(v6, cdof[da])
                    v6 = [v6[x] + cdof[da][x] * qv[da] for x in range(6)]
            cvel.append(v6)

        # ---- rne bias (smooth.py:46-78) ----
        cacc = [[zero, zero, zero, -float(gravity[0]) * one, -float(gravity[1]) * one, -float(gravity[2]) * one]]
        for b in range(1, nbody):
            p = m.body_parentid[b]
            da, dn = m.body_dofadr[b], m.body_dofnum[b]
            acc = list(cacc[p])
            for i in range(dn):
                cd = cdof_dot[da + i]
                acc = [acc[x] + cd[x] * qv[da + i] for x in range(6)]
            cacc.append(acc)
        cfrc = [None] * nbody
        for b in range(1, nbody):
            I6 = cinert[b]
            h6 = m6v(I6, cvel[b])
            f6 = m6v(I6, cacc[b])
            fc = force_cross(cvel[b], h6)
            cfrc[b] = [f6[x] + fc[x] for x in range(6)]
        for b in range(nbody - 1, 1, -1):
            p = m.body_parentid[b]
            if p > 0:
                cfrc[p] = [cfrc[p][x] + cfrc[b][x] for x in range(6)]
        qfrc_bias = [vdot(cdof[i], cfrc[m.dof_bodyid[i]]) for i in range(nv)]

        # ---- passive + actuation (smooth.py:81-131) ----
        qfrc_passive = [-float(dof_damping[i]) * qv[i] for i in range(nv)]
        qfrc_act = [zero] * nv
        for u in range(nu):
            c = ct[u]
            if act_crl[u] > 0:
                c = jnp.clip(c, act_cr[u][0], act_cr[u][1])
            gain = float(act_gain[u][0])
            force = gain * c
            if m.actuator_biastype[u] == 1:
                qadr = m.jnt_qposadr[m.actuator_trnid[u]]
                length = qp[qadr] * float(act_gear[u])
                vel = qv[int(act_dofadr[u])] * float(act_gear[u])
                force = force + (
                    float(act_bias[u][0])
                    + float(act_bias[u][1]) * length
                    + float(act_bias[u][2]) * vel
                )
            if act_frl[u] > 0:
                force = jnp.clip(force, act_fr[u][0], act_fr[u][1])
            i = int(act_dofadr[u])
            qfrc_act[i] = qfrc_act[i] + force * float(act_gear[u])

        qfrc_smooth = [
            qfrc_passive[i] + qfrc_act[i] - qfrc_bias[i] for i in range(nv)
        ]
        qacc_smooth = solver_pallas._chol_solve_lanes(
            Mrows, qfrc_smooth, nv, mask=M_mask, perm=M_perm
        )
        if _DEBUG_SINK is not None:
            _DEBUG_SINK.update(
                qfrc_bias=qfrc_bias, qfrc_act=qfrc_act,
                qfrc_passive=qfrc_passive, qacc_smooth=qacc_smooth,
                Mrows=Mrows, cvel=cvel, cdof=cdof,
            )

        # ---- collision (collision.py) ----
        con_dist = [None] * ncon
        con_pos = [None] * ncon
        con_frame = [None] * ncon

        def plane_sphere(pp, pn, c, r):
            dist = vdot(pn, vsub(c, pp)) - r
            pos = vsub(c, vscale(pn, r + 0.5 * dist))
            return dist, pos

        def sphere_sphere(c1, r1, c2, r2):
            dvec = vsub(c2, c1)
            dc = vnorm(dvec)
            n = vscale(dvec, 1.0 / dc)
            dist = dc - (r1 + r2)
            pos = vadd(c1, vscale(n, r1 + 0.5 * dist))
            return dist, pos, n

        def closest_on_seg(p, c, axis, hl):
            t = jnp.clip(vdot(vsub(p, c), axis), -hl, hl)
            return vadd(c, vscale(axis, t))

        def closest_pt_on_box(pl, size):
            cl = [jnp.clip(pl[i], -size[i], size[i]) for i in range(3)]
            inside = (
                (jnp.abs(pl[0]) < size[0])
                & (jnp.abs(pl[1]) < size[1])
                & (jnp.abs(pl[2]) < size[2])
            )
            gaps = [size[i] - jnp.abs(pl[i]) for i in range(3)]
            gmin01 = jnp.minimum(gaps[0], gaps[1])
            ax_is0 = (gaps[0] <= gaps[1]) & (gaps[0] <= gaps[2])
            ax_is1 = (~ax_is0) & (gaps[1] <= gaps[2])
            ax_is2 = (~ax_is0) & (~ax_is1)
            face = []
            for i, axm in enumerate([ax_is0, ax_is1, ax_is2]):
                sgn = jnp.sign(pl[i])
                sgn = jnp.where(sgn == 0, 1.0, sgn)
                face.append(jnp.where(axm, sgn * size[i], pl[i]))
            return [jnp.where(inside, face[i], cl[i]) for i in range(3)], inside

        def sphere_box(c1, r1, bc, bR, size):
            rel = vsub(c1, bc)
            pl = [vdot(mat_col(bR, i), rel) for i in range(3)]
            cpl, inside = closest_pt_on_box(pl, size)
            cp = vadd(bc, mat_vec(bR, cpl))  # bR @ cpl (world)
            dvec = vsub(cp, c1)
            dc = vnorm(dvec)
            n_out = vscale(dvec, 1.0 / dc)
            n = [jnp.where(inside, -n_out[i], n_out[i]) for i in range(3)]
            dist = jnp.where(inside, -(dc + r1), dc - r1)
            pos = vadd(c1, vscale(n, r1 + 0.5 * dist))
            return dist, pos, n

        for (g1, g2, t1, t2, condim, conadr, conmax) in m.pair_table:
            p1, p2 = geom_x[g1], geom_x[g2]
            R1, R2 = geom_R[g1], geom_R[g2]
            s1, s2 = geom_size[g1], geom_size[g2]
            key = (t1, t2)
            if key == (PLANE, SPHERE):
                pn = mat_col(R1, 2)
                dist, pos = plane_sphere(p1, pn, p2, s2[0])
                con_dist[conadr] = dist
                con_pos[conadr] = pos
                con_frame[conadr] = make_frame(pn)
            elif key == (PLANE, CAPSULE):
                pn = mat_col(R1, 2)
                axis = mat_col(R2, 2)
                fr = axis_frame(pn, axis)
                for e, sgn in enumerate((1.0, -1.0)):
                    ep = vadd(p2, vscale(axis, sgn * s2[1]))
                    dist, pos = plane_sphere(p1, pn, ep, s2[0])
                    con_dist[conadr + e] = dist
                    con_pos[conadr + e] = pos
                    con_frame[conadr + e] = fr
            elif key == (PLANE, BOX):
                pn = mat_col(R1, 2)
                corners = []
                for sx in (-1, 1):
                    for sy in (-1, 1):
                        for sz in (-1, 1):
                            local = [sx * s2[0], sy * s2[1], sz * s2[2]]
                            corners.append(vadd(p2, mat_vec(R2, [cv(local[0]), cv(local[1]), cv(local[2])])))
                dists = [vdot(c, pn) - vdot(pn, p1) for c in corners]
                # 4 deepest of 8: partial selection network
                idx = list(range(8))
                # compute sorted order via repeated min extraction on lanes:
                picked = []
                remaining_d = list(dists)
                remaining_c = [list(c) for c in corners]
                for _ in range(4):
                    dmin = remaining_d[0]
                    cmin = remaining_c[0]
                    for t in range(1, len(remaining_d)):
                        better = remaining_d[t] < dmin
                        new_c = [jnp.where(better, remaining_c[t][x], cmin[x]) for x in range(3)]
                        # swap the running min into slot t (selection pass)
                        remaining_c[t] = [
                            jnp.where(better, cmin[x], remaining_c[t][x]) for x in range(3)
                        ]
                        new_d = jnp.minimum(remaining_d[t], dmin)
                        remaining_d[t] = jnp.where(better, dmin, remaining_d[t])
                        dmin, cmin = new_d, new_c
                    remaining_d = remaining_d[1:]
                    remaining_c = remaining_c[1:]
                    picked.append((dmin, cmin))
                fr = make_frame(pn)
                for e, (dist, cpt) in enumerate(picked):
                    pos = vsub(cpt, vscale(pn, 0.5 * dist))
                    con_dist[conadr + e] = dist
                    con_pos[conadr + e] = pos
                    con_frame[conadr + e] = fr
            elif key == (SPHERE, SPHERE):
                dist, pos, n = sphere_sphere(p1, s1[0], p2, s2[0])
                con_dist[conadr] = dist
                con_pos[conadr] = pos
                con_frame[conadr] = make_frame(n)
            elif key == (SPHERE, CAPSULE):
                axis = mat_col(R2, 2)
                cp = closest_on_seg(p1, p2, axis, s2[1])
                dist, pos, n = sphere_sphere(p1, s1[0], cp, s2[0])
                con_dist[conadr] = dist
                con_pos[conadr] = pos
                con_frame[conadr] = make_frame(n)
            elif key == (SPHERE, BOX):
                dist, pos, n = sphere_box(p1, s1[0], p2, R2, s2)
                con_dist[conadr] = dist
                con_pos[conadr] = pos
                con_frame[conadr] = make_frame(n)
            elif key == (CAPSULE, CAPSULE):
                a1, a2 = mat_col(R1, 2), mat_col(R2, 2)
                r = vsub(p1, p2)
                Bd = vdot(a1, a2)
                Dd = vdot(a1, r)
                E = vdot(a2, r)
                denom = 1.0 - Bd * Bd
                s = jnp.where(denom > 1e-12, (Bd * E - Dd) / jnp.maximum(denom, 1e-12), 0.0)
                s = jnp.clip(s, -s1[1], s1[1])
                t = jnp.clip(Bd * s + E, -s2[1], s2[1])
                s = jnp.clip(Bd * t - Dd, -s1[1], s1[1])
                q1 = vadd(p1, vscale(a1, s))
                q2 = vadd(p2, vscale(a2, t))
                dist, pos, n = sphere_sphere(q1, s1[0], q2, s2[0])
                con_dist[conadr] = dist
                con_pos[conadr] = pos
                con_frame[conadr] = make_frame(n)
            elif key == (CAPSULE, BOX):
                axis = mat_col(R1, 2)
                for e, sgn in enumerate((1.0, -1.0)):
                    ep = vadd(p1, vscale(axis, sgn * s1[1]))
                    dist, pos, n = sphere_box(ep, s1[0], p2, R2, s2)
                    con_dist[conadr + e] = dist
                    con_pos[conadr + e] = pos
                    con_frame[conadr + e] = make_frame(n)
            elif key == (BOX, BOX):
                # corner-vs-box both ways, deepest 8 of 16
                cands = []
                for (ca, Ra, sa, cb, Rb, sb, flip) in (
                    (p1, R1, s1, p2, R2, s2, False),
                    (p2, R2, s2, p1, R1, s1, True),
                ):
                    for sx in (-1, 1):
                        for sy in (-1, 1):
                            for sz in (-1, 1):
                                corner = vadd(
                                    ca,
                                    mat_vec(Ra, [cv(sx * sa[0]), cv(sy * sa[1]), cv(sz * sa[2])]),
                                )
                                dist, pos, n = sphere_box(corner, 0.0, cb, Rb, sb)
                                if flip:
                                    n = [-x for x in n]
                                cands.append((dist, pos, n))
                # select 8 deepest by repeated min extraction
                rem = [[c[0], list(c[1]), list(c[2])] for c in cands]
                for e in range(8):
                    dmin, pmin, nmin = rem[0][0], rem[0][1], rem[0][2]
                    for t in range(1, len(rem)):
                        better = rem[t][0] < dmin
                        new_p = [jnp.where(better, rem[t][1][x], pmin[x]) for x in range(3)]
                        new_n = [jnp.where(better, rem[t][2][x], nmin[x]) for x in range(3)]
                        rem[t][1] = [jnp.where(better, pmin[x], rem[t][1][x]) for x in range(3)]
                        rem[t][2] = [jnp.where(better, nmin[x], rem[t][2][x]) for x in range(3)]
                        new_d = jnp.minimum(rem[t][0], dmin)
                        rem[t][0] = jnp.where(better, dmin, rem[t][0])
                        dmin, pmin, nmin = new_d, new_p, new_n
                    rem = rem[1:]
                    con_dist[conadr + e] = dmin
                    con_pos[conadr + e] = pmin
                    con_frame[conadr + e] = make_frame(nmin)
            else:
                raise NotImplementedError(f"collider {key}")

        # ---- constraint rows (constraint.py) ----
        # rows_J entries are (B,) lanes or the static-zero marker 0.0 —
        # the sparse Newton solve skips marked entries at trace time
        rows_J = []
        rows_D = []
        rows_aref = []
        rows_fl = []
        rows_eta = []

        for i in range(nv):
            if m.dof_frictionloss_static[i] <= 0:
                continue
            J = [0.0] * nv
            J[i] = one
            imp, aref = kbi(dof_solref[i], dof_solimp[i], zero, qv[i])
            R = jnp.maximum((1.0 - imp) / imp * dof_invw[i], MJ_MINVAL)
            rows_J.append(J)
            rows_D.append(1.0 / R)
            rows_aref.append(aref)
            rows_fl.append(float(dof_frictionloss[i]) * one)
            rows_eta.append(zero)

        from dial_mpc_tpu.physics.model import DSBL_LIMIT

        if not (m.opt.disableflags & DSBL_LIMIT):
            for j in range(njnt):
                if not m.jnt_limited[j] or m.jnt_type[j] not in (SLIDE, HINGE):
                    continue
                qadr, dadr = m.jnt_qposadr[j], m.jnt_dofadr[j]
                q = qp[qadr]
                lo, hi = jnt_range[j][0], jnt_range[j][1]
                dist_lo = q - lo
                dist_hi = hi - q
                use_lo = dist_lo < dist_hi
                dist = jnp.where(use_lo, dist_lo, dist_hi)
                sign = jnp.where(use_lo, 1.0, -1.0)
                pos = dist - jnt_margin[j]
                active = (dist < jnt_margin[j]).astype(qp[0].dtype)
                J = [0.0] * nv
                J[dadr] = sign * active
                vel = sign * qv[dadr]
                imp, aref = kbi(jnt_solref[j], jnt_solimp[j], pos, vel)
                R = jnp.maximum((1.0 - imp) / imp * dof_invw[dadr], MJ_MINVAL)
                rows_J.append(J)
                rows_D.append(active / R)
                rows_aref.append(aref * active)
                rows_fl.append(zero)
                rows_eta.append(zero)

        groups = []
        slot_meta = []
        for (g1, g2, t1, t2, condim, conadr, conmax) in m.pair_table:
            for k in range(conmax):
                slot_meta.append((conadr + k, g1, g2, condim))
        for (slot, g1, g2, condim) in slot_meta:
            b1 = geom_bodyid[g1]
            b2 = geom_bodyid[g2]
            point = con_pos[slot]
            frame = con_frame[slot]
            pos = con_dist[slot] - con_inclm[slot]
            active = (con_dist[slot] < con_inclm[slot]).astype(qp[0].dtype)

            def pj(body):
                root = m.body_rootid[body]
                off = vsub(point, subtree_com[root])
                jacp = []
                jacr = []
                for i in range(nv):
                    if chain_mask[body][i]:
                        ang = cdof[i][:3]
                        lin = cdof[i][3:]
                        jacp.append(vadd(lin, vcross(ang, off)))
                        jacr.append(ang)
                    else:
                        jacp.append(None)
                        jacr.append(None)
                return jacp, jacr

            jacp1, jacr1 = pj(b1)
            jacp2, jacr2 = pj(b2)

            def drow(jac1, jac2, direction):
                # statically-zero columns (dofs outside both bodies'
                # chains) are the python marker 0.0 — the sparse solver
                # skips them at trace time
                row = []
                for i in range(nv):
                    a = jac2[i]
                    bq = jac1[i]
                    if a is None and bq is None:
                        row.append(0.0)
                    elif bq is None:
                        row.append(vdot(a, direction))
                    elif a is None:
                        row.append(-vdot(bq, direction))
                    else:
                        row.append(vdot(vsub(a, bq), direction))
                return row

            Jn = drow(jacp1, jacp2, frame[0])
            imp, _ = kbi(con_solref[slot], con_solimp[slot], pos, zero)
            invw_t = body_invw[b1][0] + body_invw[b2][0]
            invw_r = body_invw[b1][1] + body_invw[b2][1]

            def jrow_vel(row):
                s = None
                for i in range(nv):
                    if isinstance(row[i], float):
                        continue
                    t = row[i] * qv[i]
                    s = t if s is None else s + t
                return zero if s is None else s

            def jmask(row):
                return [
                    0.0 if isinstance(row[i], float) else row[i] * active
                    for i in range(nv)
                ]

            if condim == 1:
                vel = jrow_vel(Jn)
                _, aref = kbi(con_solref[slot], con_solimp[slot], pos, vel)
                R = jnp.maximum((1.0 - imp) / imp * invw_t, MJ_MINVAL)
                rows_J.append(jmask(Jn))
                rows_D.append(active / R)
                rows_aref.append(aref * active)
                rows_fl.append(zero)
                rows_eta.append(zero)
            elif elliptic:
                fri = con_fri[slot]
                mu = float(fri[0])
                etas = [float(x) for x in fri[: condim - 1]]
                Rn = jnp.maximum((1.0 - imp) / imp * invw_t, MJ_MINVAL)
                vel_n = jrow_vel(Jn)
                _, aref_n = kbi(con_solref[slot], con_solimp[slot], pos, vel_n)
                groups.append((len(rows_J), condim))
                rows_J.append(jmask(Jn))
                rows_D.append(active / Rn)
                rows_aref.append(aref_n * active)
                rows_fl.append(zero)
                rows_eta.append(zero)
                fric_rows = [drow(jacp1, jacp2, frame[1]), drow(jacp1, jacp2, frame[2])]
                if condim > 3:
                    fric_rows.append(drow(jacr1, jacr2, frame[0]))
                if condim > 4:
                    fric_rows += [drow(jacr1, jacr2, frame[1]), drow(jacr1, jacr2, frame[2])]
                for eta_i, Jf in zip(etas, fric_rows):
                    Ri = Rn * mu * mu / max(eta_i * eta_i * impratio, MJ_MINVAL)
                    vel = jrow_vel(Jf)
                    _, aref_f = kbi(con_solref[slot], con_solimp[slot], zero, vel)
                    rows_J.append(jmask(Jf))
                    rows_D.append(active / Ri)
                    rows_aref.append(aref_f * active)
                    rows_fl.append(zero)
                    rows_eta.append(eta_i * one)
            else:
                fri = con_fri[slot]
                tdirs = [drow(jacp1, jacp2, frame[1]), drow(jacp1, jacp2, frame[2])]
                if condim == 6:
                    tdirs += [
                        drow(jacr1, jacr2, frame[0]),
                        drow(jacr1, jacr2, frame[1]),
                        drow(jacr1, jacr2, frame[2]),
                    ]
                    invw_ax = [invw_t, invw_t, invw_r, invw_r, invw_r]
                else:
                    invw_ax = [invw_t, invw_t]
                for kdir, Jt in enumerate(tdirs):
                    mu = float(con_fri[slot][kdir])
                    invw_fac = invw_t + mu * mu * invw_ax[kdir]
                    R = jnp.maximum(
                        (1.0 - imp) / imp * invw_fac * 2.0 * mu * mu, MJ_MINVAL
                    )
                    for sgn in (1.0, -1.0):
                        Jrow = [
                            0.0
                            if isinstance(Jn[i], float) and isinstance(Jt[i], float)
                            else Jn[i] + sgn * mu * Jt[i]
                            for i in range(nv)
                        ]
                        vel = jrow_vel(Jrow)
                        _, aref = kbi(con_solref[slot], con_solimp[slot], pos, vel)
                        rows_J.append(jmask(Jrow))
                        rows_D.append(active / R)
                        rows_aref.append(aref * active)
                        rows_fl.append(zero)
                        rows_eta.append(zero)

        nefc = len(rows_J)

        # ---- Newton solve (shared in-kernel routine, static sparsity) ----
        if nefc:
            Dv = jnp.stack(rows_D, axis=0)
            arefv = jnp.stack(rows_aref, axis=0)
            flv = jnp.stack(rows_fl, axis=0)
            etav = jnp.stack(rows_eta, axis=0)
            qacc, qfrc_con = solver_pallas.newton_solve_rows(
                rows_J, Dv, arefv, flv, etav, Mrows, M_mask, qacc_smooth,
                nv=nv,
                iterations=m.opt.iterations,
                ls_iterations=m.opt.ls_iterations,
                tolerance=float(m.opt.tolerance),
                groups=tuple(groups),
                impratio=impratio,
            )
        else:
            qacc = qacc_smooth
            qfrc_con = [zero] * nv

        # ---- integrate (forward.py:43-88) ----
        h = timestep
        if eulerdamp:
            MhB = [
                [
                    Mrows[i][j] + (h * float(dof_damping[i]) if i == j else 0.0)
                    for j in range(nv)
                ]
                for i in range(nv)
            ]
            qfrc_tot = [
                qfrc_smooth[i] + qfrc_con[i] for i in range(nv)
            ]
            qacc_int = solver_pallas._chol_solve_lanes(
                MhB, qfrc_tot, nv, mask=M_mask, perm=M_perm
            )
        else:
            qacc_int = qacc

        qv_new = [qv[i] + h * qacc_int[i] for i in range(nv)]
        qp_new = list(qp)
        for j in range(njnt):
            jt = m.jnt_type[j]
            qadr = m.jnt_qposadr[j]
            dadr = m.jnt_dofadr[j]
            if jt == FREE:
                for i in range(3):
                    qp_new[qadr + i] = qp_new[qadr + i] + h * qv_new[dadr + i]
                omega = [qv_new[dadr + 3], qv_new[dadr + 4], qv_new[dadr + 5]]
                angle = vnorm(omega) * h
                axis = vscale(omega, 1.0 / vnorm(omega))
                s, c = jnp.sin(angle * 0.5), jnp.cos(angle * 0.5)
                dq = [c, axis[0] * s, axis[1] * s, axis[2] * s]
                qcur = [qp_new[qadr + 3 + i] for i in range(4)]
                qn = quat_normalize(quat_mul(qcur, dq))
                for i in range(4):
                    qp_new[qadr + 3 + i] = qn[i]
            else:
                qp_new[qadr] = qp_new[qadr] + h * qv_new[dadr]

        if not want_outs:
            return qp_new, qv_new, None

        # ---- maximal-coordinate views (kinematics.py:212-225) ----
        # computed at the PRE-step kinematics (matching forward() inside step:
        # forward is called on the pre-integration state)
        xd_vel = []
        xd_ang = []
        for b in range(1, nbody):
            root_com = subtree_com[m.body_rootid[b]]
            off = vsub(xpos[b], root_com)
            ang = cvel[b][:3]
            vel = vadd(cvel[b][3:], vcross(ang, off))
            xd_vel.append(vel)
            xd_ang.append(ang)

        outs = {
            "site_x": site_x,
            "site_R": site_R,
            "xpos": xpos,
            "xquat": xquat,
            "xd_vel": xd_vel,
            "xd_ang": xd_ang,
            "con_dist": con_dist,
            "con_pos": con_pos,
            "qacc": qacc_int,
            "zero": zero,
        }
        return qp_new, qv_new, outs

    def write_outs(o, qp_new, qv_new, qpos_out, qvel_out, site_xpos_out,
                   site_xmat_out, xpos_out, xrot_out, xdvel_out, xdang_out,
                   cdist_out, cpos_out, qacc_out):
        """Write one step's outputs to refs."""
        ix = lambda i: i
        zero = o["zero"]
        for i in range(nq):
            qpos_out[ix(i)] = qp_new[i]
        for i in range(nv):
            qvel_out[ix(i)] = qv_new[i]
            qacc_out[ix(i)] = o["qacc"][i]
        if nsite:
            for s in range(nsite):
                for i in range(3):
                    site_xpos_out[ix(s * 3 + i)] = o["site_x"][s][i]
                for i in range(3):
                    for j in range(3):
                        site_xmat_out[ix(s * 9 + i * 3 + j)] = o["site_R"][s][i][j]
        else:
            site_xpos_out[ix(0)] = zero
            site_xmat_out[ix(0)] = zero
        for b in range(1, nbody):
            for i in range(3):
                xpos_out[ix((b - 1) * 3 + i)] = o["xpos"][b][i]
            for i in range(4):
                xrot_out[ix((b - 1) * 4 + i)] = o["xquat"][b][i]
            for i in range(3):
                xdvel_out[ix((b - 1) * 3 + i)] = o["xd_vel"][b - 1][i]
                xdang_out[ix((b - 1) * 3 + i)] = o["xd_ang"][b - 1][i]
        if ncon:
            for s in range(ncon):
                cdist_out[ix(s)] = o["con_dist"][s]
                for i in range(3):
                    cpos_out[ix(s * 3 + i)] = o["con_pos"][s][i]
        else:
            cdist_out[ix(0)] = zero
            for i in range(3):
                cpos_out[ix(i)] = zero

    def kernel(qpos_ref, qvel_ref, ctrl_ref, *out_refs):
        cdt = _compute_dtype(qpos_ref.dtype)
        qp = [qpos_ref[i].astype(cdt) for i in range(nq)]
        qv = [qvel_ref[i].astype(cdt) for i in range(nv)]
        ct = [ctrl_ref[i].astype(cdt) for i in range(nu)]
        qp_new, qv_new, o = step_lanes(qp, qv, ct)
        qp_new, qv_new, o = _cast_outs(qp_new, qv_new, o, out_refs[0].dtype)
        write_outs(o, qp_new, qv_new, *out_refs)

    return kernel, step_lanes, write_outs


def _compute_dtype(in_dtype):
    """In-kernel compute dtype for a given ref dtype.

    The baked model constants are f64-exact numpy scalars; with x64
    enabled (the CPU oracle/interpret test config) they promote f32
    inputs to f64 mid-kernel, which would fail the final f32 ref store —
    so compute uniformly in f64 there and cast at the store. With x64
    disabled (the production TPU config) the constants demote to f32 and
    both casts are no-ops.
    """
    import jax.numpy as _jnp

    return _jnp.float64 if jax.config.jax_enable_x64 else in_dtype


def _cast_outs(qp_new, qv_new, o, out_dtype):
    """Cast kernel results to the output-ref dtype (no-op when equal)."""
    cast = lambda x: x.astype(out_dtype) if hasattr(x, "astype") else x
    return jax.tree.map(cast, (qp_new, qv_new, o))


def _build_multistep_kernel(m: Model, block: int, n_steps: int):
    """n_steps fused substeps per kernel call: the (qpos, qvel) carry stays
    in VMEM across substeps (an in-kernel fori_loop), and only the FINAL
    substep materializes the 11 outputs. Arithmetic is identical to n_steps
    sequential single-step kernel calls (tests/test_engine_kernel.py pins
    this), but the intermediate substeps' HBM traffic — input/output rows
    plus the host-level lane transposes — disappears entirely.
    """
    _, step_lanes, write_outs = _build_step_kernel(m, block)
    nq, nv, nu = m.nq, m.nv, m.nu

    def kernel(qpos_ref, qvel_ref, ctrl_ref, *out_refs):
        cdt = _compute_dtype(qpos_ref.dtype)
        qp = [qpos_ref[i].astype(cdt) for i in range(nq)]
        qv = [qvel_ref[i].astype(cdt) for i in range(nv)]
        ct = [ctrl_ref[i].astype(cdt) for i in range(nu)]
        if n_steps > 1:
            if os.environ.get("DIAL_MPC_FUSE_UNROLL", "0") == "1":
                # straight-line variant (larger compile, better Mosaic
                # scheduling candidate) — perf experiment switch
                for _ in range(n_steps - 1):
                    qp, qv, _unused = step_lanes(qp, qv, ct, want_outs=False)
            else:
                def body(_, carry):
                    qp_c, qv_c = list(carry[:nq]), list(carry[nq:])
                    qp_n, qv_n, _unused = step_lanes(
                        qp_c, qv_c, ct, want_outs=False
                    )
                    return tuple(qp_n) + tuple(qv_n)

                carry = jax.lax.fori_loop(
                    0, n_steps - 1, body, tuple(qp) + tuple(qv)
                )
                qp, qv = list(carry[:nq]), list(carry[nq:])
        qp_new, qv_new, o = step_lanes(qp, qv, ct)
        qp_new, qv_new, o = _cast_outs(qp_new, qv_new, o, out_refs[0].dtype)
        write_outs(o, qp_new, qv_new, *out_refs)

    return kernel


# ---------------------------------------------------------------------------
# dispatch: custom_vmap core + lean Data assembly
# ---------------------------------------------------------------------------


def _static_nefc(m: Model) -> int:
    """Total efc row count from the static layout (mirrors constraint.py)."""
    rows = sum(1 for i in range(m.nv) if m.dof_frictionloss_static[i] > 0)
    from dial_mpc_tpu.physics.model import DSBL_LIMIT

    if not (m.opt.disableflags & DSBL_LIMIT):
        rows += sum(
            1
            for j in range(m.njnt)
            if m.jnt_limited[j] and m.jnt_type[j] in (SLIDE, HINGE)
        )
    for (g1, g2, t1, t2, condim, conadr, conmax) in m.pair_table:
        if condim == 1:
            rows += conmax
        elif m.opt.cone == 1:
            rows += conmax * condim
        else:
            nfacets = 2 * (condim - 1)
            rows += conmax * nfacets
    return rows


def _auto_block(m: Model) -> int:
    """Largest block whose live VMEM footprint fits the 16M scoped limit.

    The liveness estimate below under-counts Mosaic's scheduled
    allocation by ~3x (calibrated against a measured OOM: Allegro at
    block 256 allocates 80 KB/lane vs the ~19 KB estimate, Go2 at 512
    compiles so its true footprint is <= 31 KB/lane vs ~10 KB estimated);
    the factor-3 x 14M budget puts Go2/H1 at 256 and the contact-heavy
    crate scenes + Allegro (8-iteration elliptic solve) at 128 — matching
    what compiles and what measured fastest. Block-size sensitivity is
    small anyway (256 vs 384 vs 512 within 5% at Nsample 2048-8192).
    """
    nefc = _static_nefc(m)
    lanes_bytes = 4 * (
        # sparse solver: J lives as per-row support lanes (~nv/2 avg), not
        # a dense (nefc, nv) stack
        nefc * (m.nv // 2 + 1)
        + 10 * nefc  # D/aref/fl/eta/jar/force/...
        + m.nv * m.nv  # M
        + 36 * m.nbody  # composite inertias
        + 40 * m.nv  # cdof/cdof_dot/vectors
        + 20 * m.nbody  # frames/velocities
        + 12 * max(m.ncon, 1)
    ) * 3
    budget = 14 * 1024 * 1024
    block = 256
    while block > 64 and lanes_bytes * block > budget:
        block //= 2
    return block


def engine_enabled(m: Model | None = None) -> bool:
    """Kernel path on TPU for ALL models, elliptic cones included.

    (Round-1 disabled cone == 1 over NaNs seen in long Allegro rollouts;
    after the zero-size-concatenate Mosaic fixes and the NaN-robust MPPI
    softmax, a 100-step Nsample=2048 Allegro planner run on the real chip
    stays finite, and the 200-step interpret-mode rollout parity test
    (tests/test_engine_kernel.py) pins the cone zone logic.)
    """
    mode = os.environ.get("DIAL_MPC_ENGINE", "auto")
    if mode == "pallas":
        return True
    if mode == "xla":
        return False
    return jax.default_backend() == "tpu"


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _lanes2d() -> int:
    """Sublane count S for the 2D lane layout (0 = classic 1D lanes).

    With S > 0 every per-row value inside the kernel is shaped (S, W)
    instead of (block,): one vector op then covers S*W samples — a full
    native (8, 128) vreg at S=8, W=128 — instead of 128-lane rows on a
    single sublane. The kernel algebra is shape-agnostic (pure elementwise
    lane ops + axis-0 stacks/reductions), so only this I/O boundary
    changes. Set via DIAL_MPC_LANES2D.
    """
    v = os.environ.get("DIAL_MPC_LANES2D", "")
    if not v:
        return -1  # unset: resolved per-model by _resolve_lanes()
    s = int(v)
    if s < 0:
        raise ValueError(f"DIAL_MPC_LANES2D must be >= 0, got {s}")
    return s


def _resolve_lanes(m: Model) -> int:
    """Effective sublane count S for this model.

    Explicit DIAL_MPC_LANES2D always wins. Otherwise the 2-D (8, 128)
    layout is the TPU default: measured 2.9-4.1x faster than the 1-D
    layout on the Go2 solve (251.7 vs 86.4 Hz @ Nsample=2048, 156.0 vs
    37.9 Hz @ 8192, v5e chip) — one vector op covers a full native vreg
    of 1024 samples instead of a 128-lane row, attacking the per-op
    issue floor the 1-D layout is bound by. Interpret mode (CPU tests)
    keeps the 1-D default so the pinned suites cover both layouts
    (tests/test_engine_kernel.py runs 2-D explicitly via the env vars).
    """
    s = _lanes2d()
    if s >= 0:
        return s
    return 0 if _use_interpret() else 8


def _lane_w() -> int:
    """Lane width W of the 2D layout (DIAL_MPC_LANE_W, default 128 — the
    hardware vreg width). Tests override it smaller so interpret-mode
    parity runs don't pad tiny batches up to S*128 samples; on a real TPU
    W must stay a multiple of 128 or the minor-dim tile is misaligned."""
    v = os.environ.get("DIAL_MPC_LANE_W", "")
    w = int(v) if v else 128
    if w < 1:
        raise ValueError(f"DIAL_MPC_LANE_W must be >= 1, got {w}")
    if w % 128 != 0 and not _use_interpret():
        raise ValueError(
            f"DIAL_MPC_LANE_W={w} is not a multiple of 128; on TPU the "
            "minor-dim tile would be misaligned (use the default 128)"
        )
    return w


_CORE_CACHE: dict = {}


def _out_specs(m: Model):
    # every row count clamped >= 1: Mosaic rejects zero-sized operands
    # (e.g. the Allegro scene has no sites)
    nbody1 = m.nbody - 1
    return [
        ("qpos", m.nq),
        ("qvel", m.nv),
        ("site_xpos", max(m.nsite * 3, 1)),
        ("site_xmat", max(m.nsite * 9, 1)),
        ("x_pos", nbody1 * 3),
        ("x_rot", nbody1 * 4),
        ("xd_vel", nbody1 * 3),
        ("xd_ang", nbody1 * 3),
        ("cdist", max(m.ncon, 1)),
        ("cpos", max(m.ncon, 1) * 3),
        ("qacc", m.nv),
    ]


def step_core_for(m: Model, block: int | None = None, n_steps: int = 1):
    """custom_vmap step core: (qpos, qvel, ctrl) -> tuple of outputs.

    Both scalar and vmapped calls dispatch to the lane-major mega-kernel;
    an unbatched call runs as a batch of one (a single grid block — tens
    of microseconds — versus the ~2 ms the scalar XLA op-by-op step used
    to cost, which dominated the planner's env advance). The XLA
    reference implementation lives in physics/forward.py and is pinned
    against this kernel by tests/test_engine_kernel.py. n_steps > 1 fuses
    that many substeps (constant ctrl) into ONE kernel call — outputs
    come from the final substep, matching n_steps sequential calls
    exactly.
    """
    if block is None:
        override = os.environ.get("DIAL_MPC_BLOCK")
        block = int(override) if override else _auto_block(m)
    key = (m.pair_table, m.nq, m.nv, m.nu, m.jnt_type, m.opt.cone,
           m.opt.iterations, m.opt.disableflags, float(_const(m.opt.timestep)),
           block, n_steps, _resolve_lanes(m), _lane_w())
    if key in _CORE_CACHE:
        return _CORE_CACHE[key]

    specs = _out_specs(m)

    if n_steps == 1:
        kernel, _, _ = _build_step_kernel(m, block)
    else:
        kernel = _build_multistep_kernel(m, block, n_steps)

    def _pallas_batched(qpos, qvel, ctrl):
        B = qpos.shape[0]
        S = _resolve_lanes(m)
        W = _lane_w()
        if S:
            # don't pad small batches up to a full S*W block (e.g. a
            # 256-sample shard on an 8-device mesh would pad 4x at S=8):
            # cap the sublane count at what the batch actually fills
            S = min(S, max(1, -(-B // W)))
        gran = S * W if S else block
        Bp = ((B + gran - 1) // gran) * gran
        pad = Bp - B

        def prep(x):
            if pad:
                x = jnp.concatenate(
                    [x, jnp.broadcast_to(x[-1:], (pad,) + x.shape[1:])], axis=0
                )
            x = jnp.moveaxis(x, 0, -1)
            if S:
                x = x.reshape(x.shape[:-1] + (S, Bp // S))
            return x

        qp, qv, ct = prep(qpos), prep(qvel), prep(ctrl)
        grid = (Bp // gran,)
        if S:
            bspec = lambda n: pl.BlockSpec((n, S, W), lambda i: (0, 0, i))
            oshape = lambda n: (n, S, Bp // S)
        else:
            bspec = lambda n: pl.BlockSpec((n, block), lambda i: (0, i))
            oshape = lambda n: (n, Bp)
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[bspec(m.nq), bspec(m.nv), bspec(m.nu)],
            out_specs=[bspec(n) for _, n in specs],
            out_shape=[
                jax.ShapeDtypeStruct(oshape(n), qpos.dtype) for _, n in specs
            ],
            interpret=_use_interpret(),
        )(qp, qv, ct)

        def unpack(o):
            if S:
                o = o.reshape(o.shape[:-2] + (Bp,))
            return jnp.moveaxis(o, -1, 0)[:B]

        return tuple(unpack(o) for o in outs)

    @jax.custom_batching.custom_vmap
    def core(qpos, qvel, ctrl):
        # unbatched calls (the planner's single env advance per control
        # step) dispatch to the kernel as a batch of one — one grid block,
        # tens of us — instead of the scalar XLA reference step, whose
        # thousands of serialized small ops measured 2.16 ms: more than
        # half the whole Nsample=2048 solve
        outs = _pallas_batched(qpos[None], qvel[None], ctrl[None])
        return tuple(o[0] for o in outs)

    @core.def_vmap
    def _core_vmap(axis_size, in_batched, qpos, qvel, ctrl):
        args = [
            a if b else jnp.broadcast_to(a, (axis_size,) + a.shape)
            for a, b in zip((qpos, qvel, ctrl), in_batched)
        ]
        out = _pallas_batched(*args)
        return out, tuple(True for _ in out)

    _CORE_CACHE[key] = core
    return core


def lean_data(m: Model, d_prev, outs, ctrl, n_frames_time):
    """Assemble the lean Data carried through rollouts from core outputs."""
    import dataclasses

    from dial_mpc_tpu.physics.model import Contact, Data

    (qpos, qvel, site_xpos, site_xmat, x_pos, x_rot, xd_vel, xd_ang,
     cdist, cpos, qacc) = outs
    nbody1 = m.nbody - 1
    contact = Contact(
        dist=cdist[: m.ncon],
        pos=cpos.reshape(-1, 3)[: m.ncon],
        frame=None,
        geom=m.con_geom,
        includemargin=m.con_includemargin,
        friction=m.con_friction,
        solref=m.con_solref,
        solimp=m.con_solimp,
        dim=m.con_dim,
    )
    return Data(
        qpos=qpos,
        qvel=qvel,
        ctrl=ctrl,
        time=d_prev.time + n_frames_time,
        site_xpos=site_xpos[: m.nsite * 3].reshape(m.nsite, 3),
        site_xmat=site_xmat[: m.nsite * 9].reshape(m.nsite, 3, 3),
        x_pos=x_pos.reshape(nbody1, 3),
        x_rot=x_rot.reshape(nbody1, 4),
        xd_vel=xd_vel.reshape(nbody1, 3),
        xd_ang=xd_ang.reshape(nbody1, 3),
        qacc=qacc,
        contact=contact,
    )


def trim_data(m: Model, d):
    """Full Data -> the same lean structure lean_data produces."""
    import dataclasses

    from dial_mpc_tpu.physics.model import Contact, Data

    contact = Contact(
        dist=d.contact.dist,
        pos=d.contact.pos,
        frame=None,
        geom=m.con_geom,
        includemargin=m.con_includemargin,
        friction=m.con_friction,
        solref=m.con_solref,
        solimp=m.con_solimp,
        dim=m.con_dim,
    ) if d.contact is not None else None
    return Data(
        qpos=d.qpos,
        qvel=d.qvel,
        ctrl=d.ctrl,
        time=d.time,
        site_xpos=d.site_xpos,
        site_xmat=d.site_xmat,
        x_pos=d.x_pos,
        x_rot=d.x_rot,
        xd_vel=d.xd_vel,
        xd_ang=d.xd_ang,
        qacc=d.qacc,
        contact=contact,
    )
