"""Constraint assembly: dof friction, joint limits, contact friction cones.

Produces dense, statically-shaped efc arrays:
  efc_J (nefc, nv), efc_D, efc_aref, efc_frictionloss, efc_floss_mask.

Row order: dof-friction rows, joint-limit rows, contact rows (pyramidal
facets per contact slot, slot order from the static pair table). Inactive
rows (separated contacts, unviolated limits beyond margin) get D = 0 so
they drop out of the solver algebraically without changing any shapes.

Semantics follow MuJoCo's soft-constraint model: impedance d(r) from
solimp, stiffness/damping from solref, reference acceleration
aref = -b*vel - k*d(r)*pos, regularizer R = (1-d)/d * diagApprox.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from dial_mpc_tpu.physics.kinematics import replace
from dial_mpc_tpu.physics.model import Data, Model, DSBL_CONTACT, DSBL_LIMIT

SLIDE, HINGE = 2, 3
MJ_MINIMP, MJ_MAXIMP = 0.0001, 0.9999
MJ_MINVAL = 1e-15


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Efc:
    J: jax.Array  # (nefc, nv)
    D: jax.Array  # (nefc,) inverse regularizer (0 => inactive row)
    aref: jax.Array  # (nefc,)
    pos: jax.Array  # (nefc,) constraint violation (for diagnostics)
    frictionloss: jax.Array  # (nefc,) dof-friction bound (0 => unilateral row)
    eta: jax.Array = None  # (nefc,) elliptic friction coefficient per row


def elliptic_groups(m: Model):
    """Static (row0, condim) spans of elliptic contact groups in efc rows.

    Row layout: dof-friction rows, joint-limit rows, then contact rows in
    slot order. Only meaningful when m.opt.cone == 1; empty otherwise.
    """
    if m.opt.cone != 1 or (m.opt.disableflags & DSBL_CONTACT):
        return ()
    nrows = sum(1 for i in range(m.nv) if m.dof_frictionloss_static[i] > 0)
    if not (m.opt.disableflags & DSBL_LIMIT):
        for j in range(m.njnt):
            if m.jnt_limited[j] and m.jnt_type[j] in (SLIDE, HINGE):
                nrows += 1
    groups = []
    for (g1, g2, t1, t2, condim, conadr, conmax) in m.pair_table:
        for _ in range(conmax):
            if condim == 1:
                nrows += 1
            else:
                groups.append((nrows, condim))
                nrows += condim
    return tuple(groups)


def _impedance(solimp, pos):
    dmin, dmax, width, mid, power = (
        solimp[..., 0],
        solimp[..., 1],
        solimp[..., 2],
        solimp[..., 3],
        solimp[..., 4],
    )
    x = jnp.abs(pos) / jnp.maximum(width, MJ_MINVAL)
    ya = x ** power / jnp.maximum(mid ** (power - 1.0), MJ_MINVAL)
    yb = 1.0 - (1.0 - x) ** power / jnp.maximum((1.0 - mid) ** (power - 1.0), MJ_MINVAL)
    y = jnp.where(x < mid, ya, yb)
    imp = dmin + y * (dmax - dmin)
    imp = jnp.clip(imp, MJ_MINIMP, MJ_MAXIMP)
    return jnp.where(x > 1.0, dmax, imp)


def _kbi(m: Model, solref, solimp, pos, vel):
    """Impedance, and aref = -b*vel - k*imp*pos (standard or direct solref)."""
    imp = _impedance(solimp, pos)
    dmax = solimp[..., 1]
    timeconst = jnp.maximum(solref[..., 0], 2.0 * m.opt.timestep)
    dampratio = solref[..., 1]
    b_std = 2.0 / jnp.maximum(dmax * timeconst, MJ_MINVAL)
    k_std = 1.0 / jnp.maximum(
        dmax * dmax * timeconst * timeconst * dampratio * dampratio, MJ_MINVAL
    )
    # direct (negative) solref: -stiffness, -damping
    k = jnp.where(solref[..., 0] <= 0, -solref[..., 0] / jnp.maximum(dmax * dmax, MJ_MINVAL), k_std)
    b = jnp.where(solref[..., 1] <= 0, -solref[..., 1] / jnp.maximum(dmax, MJ_MINVAL), b_std)
    aref = -b * vel - k * imp * pos
    return imp, aref


def _point_jacobian(m: Model, d: Data, point: jax.Array, body: int):
    """Translational & rotational Jacobians of a world point on a body.

    Dense masked form of mj_jac: every dof column is computed, then masked
    by the body's kinematic chain.
    """
    root = m.body_rootid[body]
    offset = point - d.subtree_com[root]
    jacp = d.cdof[:, 3:] + jnp.cross(d.cdof[:, :3], offset[None, :])
    jacr = d.cdof[:, :3]
    mask = m.body_chain_mask[body][:, None]
    return jacp * mask, jacr * mask


def make_constraint(m: Model, d: Data) -> Data:
    dtype = d.qpos.dtype
    nv = m.nv
    rows_J, rows_D, rows_aref, rows_pos, rows_fl = [], [], [], [], []

    # ---- dof friction rows (H1 push-crate's sliding box) ----
    for i in range(nv):
        if m.dof_frictionloss_static[i] <= 0:
            continue
        J = jnp.zeros(nv, dtype).at[i].set(1.0)
        vel = d.qvel[i]
        imp, aref = _kbi(m, m.dof_solref[i], m.dof_solimp[i], jnp.zeros((), dtype), vel)
        R = jnp.maximum((1.0 - imp) / imp * m.dof_invweight0[i], MJ_MINVAL)
        rows_J.append(J)
        rows_D.append(1.0 / R)
        rows_aref.append(aref)
        rows_pos.append(jnp.zeros((), dtype))
        rows_fl.append(m.dof_frictionloss[i])

    # ---- joint limit rows ----
    if not (m.opt.disableflags & DSBL_LIMIT):
        for j in range(m.njnt):
            if not m.jnt_limited[j]:
                continue
            jt = m.jnt_type[j]
            if jt not in (SLIDE, HINGE):
                continue
            qadr, dadr = m.jnt_qposadr[j], m.jnt_dofadr[j]
            q = d.qpos[qadr]
            lo, hi = m.jnt_range[j, 0], m.jnt_range[j, 1]
            dist_lo = q - lo
            dist_hi = hi - q
            use_lo = dist_lo < dist_hi
            dist = jnp.where(use_lo, dist_lo, dist_hi)
            sign = jnp.where(use_lo, 1.0, -1.0)
            pos = dist - m.jnt_margin[j]
            active = (dist < m.jnt_margin[j]).astype(dtype)
            J = jnp.zeros(nv, dtype).at[dadr].set(sign.astype(dtype))
            vel = sign * d.qvel[dadr]
            imp, aref = _kbi(m, m.jnt_solref[j], m.jnt_solimp[j], pos, vel)
            R = jnp.maximum((1.0 - imp) / imp * m.dof_invweight0[dadr], MJ_MINVAL)
            rows_J.append(J * active)
            rows_D.append(active / R)
            rows_aref.append(aref * active)
            rows_pos.append(pos)
            rows_fl.append(jnp.zeros((), dtype))

    rows_eta = [jnp.zeros((), dtype) for _ in rows_J]

    # ---- contact rows (pyramidal or elliptic cone) ----
    if m.ncon and not (m.opt.disableflags & DSBL_CONTACT):
        con = d.contact
        slot_meta = []
        for (g1, g2, t1, t2, condim, conadr, conmax) in m.pair_table:
            for k in range(conmax):
                slot_meta.append((conadr + k, g1, g2, condim))
        for (slot, g1, g2, condim) in slot_meta:
            b1 = m.geom_bodyid_static[g1]
            b2 = m.geom_bodyid_static[g2]
            point = con.pos[slot]
            frame = con.frame[slot]  # rows: n, t1, t2
            pos = con.dist[slot] - con.includemargin[slot]
            active = (con.dist[slot] < con.includemargin[slot]).astype(dtype)

            jacp1, jacr1 = _point_jacobian(m, d, point, b1)
            jacp2, jacr2 = _point_jacobian(m, d, point, b2)
            djacp = jacp2 - jacp1  # (nv, 3)
            djacr = jacr2 - jacr1

            Jn = djacp @ frame[0]
            imp, _ = _kbi(
                m, con.solref[slot], con.solimp[slot], pos, jnp.zeros((), dtype)
            )
            invweight_t = (
                m.body_invweight0[b1, 0] + m.body_invweight0[b2, 0]
            )
            invweight_r = (
                m.body_invweight0[b1, 1] + m.body_invweight0[b2, 1]
            )

            if condim == 1:
                vel = Jn @ d.qvel
                _, aref = _kbi(m, con.solref[slot], con.solimp[slot], pos, vel)
                R = jnp.maximum((1.0 - imp) / imp * invweight_t, MJ_MINVAL)
                rows_J.append(Jn * active)
                rows_D.append(active / R)
                rows_aref.append(aref * active)
                rows_pos.append(pos)
                rows_fl.append(jnp.zeros((), dtype))
                rows_eta.append(jnp.zeros((), dtype))
            elif m.opt.cone == 1:
                # elliptic cone: condim rows [normal, t1, t2, (tor, r1, r2)].
                # Regularizers verified against CPU MuJoCo:
                #   R_n = (1-imp)/imp * invweight_t
                #   R_i = R_n * mu^2 / (eta_i^2 * impratio)   (friction rows)
                # normal aref has the position term, friction rows are
                # velocity-only.
                fri = con.friction[slot]
                mu = fri[0]
                etas = [fri[0], fri[1], fri[2], fri[3], fri[4]][: condim - 1]
                Rn = jnp.maximum((1.0 - imp) / imp * invweight_t, MJ_MINVAL)
                vel_n = Jn @ d.qvel
                _, aref_n = _kbi(m, con.solref[slot], con.solimp[slot], pos, vel_n)
                rows_J.append(Jn * active)
                rows_D.append(active / Rn)
                rows_aref.append(aref_n * active)
                rows_pos.append(pos)
                rows_fl.append(jnp.zeros((), dtype))
                rows_eta.append(jnp.zeros((), dtype))

                fric_Js = [djacp @ frame[1], djacp @ frame[2]]
                if condim > 3:
                    fric_Js.append(djacr @ frame[0])
                if condim > 4:
                    fric_Js += [djacr @ frame[1], djacr @ frame[2]]
                for eta_i, Jf in zip(etas, fric_Js):
                    Ri = Rn * mu * mu / jnp.maximum(
                        eta_i * eta_i * m.opt.impratio, MJ_MINVAL
                    )
                    vel = Jf @ d.qvel
                    _, aref_f = _kbi(
                        m,
                        con.solref[slot],
                        con.solimp[slot],
                        jnp.zeros((), dtype),
                        vel,
                    )
                    rows_J.append(Jf * active)
                    rows_D.append(active / Ri)
                    rows_aref.append(aref_f * active)
                    rows_pos.append(pos)
                    rows_fl.append(jnp.zeros((), dtype))
                    rows_eta.append(jnp.asarray(eta_i, dtype))
            else:
                # pyramidal facets: n +/- mu_k * dir_k
                fri = con.friction[slot]
                tdirs = [djacp @ frame[1], djacp @ frame[2]]
                if condim == 6:
                    tdirs += [djacr @ frame[0], djacr @ frame[1], djacr @ frame[2]]
                    invw_axis = [invweight_t, invweight_t, invweight_r, invweight_r, invweight_r]
                else:
                    invw_axis = [invweight_t, invweight_t]
                for k, Jt in enumerate(tdirs):
                    mu = fri[k]
                    invweight_fac = invweight_t + mu * mu * invw_axis[k]
                    R = jnp.maximum(
                        (1.0 - imp) / imp * invweight_fac * 2.0 * mu * mu, MJ_MINVAL
                    )
                    for sgn in (1.0, -1.0):
                        Jrow = Jn + sgn * mu * Jt
                        vel = Jrow @ d.qvel
                        _, aref = _kbi(
                            m, con.solref[slot], con.solimp[slot], pos, vel
                        )
                        rows_J.append(Jrow * active)
                        rows_D.append(active / R)
                        rows_aref.append(aref * active)
                        rows_pos.append(pos)
                        rows_fl.append(jnp.zeros((), dtype))
                        rows_eta.append(jnp.zeros((), dtype))

    if rows_J:
        efc = Efc(
            J=jnp.stack(rows_J),
            D=jnp.stack([jnp.asarray(x, dtype) for x in rows_D]),
            aref=jnp.stack([jnp.asarray(x, dtype) for x in rows_aref]),
            pos=jnp.stack([jnp.asarray(x, dtype) for x in rows_pos]),
            frictionloss=jnp.stack([jnp.asarray(x, dtype) for x in rows_fl]),
            eta=jnp.stack([jnp.asarray(x, dtype) for x in rows_eta]),
        )
    else:
        efc = Efc(
            J=jnp.zeros((0, nv), dtype),
            D=jnp.zeros(0, dtype),
            aref=jnp.zeros(0, dtype),
            pos=jnp.zeros(0, dtype),
            frictionloss=jnp.zeros(0, dtype),
            eta=jnp.zeros(0, dtype),
        )
    return replace(d, efc=efc)
