"""Smooth (unconstrained) dynamics: mass matrix, bias forces, actuation.

Mirrors MuJoCo's mj_crb / mj_rne / mj_passive / mj_fwdActuation stages, but
in dense form: the mass matrix is a dense (nv, nv) array built with one
masked matmul — under vmap over the sample axis this becomes a large batched
GEMM that XLA tiles onto the TPU MXU, replacing MuJoCo's sparse CSR loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dial_mpc_tpu.physics import linalg, maths
from dial_mpc_tpu.physics.kinematics import replace
from dial_mpc_tpu.physics.model import Data, Model


def crb(m: Model, d: Data) -> Data:
    """Composite-rigid-body mass matrix (dense), plus its Cholesky factor."""
    # accumulate composite inertias bottom-up (unrolled over bodies)
    crb_i = [d.cinert[b] for b in range(m.nbody)]
    for b in range(m.nbody - 1, 0, -1):
        p = m.body_parentid[b]
        if p > 0:
            crb_i[p] = crb_i[p] + crb_i[b]
    crb_stack = jnp.stack(crb_i)  # (nbody, 6, 6)

    dof_bodyid = jnp.asarray(m.dof_bodyid)
    # F[i] = crb[body(i)] @ cdof[i]
    F = jnp.einsum("vij,vj->vi", crb_stack[dof_bodyid], d.cdof)
    # lower triangle: M[i, j] = F[i] . cdof[j] for j ancestor-or-self of i
    lower = jnp.einsum("vi,wi->vw", F, d.cdof) * m.dof_ancestor_mask
    qM = lower + lower.T - jnp.diag(jnp.diag(lower))
    qM = qM + jnp.diag(m.dof_armature)
    qLD = linalg.cholesky(qM)
    return replace(d, qM=qM, qLD=qLD)


def solve_m(d: Data, rhs: jax.Array) -> jax.Array:
    """M^{-1} rhs via the cached (unrolled) Cholesky factor."""
    return linalg.cho_solve(d.qLD, rhs)


def rne(m: Model, d: Data) -> Data:
    """Bias force C(q, qvel) via recursive Newton-Euler (mj_rne, flg_acc=0)."""
    dtype = d.qpos.dtype
    gravity = -m.opt.gravity.astype(dtype)
    cacc0 = jnp.concatenate([jnp.zeros(3, dtype), gravity])

    cacc = [cacc0]
    for b in range(1, m.nbody):
        p = m.body_parentid[b]
        da, dn = m.body_dofadr[b], m.body_dofnum[b]
        acc = cacc[p]
        if dn:
            acc = acc + d.cdof_dot[da : da + dn].T @ d.qvel[da : da + dn]
        cacc.append(acc)

    cfrc = [None]
    for b in range(1, m.nbody):
        I = d.cinert[b]
        h = I @ d.cvel[b]
        cfrc.append(I @ cacc[b] + maths.force_cross(d.cvel[b], h))

    # accumulate subtree forces bottom-up
    for b in range(m.nbody - 1, 1, -1):
        p = m.body_parentid[b]
        if p > 0:
            cfrc[p] = cfrc[p] + cfrc[b]

    qfrc_bias = jnp.zeros(m.nv, dtype)
    parts = []
    for i in range(m.nv):
        parts.append(jnp.dot(d.cdof[i], cfrc[m.dof_bodyid[i]]))
    qfrc_bias = jnp.stack(parts) if parts else qfrc_bias
    return replace(d, qfrc_bias=qfrc_bias)


def passive(m: Model, d: Data) -> Data:
    """Joint damping (springs are zero in all supported models)."""
    qfrc = -m.dof_damping * d.qvel
    return replace(d, qfrc_passive=qfrc)


def actuation(m: Model, d: Data) -> Data:
    """Joint-transmission actuators: motor (gain) and position (affine bias).

    Reference behavior: MJX fwd_actuation for trntype=joint, gaintype=fixed,
    biastype in {none, affine} — covers all models shipped with DIAL-MPC
    (motors for Go2/H1, position servos for Allegro).
    """
    dtype = d.qpos.dtype
    if m.nu == 0:
        return replace(
            d,
            qfrc_actuator=jnp.zeros(m.nv, dtype),
            actuator_force=jnp.zeros(0, dtype),
        )

    ctrl = jnp.where(
        m.actuator_ctrllimited > 0,
        jnp.clip(d.ctrl, m.actuator_ctrlrange[:, 0], m.actuator_ctrlrange[:, 1]),
        d.ctrl,
    )

    # actuator length/velocity for joint transmission
    qposadr = jnp.asarray(
        [m.jnt_qposadr[m.actuator_trnid[u]] for u in range(m.nu)], dtype=jnp.int32
    )
    length = d.qpos[qposadr] * m.actuator_gear
    velocity = d.qvel[m.actuator_dofadr] * m.actuator_gear

    gain = m.actuator_gainprm[:, 0]
    force = gain * ctrl
    bias = (
        m.actuator_biasprm[:, 0]
        + m.actuator_biasprm[:, 1] * length
        + m.actuator_biasprm[:, 2] * velocity
    )
    biastype = jnp.asarray(m.actuator_biastype)
    force = force + jnp.where(biastype == 1, bias, 0.0)
    force = jnp.where(
        m.actuator_forcelimited > 0,
        jnp.clip(force, m.actuator_forcerange[:, 0], m.actuator_forcerange[:, 1]),
        force,
    )

    qfrc = jnp.zeros(m.nv, dtype).at[m.actuator_dofadr].add(force * m.actuator_gear)
    return replace(d, qfrc_actuator=qfrc, actuator_force=force)


def fwd_smooth(m: Model, d: Data) -> Data:
    """qacc_smooth = M^{-1} (passive + actuator - bias)."""
    qfrc_smooth = d.qfrc_passive + d.qfrc_actuator - d.qfrc_bias
    qacc_smooth = solve_m(d, qfrc_smooth)
    return replace(d, qfrc_smooth=qfrc_smooth, qacc_smooth=qacc_smooth)
