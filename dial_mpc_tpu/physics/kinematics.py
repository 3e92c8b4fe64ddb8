"""Forward kinematics and CoM-frame quantities (mj_kinematics / mj_comPos /
mj_comVel semantics).

Bodies are processed in topological order (MuJoCo guarantees parent id <
child id); the per-body loop is unrolled at trace time — nbody <= ~25 for
the supported robots, and unrolling keeps every op statically shaped so the
whole pipeline vmaps cleanly over thousands of samples.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dial_mpc_tpu.physics import maths
from dial_mpc_tpu.physics.model import Data, Model

# mjtJoint
FREE, BALL, SLIDE, HINGE = 0, 1, 2, 3


def kinematics(m: Model, d: Data) -> Data:
    """Body / geom / site poses from qpos (mj_kinematics)."""
    dtype = d.qpos.dtype
    xpos = [jnp.zeros(3, dtype)]
    xquat = [jnp.array([1.0, 0.0, 0.0, 0.0], dtype)]
    xanchor = [None] * m.njnt
    xaxis = [None] * m.njnt

    for b in range(1, m.nbody):
        p = m.body_parentid[b]
        # body frame attached to parent
        pos = xpos[p] + maths.rotate(m.body_pos[b], xquat[p])
        quat = maths.quat_mul(xquat[p], m.body_quat[b])

        jadr, jnum = m.body_jntadr[b], m.body_jntnum[b]
        for k in range(jnum):
            j = jadr + k
            jt = m.jnt_type[j]
            qadr = m.jnt_qposadr[j]
            if jt == FREE:
                pos = d.qpos[qadr : qadr + 3]
                quat = maths.normalize(d.qpos[qadr + 3 : qadr + 7])
                xanchor[j] = pos
                xaxis[j] = m.jnt_axis[j]  # mj_kinematics leaves free-joint axis unrotated
            elif jt == SLIDE:
                axis = maths.rotate(m.jnt_axis[j], quat)
                # anchor is evaluated before the translation (mj_kinematics)
                xanchor[j] = pos + maths.rotate(m.jnt_pos[j], quat)
                xaxis[j] = axis
                pos = pos + axis * (d.qpos[qadr] - m.qpos0[qadr])
            elif jt == HINGE:
                anchor = pos + maths.rotate(m.jnt_pos[j], quat)
                axis_local = m.jnt_axis[j]
                qloc = maths.axis_angle_to_quat(
                    axis_local, d.qpos[qadr] - m.qpos0[qadr]
                )
                quat = maths.quat_mul(quat, qloc)
                # keep the anchor point fixed under the rotation
                pos = anchor - maths.rotate(m.jnt_pos[j], quat)
                xanchor[j] = anchor
                xaxis[j] = maths.rotate(axis_local, quat)
            else:  # pragma: no cover - ball joints unused by supported models
                raise NotImplementedError("ball joints not supported yet")
        xpos.append(pos)
        xquat.append(maths.normalize(quat))

    xpos = jnp.stack(xpos)
    xquat = jnp.stack(xquat)
    xmat = jax.vmap(maths.quat_to_mat)(xquat)

    # inertial frames
    xipos = xpos + jax.vmap(maths.rotate)(m.body_ipos, xquat)
    ximat = jax.vmap(maths.quat_to_mat)(jax.vmap(maths.quat_mul)(xquat, m.body_iquat))

    # geoms / sites
    gb = m.geom_bodyid
    geom_xpos = xpos[gb] + jax.vmap(maths.rotate)(m.geom_pos, xquat[gb])
    geom_xmat = jax.vmap(maths.quat_to_mat)(
        jax.vmap(maths.quat_mul)(xquat[gb], m.geom_quat)
    )
    if m.nsite:
        site_xpos = xpos[m.site_bodyid] + jax.vmap(maths.rotate)(
            m.site_pos, xquat[m.site_bodyid]
        )
        site_xmat = jax.vmap(maths.quat_to_mat)(
            jax.vmap(maths.quat_mul)(xquat[m.site_bodyid], m.site_quat)
        )
    else:
        site_xpos = jnp.zeros((0, 3), dtype)
        site_xmat = jnp.zeros((0, 3, 3), dtype)

    xanchor_a = (
        jnp.stack(xanchor) if m.njnt else jnp.zeros((0, 3), dtype)
    )
    xaxis_a = jnp.stack(xaxis) if m.njnt else jnp.zeros((0, 3), dtype)

    return replace(
        d,
        xpos=xpos,
        xquat=xquat,
        xmat=xmat,
        xipos=xipos,
        ximat=ximat,
        xanchor=xanchor_a,
        xaxis=xaxis_a,
        geom_xpos=geom_xpos,
        geom_xmat=geom_xmat,
        site_xpos=site_xpos,
        site_xmat=site_xmat,
    )


def replace(d: Data, **kw) -> Data:
    import dataclasses

    return dataclasses.replace(d, **kw)


def com_pos(m: Model, d: Data) -> Data:
    """Subtree CoM, CoM-frame spatial inertias and dof motion subspaces
    (mj_comPos)."""
    dtype = d.qpos.dtype
    # subtree center of mass
    mass = m.body_mass
    # accumulate bottom-up: weighted xipos sums over subtrees
    wpos = mass[:, None] * d.xipos
    sub_sum = [wpos[b] for b in range(m.nbody)]
    sub_mass = [mass[b] for b in range(m.nbody)]
    for b in range(m.nbody - 1, 0, -1):
        p = m.body_parentid[b]
        sub_sum[p] = sub_sum[p] + sub_sum[b]
        sub_mass[p] = sub_mass[p] + sub_mass[b]
    subtree_com = jnp.stack(
        [sub_sum[b] / jnp.maximum(sub_mass[b], 1e-15) for b in range(m.nbody)]
    )
    # world body: MuJoCo sets subtree_com[0] to the full-model CoM
    # (sub_sum[0]/sub_mass[0] already is exactly that).

    # spatial inertia of each body about the CoM of its kinematic tree root
    root_com = subtree_com[jnp.asarray(m.body_rootid)]
    offset = d.xipos - root_com  # CoM of body minus reference origin
    inert_world = jnp.einsum(
        "bij,bj,bkj->bik", d.ximat, m.body_inertia, d.ximat
    )
    cinert = maths.spatial_inertia(mass, inert_world, offset)

    # dof motion subspaces (cdof), reference origin = subtree_com[rootid]
    cdofs = []
    for j in range(m.njnt):
        jt = m.jnt_type[j]
        b = m.jnt_bodyid[j]
        o = subtree_com[m.body_rootid[b]]
        if jt == FREE:
            zeros = jnp.zeros(3, dtype)
            for i in range(3):
                e = jnp.zeros(3, dtype).at[i].set(1.0)
                cdofs.append(jnp.concatenate([zeros, e]))
            # rotational dofs: axes of the body frame (free-joint angular
            # velocity lives in the child frame), anchored at body origin
            for i in range(3):
                ax = d.xmat[b, :, i]
                lin = jnp.cross(ax, o - d.xpos[b])
                cdofs.append(jnp.concatenate([ax, lin]))
        elif jt == SLIDE:
            cdofs.append(jnp.concatenate([jnp.zeros(3, dtype), d.xaxis[j]]))
        elif jt == HINGE:
            ax = d.xaxis[j]
            lin = jnp.cross(ax, o - d.xanchor[j])
            cdofs.append(jnp.concatenate([ax, lin]))
    cdof = jnp.stack(cdofs) if cdofs else jnp.zeros((0, 6), dtype)

    return replace(d, subtree_com=subtree_com, cinert=cinert, cdof=cdof)


def com_vel(m: Model, d: Data) -> Data:
    """Body CoM-frame velocities and cdof time-derivatives (mj_comVel)."""
    dtype = d.qpos.dtype
    cvel = [jnp.zeros(6, dtype)]
    cdof_dot = [None] * m.nv
    for b in range(1, m.nbody):
        p = m.body_parentid[b]
        v = cvel[p]
        dadr, dnum = m.body_dofadr[b], m.body_dofnum[b]
        # per-joint accumulation mirroring mj_comVel: cdof_dot for a dof is
        # the motion cross of the velocity *accumulated so far* with cdof
        jadr, jnum = m.body_jntadr[b], m.body_jntnum[b]
        for k in range(jnum):
            j = jadr + k
            jt = m.jnt_type[j]
            da = m.jnt_dofadr[j]
            if jt == FREE:
                # translation dofs: cdof constant in world -> cdof_dot = 0
                for i in range(3):
                    cdof_dot[da + i] = jnp.zeros(6, dtype)
                v = v + d.cdof[da : da + 3].T @ d.qvel[da : da + 3]
                # rotation dofs: cross with velocity including translation part
                for i in range(3):
                    cdof_dot[da + 3 + i] = maths.motion_cross(v, d.cdof[da + 3 + i])
                v = v + d.cdof[da + 3 : da + 6].T @ d.qvel[da + 3 : da + 6]
            else:
                cdof_dot[da] = maths.motion_cross(v, d.cdof[da])
                v = v + d.cdof[da] * d.qvel[da]
        cvel.append(v)
    cvel = jnp.stack(cvel)
    cdof_dot = (
        jnp.stack(cdof_dot) if m.nv else jnp.zeros((0, 6), dtype)
    )
    return replace(d, cvel=cvel, cdof_dot=cdof_dot)


def maximal_coordinates(m: Model, d: Data) -> Data:
    """brax-style x/xd views consumed by the task environments.

    x.pos/x.rot are body frames (world excluded); xd is the world-frame
    velocity of each body-frame origin. Mirrors brax's mjx pipeline
    post-processing that the reference reward stacks rely on.
    """
    root_com = d.subtree_com[jnp.asarray(m.body_rootid)[1:]]
    offset = d.xpos[1:] - root_com
    ang = d.cvel[1:, :3]
    vel = d.cvel[1:, 3:] + jnp.cross(ang, offset)
    return replace(
        d, x_pos=d.xpos[1:], x_rot=d.xquat[1:], xd_vel=vel, xd_ang=ang
    )
