"""Top-level forward dynamics and integration (mj_forward / mj_step)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dial_mpc_tpu.physics import collision, constraint, kinematics, smooth, solver
from dial_mpc_tpu.physics import linalg, maths
from dial_mpc_tpu.physics.kinematics import replace
from dial_mpc_tpu.physics.model import Data, Model, DSBL_EULERDAMP

FREE, BALL, SLIDE, HINGE = 0, 1, 2, 3


def fwd_position(m: Model, d: Data) -> Data:
    d = kinematics.kinematics(m, d)
    d = kinematics.com_pos(m, d)
    d = collision.collide(m, d)
    d = smooth.crb(m, d)
    return d


def fwd_velocity(m: Model, d: Data) -> Data:
    d = kinematics.com_vel(m, d)
    d = smooth.rne(m, d)
    d = smooth.passive(m, d)
    return d


def forward(m: Model, d: Data) -> Data:
    """Full forward dynamics: populates qacc and all derived fields."""
    d = fwd_position(m, d)
    d = fwd_velocity(m, d)
    d = smooth.actuation(m, d)
    d = smooth.fwd_smooth(m, d)
    d = constraint.make_constraint(m, d)
    d = solver.solve(m, d)
    d = kinematics.maximal_coordinates(m, d)
    return d


def _integrate_qpos(m: Model, qpos: jax.Array, qvel: jax.Array, dt) -> jax.Array:
    """Position integration respecting quaternion manifolds (mj_integratePos)."""
    out = qpos
    for j in range(m.njnt):
        jt = m.jnt_type[j]
        qadr = m.jnt_qposadr[j]
        dadr = m.jnt_dofadr[j]
        if jt == FREE:
            out = out.at[qadr : qadr + 3].add(dt * qvel[dadr : dadr + 3])
            quat = maths.quat_integrate(
                qpos[qadr + 3 : qadr + 7], qvel[dadr + 3 : dadr + 6], dt
            )
            out = out.at[qadr + 3 : qadr + 7].set(quat)
        else:  # SLIDE / HINGE
            out = out.at[qadr].add(dt * qvel[dadr])
    return out


def _euler_damp_qacc(m: Model, d: Data) -> jax.Array:
    """Implicit joint damping: solve (M + h*diag(B)) x = qfrc_total.

    Matches mj_Euler's eulerdamp path (used by the Allegro model, where
    eulerdamp is enabled; Go2/H1 disable it via <flag eulerdamp="disable">).
    """
    h = m.opt.timestep
    MhB = d.qM + h * jnp.diag(m.dof_damping)
    qfrc = d.qfrc_smooth + d.qfrc_constraint
    return linalg.solve_pd(MhB, qfrc)


def step(m: Model, d: Data) -> Data:
    """One Euler step: forward dynamics then semi-implicit integration."""
    d = forward(m, d)
    h = m.opt.timestep.astype(d.qpos.dtype)

    # static decision: the model either enables eulerdamp or not
    if not (m.opt.disableflags & DSBL_EULERDAMP):
        qacc = _euler_damp_qacc(m, d)
    else:
        qacc = d.qacc

    qvel = d.qvel + h * qacc
    qpos = _integrate_qpos(m, d.qpos, qvel, h)
    return replace(d, qpos=qpos, qvel=qvel, time=d.time + h)
