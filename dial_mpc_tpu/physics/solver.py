"""Newton constraint solver (MuJoCo soft-constraint optimization).

Solves  min_x 0.5 (x - a_s)' M (x - a_s) + sum_i s_i(J_i x - aref_i)
with s_i quadratic-when-active for unilateral rows (limits, pyramid facets)
and Huber-shaped for dof-friction rows. Dense Hessian + Cholesky: nv <= ~30,
so under vmap the batched factorizations are small-matrix work that XLA
fuses well on TPU; iteration count is static (model.opt.iterations) for a
fixed compiled schedule.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dial_mpc_tpu.physics.kinematics import replace
from dial_mpc_tpu.physics.model import Data, Model


def _forces(efc, jar):
    """Constraint forces and quadratic-region mask for a given jar."""
    is_friction = efc.frictionloss > 0
    f_quad = -efc.D * jar
    # unilateral rows: force only when jar < 0
    f_uni = jnp.where(jar < 0, f_quad, 0.0)
    # friction rows: clamp to +/- frictionloss
    f_fri = jnp.clip(f_quad, -efc.frictionloss, efc.frictionloss)
    force = jnp.where(is_friction, f_fri, f_uni)
    quad_mask = jnp.where(
        is_friction,
        (jnp.abs(f_quad) <= efc.frictionloss).astype(jar.dtype),
        (jar < 0).astype(jar.dtype),
    )
    return force, quad_mask


def _cost(efc, jar):
    is_friction = efc.frictionloss > 0
    quad = 0.5 * efc.D * jar * jar
    # friction Huber branch: fl*|jar| - fl^2/(2 D); guard D=0 rows
    safe_d = jnp.maximum(efc.D, 1e-30)
    lin = efc.frictionloss * jnp.abs(jar) - 0.5 * efc.frictionloss**2 / safe_d
    in_quad = jnp.abs(efc.D * jar) <= efc.frictionloss
    cost_fri = jnp.where(in_quad, quad, lin)
    cost_uni = jnp.where(jar < 0, quad, 0.0)
    return jnp.sum(jnp.where(is_friction, cost_fri, cost_uni))


def _linesearch(m: Model, efc, M, p, x, qacc_smooth, jar, jv):
    """Exact-ish line search on the piecewise-quadratic 1D restriction.

    Newton iterations on phi'(alpha); ls_iterations is static so the whole
    search is an unrolled fixed-size computation.
    """
    pMp = p @ (M @ p)
    pMx = p @ (M @ (x - qacc_smooth))

    def dphi(alpha):
        jar_a = jar + alpha * jv
        force, _ = _forces(efc, jar_a)
        return pMx + alpha * pMp - jnp.sum(jv * force)

    def ddphi(alpha):
        jar_a = jar + alpha * jv
        _, quad_mask = _forces(efc, jar_a)
        return pMp + jnp.sum(quad_mask * efc.D * jv * jv)

    alpha = -dphi(0.0) / jnp.maximum(ddphi(0.0), 1e-30)
    for _ in range(max(m.opt.ls_iterations - 1, 0)):
        alpha = alpha - dphi(alpha) / jnp.maximum(ddphi(alpha), 1e-30)
    return alpha


def solve(m: Model, d: Data) -> Data:
    efc = d.efc
    M = d.qM
    qacc_smooth = d.qacc_smooth
    dtype = qacc_smooth.dtype

    if efc.J.shape[0] == 0:
        return replace(
            d,
            qacc=qacc_smooth,
            qfrc_constraint=jnp.zeros_like(qacc_smooth),
        )

    def total_cost(x, jar):
        gauss = 0.5 * (x - qacc_smooth) @ (M @ (x - qacc_smooth))
        return gauss + _cost(efc, jar)

    def body(carry, _):
        x, done = carry
        jar = efc.J @ x - efc.aref
        force, quad_mask = _forces(efc, jar)
        grad = M @ (x - qacc_smooth) - efc.J.T @ force
        # dense Hessian of the active quadratic region
        DJ = (quad_mask * efc.D)[:, None] * efc.J
        H = M + efc.J.T @ DJ
        L = jax.scipy.linalg.cholesky(H, lower=True)
        y = jax.scipy.linalg.solve_triangular(L, grad, lower=True)
        p = -jax.scipy.linalg.solve_triangular(L.T, y, lower=False)
        jv = efc.J @ p
        alpha = _linesearch(m, efc, M, p, x, qacc_smooth, jar, jv)
        x_new = x + alpha * p
        # improvement-based freeze (static schedule, masked updates)
        prev_cost = total_cost(x, jar)
        new_cost = total_cost(x_new, efc.J @ x_new - efc.aref)
        improved = (prev_cost - new_cost) > m.opt.tolerance * jnp.maximum(
            prev_cost, 1.0
        )
        take = jnp.logical_and(jnp.logical_not(done), new_cost < prev_cost)
        x = jnp.where(take, x_new, x)
        done = jnp.logical_or(done, jnp.logical_not(improved))
        return (x, done), None

    x0 = qacc_smooth
    (x, _), _ = jax.lax.scan(
        body, (x0, jnp.zeros((), bool)), None, length=m.opt.iterations
    )

    jar = efc.J @ x - efc.aref
    force, _ = _forces(efc, jar)
    qfrc_constraint = efc.J.T @ force
    return replace(d, qacc=x, qfrc_constraint=qfrc_constraint, efc=efc)
