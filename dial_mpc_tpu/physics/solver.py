"""Newton constraint solver (MuJoCo soft-constraint optimization).

Solves  min_x 0.5 (x - a_s)' M (x - a_s) + sum_i s_i(J_i x - aref_i)
with per-row penalties:
  - unilateral rows (limits, pyramidal facets, frictionless contacts):
    quadratic when jar < 0;
  - dof-friction rows: Huber-shaped (clamped to +/- frictionloss);
  - elliptic contact groups (cone == 1): three-zone cone penalty per
    contact. Zone structure and constants were verified row-for-row
    against CPU MuJoCo forces:
      u_i = eta_i * jar_i (friction rows), U = ||u||, N = jar_normal
      top zone    (N >= U):               force 0, cost 0
      bottom zone (N <= -(ir/mu^2) U):    force -D_i jar_i (per row)
      middle zone:                        f_n = k (U - N),
                                          f_i = -k (U - N) eta_i u_i / U
      with k = 1 / (R_n + mu^2 R_t) and ir = opt.impratio. The cost whose
      negative gradient is this force is 0 / 0.5 sum D_i jar_i^2 /
      0.5 k (U - N)^2 per zone (C1-continuous at both boundaries).

Dense Hessian with the fully-unrolled Cholesky from physics.linalg:
nv <= ~26, so under vmap the factorizations are pure fused elementwise
work over the sample batch; iteration counts are static for a fixed
compiled schedule.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dial_mpc_tpu.physics import linalg
from dial_mpc_tpu.physics.constraint import elliptic_groups
from dial_mpc_tpu.physics.kinematics import replace
from dial_mpc_tpu.physics.model import Data, Model

_BIGR = 1e30


def _terms(m: Model, efc, jar):
    """Penalty terms at a given jar.

    Returns (force, cost, quad_w, mids) where:
      force:   (nefc,) constraint force per row,
      cost:    scalar penalty value,
      quad_w:  (nefc,) diagonal Hessian weights (simple rows + bottom-zone
               elliptic rows),
      mids:    list of (k_mid, g_rows, row0, dim) rank-1 middle-zone
               Gauss-Newton Hessian terms, k_mid masked by the zone flag.
    """
    groups = elliptic_groups(m)
    is_friction = efc.frictionloss > 0
    f_quad = -efc.D * jar
    f_uni = jnp.where(jar < 0, f_quad, 0.0)
    f_fri = jnp.clip(f_quad, -efc.frictionloss, efc.frictionloss)
    force = jnp.where(is_friction, f_fri, f_uni)
    quad_w = jnp.where(
        is_friction,
        (jnp.abs(f_quad) <= efc.frictionloss) * efc.D,
        (jar < 0) * efc.D,
    )
    quad = 0.5 * efc.D * jar * jar
    safe_d = jnp.maximum(efc.D, 1e-30)
    lin = efc.frictionloss * jnp.abs(jar) - 0.5 * efc.frictionloss**2 / safe_d
    in_quad = jnp.abs(efc.D * jar) <= efc.frictionloss
    cost_rows = jnp.where(
        is_friction,
        jnp.where(in_quad, quad, lin),
        jnp.where(jar < 0, quad, 0.0),
    )

    if not groups:
        return force, jnp.sum(cost_rows), quad_w, []

    # mask elliptic rows out of the simple-row treatment (static mask)
    simple = jnp.ones(efc.D.shape[0], bool)
    for (row0, dim) in groups:
        simple = simple.at[row0 : row0 + dim].set(False)
    force = jnp.where(simple, force, 0.0)
    quad_w = jnp.where(simple, quad_w, 0.0)
    cost = jnp.sum(jnp.where(simple, cost_rows, 0.0))

    ir = m.opt.impratio
    mids = []
    for (row0, dim) in groups:
        sl = slice(row0, row0 + dim)
        jr = jar[sl]
        D = efc.D[sl]
        eta = efc.eta[sl]  # eta[0] is 0 (normal row)
        mu = eta[1]  # tangent coefficient
        N = jr[0]
        u = eta[1:] * jr[1:]
        U = jnp.sqrt(jnp.sum(u * u) + 1e-30)
        Rn = jnp.where(D[0] > 0, 1.0 / jnp.maximum(D[0], 1e-30), _BIGR)
        Rt = jnp.where(D[1] > 0, 1.0 / jnp.maximum(D[1], 1e-30), _BIGR)
        k = 1.0 / (Rn + mu * mu * Rt)

        top = N >= U
        bottom = N <= -(ir / jnp.maximum(mu * mu, 1e-12)) * U
        middle = jnp.logical_not(top | bottom)

        f_bottom = -D * jr
        fn_mid = k * (U - N)
        f_mid = jnp.concatenate([fn_mid[None], -fn_mid * eta[1:] * u / U])
        f_g = jnp.where(top, 0.0, jnp.where(bottom, f_bottom, f_mid))
        force = force.at[sl].set(f_g)

        cost_bottom = 0.5 * jnp.sum(D * jr * jr)
        cost_mid = 0.5 * k * (U - N) ** 2
        cost = cost + jnp.where(
            top, 0.0, jnp.where(bottom, cost_bottom, cost_mid)
        )

        quad_w = quad_w.at[sl].set(jnp.where(bottom, D, 0.0))
        # middle-zone Gauss-Newton direction g = grad(U - N) over group rows
        g = jnp.concatenate([-jnp.ones(1, jar.dtype), eta[1:] * u / U])
        mids.append((k * middle, g, row0, dim))

    return force, cost, quad_w, mids


def _solve_arrays(m: Model, J, D, aref, fl, eta, M, qacc_smooth):
    """Unbatched Newton solve on raw arrays -> (qacc, qfrc_constraint)."""
    from dial_mpc_tpu.physics.constraint import Efc

    efc = Efc(J=J, D=D, aref=aref, pos=jnp.zeros_like(D), frictionloss=fl, eta=eta)

    def total_cost(x, jar):
        gauss = 0.5 * (x - qacc_smooth) @ (M @ (x - qacc_smooth))
        _, cost, _, _ = _terms(m, efc, jar)
        return gauss + cost

    def linesearch(p, x, jar, jv):
        pMp = p @ (M @ p)
        pMx = p @ (M @ (x - qacc_smooth))

        def dphi_ddphi(alpha):
            jar_a = jar + alpha * jv
            force, _, quad_w, mids = _terms(m, efc, jar_a)
            dphi = pMx + alpha * pMp - jnp.sum(jv * force)
            ddphi = pMp + jnp.sum(quad_w * jv * jv)
            for (k_mid, g, row0, dim) in mids:
                gjv = jnp.sum(g * jv[row0 : row0 + dim])
                ddphi = ddphi + k_mid * gjv * gjv
            return dphi, ddphi

        dp, ddp = dphi_ddphi(0.0)
        alpha = -dp / jnp.maximum(ddp, 1e-30)
        for _ in range(max(m.opt.ls_iterations - 1, 0)):
            dp, ddp = dphi_ddphi(alpha)
            alpha = alpha - dp / jnp.maximum(ddp, 1e-30)
        return alpha

    def body(carry, _):
        x, done = carry
        jar = efc.J @ x - efc.aref
        force, _, quad_w, mids = _terms(m, efc, jar)
        grad = M @ (x - qacc_smooth) - efc.J.T @ force
        DJ = quad_w[:, None] * efc.J
        H = M + efc.J.T @ DJ
        for (k_mid, g, row0, dim) in mids:
            v = efc.J[row0 : row0 + dim].T @ g  # (nv,)
            H = H + k_mid * jnp.outer(v, v)
        p = -linalg.solve_pd(H, grad)
        jv = efc.J @ p
        alpha = linesearch(p, x, jar, jv)
        x_new = x + alpha * p
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
    force, _, _, _ = _terms(m, efc, jar)
    return x, efc.J.T @ force


_CORE_CACHE: dict = {}


def _core_for(m: Model, nefc: int):
    """custom_vmap-wrapped solver core: scalar calls use the reference XLA
    path; vmapped calls (the planner's sample batch) dispatch to the Pallas
    lane-major kernel."""
    key = (
        m.pair_table,
        m.nv,
        nefc,
        m.opt.iterations,
        m.opt.ls_iterations,
        m.opt.cone,
        m.opt.disableflags,
        float(m.opt.tolerance),
        m.jnt_type,
        m.dof_frictionloss_static,
    )
    if key in _CORE_CACHE:
        return _CORE_CACHE[key]

    from dial_mpc_tpu.physics import solver_pallas

    @jax.custom_batching.custom_vmap
    def core(J, D, aref, fl, eta, M, qs):
        return _solve_arrays(m, J, D, aref, fl, eta, M, qs)

    @core.def_vmap
    def _core_vmap(axis_size, in_batched, *args):
        args = [
            a if b else jnp.broadcast_to(a, (axis_size,) + a.shape)
            for a, b in zip(args, in_batched)
        ]
        if solver_pallas.enabled():
            out = solver_pallas.solve_batched(m, *args)
        else:
            out = jax.vmap(lambda *a: _solve_arrays(m, *a))(*args)
        return out, (True, True)

    _CORE_CACHE[key] = core
    return core


def solve(m: Model, d: Data) -> Data:
    efc = d.efc
    if efc.J.shape[0] == 0:
        return replace(
            d,
            qacc=d.qacc_smooth,
            qfrc_constraint=jnp.zeros_like(d.qacc_smooth),
        )
    core = _core_for(m, efc.J.shape[0])
    x, qfrc_constraint = core(
        efc.J, efc.D, efc.aref, efc.frictionloss, efc.eta, d.qM, d.qacc_smooth
    )
    return replace(d, qacc=x, qfrc_constraint=qfrc_constraint, efc=efc)
