"""Pallas TPU kernel for the batched Newton constraint solver.

Profiling the Go2 pipeline at batch 2048 showed the XLA solver loop taking
~57% of the physics step: the unrolled small-matrix algebra materializes
hundreds of f32[B] intermediates in HBM between fusions. This kernel runs
the ENTIRE Newton solve — jar, penalty forces, gradient, Hessian assembly,
unrolled Cholesky, line search, iteration freeze — inside VMEM for a block
of samples, with the sample axis on the vector lanes:

  layout: J (nefc, nv, B), M (nv, nv, B), vectors (n, B); block = 128
  samples on the minor-most (lane) dimension. Every op in the kernel is an
  (rows, 128) VPU op at full lane utilization; HBM traffic is one read of
  J/M/vectors and one write of the result per sample.

The kernel is generated per model (nv, nefc, solver schedule and elliptic
group structure are static). It is wired into physics.solver via
jax.custom_batching.custom_vmap: the scalar path keeps the reference XLA
implementation; a vmapped call (the planner's sample batch) dispatches to
this kernel on TPU backends.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

BLOCK = 128


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def enabled() -> bool:
    return os.environ.get("DIAL_MPC_PALLAS", "1") != "0"


def _chol_solve_lanes(H, g, n):
    """Solve H x = g; H is a list-of-lists of (B,) lanes, g list of (B,)."""
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = H[j][j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(jnp.maximum(s, 1e-12))
        L[j][j] = d
        inv = 1.0 / d
        for i in range(j + 1, n):
            s = H[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv
    y = []
    for i in range(n):
        s = g[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y.append(s / L[i][i])
    x = [None] * n
    for i in range(n - 1, -1, -1):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return x


def newton_solve(J, Jc, D, aref, fl, eta, M, qs, *, nv, nefc,
                 iterations, ls_iterations, tolerance, groups, impratio):
    """In-kernel batched Newton solve on lane-major values.

    J (nefc, nv, B), Jc (nv, nefc, B), vectors (n, B). Returns
    (x (nv, B), qfrc (nv, B)). Shared by the standalone solver kernel and
    the full-step engine kernel.
    """

    def _set_rows(arr, row0, dim, new):
        # jnp's .at[slice].set lowers to lax.scatter, which Mosaic cannot
        # compile; concatenation of static slices lowers cleanly. Skip
        # zero-sized edge pieces (invalid vector types in Mosaic).
        parts = []
        if row0 > 0:
            parts.append(arr[:row0])
        parts.append(new)
        if row0 + dim < arr.shape[0]:
            parts.append(arr[row0 + dim :])
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)

    def terms(jar):
        is_fr = fl > 0
        f_quad = -D * jar
        f_uni = jnp.where(jar < 0, f_quad, 0.0)
        f_fri = jnp.clip(f_quad, -fl, fl)
        force = jnp.where(is_fr, f_fri, f_uni)
        quad_w = jnp.where(is_fr, (jnp.abs(f_quad) <= fl) * D, (jar < 0) * D)
        quad = 0.5 * D * jar * jar
        lin = fl * jnp.abs(jar) - 0.5 * fl * fl / jnp.maximum(D, 1e-30)
        cost_rows = jnp.where(
            is_fr,
            jnp.where(jnp.abs(D * jar) <= fl, quad, lin),
            jnp.where(jar < 0, quad, 0.0),
        )
        for (row0, dim) in groups:
            cost_rows = _set_rows(
                cost_rows, row0, dim, jnp.zeros_like(cost_rows[row0 : row0 + dim])
            )
        cost = jnp.sum(cost_rows, axis=0)  # (B,)

        mids = []
        for (row0, dim) in groups:
            jr = jar[row0 : row0 + dim]
            Dg = D[row0 : row0 + dim]
            et = eta[row0 : row0 + dim]
            mu = et[1]
            N = jr[0]
            u = et[1:] * jr[1:]
            usq = u[0] * u[0]
            for kk in range(1, dim - 1):
                usq = usq + u[kk] * u[kk]
            U = jnp.sqrt(usq + 1e-30)
            Rn = jnp.where(Dg[0] > 0, 1.0 / jnp.maximum(Dg[0], 1e-30), 1e30)
            Rt = jnp.where(Dg[1] > 0, 1.0 / jnp.maximum(Dg[1], 1e-30), 1e30)
            k = 1.0 / (Rn + mu * mu * Rt)
            top = N >= U
            bottom = N <= -(impratio / jnp.maximum(mu * mu, 1e-12)) * U
            fn_mid = k * (U - N)
            f_mid = jnp.concatenate(
                [fn_mid[None], -fn_mid * et[1:] * u / U], axis=0
            )
            f_bot = -Dg * jr
            f_g = jnp.where(top, 0.0, jnp.where(bottom, f_bot, f_mid))
            force = _set_rows(force, row0, dim, f_g)
            cb = Dg[0] * jr[0] * jr[0]
            for kk in range(1, dim):
                cb = cb + Dg[kk] * jr[kk] * jr[kk]
            cost_b = 0.5 * cb
            cost_m = 0.5 * k * (U - N) ** 2
            cost = cost + jnp.where(top, 0.0, jnp.where(bottom, cost_b, cost_m))
            quad_w = _set_rows(
                quad_w, row0, dim, jnp.where(bottom, Dg, jnp.zeros_like(Dg))
            )
            middle = jnp.logical_not(top | bottom)
            g = jnp.concatenate(
                [-jnp.ones_like(N)[None], et[1:] * u / U], axis=0
            )
            mids.append((k * middle, g, row0, dim))
        return force, cost, quad_w, mids

    def matvec_M(v):  # (nv, B) -> (nv, B)
        return jnp.stack([jnp.sum(M[i] * v, axis=0) for i in range(nv)], axis=0)

    def J_apply(v):  # (nv, B) -> (nefc, B)
        acc = J[:, 0, :] * v[0][None]
        for j in range(1, nv):
            acc = acc + J[:, j, :] * v[j][None]
        return acc

    def JT_apply(w):  # (nefc, B) -> (nv, B)
        return jnp.stack([jnp.sum(Jc[i] * w, axis=0) for i in range(nv)], axis=0)

    def total_cost(x, jar):
        dx = x - qs
        gauss = 0.5 * jnp.sum(dx * matvec_M(dx), axis=0)
        _, cost, _, _ = terms(jar)
        return gauss + cost

    x = qs
    done = jnp.zeros(x.shape[-1], bool)
    for _ in range(iterations):
        jar = J_apply(x) - aref
        force, _, quad_w, mids = terms(jar)
        grad = matvec_M(x - qs) - JT_apply(force)
        Hrows = [
            [
                M[i, j] + jnp.sum((quad_w * Jc[i]) * Jc[j], axis=0)
                for j in range(nv)
            ]
            for i in range(nv)
        ]
        for (k_mid, g, row0, dim) in mids:
            v = [
                sum(Jc[i][row0 + kk] * g[kk] for kk in range(dim))
                for i in range(nv)
            ]
            for i in range(nv):
                for j in range(nv):
                    Hrows[i][j] = Hrows[i][j] + k_mid * v[i] * v[j]
        p = _chol_solve_lanes(Hrows, [-grad[i] for i in range(nv)], nv)
        p = jnp.stack(p, axis=0)  # (nv, B)
        jv = J_apply(p)

        pMp = jnp.sum(p * matvec_M(p), axis=0)
        pMx = jnp.sum(p * matvec_M(x - qs), axis=0)

        def dphi_ddphi(alpha):
            jar_a = jar + alpha * jv
            force_a, _, quad_a, mids_a = terms(jar_a)
            dphi = pMx + alpha * pMp - jnp.sum(jv * force_a, axis=0)
            ddphi = pMp + jnp.sum(quad_a * jv * jv, axis=0)
            for (k_mid, g, row0, dim) in mids_a:
                gjv = sum(g[kk] * jv[row0 + kk] for kk in range(dim))
                ddphi = ddphi + k_mid * gjv * gjv
            return dphi, ddphi

        dp, ddp = dphi_ddphi(jnp.zeros_like(pMp))
        alpha = -dp / jnp.maximum(ddp, 1e-30)
        for _ in range(max(ls_iterations - 1, 0)):
            dp, ddp = dphi_ddphi(alpha)
            alpha = alpha - dp / jnp.maximum(ddp, 1e-30)

        x_new = x + alpha[None] * p
        prev_cost = total_cost(x, jar)
        new_cost = total_cost(x_new, J_apply(x_new) - aref)
        improved = (prev_cost - new_cost) > tolerance * jnp.maximum(prev_cost, 1.0)
        take = jnp.logical_and(jnp.logical_not(done), new_cost < prev_cost)
        x = jnp.where(take[None], x_new, x)
        done = jnp.logical_or(done, jnp.logical_not(improved))

    jar = J_apply(x) - aref
    force, _, _, _ = terms(jar)
    return x, JT_apply(force)


def _make_kernel(nv, nefc, iterations, ls_iterations, tolerance, groups, impratio):
    """Thin ref-level wrapper around newton_solve for the standalone kernel."""

    def kernel(J_ref, Jc_ref, D_ref, aref_ref, fl_ref, eta_ref, M_ref, qs_ref,
               x_ref, f_ref):
        x, f = newton_solve(
            J_ref[...], Jc_ref[...], D_ref[...], aref_ref[...], fl_ref[...],
            eta_ref[...], M_ref[...], qs_ref[...],
            nv=nv, nefc=nefc, iterations=iterations,
            ls_iterations=ls_iterations, tolerance=tolerance,
            groups=groups, impratio=impratio,
        )
        x_ref[...] = x
        f_ref[...] = f

    return kernel


@functools.lru_cache(maxsize=32)
def _build(nv, nefc, iterations, ls_iterations, tolerance, groups, impratio):
    kernel = _make_kernel(
        nv, nefc, iterations, ls_iterations, tolerance, groups, impratio
    )

    def batched(J, D, aref, fl, eta, M, qs):
        """Inputs batched on axis 0: J (B, nefc, nv), M (B, nv, nv), ..."""
        B = J.shape[0]
        Bp = ((B + BLOCK - 1) // BLOCK) * BLOCK
        pad = Bp - B

        def prep(x, move):
            if pad:
                x = jnp.concatenate(
                    [x, jnp.broadcast_to(x[-1:], (pad,) + x.shape[1:])], axis=0
                )
            return jnp.moveaxis(x, 0, -1) if move else x

        Jt = prep(J, True)  # (nefc, nv, Bp)
        Jct = prep(jnp.swapaxes(J, -1, -2), True)  # (nv, nefc, Bp)
        Mt = prep(M, True)  # (nv, nv, Bp)
        Dt, at, flt, et = (prep(v, True) for v in (D, aref, fl, eta))
        qst = prep(qs, True)
        # pad M of the replicated tail is still SPD — safe to factorize

        grid = (Bp // BLOCK,)
        bspec = lambda *shape: pl.BlockSpec(
            shape + (BLOCK,), lambda i: (0,) * len(shape) + (i,)
        )
        x_t, f_t = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                bspec(nefc, nv),
                bspec(nv, nefc),
                bspec(nefc),
                bspec(nefc),
                bspec(nefc),
                bspec(nefc),
                bspec(nv, nv),
                bspec(nv),
            ],
            out_specs=[bspec(nv), bspec(nv)],
            out_shape=[
                jax.ShapeDtypeStruct((nv, Bp), J.dtype),
                jax.ShapeDtypeStruct((nv, Bp), J.dtype),
            ],
            interpret=_use_interpret(),
        )(Jt, Jct, Dt, at, flt, et, Mt, qst)
        x = jnp.moveaxis(x_t, -1, 0)[:B]
        f = jnp.moveaxis(f_t, -1, 0)[:B]
        return x, f

    return batched


def solve_batched(m, J, D, aref, fl, eta, M, qs):
    """Batched Newton solve via the Pallas kernel (axis 0 = samples)."""
    from dial_mpc_tpu.physics.constraint import elliptic_groups

    fn = _build(
        m.nv,
        J.shape[-2],
        m.opt.iterations,
        m.opt.ls_iterations,
        float(m.opt.tolerance),
        tuple(elliptic_groups(m)),
        float(np.asarray(jax.device_get(m.opt.impratio))),
    )
    return fn(J, D, aref, fl, eta, M, qs)
