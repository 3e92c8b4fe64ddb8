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


def _chol_solve_lanes(H, g, n, mask=None, perm=None):
    """Solve H x = g; H is a list-of-lists of (B,) lanes, g list of (B,).

    mask (optional): static bool[n][n] sparsity of H — ops on statically
    zero entries are skipped entirely. perm (optional): static elimination
    order (children-first for tree-structured mass matrices gives zero
    fill-in); the factorization runs on P H P^T and the result is
    un-permuted. Fill-in implied by the ordering is computed symbolically
    at trace time and only those entries are materialized.
    """
    if perm is None:
        perm = list(range(n))
    if mask is None:
        pat = [[True] * n for _ in range(n)]
        A = [[H[perm[i]][perm[j]] for j in range(n)] for i in range(n)]
    else:
        # permuted pattern + symbolic fill
        pat = [[bool(mask[perm[i]][perm[j]]) for j in range(n)] for i in range(n)]
        for j in range(n):
            below = [i for i in range(j + 1, n) if pat[i][j]]
            for a in range(len(below)):
                for b in range(a + 1, len(below)):
                    pat[below[b]][below[a]] = True
                    pat[below[a]][below[b]] = True
        A = [
            [
                H[perm[i]][perm[j]] if mask[perm[i]][perm[j]] else None
                for j in range(n)
            ]
            for i in range(n)
        ]
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = A[j][j]
        for k in range(j):
            if pat[j][k]:
                s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(jnp.maximum(s, 1e-12))
        L[j][j] = d
        inv = 1.0 / d
        for i in range(j + 1, n):
            if not pat[i][j]:
                continue
            s = A[i][j]  # None for pure fill-in entries (implicit zero)
            for k in range(j):
                if pat[i][k] and pat[j][k]:
                    t = L[i][k] * L[j][k]
                    s = -t if s is None else s - t
            if s is None:
                s = jnp.zeros_like(d)
            L[i][j] = s * inv
    y = []
    gp = [g[perm[i]] for i in range(n)]
    for i in range(n):
        s = gp[i]
        for k in range(i):
            if pat[i][k]:
                s = s - L[i][k] * y[k]
        y.append(s / L[i][i])
    xp = [None] * n
    for i in range(n - 1, -1, -1):
        s = y[i]
        for k in range(i + 1, n):
            if pat[k][i]:
                s = s - L[k][i] * xp[k]
        xp[i] = s / L[i][i]
    x = [None] * n
    for i in range(n):
        x[perm[i]] = xp[i]
    return x


def _is_z(e):
    """Static structural-zero marker (python scalar 0.0)."""
    return isinstance(e, (int, float)) and e == 0.0


def newton_solve_rows(rows_J, D, aref, fl, eta, Mrows, M_mask, qs, *, nv,
                      iterations, ls_iterations, tolerance, groups, impratio):
    """Sparse lane-level batched Newton solve.

    rows_J: list[nefc] of list[nv] — (B,) lane arrays, or python 0.0 for
    Jacobian entries that are statically zero (a contact row only touches
    the colliding bodies' kinematic chains; a joint-limit row touches one
    dof). D/aref/fl/eta: (nefc, B) stacked row quantities. Mrows: list[nv]
    of list[nv] lanes (symmetric, entries outside M_mask unread), M_mask:
    static bool[nv][nv] (None = dense). qs: list[nv] of (B,).

    All sparsity is STATIC (from the model's kinematic tree and contact
    pair table), so skipped entries cost nothing at runtime — the dense
    reference (and MJX, solver.py:121-184) does the full nv^2 work per
    iteration. The Cholesky eliminates children-first (reverse dof order),
    which for tree-structured patterns factorizes with zero fill-in.
    Returns (x list[nv], qfrc list[nv]) of (B,) lanes.
    """
    nefc = len(rows_J)
    sup = [[i for i in range(nv) if not _is_z(row[i])] for row in rows_J]
    if M_mask is None:
        M_mask = [[True] * nv for _ in range(nv)]
    Hmask = [[bool(M_mask[i][j]) for j in range(nv)] for i in range(nv)]
    for s_ in sup:
        for a in range(len(s_)):
            for b in range(a + 1):
                Hmask[s_[a]][s_[b]] = True
                Hmask[s_[b]][s_[a]] = True
    # middle-zone rank-1 terms span the union of the group's row supports
    gsup = {}
    for (row0, dim) in groups:
        u = sorted({i for r in range(row0, row0 + dim) for i in sup[r]})
        gsup[(row0, dim)] = u
        for a in range(len(u)):
            for b in range(a + 1):
                Hmask[u[a]][u[b]] = True
                Hmask[u[b]][u[a]] = True
    # (row, i<=j) -> rows contributing to H[i][j]
    pair_rows = {}
    for r, s_ in enumerate(sup):
        for a in range(len(s_)):
            for b in range(a + 1):
                pair_rows.setdefault((s_[a], s_[b]), []).append(r)
    perm = list(range(nv))[::-1]
    zero = jnp.zeros_like(qs[0])

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

    def matvec_M(v):  # list[nv] -> list[nv], static M sparsity honored
        out = []
        for i in range(nv):
            acc = None
            for j in range(nv):
                if M_mask[i][j]:
                    t = Mrows[i][j] * v[j]
                    acc = t if acc is None else acc + t
            out.append(zero if acc is None else acc)
        return out

    def J_apply(v):  # list[nv] -> (nefc, B), only static supports touched
        rows = []
        for r in range(nefc):
            acc = None
            for i in sup[r]:
                t = rows_J[r][i] * v[i]
                acc = t if acc is None else acc + t
            rows.append(zero if acc is None else acc)
        return jnp.stack(rows, axis=0)

    def JT_apply(w):  # (nefc, B) -> list[nv]
        acc = [None] * nv
        for r in range(nefc):
            wr = w[r]
            for i in sup[r]:
                t = rows_J[r][i] * wr
                acc[i] = t if acc[i] is None else acc[i] + t
        return [zero if a is None else a for a in acc]

    def vsum(a, b):  # sum_i a[i]*b[i] over dof lists
        s = a[0] * b[0]
        for i in range(1, nv):
            s = s + a[i] * b[i]
        return s

    # Incremental iteration state: jar = J x - aref, dx = x - qs and
    # Mdx = M dx are carried across iterations (jar_new = jar + alpha jv,
    # Mdx_new = Mdx + alpha Mp), eliminating the J x / M dx recomputations
    # the dense reference performs each iteration (solver.py:153-175).
    x = list(qs)
    dx = [zero] * nv
    Mdx = [zero] * nv
    jar = J_apply(x) - aref
    done = jnp.zeros(qs[0].shape, bool)

    for _ in range(iterations):
        force, cost_pen, quad_w, mids = terms(jar)
        prev_cost = 0.5 * vsum(dx, Mdx) + cost_pen
        jtf = JT_apply(force)
        grad = [Mdx[i] - jtf[i] for i in range(nv)]

        # masked lower-triangle Hessian assembly: H = M + J^T diag(w) J
        # plus middle-zone rank-1 terms, only on the static pattern
        Hrows = [[None] * nv for _ in range(nv)]
        for i in range(nv):
            for j in range(i + 1):
                acc = Mrows[i][j] if M_mask[i][j] else None
                for r in pair_rows.get((i, j), ()):
                    t = (quad_w[r] * rows_J[r][i]) * rows_J[r][j]
                    acc = t if acc is None else acc + t
                if acc is not None:
                    Hrows[i][j] = acc
                    Hrows[j][i] = acc
                elif Hmask[i][j]:
                    Hrows[i][j] = zero
                    Hrows[j][i] = zero
        for (k_mid, g, row0, dim) in mids:
            u = gsup[(row0, dim)]
            v = {}
            for i in u:
                acc = None
                for kk in range(dim):
                    e = rows_J[row0 + kk][i]
                    if _is_z(e):
                        continue
                    t = e * g[kk]
                    acc = t if acc is None else acc + t
                v[i] = zero if acc is None else acc
            for a in range(len(u)):
                for b in range(a + 1):
                    i, j = u[a], u[b]
                    h = Hrows[i][j] + k_mid * v[i] * v[j]
                    Hrows[i][j] = h
                    Hrows[j][i] = h

        p = _chol_solve_lanes(
            Hrows, [-grad[i] for i in range(nv)], nv, mask=Hmask, perm=perm
        )
        jv = J_apply(p)
        Mp = matvec_M(p)
        pMp = vsum(p, Mp)
        pMx = vsum(p, Mdx)

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

        jar_new = jar + alpha[None] * jv
        _, cost_new_pen, _, _ = terms(jar_new)
        dx_new = [dx[i] + alpha * p[i] for i in range(nv)]
        Mdx_new = [Mdx[i] + alpha * Mp[i] for i in range(nv)]
        new_cost = 0.5 * vsum(dx_new, Mdx_new) + cost_new_pen

        improved = (prev_cost - new_cost) > tolerance * jnp.maximum(prev_cost, 1.0)
        take = jnp.logical_and(jnp.logical_not(done), new_cost < prev_cost)
        x = [jnp.where(take, x[i] + alpha * p[i], x[i]) for i in range(nv)]
        dx = [jnp.where(take, dx_new[i], dx[i]) for i in range(nv)]
        Mdx = [jnp.where(take, Mdx_new[i], Mdx[i]) for i in range(nv)]
        jar = jnp.where(take[None], jar_new, jar)
        done = jnp.logical_or(done, jnp.logical_not(improved))

    force, _, _, _ = terms(jar)
    return x, JT_apply(force)


def newton_solve(J, Jc, D, aref, fl, eta, M, qs, *, nv, nefc,
                 iterations, ls_iterations, tolerance, groups, impratio):
    """Dense-array adapter (standalone solver kernel): J (nefc, nv, B),
    Jc (nv, nefc, B), M (nv, nv, B), vectors (n, B) -> ((nv, B), (nv, B)).
    """
    rows_J = [[J[r, i] for i in range(nv)] for r in range(nefc)]
    Mrows = [[M[i, j] for j in range(nv)] for i in range(nv)]
    qs_l = [qs[i] for i in range(nv)]
    x, f = newton_solve_rows(
        rows_J, D, aref, fl, eta, Mrows, None, qs_l,
        nv=nv, iterations=iterations, ls_iterations=ls_iterations,
        tolerance=tolerance, groups=groups, impratio=impratio,
    )
    return jnp.stack(x, axis=0), jnp.stack(f, axis=0)


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
