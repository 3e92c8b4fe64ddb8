"""Unrolled small-matrix linear algebra for batched TPU execution.

XLA's generic ``jax.scipy.linalg.cholesky`` / ``solve_triangular`` lower to
blocked LAPACK-style loops that serialize badly for batches of tiny
matrices (nv <= ~26 here) — profiling the Go2 pipeline at batch 2048 on a
v5e chip showed the mass-matrix factorization and the constraint-solver
Hessian solve dominating the step (~10 ms each standalone).

Since n is a static Python int, we unroll the factorization and the
triangular substitutions completely: every intermediate is one elementwise
op over the batch, which XLA fuses into a handful of VPU kernels with the
batch on the vector lanes. No while loops, no dynamic slicing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def cholesky(A: jax.Array) -> jax.Array:
    """Lower Cholesky factor of SPD A (..., n, n), fully unrolled."""
    n = A.shape[-1]
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = A[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(jnp.maximum(s, _EPS))
        L[j][j] = d
        inv = 1.0 / d
        for i in range(j + 1, n):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv
    rows = []
    zeros = jnp.zeros_like(A[..., 0, 0])
    for i in range(n):
        rows.append(
            jnp.stack([L[i][j] if j <= i else zeros for j in range(n)], axis=-1)
        )
    return jnp.stack(rows, axis=-2)


def solve_lower(L: jax.Array, b: jax.Array) -> jax.Array:
    """Solve L y = b with L lower-triangular (..., n, n), b (..., n)."""
    n = L.shape[-1]
    y = []
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[..., i, k] * y[k]
        y.append(s / L[..., i, i])
    return jnp.stack(y, axis=-1)


def solve_upper_t(L: jax.Array, b: jax.Array) -> jax.Array:
    """Solve L^T x = b with L lower-triangular (..., n, n), b (..., n)."""
    n = L.shape[-1]
    x = [None] * n
    for i in range(n - 1, -1, -1):
        s = b[..., i]
        for k in range(i + 1, n):
            s = s - L[..., k, i] * x[k]
        x[i] = s / L[..., i, i]
    return jnp.stack(x, axis=-1)


def cho_solve(L: jax.Array, b: jax.Array) -> jax.Array:
    """Solve A x = b given the lower Cholesky factor of A."""
    return solve_upper_t(L, solve_lower(L, b))


def solve_pd(A: jax.Array, b: jax.Array) -> jax.Array:
    """Solve SPD A x = b via the unrolled factorization."""
    return cho_solve(cholesky(A), b)
