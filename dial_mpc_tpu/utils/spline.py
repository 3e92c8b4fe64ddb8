"""Fixed-knot quadratic interpolating splines as precomputed linear maps.

The reference obtains its node<->dense-control transforms by constructing a
jax_cosmo ``InterpolatedUnivariateSpline(k=2)`` inside jit on every call
(reference: dial_mpc/core/dial_core.py:91-101) — re-solving the same banded
system for every sample, every diffusion level.

TPU-first redesign: spline *fitting* and *evaluation at fixed queries* are
both linear in the data values, so for the fixed time grids used everywhere
in DIAL-MPC the whole transform collapses to one precomputed matrix:

    u = node2u_mat @ nodes        # (Hsample+1, Hnode+1) @ (Hnode+1, nu)

Batched over thousands of samples this is a single GEMM on the MXU instead
of per-call banded solves. The dynamic-shift path (evaluation at runtime
query points, needed by the async planner's wall-clock resampling,
reference: dial_mpc/deploy/dial_plan.py:136-139) keeps the precomputed
slope map and does a static-shape interval search.

Spline semantics: C1 piecewise-quadratic through the data with knots at the
data sites. Slopes s solve  s[i] + s[i+1] = 2*(y[i+1]-y[i])/h[i]  plus a
not-a-knot closure (equal curvature on the first two intervals), matching
the jax_cosmo default (`endpoints="not-a-knot"`). Out-of-range queries
extrapolate the end polynomial pieces.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def slope_matrix(x: np.ndarray) -> np.ndarray:
    """K with s = K @ y: data values -> spline slopes at the data sites."""
    x = np.asarray(x, dtype=np.float64)
    n = x.shape[0]
    if n < 2:
        raise ValueError("need at least two data points")
    h = np.diff(x)
    if n == 2:  # degenerate: linear
        K = np.zeros((2, 2))
        K[:, 0] = -1.0 / h[0]
        K[:, 1] = 1.0 / h[0]
        return K
    A = np.zeros((n, n))
    B = np.zeros((n, n))
    for i in range(n - 1):
        A[i, i] = 1.0
        A[i, i + 1] = 1.0
        B[i, i] = -2.0 / h[i]
        B[i, i + 1] = 2.0 / h[i]
    # not-a-knot: (s[1]-s[0])/h[0] == (s[2]-s[1])/h[1]
    A[n - 1, 0] = 1.0 / h[0]
    A[n - 1, 1] = -(1.0 / h[0] + 1.0 / h[1])
    A[n - 1, 2] = 1.0 / h[1]
    return np.linalg.solve(A, B)


def interp_matrix(x: np.ndarray, xq: np.ndarray) -> np.ndarray:
    """S with S @ y = spline(xq): the full fit+eval linear map.

    On interval [x[i], x[i+1]]:
        y(t) = y[i] + s[i]*dt + (s[i+1]-s[i])/(2 h[i]) * dt^2,  dt = t - x[i]
    Queries outside the data range use the first/last interval's polynomial.
    """
    x = np.asarray(x, dtype=np.float64)
    xq = np.asarray(xq, dtype=np.float64)
    n = x.shape[0]
    h = np.diff(x)
    K = slope_matrix(x)
    S = np.zeros((xq.shape[0], n))
    for q, t in enumerate(xq):
        i = int(np.clip(np.searchsorted(x, t, side="right") - 1, 0, n - 2))
        dt = t - x[i]
        row = np.zeros(n)
        row[i] = 1.0
        row += dt * K[i]
        row += dt * dt / (2.0 * h[i]) * (K[i + 1] - K[i])
        S[q] = row
    return S


class FixedSpline:
    """Precomputed transforms on a fixed data grid.

    apply(Y): evaluate at the fixed query grid — one matmul, batched over
    any leading axes (samples) and trailing axes (action dims).
    shift(Y, dt): evaluate at (grid + dt) for a traced scalar dt — used by
    the async planner's wall-clock warm-start resampling.
    """

    def __init__(self, x_data, x_query, dtype=jnp.float32):
        self.x_data = np.asarray(x_data, dtype=np.float64)
        self.h = np.diff(self.x_data)
        self.matrix = jnp.asarray(interp_matrix(self.x_data, x_query), dtype=dtype)
        self.K = jnp.asarray(slope_matrix(self.x_data), dtype=dtype)
        self._x = jnp.asarray(self.x_data, dtype=dtype)
        self._h = jnp.asarray(self.h, dtype=dtype)

    def apply(self, Y: jax.Array) -> jax.Array:
        """(..., n_data, nu) -> (..., n_query, nu)."""
        return jnp.einsum("qn,...nu->...qu", self.matrix, Y)

    def shift(self, Y: jax.Array, dt) -> jax.Array:
        """Resample Y at (x_data + dt); dt may be a traced scalar.

        (n_data, nu) -> (n_data, nu). Matches evaluating the fitted spline
        at shifted sites (reference: dial_plan.py:136-139), extrapolating
        the end pieces for queries beyond the grid.
        """
        n = self.x_data.shape[0]
        s = self.K @ Y  # (n, nu) slopes
        tq = self._x + dt
        idx = jnp.clip(jnp.searchsorted(self._x, tq, side="right") - 1, 0, n - 2)
        d = tq - self._x[idx]  # (n,)
        y_i = Y[idx]
        s_i = s[idx]
        s_ip = s[idx + 1]
        h_i = self._h[idx]
        return (
            y_i
            + d[:, None] * s_i
            + (d * d / (2.0 * h_i))[:, None] * (s_ip - s_i)
        )
