"""Spline module: interpolation exactness, smoothness, round-trips, shift."""

import jax.numpy as jnp
import numpy as np
import pytest

from dial_mpc_tpu.utils.spline import FixedSpline, interp_matrix


def test_interpolates_data_sites():
    x = np.linspace(0, 0.32, 5)
    S = interp_matrix(x, x)
    np.testing.assert_allclose(S, np.eye(5), atol=1e-12)


def test_reproduces_quadratics_exactly():
    """A quadratic spline with not-a-knot closure is exact for quadratics."""
    x = np.linspace(0, 1, 6)
    xq = np.linspace(-0.1, 1.1, 50)  # includes extrapolation
    S = interp_matrix(x, xq)
    for coeffs in [(1.0, 0.0, 0.0), (0.3, -2.0, 1.5), (0.0, 1.0, -0.7)]:
        a, b, c = coeffs
        y = a * x**2 + b * x + c
        yq = a * xq**2 + b * xq + c
        np.testing.assert_allclose(S @ y, yq, atol=1e-9)


def test_c1_continuity():
    rng = np.random.default_rng(0)
    x = np.linspace(0, 1, 7)
    y = rng.normal(size=7)
    eps = 1e-7
    for xi in x[1:-1]:
        left = interp_matrix(x, np.array([xi - eps])) @ y
        right = interp_matrix(x, np.array([xi + eps])) @ y
        dl = (interp_matrix(x, np.array([xi])) @ y - left) / eps
        dr = (right - interp_matrix(x, np.array([xi])) @ y) / eps
        np.testing.assert_allclose(left, right, atol=1e-5)
        np.testing.assert_allclose(dl, dr, atol=1e-4)


@pytest.mark.parametrize("n", [3, 5, 7, 17])
def test_matches_scipy_exactly(n):
    """Our FITPACK-knot construction reproduces scipy k=2 everywhere,
    including edges and out-of-range extrapolation."""
    scipy_interp = pytest.importorskip("scipy.interpolate")
    x = np.linspace(0, 0.32, n)
    rng = np.random.default_rng(1)
    y = rng.normal(size=n)
    xq = np.linspace(-0.05, 0.37, 41)  # spans extrapolation on both sides
    ours = interp_matrix(x, xq) @ y
    sp = scipy_interp.InterpolatedUnivariateSpline(x, y, k=2)(xq)
    np.testing.assert_allclose(ours, sp, atol=1e-8)


def test_shift_matches_scipy():
    scipy_interp = pytest.importorskip("scipy.interpolate")
    import jax.numpy as jnp

    step_nodes = np.linspace(0, 0.32, 5)
    sp = FixedSpline(step_nodes, step_nodes, dtype=jnp.float64)
    rng = np.random.default_rng(6)
    Y = rng.normal(size=(5, 2))
    for dt in [0.0, 0.013, 0.05, -0.02, 0.1]:
        got = sp.shift(jnp.asarray(Y), dt)
        for u in range(2):
            ref = scipy_interp.InterpolatedUnivariateSpline(
                step_nodes, Y[:, u], k=2
            )(step_nodes + dt)
            np.testing.assert_allclose(got[:, u], ref, atol=1e-8)


def test_fixed_spline_round_trip():
    """node -> dense -> node recovers the nodes for the DIAL grids."""
    Hsample, Hnode, nu = 16, 4, 12
    step_us = np.linspace(0, 0.02 * Hsample, Hsample + 1)
    step_nodes = np.linspace(0, 0.02 * Hsample, Hnode + 1)
    n2u = FixedSpline(step_nodes, step_us, dtype=jnp.float64)
    u2n = FixedSpline(step_us, step_nodes, dtype=jnp.float64)
    rng = np.random.default_rng(2)
    Y = jnp.asarray(rng.normal(size=(Hnode + 1, nu)))
    Y2 = u2n.apply(n2u.apply(Y))
    np.testing.assert_allclose(Y2, Y, atol=1e-9)


def test_fixed_spline_batched_matches_single():
    step_us = np.linspace(0, 0.32, 17)
    step_nodes = np.linspace(0, 0.32, 5)
    n2u = FixedSpline(step_nodes, step_us, dtype=jnp.float64)
    rng = np.random.default_rng(3)
    Y = jnp.asarray(rng.normal(size=(8, 5, 3)))
    batched = n2u.apply(Y)
    for i in range(8):
        np.testing.assert_allclose(batched[i], n2u.apply(Y[i]), atol=1e-12)


def test_shift_zero_is_identity():
    step_nodes = np.linspace(0, 0.32, 5)
    sp = FixedSpline(step_nodes, step_nodes, dtype=jnp.float64)
    rng = np.random.default_rng(4)
    Y = jnp.asarray(rng.normal(size=(5, 2)))
    np.testing.assert_allclose(sp.shift(Y, 0.0), Y, atol=1e-12)


def test_shift_matches_static_evaluation():
    """shift(Y, dt) == evaluating the fitted spline at grid+dt."""
    step_nodes = np.linspace(0, 0.32, 5)
    sp = FixedSpline(step_nodes, step_nodes, dtype=jnp.float64)
    rng = np.random.default_rng(5)
    Y = jnp.asarray(rng.normal(size=(5, 2)))
    for dt in [0.013, 0.05, -0.02, 0.1]:
        expected = interp_matrix(step_nodes, step_nodes + dt) @ np.asarray(Y)
        np.testing.assert_allclose(sp.shift(Y, dt), expected, atol=1e-9)
