"""Gait generation and frame-transform helpers.

Behavioral parity with the reference's dial_mpc/utils/function_utils.py:7-43
(clipped-cosine swing profile vmapped per leg; quaternion velocity frame
transforms), implemented on our own quaternion algebra instead of brax.math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dial_mpc_tpu.physics import maths


def global_to_body_velocity(v: jax.Array, q: jax.Array) -> jax.Array:
    """World-frame velocity -> body frame (rotate by q^-1)."""
    return maths.inv_rotate(v, q)


def body_to_global_velocity(v: jax.Array, q: jax.Array) -> jax.Array:
    """Body-frame velocity -> world frame (rotate by q)."""
    return maths.rotate(v, q)


def get_foot_step(duty_ratio, cadence, amplitude, phases, time):
    """Target foot heights: clipped-cosine swing profile per leg.

    Args mirror the reference (function_utils.py:19-43): duty_ratio is the
    fraction of the cycle on the ground, cadence in Hz, amplitude the swing
    apex height, phases the per-leg phase offsets in [0, 1).
    """

    def step_height(t, footphase, duty_ratio):
        angle = (t + jnp.pi - footphase) % (2 * jnp.pi) - jnp.pi
        angle = jnp.where(duty_ratio < 1, angle * 0.5 / (1 - duty_ratio), angle)
        clipped_angle = jnp.clip(angle, -jnp.pi / 2, jnp.pi / 2)
        value = jnp.where(duty_ratio < 1, jnp.cos(clipped_angle), 0)
        return jnp.where(jnp.abs(value) >= 1e-6, jnp.abs(value), 0.0)

    h_steps = amplitude * jax.vmap(step_height, in_axes=(None, 0, None))(
        time * 2 * jnp.pi * cadence + jnp.pi,
        2 * jnp.pi * phases,
        duty_ratio,
    )
    return h_steps
