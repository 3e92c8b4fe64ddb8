"""Quaternion / rotation / spatial-vector algebra (MuJoCo conventions).

Conventions:
  - quaternions are (w, x, y, z), normalized;
  - spatial (6D) motion/force vectors are ordered [angular(3); linear(3)];
  - rotation matrices are world_from_body.

Everything is written shape-polymorphic so the same code paths run under
``jax.vmap`` over the sample axis without modification.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quat_mul(u: jax.Array, v: jax.Array) -> jax.Array:
    """Hamilton product of two (w,x,y,z) quaternions."""
    return jnp.stack(
        [
            u[0] * v[0] - u[1] * v[1] - u[2] * v[2] - u[3] * v[3],
            u[0] * v[1] + u[1] * v[0] + u[2] * v[3] - u[3] * v[2],
            u[0] * v[2] - u[1] * v[3] + u[2] * v[0] + u[3] * v[1],
            u[0] * v[3] + u[1] * v[2] - u[2] * v[1] + u[3] * v[0],
        ],
        axis=-1,
    )


def quat_inv(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def normalize(v: jax.Array, axis: int = -1) -> jax.Array:
    norm = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return v / jnp.maximum(norm, 1e-15)


def rotate(v: jax.Array, q: jax.Array) -> jax.Array:
    """Rotate a 3-vector by a quaternion (world = q * body)."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    u = jnp.stack([x, y, z], axis=-1)
    uv = jnp.cross(u, v)
    uuv = jnp.cross(u, uv)
    return v + 2.0 * (w[..., None] * uv + uuv)


def inv_rotate(v: jax.Array, q: jax.Array) -> jax.Array:
    return rotate(v, quat_inv(q))


def quat_to_mat(q: jax.Array) -> jax.Array:
    """(w,x,y,z) quaternion -> 3x3 rotation matrix."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def axis_angle_to_quat(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """Unit axis + angle -> quaternion."""
    s, c = jnp.sin(angle * 0.5), jnp.cos(angle * 0.5)
    return jnp.concatenate([c[..., None], axis * s[..., None]], axis=-1)


def quat_integrate(q: jax.Array, omega_local: jax.Array, dt) -> jax.Array:
    """Integrate quaternion by body-frame angular velocity over dt.

    Matches mju_quatIntegrate: q' = q * exp(omega_local * dt / 2), normalized.
    """
    angle = jnp.linalg.norm(omega_local, axis=-1)
    # guard zero-angle (axis unused when angle==0 since sin(0)=0)
    axis = omega_local / jnp.maximum(angle, 1e-15)[..., None]
    dq = axis_angle_to_quat(axis, angle * dt)
    return normalize(quat_mul(q, dq))


def quat_to_euler(q: jax.Array) -> jax.Array:
    """Quaternion -> intrinsic z-y-x Euler (returned as [roll, pitch, yaw]).

    Matches brax.math.quat_to_euler used by the reference reward stacks
    (reference: dial_mpc/envs/unitree_go2_env.py:202).
    """
    w, x, y, z = q[0], q[1], q[2], q[3]
    roll = jnp.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    pitch = jnp.arcsin(jnp.clip(2 * (w * y - z * x), -1.0, 1.0))
    yaw = jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    return jnp.stack([roll, pitch, yaw], axis=-1)


def euler_to_quat(v: jax.Array) -> jax.Array:
    """Intrinsic z-y-x Euler angles *in degrees* -> quaternion.

    Mirrors brax.math.euler_to_quat (degrees input), used by the reference
    jumping-sequence generator (unitree_go2_env.py:579-580).
    """
    c1, c2, c3 = jnp.cos(v * jnp.pi / 360.0)
    s1, s2, s3 = jnp.sin(v * jnp.pi / 360.0)
    w = c1 * c2 * c3 - s1 * s2 * s3
    x = s1 * c2 * c3 + c1 * s2 * s3
    y = c1 * s2 * c3 - s1 * c2 * s3
    z = c1 * c2 * s3 + s1 * s2 * c3
    return jnp.stack([w, x, y, z], axis=-1)


# ---------------------------------------------------------------------------
# Spatial algebra ([ang; lin] 6-vectors, MuJoCo ordering)
# ---------------------------------------------------------------------------


def motion_cross(v: jax.Array, m: jax.Array) -> jax.Array:
    """Spatial cross product of motion vectors: v x m (mju_crossMotion)."""
    ang = jnp.cross(v[..., :3], m[..., :3])
    lin = jnp.cross(v[..., :3], m[..., 3:]) + jnp.cross(v[..., 3:], m[..., :3])
    return jnp.concatenate([ang, lin], axis=-1)


def force_cross(v: jax.Array, f: jax.Array) -> jax.Array:
    """Spatial cross product motion x* force (mju_crossForce)."""
    ang = jnp.cross(v[..., :3], f[..., :3]) + jnp.cross(v[..., 3:], f[..., 3:])
    lin = jnp.cross(v[..., :3], f[..., 3:])
    return jnp.concatenate([ang, lin], axis=-1)


def skew(v: jax.Array) -> jax.Array:
    """3-vector -> skew-symmetric matrix such that skew(v) @ u = v x u."""
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([z, -v[..., 2], v[..., 1]], -1),
            jnp.stack([v[..., 2], z, -v[..., 0]], -1),
            jnp.stack([-v[..., 1], v[..., 0], z], -1),
        ],
        axis=-2,
    )


def spatial_inertia(mass: jax.Array, inertia_mat: jax.Array, offset: jax.Array) -> jax.Array:
    """6x6 spatial inertia of a body about a reference point.

    Args:
      mass: scalar body mass.
      inertia_mat: 3x3 rotational inertia about the body CoM, world-aligned.
      offset: CoM position minus reference point (3,).

    Returns [ang;lin]-ordered 6x6:
        [[I + m c^ c^T,  m c^],
         [m c^T,         m 1 ]]
    with c^ = skew(offset). Applied to a motion vector it yields a force
    vector; this is MuJoCo's cinert in matrix form.
    """
    cx = skew(offset)
    m_cx = mass[..., None, None] * cx
    top_left = inertia_mat + m_cx @ jnp.swapaxes(cx, -1, -2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=cx.dtype), cx.shape)
    bottom_right = mass[..., None, None] * eye
    top = jnp.concatenate([top_left, m_cx], axis=-1)
    bottom = jnp.concatenate([jnp.swapaxes(m_cx, -1, -2), bottom_right], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)
