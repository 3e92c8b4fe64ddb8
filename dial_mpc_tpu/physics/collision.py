"""Narrowphase collision with a static candidate-pair table.

Broadphase is resolved at model-load time (contype/conaffinity + kinematic
filters, see model.py:_candidate_pairs); at runtime every candidate pair is
evaluated unconditionally into its fixed contact slots. Separated pairs get
dist = +BIG and are masked downstream. No dynamic shapes anywhere — the
whole collider is a fixed dataflow graph that vmaps over samples.

Supported type pairs (all that appear in the DIAL-MPC model suite):
plane-{sphere,capsule,box}, sphere-{sphere,capsule,box},
capsule-{capsule,box}, box-box (approximate manifold).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dial_mpc_tpu.physics.kinematics import replace
from dial_mpc_tpu.physics.model import (
    BOX,
    CAPSULE,
    Contact,
    Data,
    Model,
    PLANE,
    SPHERE,
)

BIG = 1e10


def make_frame(n: jax.Array) -> jax.Array:
    """Orthonormal contact frame rows [normal; tangent1; tangent2].

    Matches mju_makeFrame (verified empirically vs CPU MuJoCo): the second
    tangent is normalize(cross(n, ref)) with ref = y-hat when |n_y| < 0.5
    else z-hat, and tangent1 = cross(tangent2, n). Facet directions of the
    pyramidal cone depend on this, so it must match exactly.
    """
    y = jnp.array([0.0, 1.0, 0.0], n.dtype)
    z = jnp.array([0.0, 0.0, 1.0], n.dtype)
    ref = jnp.where(jnp.abs(n[1]) < 0.5, y, z)
    t2 = jnp.cross(n, ref)
    t2 = t2 / jnp.maximum(jnp.linalg.norm(t2), 1e-15)
    t1 = jnp.cross(t2, n)
    return jnp.stack([n, t1, t2])


def axis_frame(n: jax.Array, axis: jax.Array) -> jax.Array:
    """Contact frame with tangent1 = axis projected onto the plane of n.

    Mirrors mjc_PlaneCapsule's frame: t1 = normalize(axis - (axis.n) n),
    t2 = cross(n, t1); falls back to make_frame when axis ~ parallel to n.
    """
    t1 = axis - jnp.dot(axis, n) * n
    norm = jnp.linalg.norm(t1)
    t1 = t1 / jnp.maximum(norm, 1e-15)
    t2 = jnp.cross(n, t1)
    return jnp.where(norm > 1e-10, jnp.stack([n, t1, t2]), make_frame(n))


def _plane_sphere(pp, pn, c, r):
    dist = jnp.dot(pn, c - pp) - r
    pos = c - pn * (r + 0.5 * dist)
    return dist[None], pos[None], make_frame(pn)[None]


def _sphere_sphere(c1, r1, c2, r2):
    dvec = c2 - c1
    dist_c = jnp.linalg.norm(dvec)
    n = dvec / jnp.maximum(dist_c, 1e-15)
    dist = dist_c - (r1 + r2)
    pos = c1 + n * (r1 + 0.5 * dist)
    return dist[None], pos[None], make_frame(n)[None]


def _plane_capsule(pp, pn, c, axis, r, hl):
    e1, e2 = c + axis * hl, c - axis * hl
    d1, p1, _ = _plane_sphere(pp, pn, e1, r)
    d2, p2, _ = _plane_sphere(pp, pn, e2, r)
    frame = axis_frame(pn, axis)[None]
    return (
        jnp.concatenate([d1, d2]),
        jnp.concatenate([p1, p2]),
        jnp.concatenate([frame, frame]),
    )


def _closest_on_segment(p, c, axis, hl):
    t = jnp.clip(jnp.dot(p - c, axis), -hl, hl)
    return c + axis * t


def _sphere_capsule(c1, r1, c2, axis2, r2, hl2):
    p = _closest_on_segment(c1, c2, axis2, hl2)
    return _sphere_sphere(c1, r1, p, r2)


def _segment_segment(c1, a1, hl1, c2, a2, hl2):
    """Closest points between two segments (standard clamped solve)."""
    r = c1 - c2
    A = 1.0  # a1·a1
    B = jnp.dot(a1, a2)
    C = 1.0
    D = jnp.dot(a1, r)
    E = jnp.dot(a2, r)
    denom = A * C - B * B
    s = jnp.where(denom > 1e-12, (B * E - C * D) / jnp.maximum(denom, 1e-12), 0.0)
    s = jnp.clip(s, -hl1, hl1)
    t = jnp.clip(B * s + E, -hl2, hl2)
    s = jnp.clip(B * t - D, -hl1, hl1)
    return c1 + a1 * s, c2 + a2 * t


def _capsule_capsule(c1, a1, r1, hl1, c2, a2, r2, hl2):
    p1, p2 = _segment_segment(c1, a1, hl1, c2, a2, hl2)
    return _sphere_sphere(p1, r1, p2, r2)


def _box_corners(size, dtype):
    sx, sy, sz = size[0], size[1], size[2]
    signs = jnp.array(
        [
            [-1, -1, -1], [1, -1, -1], [-1, 1, -1], [1, 1, -1],
            [-1, -1, 1], [1, -1, 1], [-1, 1, 1], [1, 1, 1],
        ],
        dtype=dtype,
    )
    return signs * jnp.stack([sx, sy, sz])


def _plane_box(pp, pn, bc, bmat, size):
    """Up to 4 contacts: the 4 deepest box corners vs the plane."""
    corners = bc + _box_corners(size, bc.dtype) @ bmat.T  # (8, 3)
    dists = corners @ pn - jnp.dot(pn, pp)
    # 4 deepest corners, statically shaped
    neg_d, idx = jax.lax.top_k(-dists, 4)
    d = -neg_d
    pos = corners[idx] - 0.5 * d[:, None] * pn
    frame = jnp.broadcast_to(make_frame(pn), (4, 3, 3))
    return d, pos, frame


def _closest_pt_on_box(p_local, size):
    """Closest point on a box (local frame) to p; handles interior points."""
    clamped = jnp.clip(p_local, -size, size)
    inside = jnp.all(jnp.abs(p_local) < size)
    # for interior points project to the nearest face
    gap = size - jnp.abs(p_local)
    ax = jnp.argmin(gap)
    face_pt = p_local
    face_val = jnp.sign(p_local[ax]) * size[ax]
    face_pt = face_pt.at[ax].set(jnp.where(jnp.sign(p_local[ax]) == 0, size[ax], face_val))
    return jnp.where(inside, face_pt, clamped), inside


def _sphere_box(c1, r1, bc, bmat, size):
    p_local = bmat.T @ (c1 - bc)
    cp_local, inside = _closest_pt_on_box(p_local, size)
    cp = bc + bmat @ cp_local
    dvec = cp - c1
    dist_c = jnp.linalg.norm(dvec)
    # normal points from sphere into box surface; flip when center inside
    n_out = dvec / jnp.maximum(dist_c, 1e-15)
    n = jnp.where(inside, -n_out, n_out)
    dist = jnp.where(inside, -(dist_c + r1), dist_c - r1)
    pos = c1 + n * (r1 + 0.5 * dist)
    return dist[None], pos[None], make_frame(n)[None]


def _capsule_box(c1, a1, r1, hl1, bc, bmat, size):
    """2 contacts: the two capsule end-spheres against the box.

    Approximate manifold (exact capsule-box needs edge-face analysis); the
    end-sphere pair covers the resting / pushing configurations in the crate
    scenes. Slot count stays static.
    """
    e1, e2 = c1 + a1 * hl1, c1 - a1 * hl1
    d1, p1, f1 = _sphere_box(e1, r1, bc, bmat, size)
    d2, p2, f2 = _sphere_box(e2, r1, bc, bmat, size)
    return (
        jnp.concatenate([d1, d2]),
        jnp.concatenate([p1, p2]),
        jnp.concatenate([f1, f2]),
    )


def _box_box(c1, m1, s1, c2, m2, s2):
    """8 contacts: corner-vs-box sampling both ways (approximate manifold).

    The 16 corner candidates (8 of each box against the other) are ranked by
    penetration and the deepest 8 kept — adequate for the quasi-static crate
    stacks in the DIAL-MPC scenes; an exact SAT manifold is a planned
    refinement.
    """
    dists, poss, frames = [], [], []
    for (ca, ma, sa, cb, mb, sb, flip) in (
        (c1, m1, s1, c2, m2, s2, False),
        (c2, m2, s2, c1, m1, s1, True),
    ):
        corners = ca + _box_corners(sa, ca.dtype) @ ma.T
        for k in range(8):
            d, p, f = _sphere_box(corners[k], 0.0, cb, mb, sb)
            if flip:
                f = f.at[:, 0].multiply(-1.0)
                f = f.at[:, 2].multiply(-1.0)
            dists.append(d)
            poss.append(p)
            frames.append(f)
    dists = jnp.concatenate(dists)
    poss = jnp.concatenate(poss)
    frames = jnp.concatenate(frames)
    neg_d, idx = jax.lax.top_k(-dists, 8)
    return -neg_d, poss[idx], frames[idx]


def collide(m: Model, d: Data) -> Data:
    """Evaluate every candidate pair into its static contact slots."""
    dtype = d.qpos.dtype
    if m.ncon == 0:
        contact = Contact(
            dist=jnp.zeros(0, dtype),
            pos=jnp.zeros((0, 3), dtype),
            frame=jnp.zeros((0, 3, 3), dtype),
            geom=m.con_geom,
            includemargin=m.con_includemargin,
            friction=m.con_friction,
            solref=m.con_solref,
            solimp=m.con_solimp,
            dim=m.con_dim,
        )
        return replace(d, contact=contact)

    dist_parts, pos_parts, frame_parts = [], [], []
    gx, gm, gs = d.geom_xpos, d.geom_xmat, m.geom_size

    for (g1, g2, t1, t2, condim, conadr, conmax) in m.pair_table:
        p1, p2 = gx[g1], gx[g2]
        M1, M2 = gm[g1], gm[g2]
        s1, s2 = gs[g1], gs[g2]
        key = (t1, t2)
        if key == (PLANE, SPHERE):
            out = _plane_sphere(p1, M1[:, 2], p2, s2[0])
        elif key == (PLANE, CAPSULE):
            out = _plane_capsule(p1, M1[:, 2], p2, M2[:, 2], s2[0], s2[1])
        elif key == (PLANE, BOX):
            out = _plane_box(p1, M1[:, 2], p2, M2, s2)
        elif key == (SPHERE, SPHERE):
            out = _sphere_sphere(p1, s1[0], p2, s2[0])
        elif key == (SPHERE, CAPSULE):
            out = _sphere_capsule(p1, s1[0], p2, M2[:, 2], s2[0], s2[1])
        elif key == (SPHERE, BOX):
            out = _sphere_box(p1, s1[0], p2, M2, s2)
        elif key == (CAPSULE, CAPSULE):
            out = _capsule_capsule(
                p1, M1[:, 2], s1[0], s1[1], p2, M2[:, 2], s2[0], s2[1]
            )
        elif key == (CAPSULE, BOX):
            out = _capsule_box(p1, M1[:, 2], s1[0], s1[1], p2, M2, s2)
        elif key == (BOX, BOX):
            out = _box_box(p1, M1, s1, p2, M2, s2)
        else:  # pragma: no cover
            raise NotImplementedError(f"collider {key}")
        dist, pos, frame = out
        assert dist.shape[0] == conmax, (key, dist.shape, conmax)
        dist_parts.append(dist.astype(dtype))
        pos_parts.append(pos.astype(dtype))
        frame_parts.append(frame.astype(dtype))

    contact = Contact(
        dist=jnp.concatenate(dist_parts),
        pos=jnp.concatenate(pos_parts),
        frame=jnp.concatenate(frame_parts),
        geom=m.con_geom,
        includemargin=m.con_includemargin,
        friction=m.con_friction,
        solref=m.con_solref,
        solimp=m.con_solimp,
        dim=m.con_dim,
    )
    return replace(d, contact=contact)
