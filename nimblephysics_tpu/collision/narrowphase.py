"""Vectorized analytic narrowphase primitives with static contact counts.

TPU-native re-design of the reference narrowphase (dart/collision/dart/
DARTCollide.cpp: collideBoxBox:1452, collideBoxSphere:1482,
collideSphereBox:1655, collideSphereSphere:1812, capsule support via libccd
MPR :1884-1990). Instead of dynamically-sized contact manifolds, every pair
type emits a FIXED number of candidate contact slots with a validity mask
(depth > 0), so collision is pure masked arithmetic under jit/vmap.

Conventions:
  * Contact normal points from body B (second) toward body A (first): the
    constraint pushes A along +n and B along -n (matches the reference's
    ContactConstraint spatial-normal construction).
  * depth > 0 means penetrating; slots with depth <= 0 are invalid.
  * Contact point = midpoint of the penetration interval.
  * All functions are differentiable in the geometric inputs.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from nimblephysics_tpu.math import lie

_SAFE_EPS = 1e-12


def _safe_normalize(v, fallback):
    """Normalize with an AD-safe guard at ||v|| = 0."""
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    safe = jnp.where(n2 < _SAFE_EPS, 1.0, n2)
    unit = v / jnp.sqrt(safe)
    return jnp.where(n2 < _SAFE_EPS, fallback, unit)


# Each primitive returns (points (k,3), normals (k,3), depths (k,)).


def sphere_plane(center, radius, plane_normal, plane_offset):
    """Sphere (A) vs static plane (B): 1 slot.

    Plane: {x : n.x = offset}, n unit, pointing toward free space.
    """
    dist = jnp.dot(center, plane_normal) - plane_offset
    depth = radius - dist
    point = center - plane_normal * (dist + (radius - dist) * 0.0 + 0.0)
    # Put the point at the deepest sphere point pulled up half the depth:
    point = center - plane_normal * (radius - 0.5 * depth)
    return point[None], plane_normal[None], depth[None]


def sphere_sphere(c_a, r_a, c_b, r_b):
    """Two spheres: 1 slot. Normal from B to A."""
    d = c_a - c_b
    dist = jnp.linalg.norm(jnp.where(jnp.sum(d * d) < _SAFE_EPS, jnp.ones(3), d))
    dist = jnp.where(jnp.sum(d * d) < _SAFE_EPS, 0.0, dist)
    n = _safe_normalize(d, jnp.array([0.0, 0.0, 1.0], dtype=d.dtype))
    depth = (r_a + r_b) - dist
    point = c_b + n * (r_b - 0.5 * depth)
    return point[None], n[None], depth[None]


def sphere_box(center, radius, T_box, half_extents):
    """Sphere (A) vs box (B): 1 slot.

    Closest-point clamp in the box frame; if the center is inside the box,
    push out through the nearest face (kept AD-stable with masked selects).
    """
    c_local = lie.transform_point(lie.transform_inv(T_box), center)
    clamped = jnp.clip(c_local, -half_extents, half_extents)
    delta = c_local - clamped
    outside = jnp.sum(delta * delta) > _SAFE_EPS

    # Outside branch: normal from closest point toward sphere center.
    n_out_local = _safe_normalize(
        delta, jnp.array([0.0, 0.0, 1.0], dtype=center.dtype)
    )
    dist_out = jnp.linalg.norm(jnp.where(outside, delta, jnp.ones(3)))
    dist_out = jnp.where(outside, dist_out, 0.0)

    # Inside branch: nearest face.
    face_dist = half_extents - jnp.abs(c_local)  # >= 0 inside
    axis = jnp.argmin(face_dist)
    sign = jnp.sign(c_local[axis] + _SAFE_EPS)
    n_in_local = jnp.zeros(3, dtype=center.dtype).at[axis].set(sign)
    dist_in = -face_dist[axis]  # negative "distance" (inside)

    n_local = jnp.where(outside, n_out_local, n_in_local)
    dist = jnp.where(outside, dist_out, dist_in)
    depth = radius - dist
    n_world = lie.transform_vector(T_box, n_local)
    surf_local = jnp.where(outside, clamped, c_local - n_local * dist_in)
    point_world = lie.transform_point(T_box, surf_local)
    point = point_world + n_world * (0.0 - 0.5 * (depth - radius) - 0.0) * 0.0
    point = 0.5 * (point_world + (center - n_world * radius))
    return point[None], n_world[None], depth[None]


def box_plane(T_box, half_extents, plane_normal, plane_offset):
    """Box (A) vs static plane (B): 8 slots (one per corner)."""
    dtype = T_box.dtype
    signs = jnp.array(
        [
            [sx, sy, sz]
            for sx in (-1.0, 1.0)
            for sy in (-1.0, 1.0)
            for sz in (-1.0, 1.0)
        ],
        dtype=dtype,
    )
    corners_local = signs * half_extents
    corners = jnp.stack(
        [lie.transform_point(T_box, c) for c in corners_local]
    )
    dists = corners @ plane_normal - plane_offset
    depths = -dists
    normals = jnp.broadcast_to(plane_normal, (8, 3))
    points = corners + 0.5 * depths[:, None] * plane_normal
    return points, normals, depths


def capsule_plane(T_cap, radius, height, plane_normal, plane_offset):
    """Capsule (A, axis = local z) vs plane (B): 2 slots (end spheres)."""
    dtype = T_cap.dtype
    axis = lie.transform_vector(T_cap, jnp.array([0.0, 0.0, 1.0], dtype=dtype))
    c = T_cap[:3, 3]
    ends = jnp.stack([c + axis * (height / 2.0), c - axis * (height / 2.0)])
    pts, ns, ds = [], [], []
    for i in range(2):
        p, n, d = sphere_plane(ends[i], radius, plane_normal, plane_offset)
        pts.append(p[0])
        ns.append(n[0])
        ds.append(d[0])
    return jnp.stack(pts), jnp.stack(ns), jnp.stack(ds)


def _segment_closest_point(p, a, b):
    """Closest point on segment [a,b] to point p (AD-safe)."""
    ab = b - a
    denom = jnp.maximum(jnp.sum(ab * ab), _SAFE_EPS)
    t = jnp.clip(jnp.dot(p - a, ab) / denom, 0.0, 1.0)
    return a + t * ab


def capsule_sphere(T_cap, radius_c, height, c_sphere, r_sphere):
    """Capsule (A) vs sphere (B): 1 slot."""
    dtype = T_cap.dtype
    axis = lie.transform_vector(T_cap, jnp.array([0.0, 0.0, 1.0], dtype=dtype))
    c = T_cap[:3, 3]
    a = c - axis * (height / 2.0)
    b = c + axis * (height / 2.0)
    closest = _segment_closest_point(c_sphere, a, b)
    return sphere_sphere(closest, radius_c, c_sphere, r_sphere)


def _segment_segment_closest(a0, a1, b0, b1):
    """Closest points between two segments (clamped, AD-safe)."""
    d1 = a1 - a0
    d2 = b1 - b0
    r = a0 - b0
    a = jnp.dot(d1, d1)
    e = jnp.dot(d2, d2)
    f = jnp.dot(d2, r)
    c = jnp.dot(d1, r)
    b = jnp.dot(d1, d2)
    denom = jnp.maximum(a * e - b * b, _SAFE_EPS)
    s = jnp.clip((b * f - c * e) / denom, 0.0, 1.0)
    t = jnp.clip((b * s + f) / jnp.maximum(e, _SAFE_EPS), 0.0, 1.0)
    s = jnp.clip((b * t - c) / jnp.maximum(a, _SAFE_EPS), 0.0, 1.0)
    return a0 + s * d1, b0 + t * d2


def capsule_capsule(T_a, r_a, h_a, T_b, r_b, h_b):
    """Two capsules: 1 slot (deepest); parallel-overlap manifolds later."""
    dtype = T_a.dtype
    za = lie.transform_vector(T_a, jnp.array([0.0, 0.0, 1.0], dtype=dtype))
    zb = lie.transform_vector(T_b, jnp.array([0.0, 0.0, 1.0], dtype=dtype))
    ca, cb = T_a[:3, 3], T_b[:3, 3]
    pa, pb = _segment_segment_closest(
        ca - za * h_a / 2, ca + za * h_a / 2, cb - zb * h_b / 2, cb + zb * h_b / 2
    )
    return sphere_sphere(pa, r_a, pb, r_b)


def capsule_box(T_cap, radius, height, T_box, half_extents):
    """Capsule (A) vs box (B): 2 slots (one per sampled segment point).

    Approximate: treats the capsule's two end-spheres against the box.
    (The reference routes this pair through libccd MPR, one contact.)
    """
    dtype = T_cap.dtype
    axis = lie.transform_vector(T_cap, jnp.array([0.0, 0.0, 1.0], dtype=dtype))
    c = T_cap[:3, 3]
    ends = jnp.stack([c - axis * (height / 2.0), c + axis * (height / 2.0)])
    pts, ns, ds = [], [], []
    for i in range(2):
        p, n, d = sphere_box(ends[i], radius, T_box, half_extents)
        pts.append(p[0])
        ns.append(n[0])
        ds.append(d[0])
    return jnp.stack(pts), jnp.stack(ns), jnp.stack(ds)


def box_box_sat(T_a, half_a, T_b, half_b):
    """Box-box separating-axis test with an 8-slot contact manifold.

    Re-design of the ODE-style SAT in the reference (collideBoxBox,
    DARTCollide.cpp:1452): evaluates the 6 face axes + 9 edge-cross axes,
    picks the minimum-penetration axis with masked argmin (edge axes get a
    small preference penalty as in ODE), then emits a static 8-slot
    manifold: the 8 corners of the *incident* box tested against the
    reference box's slab (corner depth along the separation normal), valid
    where inside. Face-face contact yields up to 4 valid slots, edge cases 1+.
    """
    dtype = T_a.dtype
    R_a, p_a = T_a[:3, :3], T_a[:3, 3]
    R_b, p_b = T_b[:3, :3], T_b[:3, 3]
    # Rotation of B in A's frame.
    C = R_a.T @ R_b  # columns: B axes in A frame
    absC = jnp.abs(C) + 1e-9
    t = R_a.T @ (p_b - p_a)  # B center in A frame

    axes = []  # (axis_in_world, separation, is_edge)
    seps = []
    penalties = []
    world_axes = []
    # Face axes of A (3): separation = |t.e| - (ha.e + hb @ absC_row)
    for i in range(3):
        sep = jnp.abs(t[i]) - (half_a[i] + jnp.dot(absC[i, :], half_b))
        axis_w = R_a[:, i] * jnp.sign(t[i] + 1e-30)
        world_axes.append(axis_w)
        seps.append(sep)
        penalties.append(0.0)
    # Face axes of B (3).
    tb = C.T @ t  # A->B center offset in B frame
    for j in range(3):
        sep = jnp.abs(tb[j]) - (half_b[j] + jnp.dot(absC[:, j], half_a))
        axis_w = R_b[:, j] * jnp.sign(tb[j] + 1e-30)
        world_axes.append(axis_w)
        seps.append(sep)
        penalties.append(0.0)
    # Edge-cross axes (9): a_i x b_j.
    for i in range(3):
        for j in range(3):
            axis = jnp.cross(R_a[:, i], R_b[:, j])
            # AD-safe normalization: the norm has a NaN gradient at zero
            # (parallel edges) — double-where guard.
            n2 = jnp.sum(axis * axis)
            degen = n2 < 1e-12
            norm = jnp.sqrt(jnp.where(degen, 1.0, n2))
            norm = jnp.where(degen, 0.0, norm)
            u = jnp.where(degen, jnp.zeros_like(axis), axis) / jnp.where(
                degen, 1.0, norm
            )
            # Project both boxes on u.
            ra = jnp.sum(half_a * jnp.abs(R_a.T @ u))
            rb = jnp.sum(half_b * jnp.abs(R_b.T @ u))
            dist = jnp.dot(u, p_b - p_a)
            sep = jnp.abs(dist) - (ra + rb)
            # Degenerate (parallel edges): exclude from BOTH the separation
            # certificate and the axis selection (-inf loses every argmax
            # and never certifies separation).
            sep = jnp.where(norm < 1e-6, jnp.asarray(-jnp.inf, dtype=dtype), sep)
            axis_w = u * jnp.sign(dist + 1e-30)
            world_axes.append(axis_w)
            seps.append(sep)
            penalties.append(1e-4)  # ODE-style slight preference for faces

    seps_arr = jnp.stack(seps)
    pen_arr = jnp.asarray(penalties, dtype=dtype)
    axes_arr = jnp.stack(world_axes)  # axis points from A toward B
    # SAT picks the axis of LEAST penetration (max separation); edge axes
    # carry a small penalty so faces win near-ties (ODE behavior).
    best = jnp.argmax(seps_arr - pen_arr)
    sep_best = seps_arr[best]
    # Contact normal must point from B to A (push A away from B).
    n = -axes_arr[best]

    # Manifold: corners of B below A's supporting plane along n, and corners
    # of A above B's supporting plane — 8 slots from the incident box (B),
    # depth measured as interpenetration along n of each B corner against
    # A's support plane.
    signs = jnp.array(
        [
            [sx, sy, sz]
            for sx in (-1.0, 1.0)
            for sy in (-1.0, 1.0)
            for sz in (-1.0, 1.0)
        ],
        dtype=dtype,
    )
    corners_b = (signs * half_b) @ R_b.T + p_b  # (8,3) world
    # Support plane of A along direction -n (A's furthest extent toward B):
    # plane point = p_a + support_A(-n), normal n (pointing B->A).
    support_a = jnp.sum(half_a * jnp.abs(R_a.T @ n))
    plane_off = jnp.dot(n, p_a) - support_a  # A occupies n.x >= plane_off
    # Depth of each B corner behind A's face plane (penetrating corners
    # satisfy n . c >= plane_off):
    depths = corners_b @ n - plane_off
    # Also require the corner to be (nearly) inside A's slab region laterally?
    # For the static manifold we accept all penetrating corners; PGS handles
    # the redundancy, and the LCP dedup mirrors LCPUtils merging.
    # Gate validity on the SAT overlap itself (ANY separating axis =>
    # no contact):
    separated = jnp.max(seps_arr) >= 0.0
    depths = jnp.where(separated, -jnp.ones_like(depths), depths)
    points = corners_b + 0.5 * depths[:, None] * n
    normals = jnp.broadcast_to(n, (8, 3))
    return points, normals, depths


def ellipsoid_as_sphere(size):
    """The reference collides ellipsoids as bounding spheres when not
    axis-aligned-equal (DARTCollisionDetector.cpp:283-308 treats
    ellipsoid-as-sphere). radius = mean semi-axis."""
    return jnp.mean(size) / 2.0
