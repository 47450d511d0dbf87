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

import jax
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
    # Deepest sphere point pulled up half the depth (midpoint convention):
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
    # Midpoint of the penetration interval:
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
    """Capsule (A) vs box (B): 3 slots — the two end spheres plus a FLANK
    slot at the closest segment<->box point pair (fixes the cylinder-flank
    vs box-face contact the 2-end-sphere approximation misses; the
    reference routes this pair through libccd MPR, one contact,
    DARTCollide.cpp:1884-1990).

    The flank point is found by fixed-iteration alternating projection
    between the two convex sets (segment, box) — converges geometrically,
    differentiable, AD-safe.
    """
    dtype = T_cap.dtype
    axis = lie.transform_vector(T_cap, jnp.array([0.0, 0.0, 1.0], dtype=dtype))
    c = T_cap[:3, 3]
    a = c - axis * (height / 2.0)
    b = c + axis * (height / 2.0)
    pts, ns, ds = [], [], []
    for end in (a, b):
        p, n, d = sphere_box(end, radius, T_box, half_extents)
        pts.append(p[0])
        ns.append(n[0])
        ds.append(d[0])
    # Flank: alternate projections segment -> box -> segment (8 rounds).
    T_inv = lie.transform_inv(T_box)
    p_seg = c  # start at the capsule center
    for _ in range(8):
        p_local = lie.transform_point(T_inv, p_seg)
        p_box = lie.transform_point(
            T_box, jnp.clip(p_local, -half_extents, half_extents)
        )
        p_seg = _segment_closest_point(p_box, a, b)
    p3, n3, d3 = sphere_box(p_seg, radius, T_box, half_extents)
    # Avoid triple-counting when the flank point collapses onto an end:
    # mask the flank slot if it sits within 5% of the half height of
    # either end point.
    t_end = jnp.minimum(
        jnp.linalg.norm(p_seg - a), jnp.linalg.norm(p_seg - b)
    )
    dup = t_end < 0.05 * (height / 2.0) + 1e-9
    pts.append(p3[0])
    ns.append(n3[0])
    ds.append(jnp.where(dup, -1.0, d3[0]))
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
    # carry a small penalty so faces win near-ties (ODE behavior,
    # collideBoxBox fudge factor).
    score = seps_arr - pen_arr
    best = jnp.argmax(score)
    separated = jnp.max(seps_arr) >= 0.0

    # --- Two-sided face manifolds with exact lateral clipping ------------
    # (reference: DARTCollide.cpp:1452 collideBoxBox's intersectRectQuad
    # clipping of the incident face against the reference face). Both the
    # A-reference and B-reference manifolds are computed; masks select the
    # winner. The intersection polygon's vertices are enumerated directly
    # (corners-inside + edge crossings, <= 8 live) instead of sequential
    # Sutherland-Hodgman — static shapes, pure masked arithmetic.
    bestA = jnp.argmax(score[0:3])
    bestB = jnp.argmax(score[3:6])
    ptsA, nrmA, depA = _box_face_manifold(
        R_a, p_a, half_a, R_b, p_b, half_b, bestA, flip_normal=True
    )
    ptsB, nrmB, depB = _box_face_manifold(
        R_b, p_b, half_b, R_a, p_a, half_a, bestB, flip_normal=False
    )

    # --- Edge-edge contact (single slot) ----------------------------------
    bestE = jnp.argmax(score[6:15])
    ptsE, nrmE, depE = _box_edge_contact(
        R_a, p_a, half_a, R_b, p_b, half_b, bestE, axes_arr[6 + bestE],
        seps_arr[6 + bestE],
    )

    is_face_a = best < 3
    is_face_b = (best >= 3) & (best < 6)
    pts = jnp.where(
        is_face_a, ptsA, jnp.where(is_face_b, ptsB, ptsE)
    )
    nrm = jnp.where(
        is_face_a, nrmA, jnp.where(is_face_b, nrmB, nrmE)
    )
    dep = jnp.where(
        is_face_a, depA, jnp.where(is_face_b, depB, depE)
    )
    dep = jnp.where(separated, -jnp.ones_like(dep), dep)
    return pts, nrm, dep


def _box_face_manifold(R_r, p_r, h_r, R_i, p_i, h_i, face_idx, flip_normal):
    """Clipped face-face manifold: reference box (R_r, p_r, h_r) face
    `face_idx` (traced int in [0,3)) against the incident box's most
    anti-parallel face. Returns 8 slots (points, normals, depths); invalid
    slots have depth = -1. `flip_normal`: True when the reference box is
    body A (contact normal points B -> A = against the ref face normal).
    """
    dtype = R_r.dtype
    e = jax.nn.one_hot(face_idx, 3, dtype=dtype)
    e_u = jax.nn.one_hot((face_idx + 1) % 3, 3, dtype=dtype)
    e_v = jax.nn.one_hot((face_idx + 2) % 3, 3, dtype=dtype)
    a_r = R_r @ e  # ref face axis (world, unsigned)
    sgn = jnp.sign(jnp.dot(a_r, p_i - p_r) + 1e-30)
    n_ref = a_r * sgn  # points from ref box toward incident box
    u = R_r @ e_u
    v = R_r @ e_v
    h_face = jnp.dot(h_r, e)
    h_u = jnp.dot(h_r, e_u)
    h_v = jnp.dot(h_r, e_v)
    face_origin = p_r + n_ref * h_face  # center of the ref face

    # Incident face: the face of the incident box most anti-parallel to
    # n_ref.
    dots = R_i.T @ n_ref  # (3,)
    inc_idx = jnp.argmax(jnp.abs(dots))
    ei = jax.nn.one_hot(inc_idx, 3, dtype=dtype)
    ei_u = jax.nn.one_hot((inc_idx + 1) % 3, 3, dtype=dtype)
    ei_v = jax.nn.one_hot((inc_idx + 2) % 3, 3, dtype=dtype)
    s_i = -jnp.sign(jnp.dot(dots, ei) + 1e-30)  # face pointing at ref box
    n_inc = (R_i @ ei) * s_i
    inc_center = p_i + n_inc * jnp.dot(h_i, ei)
    iu = R_i @ ei_u
    iv = R_i @ ei_v
    hi_u = jnp.dot(h_i, ei_u)
    hi_v = jnp.dot(h_i, ei_v)

    # Incident face corners in the ref-face 2D frame (xi along u, eta
    # along v, measured from face_origin).
    corner_signs = jnp.asarray(
        [[1.0, 1.0], [1.0, -1.0], [-1.0, -1.0], [-1.0, 1.0]], dtype=dtype
    )
    corners3d = (
        inc_center[None, :]
        + corner_signs[:, 0:1] * hi_u * iu[None, :]
        + corner_signs[:, 1:2] * hi_v * iv[None, :]
    )  # (4, 3), in CCW-ish order around the incident face
    rel = corners3d - face_origin[None, :]
    quad = jnp.stack([rel @ u, rel @ v], axis=1)  # (4, 2)

    # Candidate intersection-polygon vertices (24 = 4 quad corners + 4 rect
    # corners + 16 edge crossings), each with a validity mask.
    rect = corner_signs * jnp.stack([h_u, h_v])  # (4, 2)

    # (a) incident corners inside the rect.
    in_rect = (jnp.abs(quad[:, 0]) <= h_u + 1e-9) & (
        jnp.abs(quad[:, 1]) <= h_v + 1e-9
    )
    # (b) rect corners inside the incident quad (sign-consistent 2D cross
    # products against all 4 quad edges).
    qa = quad
    qb = jnp.roll(quad, -1, axis=0)
    edge = qb - qa  # (4, 2)
    rel_r = rect[:, None, :] - qa[None, :, :]  # (4 rect, 4 edge, 2)
    cross2 = edge[None, :, 0] * rel_r[:, :, 1] - edge[None, :, 1] * rel_r[:, :, 0]
    in_quad = (jnp.all(cross2 <= 1e-9, axis=1)) | (
        jnp.all(cross2 >= -1e-9, axis=1)
    )
    # (c) quad-edge x rect-edge intersections.
    ra = rect
    rb = jnp.roll(rect, -1, axis=0)
    # Solve qa + t (qb - qa) = ra + s (rb - ra) for each pair.
    d1 = qb - qa  # (4, 2)
    d2 = rb - ra  # (4, 2)
    qa_e = qa[:, None, :]
    ra_e = ra[None, :, :]
    denom = d1[:, None, 0] * d2[None, :, 1] - d1[:, None, 1] * d2[None, :, 0]
    degen = jnp.abs(denom) < 1e-12
    denom_s = jnp.where(degen, 1.0, denom)
    diff = ra_e - qa_e  # (4, 4, 2)
    t = (diff[:, :, 0] * d2[None, :, 1] - diff[:, :, 1] * d2[None, :, 0]) / denom_s
    s = (diff[:, :, 0] * d1[:, None, 1] - diff[:, :, 1] * d1[:, None, 0]) / denom_s
    inter_ok = (
        (~degen)
        & (t >= -1e-9)
        & (t <= 1.0 + 1e-9)
        & (s >= -1e-9)
        & (s <= 1.0 + 1e-9)
    )
    inter_pts = qa_e + t[:, :, None] * d1[:, None, :]  # (4, 4, 2)

    cand = jnp.concatenate(
        [quad, rect, inter_pts.reshape(16, 2)], axis=0
    )  # (24, 2)
    cand_ok = jnp.concatenate(
        [in_rect, in_quad, inter_ok.reshape(16)], axis=0
    )

    # Depth at a lateral position (xi, eta): distance the incident face
    # plane sits BELOW the ref face plane there (linear in xi, eta).
    # x(xi,eta,s) = face_origin + xi u + eta v - s n_ref on the incident
    # plane n_inc . x = n_inc . inc_center  =>
    # s(xi,eta) = (n_inc.(face_origin - inc_center) + xi n_inc.u + eta
    #              n_inc.v) / (n_inc . n_ref)   [denominator <= -1/sqrt(3)]
    denom_p = jnp.dot(n_inc, n_ref)
    denom_p = jnp.where(jnp.abs(denom_p) < 1e-6, -1e-6, denom_p)
    c0 = jnp.dot(n_inc, face_origin - inc_center) / denom_p
    c1 = jnp.dot(n_inc, u) / denom_p
    c2 = jnp.dot(n_inc, v) / denom_p
    # s > 0 <=> the incident surface sits s past the ref plane INTO the
    # ref box at that lateral position: that IS the local penetration.
    depth_cand = c0 + c1 * cand[:, 0] + c2 * cand[:, 1]
    depth_cand = jnp.where(cand_ok, depth_cand, -1.0)

    # Keep the 8 deepest valid candidates (static manifold size).
    topv, topi = jax.lax.top_k(depth_cand, 8)
    sel = cand[topi]  # (8, 2)
    depths = topv
    # Contact normal: B -> A convention.
    n_contact = -n_ref if flip_normal else n_ref
    # 3D point: on the incident surface, pulled to the midpoint of the
    # penetration interval along the ref normal.
    surf = (
        face_origin[None, :]
        + sel[:, 0:1] * u[None, :]
        + sel[:, 1:2] * v[None, :]
        - depths[:, None] * n_ref[None, :]
    )
    points = surf + 0.5 * depths[:, None] * n_ref[None, :]
    normals = jnp.broadcast_to(n_contact, (8, 3))
    return points, normals, depths


def _box_edge_contact(R_a, p_a, h_a, R_b, p_b, h_b, edge_idx, axis_w, sep):
    """Edge-edge contact for the SAT edge-cross axis i x j
    (edge_idx = 3*i + j, traced): closest points between the two support
    edges. One valid slot; the rest are depth = -1."""
    dtype = R_a.dtype
    i = edge_idx // 3
    j = edge_idx % 3
    ei = jax.nn.one_hot(i, 3, dtype=dtype)
    ej = jax.nn.one_hot(j, 3, dtype=dtype)
    # axis_w points from A toward B (sign applied by the caller loop).
    u = axis_w
    # Support corner of A along +u, excluding the edge direction i.
    sa = jnp.sign(R_a.T @ u + 1e-30) * (1.0 - ei)
    ca = p_a + R_a @ (sa * h_a)
    da = R_a @ ei  # edge direction of A
    # Support corner of B along -u, excluding direction j.
    sb = jnp.sign(R_b.T @ (-u) + 1e-30) * (1.0 - ej)
    cb = p_b + R_b @ (sb * h_b)
    db = R_b @ ej
    # Closest points between the two (infinite) edge lines.
    r = cb - ca
    a_ = jnp.dot(da, da)
    b_ = jnp.dot(da, db)
    e_ = jnp.dot(db, db)
    c_ = jnp.dot(da, r)
    f_ = jnp.dot(db, r)
    den = jnp.maximum(a_ * e_ - b_ * b_, 1e-12)
    t = (c_ * e_ - b_ * f_) / den
    s = (b_ * c_ - a_ * f_) / den
    la = jnp.dot(h_a, ei)
    lb = jnp.dot(h_b, ej)
    t = jnp.clip(t, -la, la)
    s = jnp.clip(s, -lb, lb)
    pa_pt = ca + t * da
    pb_pt = cb + s * db
    point = 0.5 * (pa_pt + pb_pt)
    depth0 = -sep
    n_contact = -u  # B -> A
    points = jnp.broadcast_to(point, (8, 3))
    normals = jnp.broadcast_to(n_contact, (8, 3))
    depths = jnp.concatenate(
        [depth0[None], jnp.full((7,), -1.0, dtype=dtype)]
    )
    return points, normals, depths


def ellipsoid_as_sphere(size):
    """The reference collides ellipsoids as bounding spheres when not
    axis-aligned-equal (DARTCollisionDetector.cpp:283-308 treats
    ellipsoid-as-sphere). radius = mean semi-axis."""
    return jnp.mean(size) / 2.0


# ---------------------------------------------------------------------------
# Heightmap terrain (reference: dynamics/HeightmapShape.hpp). Local frame:
# grid point (i, j) sits at ((i - (W-1)/2) sx, (j - (H-1)/2) sy,
# heights[j, i] * sz); heights is (H, W). Contacts use bilinear height
# interpolation and a central-difference surface normal — differentiable.
# ---------------------------------------------------------------------------


def _heightmap_sample(heights, scale, xy_local):
    """Bilinear height + world-up normal (local frame) at xy (2,)."""
    H, W = heights.shape
    sx, sy, sz = scale
    gx = xy_local[0] / sx + (W - 1) / 2.0
    gy = xy_local[1] / sy + (H - 1) / 2.0
    inside = (gx >= 0.0) & (gx <= W - 1) & (gy >= 0.0) & (gy <= H - 1)
    gx = jnp.clip(gx, 0.0, W - 1 - 1e-9)
    gy = jnp.clip(gy, 0.0, H - 1 - 1e-9)
    i0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, W - 2)
    j0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, H - 2)
    fx = gx - i0
    fy = gy - j0
    h00 = heights[j0, i0]
    h10 = heights[j0, i0 + 1]
    h01 = heights[j0 + 1, i0]
    h11 = heights[j0 + 1, i0 + 1]
    h = ((1 - fx) * (1 - fy) * h00 + fx * (1 - fy) * h10
         + (1 - fx) * fy * h01 + fx * fy * h11) * sz
    # Bilinear-patch gradient -> outward (up) normal.
    dh_dx = (((1 - fy) * (h10 - h00) + fy * (h11 - h01)) * sz) / sx
    dh_dy = (((1 - fx) * (h01 - h00) + fx * (h11 - h10)) * sz) / sy
    n = jnp.stack([-dh_dx, -dh_dy, jnp.ones_like(h)])
    n = n / jnp.linalg.norm(n)
    return h, n, inside


def sphere_heightmap(center, radius, T_hm, heights, scale):
    """Sphere (A) vs heightmap (B): 1 slot."""
    T_inv = lie.transform_inv(T_hm)
    c_local = lie.transform_point(T_inv, center)
    h, n_local, inside = _heightmap_sample(heights, scale, c_local[:2])
    # Signed distance along the surface normal (approx: vertical gap
    # projected on n) — exact for flat cells.
    gap = (c_local[2] - h) * n_local[2]
    depth = jnp.where(inside, radius - gap, -1.0)
    n_world = lie.transform_vector(T_hm, n_local)
    point = center - n_world * (radius - 0.5 * depth)
    return point[None], n_world[None], depth[None]


def capsule_heightmap(T_cap, radius, height, T_hm, heights, scale):
    """Capsule (A) vs heightmap (B): 3 slots (ends + midpoint)."""
    dtype = T_cap.dtype
    axis = lie.transform_vector(T_cap, jnp.array([0.0, 0.0, 1.0], dtype=dtype))
    c = T_cap[:3, 3]
    pts, ns, ds = [], [], []
    for t in (-0.5, 0.0, 0.5):
        p, n, d = sphere_heightmap(
            c + axis * (t * height), radius, T_hm, heights, scale
        )
        pts.append(p[0])
        ns.append(n[0])
        ds.append(d[0])
    return jnp.stack(pts), jnp.stack(ns), jnp.stack(ds)


def box_heightmap(T_box, half, T_hm, heights, scale):
    """Box (A) vs heightmap (B): 8 corner slots."""
    dtype = T_box.dtype
    signs = jnp.array(
        [[sx, sy, sz] for sx in (-1.0, 1.0) for sy in (-1.0, 1.0)
         for sz in (-1.0, 1.0)], dtype=dtype,
    )
    pts, ns, ds = [], [], []
    for k in range(8):
        corner = lie.transform_point(T_box, signs[k] * half)
        p, n, d = sphere_heightmap(corner, 0.0, T_hm, heights, scale)
        pts.append(p[0])
        ns.append(n[0])
        ds.append(d[0])
    return jnp.stack(pts), jnp.stack(ns), jnp.stack(ds)
