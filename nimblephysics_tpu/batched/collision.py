"""Batch-minor narrowphase: the collider's static pair plan evaluated with
the world batch in the trailing lane axis.

Formula parity with collision/narrowphase.py (the TPU re-design of
dart/collision/dart/DARTCollide.cpp); pair kinds without a native batched
implementation fall back to vmapping the single-world primitive over a
transposed (batch-major) view — correct everywhere, fast where it matters.

Per-slot outputs: point (k, 3, B), normal (k, 3, B), depth (k, B).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.batched import linalg as bl
from nimblephysics_tpu.collision.collider import Collider, _PairSlot, _sphere_radius

_EPS = 1e-12


def _safe_normalize_b(v, fallback):
    """(3, B) normalize with AD-safe zero guard; fallback (3,) static."""
    n2 = jnp.sum(v * v, axis=0, keepdims=True)
    safe = jnp.where(n2 < _EPS, 1.0, n2)
    unit = v / jnp.sqrt(safe)
    fb = jnp.broadcast_to(
        jnp.asarray(fallback, dtype=v.dtype)[:, None], v.shape
    )
    return jnp.where(n2 < _EPS, fb, unit)


def sphere_plane_b(center, radius, n_w, d_w):
    """center (3, B), radius static, plane normal (3, B), offset (B,)."""
    dist = bl.dot(center, n_w) - d_w
    depth = radius - dist
    point = center - n_w * (radius - 0.5 * depth)[None, :]
    return point[None], n_w[None], depth[None]


def sphere_sphere_b(c_a, r_a, c_b, r_b):
    d = c_a - c_b
    d2 = jnp.sum(d * d, axis=0)
    dist = jnp.where(d2 < _EPS, 0.0, jnp.sqrt(jnp.where(d2 < _EPS, 1.0, d2)))
    n = _safe_normalize_b(d, (0.0, 0.0, 1.0))
    depth = (r_a + r_b) - dist
    point = c_b + n * (r_b - 0.5 * depth)[None, :]
    return point[None], n[None], depth[None]


def sphere_box_b(center, radius, R_box, p_box, half):
    """Matches narrowphase.sphere_box. half: static (3,) numpy."""
    dtype = center.dtype
    c_local = bl.mtv(R_box, center - p_box)  # (3, B)
    h = jnp.asarray(half, dtype=dtype)[:, None]
    clamped = jnp.clip(c_local, -h, h)
    delta = c_local - clamped
    outside = jnp.sum(delta * delta, axis=0) > _EPS

    n_out = _safe_normalize_b(delta, (0.0, 0.0, 1.0))
    d2 = jnp.sum(delta * delta, axis=0)
    dist_out = jnp.where(outside, jnp.sqrt(jnp.where(outside, d2, 1.0)), 0.0)

    face_dist = h - jnp.abs(c_local)  # (3, B)
    axis = jnp.argmin(face_dist, axis=0)  # (B,)
    onehot = jnp.stack([axis == 0, axis == 1, axis == 2]).astype(dtype)
    sign = jnp.sign(jnp.sum(c_local * onehot, axis=0) + _EPS)
    n_in = onehot * sign[None, :]
    dist_in = -jnp.min(face_dist, axis=0)

    n_local = jnp.where(outside[None, :], n_out, n_in)
    dist = jnp.where(outside, dist_out, dist_in)
    depth = radius - dist
    n_world = bl.mv(R_box, n_local)
    surf_local = jnp.where(
        outside[None, :], clamped, c_local - n_local * dist_in[None, :]
    )
    point_world = bl.mv(R_box, surf_local) + p_box
    point = 0.5 * (point_world + (center - n_world * radius))
    return point[None], n_world[None], depth[None]


_BOX_SIGNS = np.array(
    [
        [sx, sy, sz]
        for sx in (-1.0, 1.0)
        for sy in (-1.0, 1.0)
        for sz in (-1.0, 1.0)
    ]
)


def box_plane_b(R_box, p_box, half, n_w, d_w):
    pts, nrms, deps = [], [], []
    for s in _BOX_SIGNS:
        corner = bl.mv(R_box, bl.const(s * half, R_box.dtype)) + p_box
        dist = bl.dot(corner, n_w) - d_w
        depth = -dist
        pts.append(corner + 0.5 * depth[None, :] * n_w)
        nrms.append(n_w)
        deps.append(depth)
    return jnp.stack(pts), jnp.stack(nrms), jnp.stack(deps)


def capsule_plane_b(R_cap, p_cap, radius, height, n_w, d_w):
    axis = R_cap[:, 2]  # local z in world, (3, B)
    outs = []
    for sgn in (1.0, -1.0):
        end = p_cap + axis * (sgn * height / 2.0)
        outs.append(sphere_plane_b(end, radius, n_w, d_w))
    return tuple(jnp.concatenate([o[i] for o in outs]) for i in range(3))


def _segment_closest_b(p, a, b):
    ab = b - a
    denom = jnp.maximum(jnp.sum(ab * ab, axis=0), _EPS)
    t = jnp.clip(bl.dot(p - a, ab) / denom, 0.0, 1.0)
    return a + t[None, :] * ab


def capsule_sphere_b(R_cap, p_cap, r_c, h, c_sphere, r_s):
    axis = R_cap[:, 2]
    a = p_cap - axis * (h / 2.0)
    b = p_cap + axis * (h / 2.0)
    closest = _segment_closest_b(c_sphere, a, b)
    return sphere_sphere_b(closest, r_c, c_sphere, r_s)


def _segment_segment_b(a0, a1, b0, b1):
    d1 = a1 - a0
    d2 = b1 - b0
    r = a0 - b0
    a = jnp.sum(d1 * d1, axis=0)
    e = jnp.sum(d2 * d2, axis=0)
    f = jnp.sum(d2 * r, axis=0)
    c = jnp.sum(d1 * r, axis=0)
    b = jnp.sum(d1 * d2, axis=0)
    denom = jnp.maximum(a * e - b * b, _EPS)
    s = jnp.clip((b * f - c * e) / denom, 0.0, 1.0)
    t = jnp.clip((b * s + f) / jnp.maximum(e, _EPS), 0.0, 1.0)
    s = jnp.clip((b * t - c) / jnp.maximum(a, _EPS), 0.0, 1.0)
    return a0 + s[None, :] * d1, b0 + t[None, :] * d2


def capsule_capsule_b(R_a, p_a, r_a, h_a, R_b, p_b, r_b, h_b):
    za, zb = R_a[:, 2], R_b[:, 2]
    pa, pb = _segment_segment_b(
        p_a - za * (h_a / 2.0),
        p_a + za * (h_a / 2.0),
        p_b - zb * (h_b / 2.0),
        p_b + zb * (h_b / 2.0),
    )
    return sphere_sphere_b(pa, r_a, pb, r_b)


def capsule_box_b(R_cap, p_cap, radius, height, R_box, p_box, half):
    axis = R_cap[:, 2]
    outs = []
    for sgn in (-1.0, 1.0):
        end = p_cap + axis * (sgn * height / 2.0)
        outs.append(sphere_box_b(end, radius, R_box, p_box, half))
    return tuple(jnp.concatenate([o[i] for o in outs]) for i in range(3))


# ---------------------------------------------------------------------------
# Native batch-minor box-box SAT (lane-major port of
# collision/narrowphase.box_box_sat — the ODE-style clipped manifold,
# DARTCollide.cpp:1452 collideBoxBox re-design). All vectors are (3, B),
# scalars (B,); the manifold is the same static 8-slot layout.
# ---------------------------------------------------------------------------


def _one_hot_b(idx, n, dtype):
    """(B,) int -> (n, B) one-hot, lane-major."""
    return (
        idx[None, :] == jnp.arange(n, dtype=idx.dtype)[:, None]
    ).astype(dtype)


def _box_face_manifold_b(R_r, p_r, h_r, R_i, p_i, h_i, face_idx, flip_normal):
    """Lane-major port of narrowphase._box_face_manifold.

    face_idx: (B,) traced ints in [0, 3). h_r/h_i: static (3,) numpy.
    Returns (points (8,3,B), normals (8,3,B), depths (8,B)).
    """
    dtype = R_r.dtype
    B = p_r.shape[-1]
    h_r_j = jnp.asarray(h_r, dtype=dtype)
    h_i_j = jnp.asarray(h_i, dtype=dtype)
    e = _one_hot_b(face_idx, 3, dtype)  # (3, B)
    e_u = _one_hot_b((face_idx + 1) % 3, 3, dtype)
    e_v = _one_hot_b((face_idx + 2) % 3, 3, dtype)
    a_r = bl.mv(R_r, e)
    sgn = jnp.sign(bl.dot(a_r, p_i - p_r) + 1e-30)
    n_ref = a_r * sgn[None, :]
    u = bl.mv(R_r, e_u)
    v = bl.mv(R_r, e_v)
    h_face = jnp.sum(h_r_j[:, None] * e, axis=0)  # (B,)
    h_u = jnp.sum(h_r_j[:, None] * e_u, axis=0)
    h_v = jnp.sum(h_r_j[:, None] * e_v, axis=0)
    face_origin = p_r + n_ref * h_face[None, :]

    dots = bl.mtv(R_i, n_ref)  # (3, B)
    inc_idx = jnp.argmax(jnp.abs(dots), axis=0)  # (B,)
    ei = _one_hot_b(inc_idx, 3, dtype)
    ei_u = _one_hot_b((inc_idx + 1) % 3, 3, dtype)
    ei_v = _one_hot_b((inc_idx + 2) % 3, 3, dtype)
    s_i = -jnp.sign(jnp.sum(dots * ei, axis=0) + 1e-30)
    n_inc = bl.mv(R_i, ei) * s_i[None, :]
    inc_center = p_i + n_inc * jnp.sum(h_i_j[:, None] * ei, axis=0)[None, :]
    iu = bl.mv(R_i, ei_u)
    iv = bl.mv(R_i, ei_v)
    hi_u = jnp.sum(h_i_j[:, None] * ei_u, axis=0)  # (B,)
    hi_v = jnp.sum(h_i_j[:, None] * ei_v, axis=0)

    corner_signs = np.asarray(
        [[1.0, 1.0], [1.0, -1.0], [-1.0, -1.0], [-1.0, 1.0]]
    )
    corners3d = jnp.stack(
        [
            inc_center
            + float(corner_signs[c, 0]) * hi_u[None, :] * iu
            + float(corner_signs[c, 1]) * hi_v[None, :] * iv
            for c in range(4)
        ]
    )  # (4, 3, B)
    rel = corners3d - face_origin[None]
    quad = jnp.stack(
        [jnp.sum(rel * u[None], axis=1), jnp.sum(rel * v[None], axis=1)],
        axis=1,
    )  # (4, 2, B)
    rect = jnp.asarray(corner_signs, dtype=dtype)[:, :, None] * jnp.stack(
        [h_u, h_v]
    )[None, :, :]  # (4, 2, B)

    # (a) incident corners inside the rect.
    in_rect = (jnp.abs(quad[:, 0]) <= h_u[None, :] + 1e-9) & (
        jnp.abs(quad[:, 1]) <= h_v[None, :] + 1e-9
    )  # (4, B)
    # (b) rect corners inside the incident quad.
    qa = quad
    qb = jnp.roll(quad, -1, axis=0)
    edge = qb - qa  # (4, 2, B)
    rel_r = rect[:, None] - qa[None]  # (4 rect, 4 edge, 2, B)
    cross2 = (
        edge[None, :, 0] * rel_r[:, :, 1] - edge[None, :, 1] * rel_r[:, :, 0]
    )  # (4, 4, B)
    in_quad = jnp.all(cross2 <= 1e-9, axis=1) | jnp.all(
        cross2 >= -1e-9, axis=1
    )  # (4, B)
    # (c) quad-edge x rect-edge intersections.
    ra = rect
    rb = jnp.roll(rect, -1, axis=0)
    d1 = qb - qa
    d2 = rb - ra
    denom = (
        d1[:, None, 0] * d2[None, :, 1] - d1[:, None, 1] * d2[None, :, 0]
    )  # (4, 4, B)
    degen = jnp.abs(denom) < 1e-12
    denom_s = jnp.where(degen, 1.0, denom)
    diff = ra[None, :] - qa[:, None]  # (4, 4, 2, B)
    t = (
        diff[:, :, 0] * d2[None, :, 1] - diff[:, :, 1] * d2[None, :, 0]
    ) / denom_s
    s = (
        diff[:, :, 0] * d1[:, None, 1] - diff[:, :, 1] * d1[:, None, 0]
    ) / denom_s
    inter_ok = (
        (~degen)
        & (t >= -1e-9)
        & (t <= 1.0 + 1e-9)
        & (s >= -1e-9)
        & (s <= 1.0 + 1e-9)
    )  # (4, 4, B)
    inter_pts = qa[:, None] + t[:, :, None] * d1[:, None]  # (4, 4, 2, B)

    cand = jnp.concatenate(
        [quad, rect, inter_pts.reshape(16, 2, B)], axis=0
    )  # (24, 2, B)
    cand_ok = jnp.concatenate(
        [in_rect, in_quad, inter_ok.reshape(16, B)], axis=0
    )  # (24, B)

    denom_p = bl.dot(n_inc, n_ref)  # (B,)
    denom_p = jnp.where(jnp.abs(denom_p) < 1e-6, -1e-6, denom_p)
    c0 = bl.dot(n_inc, face_origin - inc_center) / denom_p
    c1 = bl.dot(n_inc, u) / denom_p
    c2 = bl.dot(n_inc, v) / denom_p
    depth_cand = c0[None, :] + c1[None, :] * cand[:, 0] + c2[None, :] * cand[:, 1]
    depth_cand = jnp.where(cand_ok, depth_cand, -1.0)  # (24, B)

    # Top-8 by iterative masked max (stays lane-major; depth floor is -1,
    # masked-out candidates drop to -2 and read as invalid).
    sel_list, dep_list = [], []
    dc = depth_cand
    for _ in range(8):
        idx = jnp.argmax(dc, axis=0)  # (B,)
        oh = _one_hot_b(idx, 24, dtype)  # (24, B)
        dep_list.append(jnp.sum(dc * oh, axis=0))
        sel_list.append(jnp.sum(cand * oh[:, None], axis=0))  # (2, B)
        dc = jnp.where(oh > 0, -2.0, dc)
    depths = jnp.stack(dep_list)  # (8, B)
    sel = jnp.stack(sel_list)  # (8, 2, B)

    n_contact = -n_ref if flip_normal else n_ref
    surf = (
        face_origin[None]
        + sel[:, 0][:, None] * u[None]
        + sel[:, 1][:, None] * v[None]
        - depths[:, None] * n_ref[None]
    )  # (8, 3, B)
    points = surf + 0.5 * depths[:, None] * n_ref[None]
    normals = jnp.broadcast_to(n_contact[None], (8, 3, B))
    return points, normals, depths


def _box_edge_contact_b(R_a, p_a, h_a, R_b, p_b, h_b, edge_idx, axis_w, sep):
    """Lane-major port of narrowphase._box_edge_contact.

    edge_idx: (B,) ints (3*i + j); axis_w (3, B); sep (B,)."""
    dtype = R_a.dtype
    B = p_a.shape[-1]
    h_a_j = jnp.asarray(h_a, dtype=dtype)
    h_b_j = jnp.asarray(h_b, dtype=dtype)
    ei = _one_hot_b(edge_idx // 3, 3, dtype)  # (3, B)
    ej = _one_hot_b(edge_idx % 3, 3, dtype)
    u = axis_w
    sa = jnp.sign(bl.mtv(R_a, u) + 1e-30) * (1.0 - ei)
    ca = p_a + bl.mv(R_a, sa * h_a_j[:, None])
    da = bl.mv(R_a, ei)
    sb = jnp.sign(bl.mtv(R_b, -u) + 1e-30) * (1.0 - ej)
    cb = p_b + bl.mv(R_b, sb * h_b_j[:, None])
    db = bl.mv(R_b, ej)
    r = cb - ca
    a_ = bl.dot(da, da)
    b_ = bl.dot(da, db)
    e_ = bl.dot(db, db)
    c_ = bl.dot(da, r)
    f_ = bl.dot(db, r)
    den = jnp.maximum(a_ * e_ - b_ * b_, 1e-12)
    t = (c_ * e_ - b_ * f_) / den
    s = (b_ * c_ - a_ * f_) / den
    la = jnp.sum(h_a_j[:, None] * ei, axis=0)
    lb = jnp.sum(h_b_j[:, None] * ej, axis=0)
    t = jnp.clip(t, -la, la)
    s = jnp.clip(s, -lb, lb)
    point = 0.5 * ((ca + t[None, :] * da) + (cb + s[None, :] * db))
    points = jnp.broadcast_to(point[None], (8, 3, B))
    normals = jnp.broadcast_to(-u[None], (8, 3, B))
    depths = jnp.concatenate(
        [(-sep)[None], jnp.full((7, B), -1.0, dtype=dtype)]
    )
    return points, normals, depths


def box_box_b(R_a, p_a, half_a, R_b, p_b, half_b):
    """Batch-minor box-box SAT + clipped 8-slot manifold.

    Formula parity with narrowphase.box_box_sat (same axis scoring,
    penalties, and manifold construction); everything (.., B) lane-major
    so Atlas-class box-heavy worlds stay on the native fast path.
    """
    dtype = R_a.dtype
    B = p_a.shape[-1]
    ha = np.asarray(half_a, dtype=np.float64)
    hb = np.asarray(half_b, dtype=np.float64)
    # jnp constants at the engine dtype: bare numpy scalars are strongly
    # typed and would promote the whole manifold to f64 under x64.
    ha_j = jnp.asarray(ha, dtype=dtype)
    hb_j = jnp.asarray(hb, dtype=dtype)
    C = bl.mtm(R_a, R_b)  # (3, 3, B): R_a^T R_b
    absC = jnp.abs(C) + 1e-9
    t = bl.mtv(R_a, p_b - p_a)  # (3, B)

    seps, world_axes, penalties = [], [], []
    # Face axes of A (3).
    for i in range(3):
        sep = jnp.abs(t[i]) - (
            ha_j[i] + jnp.sum(absC[i] * hb_j[:, None], axis=0)
        )
        world_axes.append(R_a[:, i] * jnp.sign(t[i] + 1e-30)[None, :])
        seps.append(sep)
        penalties.append(0.0)
    # Face axes of B (3).
    tb = bl.mtv(C, t)  # C^T t: A->B center offset in B frame
    for j in range(3):
        sep = jnp.abs(tb[j]) - (
            hb_j[j] + jnp.sum(absC[:, j] * ha_j[:, None], axis=0)
        )
        world_axes.append(R_b[:, j] * jnp.sign(tb[j] + 1e-30)[None, :])
        seps.append(sep)
        penalties.append(0.0)
    # Edge-cross axes (9): a_i x b_j, AD-safe double-where at parallelism.
    for i in range(3):
        for j in range(3):
            axis = bl.cross(R_a[:, i], R_b[:, j])  # (3, B)
            n2 = jnp.sum(axis * axis, axis=0)
            degen = n2 < 1e-12
            norm = jnp.sqrt(jnp.where(degen, 1.0, n2))
            norm = jnp.where(degen, 0.0, norm)
            u = jnp.where(degen[None, :], 0.0, axis) / jnp.where(
                degen, 1.0, norm
            )[None, :]
            ra = jnp.sum(ha_j[:, None] * jnp.abs(bl.mtv(R_a, u)), axis=0)
            rb = jnp.sum(hb_j[:, None] * jnp.abs(bl.mtv(R_b, u)), axis=0)
            dist = bl.dot(u, p_b - p_a)
            sep = jnp.abs(dist) - (ra + rb)
            sep = jnp.where(
                norm < 1e-6, jnp.asarray(-jnp.inf, dtype=dtype), sep
            )
            world_axes.append(u * jnp.sign(dist + 1e-30)[None, :])
            seps.append(sep)
            penalties.append(1e-4)

    seps_arr = jnp.stack(seps)  # (15, B)
    pen_arr = jnp.asarray(penalties, dtype=dtype)[:, None]
    axes_arr = jnp.stack(world_axes)  # (15, 3, B)
    score = seps_arr - pen_arr
    best = jnp.argmax(score, axis=0)  # (B,)
    separated = jnp.max(seps_arr, axis=0) >= 0.0  # (B,)

    bestA = jnp.argmax(score[0:3], axis=0)
    bestB = jnp.argmax(score[3:6], axis=0)
    ptsA, nrmA, depA = _box_face_manifold_b(
        R_a, p_a, ha, R_b, p_b, hb, bestA, flip_normal=True
    )
    ptsB, nrmB, depB = _box_face_manifold_b(
        R_b, p_b, hb, R_a, p_a, ha, bestB, flip_normal=False
    )
    bestE = jnp.argmax(score[6:15], axis=0)  # (B,)
    ohE = _one_hot_b(bestE, 9, dtype)  # (9, B)
    axisE = jnp.sum(axes_arr[6:15] * ohE[:, None], axis=0)  # (3, B)
    # where-gather (not multiply): degenerate rows hold -inf and
    # -inf * 0 = nan would poison the sum.
    sepE = jnp.sum(jnp.where(ohE > 0, seps_arr[6:15], 0.0), axis=0)
    ptsE, nrmE, depE = _box_edge_contact_b(
        R_a, p_a, ha, R_b, p_b, hb, bestE, axisE, sepE
    )

    is_face_a = (best < 3)[None, None, :]
    is_face_b = ((best >= 3) & (best < 6))[None, None, :]
    pts = jnp.where(is_face_a, ptsA, jnp.where(is_face_b, ptsB, ptsE))
    nrm = jnp.where(is_face_a, nrmA, jnp.where(is_face_b, nrmB, nrmE))
    dep = jnp.where(
        is_face_a[:, 0], depA, jnp.where(is_face_b[:, 0], depB, depE)
    )
    dep = jnp.where(separated[None, :], -jnp.ones_like(dep), dep)
    return pts, nrm, dep


def _to_T_major(R, p, B):
    """(3,3,B)/(3,B) -> batch-major (B, 4, 4) for the vmap fallback."""
    Rb = jnp.moveaxis(jnp.broadcast_to(R, (3, 3, B)), -1, 0)  # (B, 3, 3)
    pb = jnp.moveaxis(jnp.broadcast_to(p, (3, B)), -1, 0)  # (B, 3)
    top = jnp.concatenate([Rb, pb[:, :, None]], axis=2)
    bot = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=R.dtype)[None, None, :],
        (B, 1, 4),
    )
    return jnp.concatenate([top, bot], axis=1)


class BatchedCollider:
    """Evaluates a Collider's static slot plan batch-minor."""

    NATIVE = {
        "sphere_plane",
        "sphere_sphere",
        "sphere_box",
        "box_plane",
        "box_box",
        "capsule_plane",
        "capsule_sphere",
        "capsule_capsule",
        "capsule_box",
    }

    def __init__(self, collider: Collider):
        self.collider = collider
        self.slots = collider.slots
        # Static per-contact metadata (mirrors Collider.collide()).
        ba, bb, mu, e = [], [], [], []
        for slot in self.slots:
            k = slot.n_slots
            ba += [slot.body_a] * k
            bb += [slot.body_b] * k
            mu += [min(slot.shape_a.friction, slot.shape_b.friction)] * k
            e += [slot.shape_a.restitution * slot.shape_b.restitution] * k
        self.body_a = np.asarray(ba, dtype=np.int32)
        self.body_b = np.asarray(bb, dtype=np.int32)
        self.mu = np.asarray(mu)
        self.restitution = np.asarray(e)
        self.num_contacts = collider.num_contacts

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other

    def _shape_T(self, R_wb, p_wb, body, T_off, dtype):
        R = bl.mm(R_wb[body], bl.const(T_off[:3, :3], dtype))
        p = bl.mv(R_wb[body], bl.const(T_off[:3, 3], dtype)) + p_wb[body]
        return R, p

    def _plane_world(self, spec, R, p, dtype):
        params = np.asarray(spec.size, dtype=np.float64).reshape(-1)
        n_local = params[:3] / np.linalg.norm(params[:3])
        d_local = float(params[3]) if params.size > 3 else 0.0
        n_w = bl.mv(R, bl.const(n_local, dtype))
        d_w = d_local + bl.dot(n_w, p)
        return n_w, d_w

    def collide(self, R_wb: List, p_wb: List, B: int):
        """All slots -> (point (C,3,B), normal (C,3,B), depth (C,B))."""
        dtype = R_wb[0].dtype if R_wb else jnp.float32
        pts, nrms, deps = [], [], []
        for slot in self.slots:
            sa, sb = slot.shape_a, slot.shape_b
            Ra, pa = self._shape_T(R_wb, p_wb, slot.body_a, sa.T_offset, dtype)
            Rb, pb = self._shape_T(R_wb, p_wb, slot.body_b, sb.T_offset, dtype)
            pa = jnp.broadcast_to(pa, (3, B))
            pb = jnp.broadcast_to(pb, (3, B))
            Ra = jnp.broadcast_to(Ra, (3, 3, B))
            Rb = jnp.broadcast_to(Rb, (3, 3, B))
            k = slot.kind
            if k == "sphere_plane":
                n_w, d_w = self._plane_world(sb, Rb, pb, dtype)
                out = sphere_plane_b(pa, _sphere_radius(sa), n_w, d_w)
            elif k == "sphere_sphere":
                out = sphere_sphere_b(
                    pa, _sphere_radius(sa), pb, _sphere_radius(sb)
                )
            elif k == "sphere_box":
                out = sphere_box_b(
                    pa, _sphere_radius(sa), Rb, pb, np.asarray(sb.size) / 2.0
                )
            elif k == "box_plane":
                n_w, d_w = self._plane_world(sb, Rb, pb, dtype)
                out = box_plane_b(Ra, pa, np.asarray(sa.size) / 2.0, n_w, d_w)
            elif k == "box_box":
                out = box_box_b(
                    Ra, pa, np.asarray(sa.size) / 2.0,
                    Rb, pb, np.asarray(sb.size) / 2.0,
                )
            elif k == "capsule_plane":
                n_w, d_w = self._plane_world(sb, Rb, pb, dtype)
                out = capsule_plane_b(
                    Ra, pa, float(sa.size[0]), float(sa.size[1]), n_w, d_w
                )
            elif k == "capsule_sphere":
                out = capsule_sphere_b(
                    Ra, pa, float(sa.size[0]), float(sa.size[1]),
                    pb, _sphere_radius(sb),
                )
            elif k == "capsule_capsule":
                out = capsule_capsule_b(
                    Ra, pa, float(sa.size[0]), float(sa.size[1]),
                    Rb, pb, float(sb.size[0]), float(sb.size[1]),
                )
            elif k == "capsule_box":
                out = capsule_box_b(
                    Ra, pa, float(sa.size[0]), float(sa.size[1]),
                    Rb, pb, np.asarray(sb.size) / 2.0,
                )
            else:
                out = self._fallback(slot, Ra, pa, Rb, pb, B, dtype)
            p, n, d = out
            pts.append(p)
            nrms.append(n)
            deps.append(d)
        if not pts:
            return (
                jnp.zeros((0, 3, B), dtype=dtype),
                jnp.zeros((0, 3, B), dtype=dtype),
                jnp.zeros((0, B), dtype=dtype),
            )
        return (
            jnp.concatenate(pts),
            jnp.concatenate(nrms),
            jnp.concatenate(deps),
        )

    def _fallback(self, slot, Ra, pa, Rb, pb, B, dtype):
        """vmap the single-world primitive over a batch-major view
        (used for pair kinds without a native batched form, e.g. box_box)."""
        Ta = _to_T_major(Ra, pa, B)
        Tb = _to_T_major(Rb, pb, B)
        p, n, d = jax.vmap(
            lambda Ta_, Tb_: self.collider._dispatch(slot, Ta_, Tb_, dtype)
        )(Ta, Tb)
        return (
            jnp.moveaxis(p, 0, -1),
            jnp.moveaxis(n, 0, -1),
            jnp.moveaxis(d, 0, -1),
        )
