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
