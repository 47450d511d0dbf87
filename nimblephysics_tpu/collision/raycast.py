"""Raycasts against world shapes (reference: dart/collision/Raycast*.hpp,
tested by unittests/unit/test_Raycast.cpp).

Differentiable analytic ray-primitive tests with masked min-reduction over
a static shape list — `raycast(world, q, origin, direction)` jits and
vmaps (batched lidar over batched worlds).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.dynamics import shapes as SH
from nimblephysics_tpu.math import lie
from nimblephysics_tpu.simulation.world import World, world_fk

_BIG = 1e10


class RayHit(NamedTuple):
    """Reference parity: collision::RaycastResult."""

    hit: jnp.ndarray  # bool
    fraction: jnp.ndarray  # distance along the (unit) ray
    point: jnp.ndarray  # (3,)
    normal: jnp.ndarray  # (3,)
    body: jnp.ndarray  # int32 global body index (-1 = none)


def _ray_sphere(o, d, center, radius):
    oc = o - center
    b = jnp.dot(oc, d)
    c = jnp.dot(oc, oc) - radius * radius
    disc = b * b - c
    safe = jnp.sqrt(jnp.maximum(disc, 1e-18))
    t = -b - safe
    t = jnp.where((disc >= 0) & (t > 0), t, _BIG)
    p = o + t * d
    n = _safe_unit(p - center)
    return t, p, n


def _safe_unit(v):
    n2 = jnp.sum(v * v)
    return v / jnp.sqrt(jnp.maximum(n2, 1e-18))


def _ray_plane(o, d, normal, offset):
    denom = jnp.dot(normal, d)
    t = (offset - jnp.dot(normal, o)) / jnp.where(
        jnp.abs(denom) < 1e-12, 1e-12, denom
    )
    t = jnp.where((jnp.abs(denom) >= 1e-12) & (t > 0), t, _BIG)
    return t, o + t * d, normal * jnp.sign(-denom)


def _ray_box(o, d, T_box, half):
    # Slab method in the box frame.
    Ti = lie.transform_inv(T_box)
    ol = lie.transform_point(Ti, o)
    dl = lie.transform_vector(Ti, d)
    inv = 1.0 / jnp.where(jnp.abs(dl) < 1e-12, 1e-12, dl)
    t1 = (-half - ol) * inv
    t2 = (half - ol) * inv
    tmin = jnp.max(jnp.minimum(t1, t2))
    tmax = jnp.min(jnp.maximum(t1, t2))
    hit = (tmax >= jnp.maximum(tmin, 0.0))
    t = jnp.where(hit & (tmin > 0), tmin, _BIG)
    pl = ol + t * dl
    # face normal: the axis where |p| is closest to its half extent
    rel = jnp.abs(jnp.abs(pl) - half)
    axis = jnp.argmin(rel)
    nl = jnp.zeros(3).at[axis].set(jnp.sign(pl[axis]))
    return t, lie.transform_point(T_box, pl), lie.transform_vector(T_box, nl)


def _ray_capsule(o, d, T_cap, radius, height):
    # Distance from ray to the capsule segment, via a few closest-point
    # iterations (exact for infinite cylinder+caps tests is messier; sphere
    # sweep gives the standard result).
    z = lie.transform_vector(T_cap, jnp.array([0.0, 0.0, 1.0], dtype=o.dtype))
    c = T_cap[:3, 3]
    a = c - z * height / 2
    b = c + z * height / 2
    # Parametric min over segment samples (static 9 samples + sphere test).
    ts = jnp.linspace(0.0, 1.0, 9)
    best = (jnp.asarray(_BIG, o.dtype), o, z)
    tt = jnp.full((9,), _BIG, dtype=o.dtype)
    ps = jnp.zeros((9, 3), dtype=o.dtype)
    ns = jnp.zeros((9, 3), dtype=o.dtype)
    for i in range(9):
        ctr = a + ts[i] * (b - a)
        t, p, nrm = _ray_sphere(o, d, ctr, radius)
        tt = tt.at[i].set(t)
        ps = ps.at[i].set(p)
        ns = ns.at[i].set(nrm)
    k = jnp.argmin(tt)
    return tt[k], ps[k], ns[k]


def raycast(
    world: World,
    q: jnp.ndarray,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
) -> RayHit:
    """Cast one ray against every collidable shape; nearest hit wins."""
    d = _safe_unit(jnp.asarray(direction))
    o = jnp.asarray(origin)
    T_wb = world_fk(world, q)
    body_off = world.body_offsets()

    ts, ps, ns, bids = [], [], [], []
    for si, skel in enumerate(world.skeletons):
        for bi, body in enumerate(skel.bodies):
            gb = body_off[si] + bi
            for shape in body.shapes:
                if not shape.collidable:
                    continue
                T_ws = T_wb[gb] @ jnp.asarray(shape.T_offset, dtype=q.dtype)
                st = shape.shape_type
                size = np.asarray(shape.size, dtype=np.float64)
                if st in (SH.SPHERE, SH.ELLIPSOID):
                    r = float(size[0]) if st == SH.SPHERE else float(size.mean() / 2)
                    t, p, nrm = _ray_sphere(o, d, T_ws[:3, 3], r)
                elif st == SH.BOX:
                    t, p, nrm = _ray_box(
                        o, d, T_ws, jnp.asarray(size / 2, dtype=q.dtype)
                    )
                elif st == SH.PLANE:
                    params = size.reshape(-1)
                    n_l = jnp.asarray(
                        params[:3] / np.linalg.norm(params[:3]), dtype=q.dtype
                    )
                    n_w = lie.transform_vector(T_ws, n_l)
                    off = (params[3] if params.size > 3 else 0.0) + jnp.dot(
                        n_w, T_ws[:3, 3]
                    )
                    t, p, nrm = _ray_plane(o, d, n_w, off)
                elif st in (SH.CAPSULE, SH.CYLINDER, SH.CONE):
                    t, p, nrm = _ray_capsule(
                        o, d, T_ws, float(size[0]), float(size[1])
                    )
                else:
                    continue
                ts.append(t)
                ps.append(p)
                ns.append(nrm)
                bids.append(gb)

    if not ts:
        z3 = jnp.zeros(3, dtype=q.dtype)
        return RayHit(jnp.asarray(False), jnp.asarray(_BIG, q.dtype), z3, z3,
                      jnp.asarray(-1, jnp.int32))
    tarr = jnp.stack(ts)
    k = jnp.argmin(tarr)
    hit = tarr[k] < _BIG * 0.5
    return RayHit(
        hit,
        tarr[k],
        jnp.stack(ps)[k],
        jnp.stack(ns)[k],
        jnp.where(hit, jnp.asarray(bids)[k], -1).astype(jnp.int32),
    )
