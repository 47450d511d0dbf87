"""Collider: static shape-pair enumeration -> fixed-size masked contact set.

TPU-native re-design of the reference collision pipeline
(dart/collision/dart/DARTCollisionDetector.cpp:182-212 — O(n^2) pairwise
broadphase with a BodyNodeCollisionFilter skipping joint-adjacent bodies,
then per-pair narrowphase). Here the pair list is enumerated ONCE at build
time from the static world spec; `collide` lowers to straight-line masked
arithmetic with a compile-time-fixed contact count, so it vmaps across
thousands of worlds.

Supported shape pairs mirror the reference backend (sphere, box, capsule,
ellipsoid-as-sphere, plane; DARTCollisionDetector.cpp:283-308) plus
box-box SAT (collideBoxBox) — convex meshes land with the mesh tier.
"""

from __future__ import annotations

import dataclasses
from typing import List, NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.collision import narrowphase as nphase
from nimblephysics_tpu.dynamics import shapes as SH
from nimblephysics_tpu.math import lie
from nimblephysics_tpu.simulation.world import World, world_fk


class Contacts(NamedTuple):
    """Fixed-size contact set (a pytree; all arrays share leading dim C).

    Reference parity: collision::Contact {point, normal, depth} plus the
    constraint-relevant combined coefficients. `normal` points from body B
    toward body A. Slots with depth <= 0 (or masked off) are invalid.
    """

    point: jnp.ndarray  # (C, 3) world
    normal: jnp.ndarray  # (C, 3) world, unit, B -> A
    depth: jnp.ndarray  # (C,) penetration (> 0 = touching)
    body_a: jnp.ndarray  # (C,) int32 global body index
    body_b: jnp.ndarray  # (C,) int32
    friction: jnp.ndarray  # (C,) combined mu  (min rule)
    restitution: jnp.ndarray  # (C,) combined e (product rule)

    @property
    def count(self) -> int:
        return self.point.shape[-2]

    def valid_mask(self) -> jnp.ndarray:
        return self.depth > 0.0


@dataclasses.dataclass(frozen=True)
class _PairSlot:
    kind: str  # narrowphase dispatch key
    body_a: int
    body_b: int
    shape_a: SH.ShapeSpec
    shape_b: SH.ShapeSpec
    n_slots: int
    hull_a: object = None  # convex.ConvexHull for mesh shapes
    hull_b: object = None


def _canonical_pair(sa: SH.ShapeSpec, sb: SH.ShapeSpec):
    """Order a shape pair into a supported canonical (kind, swap) form."""
    ta, tb = sa.shape_type, sb.shape_type
    # Ellipsoids collide as spheres (reference behavior).
    norm = {SH.ELLIPSOID: SH.SPHERE}
    ta_n, tb_n = norm.get(ta, ta), norm.get(tb, tb)
    table = {
        (SH.SPHERE, SH.SPHERE): ("sphere_sphere", 1),
        (SH.SPHERE, SH.PLANE): ("sphere_plane", 1),
        (SH.BOX, SH.PLANE): ("box_plane", 8),
        (SH.SPHERE, SH.BOX): ("sphere_box", 1),
        (SH.CAPSULE, SH.PLANE): ("capsule_plane", 2),
        (SH.CAPSULE, SH.SPHERE): ("capsule_sphere", 1),
        (SH.CAPSULE, SH.CAPSULE): ("capsule_capsule", 1),
        (SH.CAPSULE, SH.BOX): ("capsule_box", 3),
        (SH.BOX, SH.BOX): ("box_box", 8),
        # Convex mesh pairs (reference: DARTCollisionDetector.cpp:283-308
        # routes these through libccd MPR; here collision/convex.py).
        (SH.MESH, SH.PLANE): ("mesh_plane", 8),
        (SH.SPHERE, SH.MESH): ("sphere_mesh", 1),
        (SH.CAPSULE, SH.MESH): ("capsule_mesh", 3),
        (SH.BOX, SH.MESH): ("box_mesh", 8),
        (SH.MESH, SH.MESH): ("mesh_mesh", 8),
        # Heightmap terrain (reference: HeightmapShape.hpp).
        (SH.SPHERE, SH.HEIGHTMAP): ("sphere_heightmap", 1),
        (SH.CAPSULE, SH.HEIGHTMAP): ("capsule_heightmap", 3),
        (SH.BOX, SH.HEIGHTMAP): ("box_heightmap", 8),
        # Multi-sphere convex hulls collide as their sphere sets
        # (reference: MultiSphereConvexHullShape.hpp).
        (SH.MULTI_SPHERE, SH.PLANE): ("multisphere_plane", 0),
        (SH.SPHERE, SH.MULTI_SPHERE): ("sphere_multisphere", 0),
        (SH.CAPSULE, SH.MULTI_SPHERE): ("capsule_multisphere", 0),
        (SH.BOX, SH.MULTI_SPHERE): ("box_multisphere", 0),
        (SH.MULTI_SPHERE, SH.MULTI_SPHERE): ("multisphere_multisphere", 0),
        (SH.MULTI_SPHERE, SH.HEIGHTMAP): ("multisphere_heightmap", 0),
    }
    if (ta_n, tb_n) in table:
        kind, n = table[(ta_n, tb_n)]
        return kind, n, False
    if (tb_n, ta_n) in table:
        kind, n = table[(tb_n, ta_n)]
        return kind, n, True
    return None, 0, False


def _sphere_radius(spec: SH.ShapeSpec) -> float:
    if spec.shape_type == SH.ELLIPSOID:
        return float(np.mean(np.asarray(spec.size)) / 2.0)
    return float(np.asarray(spec.size).reshape(-1)[0])


class Collider:
    """Static collision plan for a World (identity-hashable, jit-static)."""

    def __init__(self, world: World):
        self.world = world
        self.slots: List[_PairSlot] = []
        self._build()

    def _build(self) -> None:
        w = self.world
        body_off = w.body_offsets()
        # Collect (global body index, shape, skeleton idx, local body idx).
        entries = []
        for si, skel in enumerate(w.skeletons):
            for bi, body in enumerate(skel.bodies):
                for shape in body.shapes:
                    if shape.collidable:
                        entries.append((body_off[si] + bi, si, bi, shape))

        def filtered(ga, si_a, bi_a, gb, si_b, bi_b) -> bool:
            """BodyNodeCollisionFilter parity (CollisionFilter.hpp:91-111):
            explicit ShouldCollide overrides win; same-skeleton pairs are
            skipped unless the skeleton enables self-collision, and
            joint-adjacent pairs additionally require the adjacent-body
            check flag (DART defaults: both disabled)."""
            key = (min(ga, gb), max(ga, gb))
            if key in w.collision_overrides:
                return not w.collision_overrides[key]
            if si_a != si_b:
                return False
            if bi_a == bi_b:
                return True
            skel = w.skeletons[si_a]
            if not skel.self_collision_enabled:
                return True
            ja = skel.joints
            adjacent = (
                ja[bi_a].parent == bi_b or ja[bi_b].parent == bi_a
            )
            return adjacent and not skel.adjacent_body_check

        def is_static(si) -> bool:
            return w.skeletons[si].num_dofs == 0

        hull_cache = {}

        def hull_of(spec):
            if id(spec) not in hull_cache:
                from nimblephysics_tpu.collision.convex import ConvexHull

                hull_cache[id(spec)] = ConvexHull.build(spec.mesh_vertices)
            return hull_cache[id(spec)]

        for i in range(len(entries)):
            for j in range(i + 1, len(entries)):
                ga, sa_i, ba_i, sa = entries[i]
                gb, sb_i, bb_i, sb = entries[j]
                if filtered(ga, sa_i, ba_i, gb, sb_i, bb_i):
                    continue
                if is_static(sa_i) and is_static(sb_i):
                    continue
                kind, n_slots, swap = _canonical_pair(sa, sb)
                if kind is None:
                    continue
                if swap:
                    ga, gb = gb, ga
                    sa, sb = sb, sa
                # Mesh pairs: hulls are built at plan time; slot counts
                # depend on the (decimated) hull vertex counts.
                hull_a = hull_b = None
                if sa.shape_type == SH.MESH:
                    if sa.mesh_vertices is None:
                        continue
                    hull_a = hull_of(sa)
                if sb.shape_type == SH.MESH:
                    if sb.mesh_vertices is None:
                        continue
                    hull_b = hull_of(sb)
                if "multisphere" in kind:
                    na_ = len(sa.spheres) if sa.shape_type == SH.MULTI_SPHERE else 1
                    nb_ = len(sb.spheres) if sb.shape_type == SH.MULTI_SPHERE else 1
                    if kind == "multisphere_multisphere":
                        n_slots = na_ * nb_
                    elif kind == "box_multisphere":
                        n_slots = nb_  # one sphere-box slot per sphere
                    elif kind == "capsule_multisphere":
                        n_slots = nb_
                    else:
                        n_slots = max(na_, nb_)
                if kind == "mesh_plane":
                    n_slots = min(8, len(hull_a.verts))
                elif kind == "box_mesh":
                    n_slots = 4 + min(4, len(hull_b.verts))
                elif kind == "mesh_mesh":
                    n_slots = min(4, len(hull_a.verts)) + min(
                        4, len(hull_b.verts)
                    )
                self.slots.append(
                    _PairSlot(kind, ga, gb, sa, sb, n_slots, hull_a, hull_b)
                )

    @property
    def num_contacts(self) -> int:
        n = sum(s.n_slots for s in self.slots)
        if self.world.max_contacts is not None:
            return min(n, self.world.max_contacts)
        return n

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other

    # -- narrowphase dispatch ------------------------------------------------

    def collide(
        self, q: jnp.ndarray, T_wb: Optional[jnp.ndarray] = None
    ) -> Contacts:
        """Run all narrowphase tests; returns the fixed-size contact set.

        Differentiable in q (contact points/normals/depths carry exact
        gradients, needed for the pos-vel Jacobian — reference analog:
        DifferentiableContactConstraint contact-position/normal gradients).
        """
        w = self.world
        dtype = q.dtype
        if T_wb is None:
            T_wb = world_fk(w, q)

        pts, nrm, dep, ba, bb, mu, e = [], [], [], [], [], [], []
        for slot in self.slots:
            Ta = T_wb[slot.body_a] @ jnp.asarray(
                slot.shape_a.T_offset, dtype=dtype
            )
            Tb = T_wb[slot.body_b] @ jnp.asarray(
                slot.shape_b.T_offset, dtype=dtype
            )
            p, n, d = self._dispatch(slot, Ta, Tb, dtype)
            k = p.shape[0]
            pts.append(p)
            nrm.append(n)
            dep.append(d)
            ba.append(np.full(k, slot.body_a, dtype=np.int32))
            bb.append(np.full(k, slot.body_b, dtype=np.int32))
            mu.append(
                np.full(
                    k,
                    min(slot.shape_a.friction, slot.shape_b.friction),
                    dtype=np.float64,
                )
            )
            e.append(
                np.full(
                    k,
                    slot.shape_a.restitution * slot.shape_b.restitution,
                    dtype=np.float64,
                )
            )

        if not pts:
            z3 = jnp.zeros((0, 3), dtype=dtype)
            z1 = jnp.zeros((0,), dtype=dtype)
            zi = jnp.zeros((0,), dtype=jnp.int32)
            return Contacts(z3, z3, z1, zi, zi, z1, z1)

        return Contacts(
            point=jnp.concatenate(pts),
            normal=jnp.concatenate(nrm),
            depth=jnp.concatenate(dep),
            body_a=jnp.asarray(np.concatenate(ba)),
            body_b=jnp.asarray(np.concatenate(bb)),
            friction=jnp.asarray(np.concatenate(mu), dtype=dtype),
            restitution=jnp.asarray(np.concatenate(e), dtype=dtype),
        )

    def _dispatch(self, slot: _PairSlot, Ta, Tb, dtype):
        sa, sb = slot.shape_a, slot.shape_b
        k = slot.kind
        if k == "sphere_sphere":
            return nphase.sphere_sphere(
                Ta[:3, 3], _sphere_radius(sa), Tb[:3, 3], _sphere_radius(sb)
            )
        if k == "sphere_plane":
            n_w, d_w = _plane_world(sb, Tb, dtype)
            return nphase.sphere_plane(Ta[:3, 3], _sphere_radius(sa), n_w, d_w)
        if k == "box_plane":
            n_w, d_w = _plane_world(sb, Tb, dtype)
            half = jnp.asarray(sa.size, dtype=dtype) / 2.0
            return nphase.box_plane(Ta, half, n_w, d_w)
        if k == "sphere_box":
            half = jnp.asarray(sb.size, dtype=dtype) / 2.0
            return nphase.sphere_box(Ta[:3, 3], _sphere_radius(sa), Tb, half)
        if k == "capsule_plane":
            n_w, d_w = _plane_world(sb, Tb, dtype)
            r, h = float(sa.size[0]), float(sa.size[1])
            return nphase.capsule_plane(Ta, r, h, n_w, d_w)
        if k == "capsule_sphere":
            r, h = float(sa.size[0]), float(sa.size[1])
            return nphase.capsule_sphere(Ta, r, h, Tb[:3, 3], _sphere_radius(sb))
        if k == "capsule_capsule":
            ra, ha = float(sa.size[0]), float(sa.size[1])
            rb, hb = float(sb.size[0]), float(sb.size[1])
            return nphase.capsule_capsule(Ta, ra, ha, Tb, rb, hb)
        if k == "capsule_box":
            r, h = float(sa.size[0]), float(sa.size[1])
            half = jnp.asarray(sb.size, dtype=dtype) / 2.0
            return nphase.capsule_box(Ta, r, h, Tb, half)
        if k == "box_box":
            half_a = jnp.asarray(sa.size, dtype=dtype) / 2.0
            half_b = jnp.asarray(sb.size, dtype=dtype) / 2.0
            return nphase.box_box_sat(Ta, half_a, Tb, half_b)
        if k == "mesh_plane":
            from nimblephysics_tpu.collision import convex

            n_w, d_w = _plane_world(sb, Tb, dtype)
            return convex.mesh_plane(Ta, slot.hull_a, n_w, d_w)
        if k == "sphere_mesh":
            from nimblephysics_tpu.collision import convex

            return convex.sphere_mesh(
                Ta[:3, 3], _sphere_radius(sa), Tb, slot.hull_b
            )
        if k == "capsule_mesh":
            from nimblephysics_tpu.collision import convex

            r, h = float(sa.size[0]), float(sa.size[1])
            return convex.capsule_mesh(Ta, r, h, Tb, slot.hull_b)
        if k == "box_mesh":
            from nimblephysics_tpu.collision import convex

            half = jnp.asarray(sa.size, dtype=dtype) / 2.0
            return convex.box_mesh(Ta, half, Tb, slot.hull_b)
        if k == "mesh_mesh":
            from nimblephysics_tpu.collision import convex

            return convex.mesh_mesh(Ta, slot.hull_a, Tb, slot.hull_b)
        if k == "sphere_heightmap":
            hm = jnp.asarray(sb.heights, dtype=dtype)
            return nphase.sphere_heightmap(
                Ta[:3, 3], _sphere_radius(sa), Tb, hm, tuple(sb.size)
            )
        if k == "capsule_heightmap":
            hm = jnp.asarray(sb.heights, dtype=dtype)
            r, h = float(sa.size[0]), float(sa.size[1])
            return nphase.capsule_heightmap(Ta, r, h, Tb, hm, tuple(sb.size))
        if k == "box_heightmap":
            hm = jnp.asarray(sb.heights, dtype=dtype)
            half = jnp.asarray(sa.size, dtype=dtype) / 2.0
            return nphase.box_heightmap(Ta, half, Tb, hm, tuple(sb.size))
        if "multisphere" in k:
            return self._dispatch_multisphere(slot, Ta, Tb, dtype)
        raise NotImplementedError(k)

    def _dispatch_multisphere(self, slot, Ta, Tb, dtype):
        """Multi-sphere hulls collide as their sphere sets: each member
        sphere runs the corresponding primitive pair; slots concatenate
        (reference analog: MultiSphereConvexHullShape support points)."""
        sa, sb = slot.shape_a, slot.shape_b
        k = slot.kind

        def spheres_world(spec, T):
            S = np.asarray(spec.spheres, dtype=np.float64)
            cs = [lie.transform_point(T, jnp.asarray(c[:3], dtype=dtype))
                  for c in S]
            return cs, [float(c[3]) for c in S]

        pts, ns, ds = [], [], []

        def add(out):
            p, n, d = out
            pts.append(p)
            ns.append(n)
            ds.append(d)

        if k == "multisphere_plane":
            cs, rs = spheres_world(sa, Ta)
            n_w, d_w = _plane_world(sb, Tb, dtype)
            for c, r in zip(cs, rs):
                add(nphase.sphere_plane(c, r, n_w, d_w))
        elif k == "sphere_multisphere":
            cs, rs = spheres_world(sb, Tb)
            for c, r in zip(cs, rs):
                add(nphase.sphere_sphere(
                    Ta[:3, 3], _sphere_radius(sa), c, r))
        elif k == "capsule_multisphere":
            cs, rs = spheres_world(sb, Tb)
            r_c, h_c = float(sa.size[0]), float(sa.size[1])
            for c, r in zip(cs, rs):
                add(nphase.capsule_sphere(Ta, r_c, h_c, c, r))
        elif k == "box_multisphere":
            cs, rs = spheres_world(sb, Tb)
            half = jnp.asarray(sa.size, dtype=dtype) / 2.0
            for c, r in zip(cs, rs):
                p, n, d = nphase.sphere_box(c, r, Ta, half)
                # sphere is body B here: flip the B->A convention.
                add((p, -n, d))
        elif k == "multisphere_multisphere":
            cs_a, rs_a = spheres_world(sa, Ta)
            cs_b, rs_b = spheres_world(sb, Tb)
            for ca_, ra_ in zip(cs_a, rs_a):
                for cb_, rb_ in zip(cs_b, rs_b):
                    add(nphase.sphere_sphere(ca_, ra_, cb_, rb_))
        elif k == "multisphere_heightmap":
            cs, rs = spheres_world(sa, Ta)
            hm = jnp.asarray(sb.heights, dtype=dtype)
            for c, r in zip(cs, rs):
                add(nphase.sphere_heightmap(c, r, Tb, hm, tuple(sb.size)))
        else:
            raise NotImplementedError(k)
        return jnp.concatenate(pts), jnp.concatenate(ns), jnp.concatenate(ds)


def _plane_world(spec: SH.ShapeSpec, T_ws, dtype):
    """Plane spec [n;offset] in shape frame -> world (n_w, offset_w)."""
    params = np.asarray(spec.size, dtype=np.float64).reshape(-1)
    n_local = jnp.asarray(params[:3] / np.linalg.norm(params[:3]), dtype=dtype)
    d_local = jnp.asarray(params[3] if params.size > 3 else 0.0, dtype=dtype)
    n_w = lie.transform_vector(T_ws, n_local)
    d_w = d_local + jnp.dot(n_w, T_ws[:3, 3])
    return n_w, d_w
