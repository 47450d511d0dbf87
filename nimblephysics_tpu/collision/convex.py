"""Convex-mesh collision: build-time hull extraction + masked narrowphase.

TPU-native re-design of the reference's convex mesh support
(dart/collision/dart/DARTCollide.cpp:1884-1990 — embedded libccd MPR with
mesh/box/sphere/capsule support functions; supported-pair dispatch
DARTCollisionDetector.cpp:283-308). Instead of an iterative portal
refinement with data-dependent termination (hostile to jit/vmap), contact
generation is VERTEX/FACE based with static shapes:

  * At BUILD time (numpy): the mesh is decimated to its support points
    over a static direction fan, and the convex hull's faces are
    enumerated brute-force (every point triple that supports the cloud) —
    tiny arrays, exact for the decimated hull.
  * At TRACE time: contacts come from hull vertices against the other
    shape's signed distance (plane/box exact; hull-face SDF exact for
    points inside, the regime the LCP keeps resting contacts in), with
    fixed slot counts selected by top_k depth. Differentiable end to end.

Manifold character: where the reference's MPR yields ONE deepest contact
per pair, the vertex manifold yields up to k support contacts — better
resting stability for flat-face contact, same single-point behavior for
vertex contact. Edge-edge mesh contact is not specially cased (the
deepest-vertex slots cover it approximately).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-12


# ---------------------------------------------------------------------------
# Build-time hull extraction (numpy, static)
# ---------------------------------------------------------------------------


def _direction_fan(n_theta: int = 8, n_phi: int = 6) -> np.ndarray:
    """Static quasi-uniform direction set (+ axis directions)."""
    dirs = [
        [1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1],
    ]
    for i in range(n_phi):
        phi = np.pi * (i + 0.5) / n_phi
        for j in range(n_theta):
            th = 2 * np.pi * j / n_theta
            dirs.append(
                [np.sin(phi) * np.cos(th), np.sin(phi) * np.sin(th), np.cos(phi)]
            )
    return np.asarray(dirs, dtype=np.float64)


def decimate_support(verts: np.ndarray, max_verts: int = 40) -> np.ndarray:
    """Keep the support points of a static direction fan (approximate hull
    vertex set, <= max_verts)."""
    verts = np.asarray(verts, dtype=np.float64).reshape(-1, 3)
    if len(verts) <= max_verts:
        return verts
    dirs = _direction_fan()
    idx = np.unique(np.argmax(verts @ dirs.T, axis=0))
    out = verts[idx]
    if len(out) > max_verts:
        # Greedy farthest-point thinning.
        keep = [0]
        d = np.linalg.norm(out - out[0], axis=1)
        for _ in range(max_verts - 1):
            k = int(np.argmax(d))
            keep.append(k)
            d = np.minimum(d, np.linalg.norm(out - out[k], axis=1))
        out = out[sorted(set(keep))]
    return out


def hull_faces(verts: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Outward face planes of the convex hull of a SMALL point set.

    Brute force: a triple (i, j, k) spans a hull face iff every point lies
    on one side of its plane. O(n^3) triples x O(n) test — build-time only
    (n <= ~40). Returns (normals (F, 3), offsets (F,)) with
    hull = {x : normals @ x <= offsets}. Coplanar duplicates are merged.
    """
    V = np.asarray(verts, dtype=np.float64).reshape(-1, 3)
    n = len(V)
    assert n >= 4, "need at least 4 points for a 3D hull"
    c = V.mean(axis=0)
    planes = []
    for i in range(n):
        for j in range(i + 1, n):
            for k in range(j + 1, n):
                nrm = np.cross(V[j] - V[i], V[k] - V[i])
                ln = np.linalg.norm(nrm)
                if ln < 1e-12:
                    continue
                nrm = nrm / ln
                d = nrm @ V[i]
                side = V @ nrm - d
                if side.max() <= 1e-9:
                    planes.append((nrm, d))
                elif side.min() >= -1e-9:
                    planes.append((-nrm, -d))
    if not planes:
        raise ValueError("degenerate (planar) point set — no 3D hull")
    N = np.asarray([p[0] for p in planes])
    D = np.asarray([p[1] for p in planes])
    # Merge duplicates (same plane found from many coplanar triples).
    key = np.round(np.concatenate([N, D[:, None]], axis=1), 7)
    _, idx = np.unique(key, axis=0, return_index=True)
    N, D = N[sorted(idx)], D[sorted(idx)]
    # Sanity: interior point strictly inside every face.
    assert (N @ c - D).max() < 0, "hull face orientation failed"
    return N, D


@dataclasses.dataclass(frozen=True, eq=False)
class ConvexHull:
    """Static hull data for one mesh shape (identity hash, jit-static)."""

    verts: np.ndarray  # (V, 3) decimated hull vertices (shape frame)
    face_n: np.ndarray  # (F, 3) outward unit normals
    face_d: np.ndarray  # (F,) offsets: inside <=> face_n @ x <= face_d

    @staticmethod
    def build(mesh_vertices, max_verts: int = 40) -> "ConvexHull":
        v = decimate_support(mesh_vertices, max_verts=max_verts)
        N, D = hull_faces(v)
        return ConvexHull(verts=v, face_n=N, face_d=D)


# ---------------------------------------------------------------------------
# Narrowphase (jnp, single world; batched via the vmap fallback adapter)
# ---------------------------------------------------------------------------


def _world_verts(T, verts_np, dtype):
    V = jnp.asarray(verts_np, dtype=dtype)
    return V @ T[:3, :3].T + T[:3, 3]


def _topk_slots(points, normals, depths, k):
    """Keep the k deepest slots (masked; depth <= 0 slots stay invalid)."""
    vals, idx = jax.lax.top_k(depths, k)
    return points[idx], normals[idx], vals


def mesh_plane(T_mesh, hull: ConvexHull, plane_n, plane_d, k: int = 8):
    """Hull vertices below the plane; k deepest slots. Mesh is body A."""
    dtype = T_mesh.dtype
    Vw = _world_verts(T_mesh, hull.verts, dtype)  # (V, 3)
    dist = Vw @ plane_n - plane_d
    depths = -dist
    points = Vw + 0.5 * depths[:, None] * plane_n[None, :]
    normals = jnp.broadcast_to(plane_n, Vw.shape)
    return _topk_slots(points, normals, depths, min(k, len(hull.verts)))


def _hull_sdf_local(x_local, hull: ConvexHull, dtype):
    """Signed distance to the hull (exact inside; face-plane max outside)
    and the outward normal of the maximizing face. x_local (3,)."""
    N = jnp.asarray(hull.face_n, dtype=dtype)
    D = jnp.asarray(hull.face_d, dtype=dtype)
    phi_f = N @ x_local - D  # (F,)
    i = jnp.argmax(phi_f)
    return phi_f[i], N[i]


def sphere_mesh(c_sphere, radius, T_mesh, hull: ConvexHull):
    """Sphere (A) vs mesh (B): 1 slot via the hull SDF at the center."""
    dtype = T_mesh.dtype
    R = T_mesh[:3, :3]
    x_local = R.T @ (c_sphere - T_mesh[:3, 3])
    phi, n_local = _hull_sdf_local(x_local, hull, dtype)
    n_world = R @ n_local  # outward from mesh -> toward sphere (B -> A)
    depth = radius - phi
    point = c_sphere - n_world * (radius - 0.5 * depth)
    return point[None], n_world[None], depth[None]


def capsule_mesh(T_cap, radius, height, T_mesh, hull: ConvexHull,
                 n_samples: int = 5, k: int = 3):
    """Capsule (A) vs mesh (B): hull SDF sampled along the segment,
    k deepest slots (flat-face lying contact gets a stable manifold)."""
    dtype = T_cap.dtype
    axis = T_cap[:3, :3] @ jnp.asarray([0.0, 0.0, 1.0], dtype=dtype)
    c = T_cap[:3, 3]
    R = T_mesh[:3, :3]
    ts = jnp.linspace(-0.5, 0.5, n_samples)
    pts, nrms, deps = [], [], []
    for i in range(n_samples):
        p = c + axis * (ts[i] * height)
        x_local = R.T @ (p - T_mesh[:3, 3])
        phi, n_local = _hull_sdf_local(x_local, hull, dtype)
        n_world = R @ n_local
        depth = radius - phi
        pts.append(p - n_world * (radius - 0.5 * depth))
        nrms.append(n_world)
        deps.append(depth)
    return _topk_slots(
        jnp.stack(pts), jnp.stack(nrms), jnp.stack(deps), k
    )


def box_mesh(T_box, half, T_mesh, hull: ConvexHull, k: int = 4):
    """Box (A) vs mesh (B): box corners vs hull SDF (k slots) + hull
    vertices vs box SDF (k slots)."""
    dtype = T_box.dtype
    R_m = T_mesh[:3, :3]
    signs = np.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        dtype=np.float64,
    )
    pts, nrms, deps = [], [], []
    # Box corners into the hull.
    for s in signs:
        corner = T_box[:3, :3] @ (jnp.asarray(s * 1.0, dtype=dtype) * half) + T_box[:3, 3]
        x_local = R_m.T @ (corner - T_mesh[:3, 3])
        phi, n_local = _hull_sdf_local(x_local, hull, dtype)
        n_world = R_m @ n_local  # mesh -> box direction (B -> A)
        depth = -phi
        pts.append(corner + 0.5 * depth * n_world)
        nrms.append(n_world)
        deps.append(depth)
    p1, n1, d1 = _topk_slots(jnp.stack(pts), jnp.stack(nrms), jnp.stack(deps), k)
    # Hull vertices into the box.
    Vw = _world_verts(T_mesh, hull.verts, dtype)
    Rb = T_box[:3, :3]
    local = (Vw - T_box[:3, 3]) @ Rb  # (V, 3) in box frame
    q = jnp.abs(local) - half
    # Inside depth: -max(q); face normal = axis of max q with sign.
    axis = jnp.argmax(q, axis=1)
    depth_v = -jnp.max(q, axis=1)
    onehot = jax.nn.one_hot(axis, 3, dtype=dtype)
    sgn = jnp.sign(jnp.sum(local * onehot, axis=1) + _EPS)
    n_local_box = onehot * sgn[:, None]  # outward box normal at the vert
    # Contact normal B -> A: the mesh (B) vertex penetrates the box (A)
    # through the face whose OUTWARD normal points toward the mesh body —
    # so B -> A is the NEGATED outward face normal (same flip as
    # mesh_mesh's B-verts-in-A case).
    n_world_v = -(n_local_box @ Rb.T)
    pts_v = Vw - 0.5 * depth_v[:, None] * n_world_v
    p2, n2, d2 = _topk_slots(pts_v, n_world_v, depth_v, min(k, len(hull.verts)))
    return (
        jnp.concatenate([p1, p2]),
        jnp.concatenate([n1, n2]),
        jnp.concatenate([d1, d2]),
    )


def mesh_mesh(T_a, hull_a: ConvexHull, T_b, hull_b: ConvexHull, k: int = 4):
    """Mesh (A) vs mesh (B): A-verts in B's hull + B-verts in A's hull."""
    dtype = T_a.dtype
    outs = []
    for (Tm, hm, To, ho, flip) in (
        (T_a, hull_a, T_b, hull_b, False),  # A verts into B
        (T_b, hull_b, T_a, hull_a, True),  # B verts into A
    ):
        Vw = _world_verts(Tm, hm.verts, dtype)
        Ro = To[:3, :3]
        local = (Vw - To[:3, 3]) @ Ro
        N = jnp.asarray(ho.face_n, dtype=dtype)
        D = jnp.asarray(ho.face_d, dtype=dtype)
        phi = local @ N.T - D  # (V, F)
        fi = jnp.argmax(phi, axis=1)
        depth = -jnp.max(phi, axis=1)
        n_local = N[fi]  # outward normal of the other hull
        n_out = n_local @ Ro.T  # points out of the penetrated hull
        # Midpoint: the penetrating vertex pulled halfway back toward the
        # penetrated hull's surface (always along its OUTWARD normal).
        pts = Vw + 0.5 * depth[:, None] * n_out
        # Normal convention B -> A: when A's vert is inside B, B's outward
        # normal points toward A; when B's vert is inside A, flip.
        n_world = -n_out if flip else n_out
        outs.append(
            _topk_slots(pts, n_world, depth, min(k, len(hm.verts)))
        )
    return (
        jnp.concatenate([outs[0][0], outs[1][0]]),
        jnp.concatenate([outs[0][1], outs[1][1]]),
        jnp.concatenate([outs[0][2], outs[1][2]]),
    )


def hull_triangles(verts: np.ndarray) -> np.ndarray:
    """Triangle index list of the hull surface (build-time; used for
    viewer display of convex mesh colliders). Brute force like
    hull_faces; coplanar faces yield a fan of coplanar triangles."""
    V = np.asarray(verts, dtype=np.float64).reshape(-1, 3)
    n = len(V)
    tris = []
    for i in range(n):
        for j in range(i + 1, n):
            for k in range(j + 1, n):
                nrm = np.cross(V[j] - V[i], V[k] - V[i])
                ln = np.linalg.norm(nrm)
                if ln < 1e-12:
                    continue
                side = (V - V[i]) @ (nrm / ln)
                if side.max() <= 1e-9 or side.min() >= -1e-9:
                    tris.append((i, j, k))
    return np.asarray(tris, dtype=np.int64).reshape(-1, 3)
