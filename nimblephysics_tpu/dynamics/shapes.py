"""Collision/visual shape specs (static, trace-time constants).

Reference parity: dart/dynamics/Shape.hpp + the 14 concrete shape types
(SURVEY.md section 2.1). Here a shape is a static spec attached to a body;
the collision layer lowers (shape_type, size) pairs into vectorized
primitive tests with fixed shapes.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

BOX = "box"
SPHERE = "sphere"
CAPSULE = "capsule"
CYLINDER = "cylinder"
CONE = "cone"
ELLIPSOID = "ellipsoid"
PLANE = "plane"
MESH = "mesh"
MULTI_SPHERE = "multisphere"
HEIGHTMAP = "heightmap"
LINE_SEGMENT = "linesegment"
POINT_CLOUD = "pointcloud"
SOFT_MESH = "softmesh"
ARROW = "arrow"


@dataclasses.dataclass(frozen=True, eq=False)  # identity hash: jit-static
class ShapeSpec:
    """One shape attached to a body.

    `size` semantics per type (DART conventions):
      box: full side lengths (3,); sphere: [radius]; capsule/cylinder/cone:
      [radius, height] (axis = local z); ellipsoid: full axis lengths
      (diameters) (3,); plane: [nx, ny, nz, offset] in the *shape* frame
      (usually attached to a fixed body); mesh: vertices referenced via
      `mesh_vertices`.
    """

    shape_type: str
    size: np.ndarray
    T_offset: np.ndarray = dataclasses.field(
        default_factory=lambda: np.eye(4)
    )  # body -> shape transform
    friction: float = 1.0
    restitution: float = 0.0
    collidable: bool = True
    visual: bool = True
    color: Optional[np.ndarray] = None
    mesh_vertices: Optional[np.ndarray] = None  # (n, 3) for convex meshes
    mesh_faces: Optional[np.ndarray] = None  # (m, 3) int
    # heightmap: heights (H, W) in the shape frame; size = [sx, sy, sz]
    # (xy grid spacing + height scale), grid centered on the origin
    # (reference: dynamics::HeightmapShape).
    heights: Optional[np.ndarray] = None
    # multisphere: (N, 4) rows [cx, cy, cz, radius]
    # (reference: dynamics::MultiSphereConvexHullShape).
    spheres: Optional[np.ndarray] = None

    def bounding_radius(self) -> float:
        """Radius of a bounding sphere centred at the shape frame origin."""
        s = np.asarray(self.size, dtype=np.float64)
        t = self.shape_type
        if t == SPHERE:
            return float(s[0])
        if t == BOX:
            return float(np.linalg.norm(s / 2.0))
        if t in (CAPSULE, CYLINDER, CONE):
            return float(np.hypot(s[0], s[1] / 2.0))
        if t == ELLIPSOID:
            return float(np.max(s) / 2.0)
        if t == MESH and self.mesh_vertices is not None:
            return float(np.linalg.norm(self.mesh_vertices, axis=1).max())
        return float("inf")  # planes/heightmaps are unbounded
