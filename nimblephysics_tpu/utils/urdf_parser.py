"""URDF robot parser -> Skeleton/World specs.

TPU-native re-design of the reference loader (dart/utils/urdf/DartLoader
.hpp:79 over vendored urdfdom). Supported: links (inertial origin/mass/
inertia, visual + collision geometry box/cylinder/sphere/capsule/mesh-stub),
joints (revolute, continuous, prismatic, fixed, floating, planar), origins
(xyz + fixed-axis rpy), axis, limits, dynamics damping/friction.

Conventions: URDF's joint origin is the transform from the parent link
frame to the child link frame at q = 0 (child frame == joint frame), so
T_pj = origin and T_cj = I. The inertial origin offsets the COM and
rotates the inertia tensor into the link frame. The root link attaches to
the world by a free joint unless `root_joint` says otherwise (DartLoader
behavior; a root link literally named "world" welds its children).
"""

from __future__ import annotations

import os
import warnings
import xml.etree.ElementTree as ET
from typing import Dict, List, Optional, Tuple

import numpy as np

from nimblephysics_tpu.dynamics import joints as JT
from nimblephysics_tpu.dynamics.shapes import ShapeSpec
from nimblephysics_tpu.dynamics.skeleton import Skeleton
from nimblephysics_tpu.simulation.world import World


def _floats(text: str, n=None) -> np.ndarray:
    v = np.array([float(x) for x in text.split()])
    return v


def _rpy_matrix(rpy: np.ndarray) -> np.ndarray:
    """Fixed-axis roll-pitch-yaw: R = Rz(y) Ry(p) Rx(r)."""
    r, p, y = rpy
    cr, sr = np.cos(r), np.sin(r)
    cp, sp = np.cos(p), np.sin(p)
    cy, sy = np.cos(y), np.sin(y)
    Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def _origin(el: Optional[ET.Element]) -> np.ndarray:
    T = np.eye(4)
    if el is None:
        return T
    xyz = el.get("xyz")
    rpy = el.get("rpy")
    if xyz:
        T[:3, 3] = _floats(xyz)
    if rpy:
        T[:3, :3] = _rpy_matrix(_floats(rpy))
    return T


def _parse_geometry(geom: ET.Element):
    box = geom.find("box")
    if box is not None:
        return "box", _floats(box.get("size"))
    cyl = geom.find("cylinder")
    if cyl is not None:
        return "cylinder", np.array(
            [float(cyl.get("radius")), float(cyl.get("length"))]
        )
    sph = geom.find("sphere")
    if sph is not None:
        return "sphere", np.array([float(sph.get("radius"))])
    cap = geom.find("capsule")
    if cap is not None:
        return "capsule", np.array(
            [float(cap.get("radius")), float(cap.get("length"))]
        )
    mesh = geom.find("mesh")
    if mesh is not None:
        scale = mesh.get("scale")
        return (
            "mesh",
            _floats(scale) if scale else np.ones(3),
            mesh.get("filename", ""),
        )
    return None


_JOINT_MAP = {
    "revolute": JT.REVOLUTE,
    "continuous": JT.REVOLUTE,
    "prismatic": JT.PRISMATIC,
    "fixed": JT.WELD,
    "floating": JT.FREE,
    "planar": JT.PLANAR,
}


def _load_mesh_asset(fname: str, base_dir: str, scale):
    """Resolve a URDF mesh filename and load its geometry.

    package:// URIs resolve by searching for the tail path under base_dir
    and its parents (DartLoader's PackageResourceRetriever behavior, in
    miniature). Missing assets return (None, None) — the caller keeps the
    link shape-less rather than failing the whole model load.
    """
    from nimblephysics_tpu.utils.mesh_loader import load_mesh

    candidates = []
    if fname.startswith("package://"):
        tail = fname[len("package://") :]
        parts = tail.split("/", 1)
        rest = parts[1] if len(parts) > 1 else parts[0]
        d = base_dir
        for _ in range(5):
            candidates.append(os.path.join(d, tail))
            candidates.append(os.path.join(d, rest))
            d = os.path.dirname(d)
    elif fname.startswith("file://"):
        candidates.append(fname[len("file://") :])
    else:
        candidates.append(
            fname if os.path.isabs(fname) else os.path.join(base_dir, fname)
        )
    for c in candidates:
        if os.path.exists(c):
            try:
                return load_mesh(c, scale=scale)
            except ValueError as e:
                # Corrupt/unsupported mesh: drop this link's collision
                # geometry, but never silently.
                warnings.warn(f"failed to load mesh asset {c!r}: {e}")
                return None, None
    return None, None


def parse_urdf(
    path_or_string: str, root_joint: str = "free", name: Optional[str] = None
) -> Skeleton:
    """Parse a URDF file (or XML string) into a Skeleton.

    root_joint: 'free' (DartLoader default for mobile robots) or 'weld'
    (fixed-base manipulators).
    """
    if os.path.exists(path_or_string):
        tree = ET.parse(path_or_string)
        root = tree.getroot()
        base_dir = os.path.dirname(os.path.abspath(path_or_string))
    else:
        root = ET.fromstring(path_or_string)
        base_dir = os.getcwd()
    assert root.tag == "robot", "not a URDF <robot> document"

    links: Dict[str, dict] = {}
    for lx in root.findall("link"):
        lname = lx.get("name")
        inertial = lx.find("inertial")
        mass = 1e-6
        com = np.zeros(3)
        inertia = np.eye(3) * 1e-9
        if inertial is not None:
            mass = float(inertial.find("mass").get("value"))
            T_in = _origin(inertial.find("origin"))
            com = T_in[:3, 3]
            ix = inertial.find("inertia")
            if ix is not None:
                I = np.array(
                    [
                        [float(ix.get("ixx", 0)), float(ix.get("ixy", 0)), float(ix.get("ixz", 0))],
                        [float(ix.get("ixy", 0)), float(ix.get("iyy", 0)), float(ix.get("iyz", 0))],
                        [float(ix.get("ixz", 0)), float(ix.get("iyz", 0)), float(ix.get("izz", 0))],
                    ]
                )
                R = T_in[:3, :3]
                inertia = R @ I @ R.T
        shapes: List[ShapeSpec] = []
        for tag, collidable in (("collision", True), ("visual", False)):
            for sx in lx.findall(tag):
                g = sx.find("geometry")
                if g is None:
                    continue
                parsed = _parse_geometry(g)
                if parsed is None:
                    continue
                mesh_verts = mesh_faces = None
                if parsed[0] == "mesh":
                    stype, scale, fname = parsed
                    size = np.zeros(1)
                    # Resolve the asset relative to the URDF file
                    # (package:// prefixes fall back to the same dir).
                    mesh_verts, mesh_faces = _load_mesh_asset(
                        fname, base_dir, scale
                    )
                    if mesh_verts is None:
                        continue  # asset missing: keep the link shape-less
                else:
                    stype, size = parsed
                color = None
                mat = sx.find("material")
                if mat is not None and mat.find("color") is not None:
                    color = _floats(mat.find("color").get("rgba"))
                shapes.append(
                    ShapeSpec(
                        shape_type=stype,
                        size=size,
                        T_offset=_origin(sx.find("origin")),
                        collidable=collidable,
                        visual=not collidable,
                        color=color,
                        mesh_vertices=mesh_verts,
                        mesh_faces=mesh_faces,
                    )
                )
        links[lname] = dict(mass=mass, com=com, inertia=inertia, shapes=shapes)

    joints_xml = root.findall("joint")
    parent_of: Dict[str, Tuple[str, ET.Element]] = {}
    children: Dict[str, List[str]] = {}
    for jx in joints_xml:
        p = jx.find("parent").get("link")
        c = jx.find("child").get("link")
        parent_of[c] = (p, jx)
        children.setdefault(p, []).append(c)

    roots = [l for l in links if l not in parent_of]
    assert len(roots) >= 1, "URDF has no root link"

    skel = Skeleton(name or root.get("name", "robot"))
    index_of: Dict[str, int] = {}

    def add(lname: str, parent_idx: int, jx: Optional[ET.Element]):
        info = links[lname]
        if jx is None:
            jtype = JT.FREE if root_joint == "free" else JT.WELD
            T_pj = np.eye(4)
            axes = None
            kwargs = {}
        else:
            jtype = _JOINT_MAP.get(jx.get("type", "fixed"), JT.WELD)
            T_pj = _origin(jx.find("origin"))
            ax = jx.find("axis")
            axes = (
                _floats(ax.get("xyz")).reshape(1, 3)
                if ax is not None
                else np.array([[1.0, 0.0, 0.0]])
            )
            kwargs = {}
            lim = jx.find("limit")
            nd = JT.num_dofs(jtype)
            if lim is not None and jx.get("type") not in ("continuous", "fixed") and nd == 1:
                lo = lim.get("lower")
                hi = lim.get("upper")
                if lo is not None:
                    kwargs["position_lower"] = [float(lo)]
                if hi is not None:
                    kwargs["position_upper"] = [float(hi)]
                eff = lim.get("effort")
                if eff is not None:
                    kwargs["force_limit"] = [float(eff)]
                vel = lim.get("velocity")
                if vel is not None:
                    kwargs["velocity_limit"] = [float(vel)]
            dyn = jx.find("dynamics")
            if dyn is not None and nd == 1:
                kwargs["damping"] = [float(dyn.get("damping", 0.0))]
            if jtype == JT.PLANAR:
                # URDF planar: motion in the plane normal to axis.
                n = axes[0] / np.linalg.norm(axes[0])
                t1 = np.cross([0, 0, 1.0], n)
                if np.linalg.norm(t1) < 1e-8:
                    t1 = np.cross([1.0, 0, 0], n)
                t1 /= np.linalg.norm(t1)
                t2 = np.cross(n, t1)
                axes = np.stack([t1, t2])
        idx = skel.add_joint_and_body(
            jtype,
            parent=parent_idx,
            name=lname,
            T_pj=T_pj,
            axes=axes if jtype != JT.WELD and jtype != JT.FREE else None,
            mass=info["mass"],
            com=info["com"],
            inertia=info["inertia"],
            shapes=tuple(info["shapes"]),
            **(kwargs if jx is not None else {}),
        )
        index_of[lname] = idx
        for c in children.get(lname, []):
            add(c, idx, parent_of[c][1])

    for r in roots:
        if r == "world":
            for c in children.get(r, []):
                add(c, -1, parent_of[c][1])
        else:
            add(r, -1, None)
    return skel


def load_urdf_world(
    path: str, root_joint: str = "free", ground: bool = False
) -> Tuple[World, np.ndarray, np.ndarray]:
    """Load a URDF into a fresh World; returns (world, q0, v0)."""
    skel = parse_urdf(path, root_joint=root_joint)
    w = World(name=skel.name)
    w.add_skeleton(skel)
    nv = skel.num_dofs
    return w, np.zeros(nv), np.zeros(nv)
