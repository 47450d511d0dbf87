"""SDF world parser (reference: dart/utils/SdfParser).

Supports the subset the reference's data exercises: <world> physics
(gravity), <model> with <link> (inertial, collision/visual geometry
box/sphere/cylinder/capsule/plane) and <joint> (revolute, prismatic,
fixed, ball, universal, free), static models. Poses are "x y z r p y"
(fixed-axis RPY), world-frame for links (SDF 1.4 convention).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Dict, List, Optional, Tuple

import numpy as np

from nimblephysics_tpu.dynamics import joints as JT
from nimblephysics_tpu.dynamics.shapes import ShapeSpec
from nimblephysics_tpu.dynamics.skeleton import Skeleton
from nimblephysics_tpu.simulation.world import World


def _pose_T(text: Optional[str]) -> np.ndarray:
    T = np.eye(4)
    if not text:
        return T
    v = np.array([float(x) for x in text.split()])
    T[:3, 3] = v[:3]
    r, p, y = v[3:6]
    cr, sr = np.cos(r), np.sin(r)
    cp, sp = np.cos(p), np.sin(p)
    cy, sy = np.cos(y), np.sin(y)
    Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    T[:3, :3] = Rz @ Ry @ Rx
    return T


def _geometry(g: ET.Element):
    box = g.find("box")
    if box is not None:
        return "box", np.array([float(x) for x in box.findtext("size").split()])
    sph = g.find("sphere")
    if sph is not None:
        return "sphere", np.array([float(sph.findtext("radius"))])
    cyl = g.find("cylinder")
    if cyl is not None:
        return "cylinder", np.array(
            [float(cyl.findtext("radius")), float(cyl.findtext("length"))]
        )
    cap = g.find("capsule")
    if cap is not None:
        return "capsule", np.array(
            [float(cap.findtext("radius")), float(cap.findtext("length"))]
        )
    pl = g.find("plane")
    if pl is not None:
        n = np.array([float(x) for x in pl.findtext("normal", "0 0 1").split()])
        return "plane", np.concatenate([n, [0.0]])
    mesh = g.find("mesh")
    if mesh is not None:
        scale = np.array(
            [float(x) for x in mesh.findtext("scale", "1 1 1").split()]
        )
        return "mesh", scale, (mesh.findtext("uri") or "").strip()
    return None


_JOINTS = {
    "revolute": JT.REVOLUTE,
    "prismatic": JT.PRISMATIC,
    "fixed": JT.WELD,
    "ball": JT.BALL,
    "universal": JT.UNIVERSAL,
    "free": JT.FREE,
}


def parse_sdf_world(path: str) -> Tuple[World, np.ndarray, np.ndarray]:
    tree = ET.parse(path)
    root = tree.getroot()
    wx = root.find("world") if root.tag != "world" else root
    if wx is None:
        wx = root  # bare <model> file
    gravity = np.array([0.0, 0.0, -9.81])
    phys = wx.find("physics") if wx.tag == "world" else None
    if phys is not None and phys.findtext("gravity"):
        gravity = np.array(
            [float(x) for x in phys.findtext("gravity").split()]
        )
    world = World(name=wx.get("name", "sdf"), gravity=gravity)

    # <sdf> may wrap a <world> with models, or bare <model> element(s).
    import os

    base_dir = os.path.dirname(os.path.abspath(path))
    models = [wx] if wx.tag == "model" else wx.findall("model")
    for mx in models:
        skel = _parse_model(mx, base_dir)
        world.add_skeleton(skel)
    nv = world.num_dofs
    return world, np.zeros(nv), np.zeros(nv)


def _parse_model(mx: ET.Element, base_dir: str = "") -> Skeleton:
    name = mx.get("name", "model")
    static = (mx.findtext("static", "false").strip().lower() in ("true", "1"))
    T_model = _pose_T(mx.findtext("pose"))

    links: Dict[str, dict] = {}
    order: List[str] = []
    for lx in mx.findall("link"):
        lname = lx.get("name")
        T_wl = T_model @ _pose_T(lx.findtext("pose"))
        inertial = lx.find("inertial")
        mass = 1.0
        com = np.zeros(3)
        I = np.eye(3) * 0.01
        if inertial is not None:
            mass = float(inertial.findtext("mass", "1"))
            com = _pose_T(inertial.findtext("pose"))[:3, 3]
            ix = inertial.find("inertia")
            if ix is not None:
                I = np.array(
                    [
                        [float(ix.findtext("ixx", "0.01")),
                         float(ix.findtext("ixy", "0")),
                         float(ix.findtext("ixz", "0"))],
                        [float(ix.findtext("ixy", "0")),
                         float(ix.findtext("iyy", "0.01")),
                         float(ix.findtext("iyz", "0"))],
                        [float(ix.findtext("ixz", "0")),
                         float(ix.findtext("iyz", "0")),
                         float(ix.findtext("izz", "0.01"))],
                    ]
                )
        shapes = []
        for tag, coll in (("collision", True), ("visual", False)):
            for sx in lx.findall(tag):
                g = sx.find("geometry")
                if g is None:
                    continue
                parsed = _geometry(g)
                if parsed is None:
                    continue
                mesh_verts = mesh_faces = None
                if parsed[0] == "mesh":
                    from nimblephysics_tpu.utils.urdf_parser import (
                        _load_mesh_asset,
                    )

                    st, scale, uri = parsed
                    size = np.zeros(1)
                    mesh_verts, mesh_faces = _load_mesh_asset(
                        uri, base_dir, scale
                    )
                    if mesh_verts is None:
                        continue
                else:
                    st, size = parsed
                shapes.append(
                    ShapeSpec(
                        shape_type=st, size=size,
                        T_offset=_pose_T(sx.findtext("pose")),
                        collidable=coll, visual=not coll,
                        mesh_vertices=mesh_verts, mesh_faces=mesh_faces,
                    )
                )
        links[lname] = dict(T_wl=T_wl, mass=mass, com=com, inertia=I,
                            shapes=tuple(shapes))
        order.append(lname)

    joints = {}
    parent_of = {}
    for jx in mx.findall("joint"):
        child = jx.findtext("child")
        joints[child] = jx
        parent_of[child] = jx.findtext("parent")

    skel = Skeleton(name)
    index_of: Dict[str, int] = {}

    def visit(lname):
        if lname in index_of:
            return index_of[lname]
        info = links[lname]
        jx = joints.get(lname)
        pname = parent_of.get(lname)
        if pname in (None, "world"):
            parent_idx = -1
            T_wp = np.eye(4)
        else:
            parent_idx = visit(pname)
            T_wp = links[pname]["T_wl"]
        if static:
            jtype = JT.WELD
        elif jx is None:
            jtype = JT.FREE
        else:
            jtype = _JOINTS.get(jx.get("type", "fixed"), JT.WELD)
        # SDF joint pose: in the CHILD link frame.
        T_cj = _pose_T(jx.findtext("pose")) if jx is not None else np.eye(4)
        T_pj = np.linalg.inv(T_wp) @ info["T_wl"] @ T_cj
        axes = None
        kwargs = {}
        if jx is not None and jtype in (JT.REVOLUTE, JT.PRISMATIC):
            ax = jx.find("axis")
            xyz = np.array(
                [float(x) for x in (ax.findtext("xyz", "0 0 1")).split()]
            ) if ax is not None else np.array([0.0, 0, 1])
            axes = xyz.reshape(1, 3)
            if ax is not None:
                lim = ax.find("limit")
                if lim is not None:
                    lo = lim.findtext("lower")
                    hi = lim.findtext("upper")
                    if lo is not None:
                        kwargs["position_lower"] = [float(lo)]
                    if hi is not None:
                        kwargs["position_upper"] = [float(hi)]
                dyn = ax.find("dynamics")
                if dyn is not None:
                    kwargs["damping"] = [float(dyn.findtext("damping", "0"))]
        idx = skel.add_joint_and_body(
            jtype, parent=parent_idx, name=lname, T_pj=T_pj, T_cj=T_cj,
            axes=axes, mass=info["mass"], com=info["com"],
            inertia=info["inertia"], shapes=info["shapes"], **kwargs,
        )
        index_of[lname] = idx
        return idx

    for lname in order:
        visit(lname)
    return skel
