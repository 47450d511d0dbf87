""".skel world parser (DART XML format) -> World + initial state.

TPU-native re-design of the reference SkelParser (dart/utils/SkelParser.hpp
readWorld:48; XmlHelpers toIsometry3s: 6 values = translation + intrinsic
XYZ Euler rotation, XmlHelpers.cpp:376). Parses the same data/skel assets
(cartpole, half_cheetah, inverted_double_pendulum, ...) into the static
World/Skeleton specs.

Conventions handled:
  * body <transformation>: initial world pose of the body frame (composed
    with the skeleton-level <transformation>).
  * joint <transformation>: pose of the joint frame in the CHILD body
    frame (T_cj). T_pj is recovered from the initial body poses:
    T_pj = T_w_parent^-1 @ T_w_child @ T_cj.
  * axis <xyz>: in the joint frame.
  * <mobile>false</mobile>: the skeleton is static — joints become welds
    frozen at the initial configuration.
  * inertia <moment_of_inertia> optional; when missing it is computed from
    the first collision shape (rotated into the body frame), mirroring the
    reference's shape-based default.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Dict, List, Optional, Tuple

import numpy as np

from nimblephysics_tpu.dynamics import joints as JT
from nimblephysics_tpu.dynamics.shapes import ShapeSpec
from nimblephysics_tpu.dynamics.skeleton import Skeleton
from nimblephysics_tpu.simulation.world import World


def _floats(text: str) -> np.ndarray:
    return np.array([float(x) for x in text.split()])


def _euler_xyz(r: np.ndarray) -> np.ndarray:
    cx, sx = np.cos(r[0]), np.sin(r[0])
    cy, sy = np.cos(r[1]), np.sin(r[1])
    cz, sz = np.cos(r[2]), np.sin(r[2])
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return Rx @ Ry @ Rz


def _transform(text: Optional[str]) -> np.ndarray:
    T = np.eye(4)
    if text is None:
        return T
    v = _floats(text)
    T[:3, 3] = v[:3]
    T[:3, :3] = _euler_xyz(v[3:6])
    return T


def _parse_geometry(geom: ET.Element) -> Optional[Tuple[str, np.ndarray]]:
    box = geom.find("box")
    if box is not None:
        return "box", _floats(box.findtext("size"))
    sphere = geom.find("sphere")
    if sphere is not None:
        return "sphere", np.array([float(sphere.findtext("radius"))])
    capsule = geom.find("capsule")
    if capsule is not None:
        return "capsule", np.array(
            [float(capsule.findtext("radius")), float(capsule.findtext("height"))]
        )
    cylinder = geom.find("cylinder")
    if cylinder is not None:
        return "cylinder", np.array(
            [
                float(cylinder.findtext("radius")),
                float(cylinder.findtext("height")),
            ]
        )
    ellipsoid = geom.find("ellipsoid")
    if ellipsoid is not None:
        return "ellipsoid", _floats(ellipsoid.findtext("size"))
    return None  # meshes/soft shapes: later tier


def _shape_inertia(shape_type: str, size: np.ndarray, mass: float) -> np.ndarray:
    import jax.numpy as jnp
    from nimblephysics_tpu.math import spatial as sp

    if shape_type == "box":
        return np.asarray(sp.inertia_box(mass, size))
    if shape_type == "sphere":
        return np.asarray(sp.inertia_sphere(mass, float(size[0])))
    if shape_type == "capsule":
        return np.asarray(sp.inertia_capsule(mass, float(size[0]), float(size[1])))
    if shape_type == "cylinder":
        return np.asarray(
            sp.inertia_cylinder(mass, float(size[0]), float(size[1]))
        )
    if shape_type == "ellipsoid":
        return np.asarray(sp.inertia_ellipsoid(mass, size))
    return np.eye(3) * 0.1 * mass


_JOINT_MAP = {
    "weld": JT.WELD,
    "revolute": JT.REVOLUTE,
    "prismatic": JT.PRISMATIC,
    "screw": JT.SCREW,
    "universal": JT.UNIVERSAL,
    "ball": JT.BALL,
    "euler": JT.EULER,
    "translational": JT.TRANSLATIONAL,
    "translational2d": JT.TRANSLATIONAL_2D,
    "planar": JT.PLANAR,
    "free": JT.FREE,
}


def _parse_axis(ax: ET.Element):
    xyz = _floats(ax.findtext("xyz", "1 0 0"))
    out = {"xyz": xyz}
    lim = ax.find("limit")
    if lim is not None:
        out["lower"] = float(lim.findtext("lower", "-inf"))
        out["upper"] = float(lim.findtext("upper", "inf"))
    dyn = ax.find("dynamics")
    if dyn is not None:
        out["damping"] = float(dyn.findtext("damping", "0"))
        out["spring"] = float(dyn.findtext("spring_stiffness", "0"))
    return out


def parse_skel_world(path: str) -> Tuple[World, np.ndarray, np.ndarray]:
    """Parse a .skel file; returns (world, q0, v0)."""
    tree = ET.parse(path)
    root = tree.getroot()
    wxml = root.find("world") if root.tag != "world" else root

    phys = wxml.find("physics")
    time_step = float(phys.findtext("time_step", "0.001")) if phys is not None else 0.001
    gravity = (
        _floats(phys.findtext("gravity", "0 0 -9.81"))
        if phys is not None
        else np.array([0.0, 0.0, -9.81])
    )
    world = World(
        name=wxml.get("name", "world"), gravity=gravity, time_step=time_step
    )

    q0_parts: List[np.ndarray] = []
    v0_parts: List[np.ndarray] = []

    for sx in wxml.findall("skeleton"):
        skel, q0, v0 = _parse_skeleton(sx)
        world.add_skeleton(skel)
        q0_parts.append(q0)
        v0_parts.append(v0)

    q0 = np.concatenate(q0_parts) if q0_parts else np.zeros(0)
    v0 = np.concatenate(v0_parts) if v0_parts else np.zeros(0)
    return world, q0, v0


def _parse_skeleton(sx: ET.Element) -> Tuple[Skeleton, np.ndarray, np.ndarray]:
    name = sx.get("name", "skeleton")
    T_skel = _transform(sx.findtext("transformation"))
    mobile = sx.findtext("mobile", "true").strip().lower() not in ("false", "0")

    # Pass 1: bodies (initial world poses, inertia, shapes).
    bodies: Dict[str, dict] = {}
    body_order: List[str] = []
    for bx in sx.findall("body"):
        bname = bx.get("name")
        T_wb = T_skel @ _transform(bx.findtext("transformation"))
        inertia_x = bx.find("inertia")
        mass = 1.0
        com = np.zeros(3)
        moment = None
        if inertia_x is not None:
            mass = float(inertia_x.findtext("mass", "1"))
            off = inertia_x.findtext("offset")
            if off is not None:
                com = _floats(off)
            mom = inertia_x.find("moment_of_inertia")
            if mom is not None:
                ixx = float(mom.findtext("ixx", "0"))
                iyy = float(mom.findtext("iyy", "0"))
                izz = float(mom.findtext("izz", "0"))
                ixy = float(mom.findtext("ixy", "0"))
                ixz = float(mom.findtext("ixz", "0"))
                iyz = float(mom.findtext("iyz", "0"))
                moment = np.array(
                    [[ixx, ixy, ixz], [ixy, iyy, iyz], [ixz, iyz, izz]]
                )
        shapes: List[ShapeSpec] = []
        for tag, collidable in (("collision_shape", True), ("visualization_shape", False)):
            for shx in bx.findall(tag):
                g = shx.find("geometry")
                if g is None:
                    continue
                parsed = _parse_geometry(g)
                if parsed is None:
                    continue
                stype, size = parsed
                T_off = _transform(shx.findtext("transformation"))
                color = shx.findtext("color")
                shapes.append(
                    ShapeSpec(
                        shape_type=stype,
                        size=size,
                        T_offset=T_off,
                        collidable=collidable,
                        visual=not collidable,
                        color=_floats(color) if color else None,
                    )
                )
        if moment is None:
            coll = [s for s in shapes if s.collidable] or shapes
            if coll:
                s0 = coll[0]
                I_local = _shape_inertia(s0.shape_type, s0.size, mass)
                R = s0.T_offset[:3, :3]
                moment = R @ I_local @ R.T
            else:
                moment = np.eye(3) * 0.1 * mass
        bodies[bname] = dict(
            T_wb=T_wb, mass=mass, com=com, moment=moment, shapes=shapes
        )
        body_order.append(bname)

    # Pass 2: joints -> parent/child graph.
    joints_xml = sx.findall("joint")
    jmap: Dict[str, ET.Element] = {}
    parent_of: Dict[str, str] = {}
    for jx in joints_xml:
        child = jx.findtext("child")
        jmap[child] = jx
        parent_of[child] = jx.findtext("parent")

    # Topological order: parents before children.
    ordered: List[str] = []
    seen = set()

    def visit(bname: str):
        if bname in seen or bname == "world" or bname is None:
            return
        visit(parent_of.get(bname))
        seen.add(bname)
        ordered.append(bname)

    for bname in body_order:
        visit(bname)

    skel = Skeleton(name)
    index_of: Dict[str, int] = {}
    q0: List[float] = []
    v0: List[float] = []

    for bname in ordered:
        jx = jmap.get(bname)
        binfo = bodies[bname]
        pname = parent_of.get(bname)
        parent_idx = index_of.get(pname, -1) if pname != "world" else -1
        T_wp = bodies[pname]["T_wb"] if pname in bodies else np.eye(4)
        T_wc = binfo["T_wb"]

        jtype_name = jx.get("type", "weld") if jx is not None else "free"
        jtype = _JOINT_MAP.get(jtype_name, JT.WELD)
        if not mobile:
            jtype = JT.WELD  # static skeleton: freeze at initial pose

        T_cj = _transform(jx.findtext("transformation")) if jx is not None else np.eye(4)
        T_pj = np.linalg.inv(T_wp) @ T_wc @ T_cj

        axes = []
        lowers, uppers, dampings, springs = [], [], [], []
        init_pos, init_vel = None, None
        if jx is not None:
            for axtag in ("axis", "axis2", "axis3"):
                ax = jx.find(axtag)
                if ax is not None:
                    info = _parse_axis(ax)
                    axes.append(info["xyz"])
                    lowers.append(info.get("lower", -np.inf))
                    uppers.append(info.get("upper", np.inf))
                    dampings.append(info.get("damping", 0.0))
                    springs.append(info.get("spring", 0.0))
            ip = jx.findtext("init_pos")
            iv = jx.findtext("init_vel")
            if ip is not None:
                init_pos = _floats(ip)
            if iv is not None:
                init_vel = _floats(iv)

        nd = JT.num_dofs(jtype)
        # Broadcast per-axis specs to the dof count where sensible.
        def vec(vals, default):
            if not vals or not mobile:
                return None
            v = np.asarray(vals, dtype=np.float64)
            if len(v) == nd:
                return v
            if len(v) == 1 and nd >= 1:
                return np.full(nd, v[0])
            return None

        kwargs = {}
        if mobile:
            kwargs = dict(
                position_lower=vec(lowers, -np.inf),
                position_upper=vec(uppers, np.inf),
                damping=vec(dampings, 0.0),
                spring_stiffness=vec(springs, 0.0),
            )

        idx = skel.add_joint_and_body(
            jtype,
            parent=parent_idx,
            name=bname,
            T_pj=T_pj,
            T_cj=T_cj,
            axes=np.asarray(axes).reshape(-1, 3) if axes else None,
            mass=binfo["mass"],
            com=binfo["com"],
            inertia=binfo["moment"],
            shapes=tuple(binfo["shapes"]),
            euler_order=(jx.findtext("axis_order", "xyz").lower() if jx is not None else "xyz"),
            **kwargs,
        )
        index_of[bname] = idx

        if nd > 0:
            qj = np.zeros(nd)
            vj = np.zeros(nd)
            if init_pos is not None and len(init_pos) in (1, nd):
                qj[:] = init_pos if len(init_pos) == nd else init_pos[0]
            if init_vel is not None and len(init_vel) in (1, nd):
                vj[:] = init_vel if len(init_vel) == nd else init_vel[0]
            q0.extend(qj.tolist())
            v0.extend(vj.tolist())

    return skel, np.asarray(q0), np.asarray(v0)
