""".osim model parser -> Skeleton + markers.

TPU-native re-design of the reference OpenSimParser
(dart/biomechanics/OpenSimParser.hpp:101, 6.9k LoC): reads OpenSim 3.x/4.0
`<Model>` documents — BodySet (mass/mass_center/inertia), the joint family
(CustomJoint with SpatialTransform functions, PinJoint, UniversalJoint,
BallJoint, WeldJoint, FreeJoint), CoordinateSet ranges/defaults, and the
MarkerSet — into this engine's static Skeleton spec + a marker table.

Scope notes: muscles/actuators/constraints are ignored (the reference's
rational use is skeletal kinematics + markers for mocap fitting); meshes
attach as non-collidable visual stubs.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Dict, List, Optional, Tuple

import numpy as np

from nimblephysics_tpu.dynamics import joints as JT
from nimblephysics_tpu.dynamics.joints import CustomJointDef
from nimblephysics_tpu.dynamics.skeleton import Skeleton
from nimblephysics_tpu.math import splines


def _floats(t: str) -> np.ndarray:
    return np.array([float(x) for x in t.split()])


def _euler_xyz_T(loc: np.ndarray, rot: np.ndarray) -> np.ndarray:
    """OpenSim location + body-fixed XYZ Euler orientation -> 4x4."""
    cx, sx = np.cos(rot[0]), np.sin(rot[0])
    cy, sy = np.cos(rot[1]), np.sin(rot[1])
    cz, sz = np.cos(rot[2]), np.sin(rot[2])
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    T = np.eye(4)
    T[:3, :3] = Rx @ Ry @ Rz
    T[:3, 3] = loc
    return T


def _parse_function(fx: ET.Element) -> splines.Fn:
    """Parse an OpenSim <function> payload into a splines.Fn."""
    for child in fx:
        tag = child.tag
        if tag == "LinearFunction":
            a, b = _floats(child.findtext("coefficients", "1 0"))[:2]
            return splines.linear(a, b)
        if tag == "Constant":
            return splines.constant(float(child.findtext("value", "0")))
        if tag in ("SimmSpline", "NaturalCubicSpline"):
            xs = _floats(child.findtext("x"))
            ys = _floats(child.findtext("y"))
            return splines.simm_spline(xs, ys)
        if tag == "PolynomialFunction":
            return splines.polynomial(_floats(child.findtext("coefficients")))
        if tag == "MultiplierFunction":
            inner = _parse_function(child.find("function"))
            scale = float(child.findtext("scale", "1"))
            return splines.multiplier(inner, scale)
    return splines.constant(0.0)


class OpenSimFile:
    """Parsed model: skeleton + markers (+ coordinate name table).

    Reference parity: biomechanics::OpenSimFile returned by
    OpenSimParser::parseOsim. Markers are also registered on the skeleton
    (skeleton.markers) so marker_table/MarkerFitter work directly.
    """

    def __init__(self, skeleton: Skeleton, markers, coordinate_names,
                 couplers=None):
        self.skeleton = skeleton
        # markers: name -> (body_index, local_offset, fixed)
        self.markers: Dict[str, Tuple[int, np.ndarray, bool]] = markers
        for name, (b, off, fixed) in markers.items():
            skeleton.add_marker(name, b, off, fixed)
        self.coordinate_names: List[str] = coordinate_names
        # CoordinateCouplerConstraints (reference: OpenSimParser.cpp:
        # 400-440 `jointsDrivenBy` — patella-style dependent coordinates):
        # list of (dependent_idx, independent_idx, splines.Fn).
        self.couplers = couplers or []

    @property
    def marker_names(self) -> List[str]:
        return list(self.markers.keys())

    # -- reduced <-> full coordinate mappings -----------------------------
    # AddBiomechanics data (e.g. .b3d kinematics) stores only INDEPENDENT
    # coordinates; coupler-driven ones are functions of them. These
    # differentiable maps convert between the two spaces.

    @property
    def independent_indices(self) -> "np.ndarray":
        dep = {d for d, _, _ in self.couplers}
        return np.asarray(
            [i for i in range(len(self.coordinate_names)) if i not in dep],
            dtype=np.int64,
        )

    @property
    def independent_coordinate_names(self) -> List[str]:
        return [self.coordinate_names[i] for i in self.independent_indices]

    def expand_poses(self, q_independent):
        """(..., n_independent) -> (..., n_full): dependent coordinates
        evaluated as fn(independent). Differentiable."""
        import jax.numpy as jnp

        q_independent = jnp.asarray(q_independent)
        n_full = len(self.coordinate_names)
        ind = self.independent_indices
        out = jnp.zeros(q_independent.shape[:-1] + (n_full,),
                        dtype=q_independent.dtype)
        out = out.at[..., ind].set(q_independent)
        pos_of = {int(g): k for k, g in enumerate(ind)}
        for dep, indep, fn in self.couplers:
            out = out.at[..., dep].set(
                fn(q_independent[..., pos_of[indep]])
            )
        return out

    def reduce_poses(self, q_full):
        """(..., n_full) -> (..., n_independent)."""
        import jax.numpy as jnp

        return jnp.asarray(q_full)[..., self.independent_indices]


def parse_osim(path: str, geometry_folder: str = "") -> OpenSimFile:
    """Parse OpenSim 3.x (joints nested in bodies) or 4.x (separate
    JointSet with PhysicalOffsetFrames) models."""
    tree = ET.parse(path)
    root = tree.getroot()
    model = root.find("Model")
    assert model is not None, "not an OpenSim <Model> document"

    joint_set = model.find("JointSet")
    if joint_set is not None and joint_set.find("objects") is not None:
        objs = joint_set.find("objects")
        if len(objs) and objs[0].findtext("socket_parent_frame"):
            return _parse_v4(model)

    body_set = model.find("BodySet")
    bodies_xml = body_set.find("objects").findall("Body")

    skel = Skeleton(model.get("name", "osim"))
    index_of: Dict[str, int] = {"ground": -1}
    coordinate_names: List[str] = []

    # Topological: OpenSim body lists are parent-before-child in practice;
    # guard with a simple deferred queue for robustness.
    pending = list(bodies_xml)
    progress = True
    while pending and progress:
        progress = False
        remaining = []
        for bx in pending:
            bname = bx.get("name")
            if bname == "ground":
                progress = True
                continue
            jx_container = bx.find("Joint")
            if jx_container is None or len(jx_container) == 0:
                # Body with no joint: weld to ground.
                idx = skel.add_joint_and_body(
                    JT.WELD, parent=-1, name=bname,
                    mass=float(bx.findtext("mass", "1")),
                )
                index_of[bname] = idx
                progress = True
                continue
            jx = jx_container[0]
            parent_name = jx.findtext("parent_body")
            if parent_name not in index_of:
                remaining.append(bx)
                continue
            idx = _add_body(skel, bx, jx, index_of[parent_name], coordinate_names)
            index_of[bname] = idx
            progress = True
        pending = remaining
    if pending:
        raise ValueError(
            f"unresolved parent bodies for: {[b.get('name') for b in pending]}"
        )

    # Markers.
    markers: Dict[str, Tuple[int, np.ndarray, bool]] = {}
    mset = model.find("MarkerSet")
    if mset is not None:
        objs = mset.find("objects")
        if objs is not None:
            for mx in objs.findall("Marker"):
                body = mx.findtext("body")
                if body is None:  # OpenSim 4.x: socket_parent_frame
                    sock = mx.findtext("socket_parent_frame", "")
                    body = sock.split("/")[-1]
                loc = _floats(mx.findtext("location", "0 0 0"))
                fixed = mx.findtext("fixed", "false").strip().lower() == "true"
                if body in index_of and index_of[body] >= 0:
                    markers[mx.get("name")] = (index_of[body], loc, fixed)

    return OpenSimFile(
        skel, markers, coordinate_names,
        couplers=_parse_couplers(model, coordinate_names),
    )


def _parse_couplers(model, coordinate_names):
    """ConstraintSet -> CoordinateCouplerConstraint list
    (reference: OpenSimParser.cpp:390-440). Returns
    [(dependent_idx, independent_idx, fn)] for single-independent
    couplers whose coordinates exist in the model (the patella
    knee_angle_*_beta pattern and similar)."""
    out = []
    cset = model.find("ConstraintSet")
    if cset is None:
        return out
    objs = cset.find("objects")
    if objs is None:
        return out
    name_to_idx = {n: i for i, n in enumerate(coordinate_names)}
    for cx in objs.findall("CoordinateCouplerConstraint"):
        indep_el = cx.findtext("independent_coordinate_names")
        dep_el = cx.findtext("dependent_coordinate_name")
        if not indep_el or not dep_el:
            continue
        indep_names = indep_el.split()
        dep = dep_el.strip()
        if len(indep_names) != 1:
            continue  # multi-independent couplers unsupported (reference
            # ignores non-patella couplers entirely)
        indep = indep_names[0]
        if dep not in name_to_idx or indep not in name_to_idx:
            continue
        fx = cx.find("coupled_coordinates_function")
        fn = _parse_function(fx if fx is not None else cx)
        out.append((name_to_idx[dep], name_to_idx[indep], fn))
    return out


def _add_body(skel, bx, jx, parent_idx, coordinate_names) -> int:
    bname = bx.get("name")
    mass = float(bx.findtext("mass", "1"))
    com = _floats(bx.findtext("mass_center", "0 0 0"))
    I = np.array(
        [
            [float(bx.findtext("inertia_xx", "0.01")),
             float(bx.findtext("inertia_xy", "0")),
             float(bx.findtext("inertia_xz", "0"))],
            [float(bx.findtext("inertia_xy", "0")),
             float(bx.findtext("inertia_yy", "0.01")),
             float(bx.findtext("inertia_yz", "0"))],
            [float(bx.findtext("inertia_xz", "0")),
             float(bx.findtext("inertia_yz", "0")),
             float(bx.findtext("inertia_zz", "0.01"))],
        ]
    )
    # Guard: some models list zero inertia for tiny bodies.
    if np.all(np.abs(I) < 1e-12):
        I = np.eye(3) * max(mass, 1e-3) * 1e-4

    loc_p = _floats(jx.findtext("location_in_parent", "0 0 0"))
    rot_p = _floats(jx.findtext("orientation_in_parent", "0 0 0"))
    loc_c = _floats(jx.findtext("location", "0 0 0"))
    rot_c = _floats(jx.findtext("orientation", "0 0 0"))
    T_pj = _euler_xyz_T(loc_p, rot_p)
    T_cj = _euler_xyz_T(loc_c, rot_c)

    # Coordinates.
    coords = []
    cs = jx.find("CoordinateSet")
    if cs is not None and cs.find("objects") is not None:
        coords = cs.find("objects").findall("Coordinate")
    coord_names = [c.get("name") for c in coords]
    lowers, uppers, defaults = [], [], []
    for c in coords:
        rng = c.findtext("range")
        if rng and c.findtext("clamped", "false").strip().lower() == "true":
            lo, hi = _floats(rng)[:2]
        else:
            lo, hi = -np.inf, np.inf
        lowers.append(lo)
        uppers.append(hi)
        defaults.append(float(c.findtext("default_value", "0")))

    tag = jx.tag
    kwargs = dict(
        T_pj=T_pj, T_cj=T_cj, mass=mass, com=com, inertia=I,
    )
    if coord_names:
        kwargs.update(
            position_lower=np.asarray(lowers),
            position_upper=np.asarray(uppers),
        )

    if tag == "WeldJoint" or not coords and tag != "FreeJoint":
        idx = skel.add_joint_and_body(JT.WELD, parent=parent_idx, name=bname,
                                      T_pj=T_pj, T_cj=T_cj, mass=mass,
                                      com=com, inertia=I)
    elif tag == "PinJoint":
        idx = skel.add_joint_and_body(
            JT.REVOLUTE, parent=parent_idx, name=bname,
            axes=np.array([[0.0, 0.0, 1.0]]), **kwargs,
        )
    elif tag == "UniversalJoint":
        idx = skel.add_joint_and_body(
            JT.UNIVERSAL, parent=parent_idx, name=bname,
            axes=np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]), **kwargs,
        )
    elif tag == "BallJoint":
        idx = skel.add_joint_and_body(JT.BALL, parent=parent_idx, name=bname,
                                      **kwargs)
    elif tag == "FreeJoint":
        idx = skel.add_joint_and_body(JT.FREE, parent=parent_idx, name=bname,
                                      T_pj=T_pj, T_cj=T_cj, mass=mass,
                                      com=com, inertia=I)
        coord_names = coord_names or [f"{bname}_free_{k}" for k in range(6)]
    elif tag == "CustomJoint":
        st = jx.find("SpatialTransform")
        axes_r, axes_t, fns, drives = [], [], [], []
        for ax in st.findall("TransformAxis"):
            axis = _floats(ax.findtext("axis", "1 0 0"))
            cname = (ax.findtext("coordinates") or "").strip()
            drive = coord_names.index(cname) if cname in coord_names else -1
            # OpenSim 3.x wraps the transform function in <function>;
            # 4.x puts <LinearFunction>/<SimmSpline>/... DIRECTLY under
            # <TransformAxis>. _parse_function scans children for known
            # function tags, so passing the axis element handles both.
            fx_el = ax.find("function")
            fn = _parse_function(fx_el if fx_el is not None else ax)
            if ax.get("name", "").startswith("rotation"):
                axes_r.append(axis)
            else:
                axes_t.append(axis)
            fns.append(fn)
            drives.append(drive)
        cj = CustomJointDef(
            n_dofs=len(coord_names),
            rot_axes=np.asarray(axes_r[:3] + [[1, 0, 0]] * (3 - len(axes_r))),
            trans_axes=np.asarray(axes_t[:3] + [[1, 0, 0]] * (3 - len(axes_t))),
            functions=tuple(fns),
            drives=tuple(drives),
        )
        idx = skel.add_joint_and_body(
            JT.CUSTOM, parent=parent_idx, name=bname, custom=cj, **kwargs,
        )
    else:
        idx = skel.add_joint_and_body(JT.WELD, parent=parent_idx, name=bname,
                                      T_pj=T_pj, T_cj=T_cj, mass=mass,
                                      com=com, inertia=I)
        coord_names = []
    coordinate_names.extend(coord_names)
    return idx


# ---------------------------------------------------------------------------
# OpenSim 4.x: BodySet + separate JointSet with PhysicalOffsetFrames.
# ---------------------------------------------------------------------------


def _parse_v4(model: ET.Element) -> OpenSimFile:
    body_xml: Dict[str, ET.Element] = {}
    for bx in model.find("BodySet").find("objects").findall("Body"):
        body_xml[bx.get("name")] = bx

    def body_info(name):
        bx = body_xml[name]
        mass = float(bx.findtext("mass", "1"))
        com = _floats(bx.findtext("mass_center", "0 0 0"))
        iv = _floats(bx.findtext("inertia", "0.01 0.01 0.01 0 0 0"))
        I = np.array(
            [
                [iv[0], iv[3], iv[4]],
                [iv[3], iv[1], iv[5]],
                [iv[4], iv[5], iv[2]],
            ]
        )
        if np.all(np.abs(I) < 1e-12):
            I = np.eye(3) * max(mass, 1e-3) * 1e-4
        return mass, com, I

    # Joints: resolve offset frames to (parent body, T_pj, child body, T_cj).
    joints = []
    for jx in model.find("JointSet").find("objects"):
        frames = {}
        fr = jx.find("frames")
        if fr is not None:
            for fx in fr.findall("PhysicalOffsetFrame"):
                parent_path = (fx.findtext("socket_parent") or "").strip()
                parent_body = parent_path.split("/")[-1]
                T = _euler_xyz_T(
                    _floats(fx.findtext("translation", "0 0 0")),
                    _floats(fx.findtext("orientation", "0 0 0")),
                )
                frames[fx.get("name")] = (parent_body, T)

        def resolve(sock_text):
            sock = (sock_text or "").strip()
            key = sock.split("/")[-1]
            if key in frames:
                return frames[key]
            return key, np.eye(4)  # direct body/ground socket

        pbody, T_pj = resolve(jx.findtext("socket_parent_frame"))
        cbody, T_cj = resolve(jx.findtext("socket_child_frame"))
        joints.append((jx, pbody, T_pj, cbody, T_cj))

    # Topological add.
    skel = Skeleton(model.get("name", "osim"))
    index_of: Dict[str, int] = {"ground": -1, "": -1}
    coordinate_names: List[str] = []
    pending = list(joints)
    while pending:
        progressed = False
        remaining = []
        for item in pending:
            jx, pbody, T_pj, cbody, T_cj = item
            if pbody not in index_of:
                remaining.append(item)
                continue
            idx = _add_joint_v4(
                skel, jx, index_of[pbody], T_pj, T_cj,
                cbody, body_info(cbody), coordinate_names,
            )
            index_of[cbody] = idx
            progressed = True
        if not progressed:
            raise ValueError(
                f"unresolved joint parents: {[i[1] for i in remaining]}"
            )
        pending = remaining

    markers: Dict[str, Tuple[int, np.ndarray, bool]] = {}
    mset = model.find("MarkerSet")
    if mset is not None and mset.find("objects") is not None:
        for mx in mset.find("objects").findall("Marker"):
            body = mx.findtext("body") or (
                mx.findtext("socket_parent_frame", "").split("/")[-1]
            )
            if body in index_of and index_of[body] >= 0:
                markers[mx.get("name")] = (
                    index_of[body],
                    _floats(mx.findtext("location", "0 0 0")),
                    mx.findtext("fixed", "false").strip().lower() == "true",
                )
    return OpenSimFile(
        skel, markers, coordinate_names,
        couplers=_parse_couplers(model, coordinate_names),
    )


def _add_joint_v4(skel, jx, parent_idx, T_pj, T_cj, bname, info,
                  coordinate_names) -> int:
    mass, com, I = info
    coords = []
    cx = jx.find("coordinates")
    if cx is not None:
        coords = cx.findall("Coordinate")
    coord_names = [c.get("name") for c in coords]
    lowers, uppers = [], []
    for c in coords:
        rng = c.findtext("range")
        if rng and c.findtext("clamped", "false").strip().lower() == "true":
            lo, hi = _floats(rng)[:2]
        else:
            lo, hi = -np.inf, np.inf
        lowers.append(lo)
        uppers.append(hi)

    kwargs = dict(T_pj=T_pj, T_cj=T_cj, mass=mass, com=com, inertia=I)
    if coord_names:
        kwargs.update(
            position_lower=np.asarray(lowers),
            position_upper=np.asarray(uppers),
        )

    tag = jx.tag
    if tag == "PinJoint" and coord_names:
        idx = skel.add_joint_and_body(
            JT.REVOLUTE, parent=parent_idx, name=bname,
            axes=np.array([[0.0, 0.0, 1.0]]), **kwargs,
        )
    elif tag == "UniversalJoint" and coord_names:
        idx = skel.add_joint_and_body(
            JT.UNIVERSAL, parent=parent_idx, name=bname,
            axes=np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]), **kwargs,
        )
    elif tag == "BallJoint" and coord_names:
        idx = skel.add_joint_and_body(
            JT.BALL, parent=parent_idx, name=bname, **kwargs,
        )
    elif tag == "FreeJoint":
        idx = skel.add_joint_and_body(
            JT.FREE, parent=parent_idx, name=bname, T_pj=T_pj, T_cj=T_cj,
            mass=mass, com=com, inertia=I,
        )
        coord_names = coord_names or [f"{bname}_free_{k}" for k in range(6)]
    elif tag == "CustomJoint" and coord_names:
        st = jx.find("SpatialTransform")
        axes_r, axes_t, fns, drives = [], [], [], []
        for ax in st.findall("TransformAxis"):
            axis = _floats(ax.findtext("axis", "1 0 0"))
            cname = (ax.findtext("coordinates") or "").strip()
            drive = coord_names.index(cname) if cname in coord_names else -1
            # OpenSim 3.x wraps the transform function in <function>;
            # 4.x puts <LinearFunction>/<SimmSpline>/... DIRECTLY under
            # <TransformAxis>. _parse_function scans children for known
            # function tags, so passing the axis element handles both.
            fx_el = ax.find("function")
            fn = _parse_function(fx_el if fx_el is not None else ax)
            if ax.get("name", "").startswith("rotation"):
                axes_r.append(axis)
            else:
                axes_t.append(axis)
            fns.append(fn)
            drives.append(drive)
        cj = CustomJointDef(
            n_dofs=len(coord_names),
            rot_axes=np.asarray(axes_r[:3] + [[1, 0, 0]] * (3 - len(axes_r))),
            trans_axes=np.asarray(axes_t[:3] + [[1, 0, 0]] * (3 - len(axes_t))),
            functions=tuple(fns),
            drives=tuple(drives),
        )
        idx = skel.add_joint_and_body(
            JT.CUSTOM, parent=parent_idx, name=bname, custom=cj, **kwargs,
        )
    else:  # WeldJoint / unknown / no coordinates
        idx = skel.add_joint_and_body(
            JT.WELD, parent=parent_idx, name=bname, T_pj=T_pj, T_cj=T_cj,
            mass=mass, com=com, inertia=I,
        )
        coord_names = []
    coordinate_names.extend(coord_names)
    return idx
