"""MJCF (MuJoCo XML) exporter.

Reference parity: dart/utils/MJCFExporter.hpp:13 — write a skeleton as a
MuJoCo model file so reference users can round-trip into MuJoCo tooling.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from xml.dom import minidom

import numpy as np

from nimblephysics_tpu.dynamics import joints as JT
from nimblephysics_tpu.dynamics import shapes as SH
from nimblephysics_tpu.dynamics.skeleton import Skeleton
from nimblephysics_tpu.math import lie


def _fmt(v) -> str:
    return " ".join(f"{float(x):.8g}" for x in np.asarray(v).reshape(-1))


def _quat_of(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> wxyz quaternion (MuJoCo convention)."""
    w = np.sqrt(max(0.0, 1 + R[0, 0] + R[1, 1] + R[2, 2])) / 2
    if w > 1e-8:
        x = (R[2, 1] - R[1, 2]) / (4 * w)
        y = (R[0, 2] - R[2, 0]) / (4 * w)
        z = (R[1, 0] - R[0, 1]) / (4 * w)
    else:
        import jax.numpy as jnp

        aa = np.asarray(lie.log_map_rot(jnp.asarray(R)))
        th = np.linalg.norm(aa)
        ax = aa / th if th > 0 else np.array([1.0, 0, 0])
        w = np.cos(th / 2)
        x, y, z = ax * np.sin(th / 2)
    return np.array([w, x, y, z])


def _add_geoms(parent_el, body, density_note=True):
    for shape in body.shapes:
        if not (shape.collidable or shape.visual):
            continue
        T = np.asarray(shape.T_offset)
        attrs = dict(
            pos=_fmt(T[:3, 3]),
            quat=_fmt(_quat_of(T[:3, :3])),
        )
        if shape.color is not None:
            attrs["rgba"] = _fmt(shape.color)
        t = shape.shape_type
        s = np.asarray(shape.size, dtype=np.float64)
        if t == SH.BOX:
            attrs.update(type="box", size=_fmt(s / 2.0))
        elif t == SH.SPHERE:
            attrs.update(type="sphere", size=_fmt([s[0]]))
        elif t == SH.CAPSULE:
            attrs.update(type="capsule", size=_fmt([s[0], s[1] / 2.0]))
        elif t == SH.CYLINDER:
            attrs.update(type="cylinder", size=_fmt([s[0], s[1] / 2.0]))
        elif t == SH.ELLIPSOID:
            attrs.update(type="ellipsoid", size=_fmt(s / 2.0))
        elif t == SH.PLANE:
            attrs.update(type="plane", size="10 10 0.1")
        else:
            continue
        if not shape.collidable:
            attrs["contype"] = "0"
            attrs["conaffinity"] = "0"
        ET.SubElement(parent_el, "geom", **attrs)


def skeleton_to_mjcf(skel: Skeleton, model_name: str = None) -> str:
    """Serialize a Skeleton as MJCF XML text."""
    root = ET.Element("mujoco", model=model_name or skel.name)
    ET.SubElement(root, "compiler", angle="radian", coordinate="local")
    worldbody = ET.SubElement(root, "worldbody")

    elements = {}
    for i, (spec, body) in enumerate(zip(skel.joints, skel.bodies)):
        parent_el = worldbody if spec.parent < 0 else elements[spec.parent]
        T_rel0 = np.asarray(spec.T_pj) @ np.linalg.inv(np.asarray(spec.T_cj))
        el = ET.SubElement(
            parent_el,
            "body",
            name=body.name,
            pos=_fmt(T_rel0[:3, 3]),
            quat=_fmt(_quat_of(T_rel0[:3, :3])),
        )
        ET.SubElement(
            el,
            "inertial",
            pos=_fmt(body.com),
            mass=f"{body.mass:.8g}",
            diaginertia=_fmt(np.diag(np.asarray(body.inertia))),
        )
        t = spec.joint_type
        if t == JT.FREE:
            ET.SubElement(el, "freejoint", name=spec.name)
        elif t in (JT.REVOLUTE, JT.SCREW):
            kw = {}
            lo, hi = spec.pos_lower_vec()[0], spec.pos_upper_vec()[0]
            if np.isfinite(lo) and np.isfinite(hi):
                kw.update(range=_fmt([lo, hi]), limited="true")
            d = spec.damping_vec()[0]
            if d:
                kw["damping"] = f"{d:.8g}"
            ET.SubElement(
                el, "joint", name=spec.name, type="hinge",
                axis=_fmt(spec.axes[0]), **kw,
            )
        elif t == JT.PRISMATIC:
            kw = {}
            lo, hi = spec.pos_lower_vec()[0], spec.pos_upper_vec()[0]
            if np.isfinite(lo) and np.isfinite(hi):
                kw.update(range=_fmt([lo, hi]), limited="true")
            d = spec.damping_vec()[0]
            if d:
                kw["damping"] = f"{d:.8g}"
            ET.SubElement(
                el, "joint", name=spec.name, type="slide",
                axis=_fmt(spec.axes[0]), **kw,
            )
        elif t == JT.BALL:
            ET.SubElement(el, "joint", name=spec.name, type="ball")
        elif t == JT.WELD:
            pass  # rigid attachment
        else:
            # Multi-dof joints decompose into stacked 1-dof MJCF joints.
            nd = spec.num_dofs
            axes = (
                spec.axes
                if spec.axes is not None
                else np.eye(3)[:nd]
            )
            kind = "slide" if t in (JT.TRANSLATIONAL, JT.TRANSLATIONAL_2D) else "hinge"
            for k in range(min(nd, len(axes))):
                ET.SubElement(
                    el, "joint", name=f"{spec.name}_{k}", type=kind,
                    axis=_fmt(axes[k]),
                )
        _add_geoms(el, body)
        elements[i] = el

    raw = ET.tostring(root, encoding="unicode")
    return minidom.parseString(raw).toprettyxml(indent="  ")


def write_mjcf(skel: Skeleton, path: str) -> None:
    with open(path, "w") as f:
        f.write(skeleton_to_mjcf(skel))
