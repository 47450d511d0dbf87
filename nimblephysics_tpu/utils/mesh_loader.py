"""Mesh file loaders (OBJ / STL / minimal DAE), numpy only.

Reference parity: the reference loads mesh assets through assimp
(dart/dynamics/MeshShape.cpp); here a small numpy loader covers the
formats used by its data/ assets (URDF robots reference .obj/.stl/.dae).
Only geometry is read (positions + triangle indices) — materials and
scene graphs are ignored; multiple meshes in one file are merged.
"""

from __future__ import annotations

import os
import struct
import xml.etree.ElementTree as ET
from typing import Optional, Tuple

import numpy as np


def load_obj(path: str) -> Tuple[np.ndarray, np.ndarray]:
    verts = []
    faces = []
    with open(path, "r", errors="replace") as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                verts.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif line.startswith("f "):
                idx = []
                for tok in line.split()[1:]:
                    i = tok.split("/")[0]
                    idx.append(int(i))
                idx = [i - 1 if i > 0 else len(verts) + i for i in idx]
                for k in range(1, len(idx) - 1):  # fan-triangulate
                    faces.append([idx[0], idx[k], idx[k + 1]])
    return (
        np.asarray(verts, dtype=np.float64).reshape(-1, 3),
        np.asarray(faces, dtype=np.int32).reshape(-1, 3),
    )


def load_stl(path: str) -> Tuple[np.ndarray, np.ndarray]:
    with open(path, "rb") as f:
        head = f.read(5)
        f.seek(0)
        data = f.read()
    if head == b"solid" and b"facet" in data[:1000]:
        return _load_stl_ascii(data.decode(errors="replace"))
    # Binary STL: 80-byte header, uint32 count, 50 bytes per triangle.
    n = struct.unpack("<I", data[80:84])[0]
    tris = np.frombuffer(
        data[84 : 84 + n * 50], dtype=np.uint8
    ).reshape(n, 50)
    xyz = tris[:, 12:48].copy().view("<f4").reshape(n, 3, 3)
    verts, inv = np.unique(
        xyz.reshape(-1, 3).round(decimals=7), axis=0, return_inverse=True
    )
    faces = inv.reshape(n, 3).astype(np.int32)
    return verts.astype(np.float64), faces


def _load_stl_ascii(text: str) -> Tuple[np.ndarray, np.ndarray]:
    pts = []
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("vertex"):
            parts = line.split()
            pts.append([float(parts[1]), float(parts[2]), float(parts[3])])
    xyz = np.asarray(pts, dtype=np.float64).reshape(-1, 3, 3)
    verts, inv = np.unique(
        xyz.reshape(-1, 3).round(decimals=9), axis=0, return_inverse=True
    )
    faces = inv.reshape(-1, 3).astype(np.int32)
    return verts, faces


def load_dae(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Minimal COLLADA reader: concatenates every <geometry> mesh's
    position source + <triangles>/<polylist> indices (unit scale and node
    transforms are ignored — adequate for collision hulls)."""
    ns = {"c": "http://www.collada.org/2005/11/COLLADASchema"}
    root = ET.parse(path).getroot()
    all_v, all_f = [], []
    off = 0
    for geom in root.iter("{http://www.collada.org/2005/11/COLLADASchema}geometry"):
        mesh = geom.find("c:mesh", ns)
        if mesh is None:
            continue
        # Position source: the <vertices>' POSITION input.
        verts_el = mesh.find("c:vertices", ns)
        if verts_el is None:
            continue
        pos_id = None
        for inp in verts_el.findall("c:input", ns):
            if inp.get("semantic") == "POSITION":
                pos_id = inp.get("source", "").lstrip("#")
        src = None
        for s in mesh.findall("c:source", ns):
            if s.get("id") == pos_id:
                src = s.find("c:float_array", ns)
        if src is None:
            continue
        v = np.array(src.text.split(), dtype=np.float64).reshape(-1, 3)
        for prim_tag in ("triangles", "polylist"):
            for prim in mesh.findall(f"c:{prim_tag}", ns):
                inputs = prim.findall("c:input", ns)
                stride = max(int(i.get("offset", 0)) for i in inputs) + 1
                voff = 0
                for i in inputs:
                    if i.get("semantic") == "VERTEX":
                        voff = int(i.get("offset", 0))
                p = prim.find("c:p", ns)
                if p is None:
                    continue
                idx = np.array(p.text.split(), dtype=np.int64)
                vidx = idx.reshape(-1, stride)[:, voff]
                if prim_tag == "polylist":
                    vc = np.array(
                        prim.find("c:vcount", ns).text.split(), dtype=np.int64
                    )
                    tris = []
                    k = 0
                    for c in vc:
                        for t in range(1, c - 1):
                            tris.append([vidx[k], vidx[k + t], vidx[k + t + 1]])
                        k += c
                    f = np.asarray(tris, dtype=np.int64)
                else:
                    f = vidx.reshape(-1, 3)
                all_f.append(f + off)
        all_v.append(v)
        off += len(v)
    if not all_v:
        raise ValueError(f"no geometry found in {path}")
    return (
        np.concatenate(all_v).astype(np.float64),
        np.concatenate(all_f).astype(np.int32) if all_f else np.zeros((0, 3), np.int32),
    )


def load_mesh(
    path: str, scale=None
) -> Tuple[np.ndarray, np.ndarray]:
    """Dispatch by extension; returns (vertices (n,3), faces (m,3))."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".obj":
        v, f = load_obj(path)
    elif ext == ".stl":
        v, f = load_stl(path)
    elif ext == ".dae":
        v, f = load_dae(path)
    else:
        raise ValueError(f"unsupported mesh format: {ext}")
    if scale is not None:
        v = v * np.asarray(scale, dtype=np.float64)
    return v, f
