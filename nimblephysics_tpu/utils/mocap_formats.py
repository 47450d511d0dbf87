"""Text mocap formats: TRC markers, MOT/STO motions, AMC/ASF (CMU), VSK.

Reference parity: OpenSimParser::loadTRC / loadMot (dart/biomechanics),
AMCParser (dart/utils), VskParser (Vicon marker sets). All plain-text
tabular formats -> numpy.
"""

from __future__ import annotations

import dataclasses
import xml.etree.ElementTree as ET
from typing import Dict, List, Tuple

import numpy as np


@dataclasses.dataclass
class MarkerTrajectories:
    """(reference: OpenSimTRC) marker name -> (T, 3) in meters."""

    marker_names: List[str]
    timestamps: np.ndarray  # (T,)
    markers: np.ndarray  # (T, M, 3), NaN = missing
    framerate: float


def load_trc(path: str) -> MarkerTrajectories:
    """Load a .trc marker file (tab-separated, mm or m units)."""
    with open(path) as f:
        lines = f.read().splitlines()
    # Line 2 is the header values row; find units.
    meta_keys = lines[1].split("\t")
    meta_vals = lines[2].split("\t")
    meta = dict(zip(meta_keys, meta_vals))
    unit = meta.get("Units", "mm").strip()
    scale = 1e-3 if unit == "mm" else 1.0
    rate = float(meta.get("DataRate", meta.get("CameraRate", "100")))
    names_row = lines[3].split("\t")
    marker_names = [n for n in names_row[2:] if n.strip()]
    data_rows = []
    times = []
    for ln in lines[5:]:
        if not ln.strip():
            continue
        parts = ln.split("\t")
        times.append(float(parts[1]))
        vals = []
        for x in parts[2 : 2 + 3 * len(marker_names)]:
            try:
                vals.append(float(x) * scale)
            except ValueError:
                vals.append(np.nan)
        vals += [np.nan] * (3 * len(marker_names) - len(vals))
        data_rows.append(vals)
    markers = np.asarray(data_rows).reshape(len(data_rows), len(marker_names), 3)
    return MarkerTrajectories(
        marker_names, np.asarray(times), markers, rate
    )


def write_trc(path: str, traj: MarkerTrajectories, units: str = "m") -> None:
    scale = 1000.0 if units == "mm" else 1.0
    T, M, _ = traj.markers.shape
    with open(path, "w") as f:
        f.write(f"PathFileType\t4\t(X/Y/Z)\t{path}\n")
        f.write(
            "DataRate\tCameraRate\tNumFrames\tNumMarkers\tUnits\t"
            "OrigDataRate\tOrigDataStartFrame\tOrigNumFrames\n"
        )
        f.write(
            f"{traj.framerate}\t{traj.framerate}\t{T}\t{M}\t{units}\t"
            f"{traj.framerate}\t1\t{T}\n"
        )
        f.write(
            "Frame#\tTime\t" + "\t\t\t".join(traj.marker_names) + "\n"
        )
        f.write(
            "\t\t"
            + "\t".join(
                f"X{i+1}\tY{i+1}\tZ{i+1}" for i in range(M)
            )
            + "\n"
        )
        for t in range(T):
            row = [str(t + 1), f"{traj.timestamps[t]:.6f}"]
            for m in range(M):
                for k in range(3):
                    v = traj.markers[t, m, k] * scale
                    row.append("" if np.isnan(v) else f"{v:.6f}")
            f.write("\t".join(row) + "\n")


@dataclasses.dataclass
class Motion:
    """(reference: OpenSimMot) column name -> trajectory."""

    column_names: List[str]
    timestamps: np.ndarray
    values: np.ndarray  # (T, C)
    in_degrees: bool = False


def load_mot(path: str) -> Motion:
    """Load an OpenSim .mot/.sto motion file."""
    with open(path) as f:
        lines = f.read().splitlines()
    in_degrees = False
    i = 0
    for i, ln in enumerate(lines):
        low = ln.strip().lower()
        if low.startswith("indegrees"):
            in_degrees = "yes" in low
        if low == "endheader":
            break
    cols = lines[i + 1].split()
    data = np.asarray(
        [[float(x) for x in ln.split()] for ln in lines[i + 2 :] if ln.strip()]
    )
    return Motion(cols[1:], data[:, 0], data[:, 1:], in_degrees)


def write_mot(path: str, motion: Motion, name: str = "motion") -> None:
    with open(path, "w") as f:
        f.write(f"{name}\nversion=1\n")
        f.write(f"nRows={len(motion.timestamps)}\n")
        f.write(f"nColumns={motion.values.shape[1] + 1}\n")
        f.write(f"inDegrees={'yes' if motion.in_degrees else 'no'}\n")
        f.write("endheader\n")
        f.write("time\t" + "\t".join(motion.column_names) + "\n")
        for t in range(len(motion.timestamps)):
            f.write(
                f"{motion.timestamps[t]:.8f}\t"
                + "\t".join(f"{v:.8f}" for v in motion.values[t])
                + "\n"
            )


def load_amc(path: str, asf_bone_order: List[str]) -> Dict[str, np.ndarray]:
    """Load a CMU .amc mocap file: bone name -> (T, dof) channel values
    (reference: utils::AMCParser)."""
    out: Dict[str, List[List[float]]] = {}
    with open(path) as f:
        for ln in f:
            ln = ln.strip()
            if not ln or ln.startswith(("#", ":")):
                continue
            parts = ln.split()
            if len(parts) == 1 and parts[0].isdigit():
                continue  # frame number
            bone, vals = parts[0], [float(x) for x in parts[1:]]
            out.setdefault(bone, []).append(vals)
    return {k: np.asarray(v) for k, v in out.items()}


def load_vsk_markers(path: str) -> Dict[str, Tuple[str, np.ndarray]]:
    """Load a Vicon .vsk marker set: marker -> (segment, offset)
    (reference: utils::VskParser)."""
    tree = ET.parse(path)
    root = tree.getroot()
    params = {}
    for p in root.iter("Parameter"):
        params[p.get("NAME")] = float(p.get("VALUE", "0"))

    def resolve(txt):
        vals = []
        for tok in txt.split():
            if tok in params:
                vals.append(params[tok])
            else:
                try:
                    vals.append(float(tok))
                except ValueError:
                    vals.append(0.0)
        return np.asarray(vals) * 1e-3  # mm -> m

    out = {}
    for m in root.iter("Marker"):
        name = m.get("NAME")
        seg = m.get("SEGMENT")
        pos = resolve(m.get("POSITION", "0 0 0"))
        out[name] = (seg, pos)
    return out
