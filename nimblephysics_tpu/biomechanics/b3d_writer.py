"""Reference-compatible `.b3d` (SubjectOnDisk) WRITER, pure Python.

Counterpart of b3d_reader.py: emits the reference binary layout
(dart/biomechanics/SubjectOnDisk.cpp writeB3D:380-470 — int64 header
size, protobuf `SubjectOnDiskHeader`, then constant-size frames: one
sensor blob + one processing-pass blob per pass per frame) using a
minimal protobuf wire ENCODER with field numbers from
dart/proto/SubjectOnDisk.proto. Every frame of a message type serializes
to identical length (all-packed fixed-count doubles), which the format
requires for O(1) seeking (the reference asserts this on write).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Sequence

import numpy as np


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _f_double(field: int, v: float) -> bytes:
    return _tag(field, 1) + struct.pack("<d", float(v))


def _f_varint(field: int, v: int) -> bytes:
    if v == 0:
        return b""  # proto3 omits defaults
    return _tag(field, 0) + _varint(int(v))


def _f_varint_always(field: int, v: int) -> bytes:
    return _tag(field, 0) + _varint(int(v))


def _f_bytes(field: int, data: bytes) -> bytes:
    if not data:
        return b""
    return _tag(field, 2) + _varint(len(data)) + data


def _f_string(field: int, s: str) -> bytes:
    return _f_bytes(field, s.encode("utf-8"))


def _f_packed_doubles(field: int, arr) -> bytes:
    a = np.asarray(arr, dtype="<f8").reshape(-1)
    if a.size == 0:
        return b""
    return _f_bytes(field, a.tobytes())


def _f_packed_doubles_always(field: int, arr) -> bytes:
    """Packed doubles, emitted even when empty would differ — frames must
    serialize to CONSTANT size, so counts must match across frames."""
    a = np.asarray(arr, dtype="<f8").reshape(-1)
    data = a.tobytes()
    return _tag(field, 2) + _varint(len(data)) + data


def _sensor_frame(marker_obs, cop, torque, force) -> bytes:
    """SubjectOnDiskSensorFrame (proto:219-231): marker_obs=2,
    raw_force_plate_cop=7 / torque=8 / force=9."""
    return (
        _f_packed_doubles_always(2, marker_obs)
        + _f_packed_doubles_always(7, cop)
        + _f_packed_doubles_always(8, torque)
        + _f_packed_doubles_always(9, force)
    )


def _pass_frame(pos, vel, acc, tau, wrench, com) -> bytes:
    """SubjectOnDiskProcessingPassFrame (proto:181-216): pos=1 vel=2
    acc=3 tau=4 ground_contact_wrench=5 com_pos=9."""
    return (
        _f_packed_doubles_always(1, pos)
        + _f_packed_doubles_always(2, vel)
        + _f_packed_doubles_always(3, acc)
        + _f_packed_doubles_always(4, tau)
        + _f_packed_doubles_always(5, wrench)
        + _f_packed_doubles_always(9, com)
    )


def write_b3d_reference_format(
    path: str,
    *,
    num_dofs: int,
    trials: Sequence[Dict],
    ground_contact_bodies: Sequence[str] = (),
    marker_names: Sequence[str] = (),
    pass_types: Sequence[int] = (0,),
    pass_osim_texts: Optional[Sequence[str]] = None,
    biological_sex: str = "unknown",
    height_m: float = 0.0,
    mass_kg: float = 0.0,
    age_years: int = 0,
    href: str = "",
    notes: str = "",
) -> None:
    """Write an AddBiomechanics-compatible .b3d subject file.

    Each trial dict: {"name": str, "timestep": float,
      "poses": (T, nq) [, "vels", "accs", "taus" (T, nq),
      "wrenches" (T, C*6), "com" (T, 3),
      "marker_obs" (T, M, 3), "plate_cop"/"plate_torque"/"plate_force"
      (T, P, 3)]}. Missing channels are zero/NaN-filled so frames stay
    constant-size.
    """
    n_markers = len(marker_names)
    C = len(ground_contact_bodies)
    n_passes = len(pass_types)

    def chan(tr, key, T, shape, fill=0.0):
        v = tr.get(key)
        if v is None:
            return np.full((T,) + shape, fill)
        return np.asarray(v, dtype=np.float64).reshape((T,) + shape)

    # Serialize all frames first (their constant sizes go in the header).
    trial_frames: List[List[bytes]] = []
    sensor_size = pass_size = None
    n_plates_all = []
    for tr in trials:
        poses = np.asarray(tr["poses"], dtype=np.float64)
        T = poses.shape[0]
        vels = chan(tr, "vels", T, (num_dofs,))
        accs = chan(tr, "accs", T, (num_dofs,))
        taus = chan(tr, "taus", T, (num_dofs,))
        wrench = chan(tr, "wrenches", T, (C * 6,))
        com = chan(tr, "com", T, (3,))
        mk = chan(tr, "marker_obs", T, (n_markers, 3), fill=np.nan)
        P = np.asarray(tr.get("plate_force", np.zeros((T, 0, 3)))).shape[1]
        n_plates_all.append(P)
        cop = chan(tr, "plate_cop", T, (P, 3))
        ptq = chan(tr, "plate_torque", T, (P, 3))
        pfo = chan(tr, "plate_force", T, (P, 3))
        frames = []
        for t in range(T):
            sensor = _sensor_frame(mk[t], cop[t], ptq[t], pfo[t])
            if sensor_size is None:
                sensor_size = len(sensor)
            assert len(sensor) == sensor_size, (
                "sensor frames must be constant-size: give every trial the "
                "same marker set and plate count"
            )
            blob = sensor
            for _ in range(n_passes):
                pf = _pass_frame(
                    poses[t], vels[t], accs[t], taus[t], wrench[t], com[t]
                )
                if pass_size is None:
                    pass_size = len(pf)
                assert len(pf) == pass_size
                blob += pf
            frames.append(blob)
        trial_frames.append(frames)

    sensor_size = sensor_size or 0
    pass_size = pass_size or 0

    # Header (SubjectOnDiskHeader, proto:157-178).
    header = b""
    header += _f_varint_always(1, num_dofs)
    header += _f_varint_always(2, len(trials))
    header += _f_varint_always(3, sensor_size)
    header += _f_varint_always(4, pass_size)
    def _f_msg(field: int, payload: bytes) -> bytes:
        # Repeated sub-messages must be emitted even when empty (the
        # reader counts entries, e.g. trial passes).
        return _tag(field, 2) + _varint(len(payload)) + payload

    texts = pass_osim_texts or [""] * n_passes
    for ptype, txt in zip(pass_types, texts):
        header += _f_msg(5, _f_varint(1, ptype) + _f_string(2, txt))
    for g in ground_contact_bodies:
        header += _f_string(6, g)
    for tr, frames, P in zip(trials, trial_frames, n_plates_all):
        sub = _f_string(1, tr.get("name", "trial"))
        sub += _f_varint_always(3, len(frames))
        sub += _f_double(4, tr.get("timestep", 0.01))
        for ptype in pass_types:  # one pass-header entry per pass
            sub += _f_msg(5, _f_varint(1, ptype))
        sub += _f_varint(7, P)
        header += _f_msg(9, sub)
    header += _f_varint_always(10, 4)  # format version
    header += _f_string(11, href)
    header += _f_string(12, notes)
    header += _f_string(13, biological_sex)
    if height_m:
        header += _f_double(14, height_m)
    if mass_kg:
        header += _f_double(15, mass_kg)
    header += _f_varint(16, age_years)
    for m in marker_names:
        header += _f_string(17, m)

    with open(path, "wb") as f:
        f.write(struct.pack("<q", len(header)))
        f.write(header)
        for frames in trial_frames:
            for blob in frames:
                f.write(blob)
