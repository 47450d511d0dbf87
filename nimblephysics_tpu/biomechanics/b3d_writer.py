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


def _f_string_always(field: int, s: str) -> bytes:
    """Repeated-string entry: emitted even when empty (dropping an empty
    entry from a repeated field would renumber the survivors)."""
    data = s.encode("utf-8")
    return _tag(field, 2) + _varint(len(data)) + data


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


def _sensor_frame(marker_obs, cop, torque, force, custom=(), acc=(),
                  gyro=(), emg=(), exo=()) -> bytes:
    """SubjectOnDiskSensorFrame (proto:215-232): custom_values=1,
    marker_obs=2, acc_obs=3, gyro_obs=4, emg_obs=5, exo_obs=6,
    raw_force_plate_cop=7 / torque=8 / force=9."""
    return (
        _f_packed_doubles(1, custom)
        + _f_packed_doubles_always(2, marker_obs)
        + _f_packed_doubles(3, acc)
        + _f_packed_doubles(4, gyro)
        + _f_packed_doubles(5, emg)
        + _f_packed_doubles(6, exo)
        + _f_packed_doubles_always(7, cop)
        + _f_packed_doubles_always(8, torque)
        + _f_packed_doubles_always(9, force)
    )


def _pass_frame(pos, vel, acc, tau, wrench, com, com_vel=None,
                com_acc=None, root_residual=None) -> bytes:
    """SubjectOnDiskProcessingPassFrame (proto:179-213): pos=1 vel=2
    acc=3 tau=4 ground_contact_wrench=5 com_pos=9 com_vel=10 com_acc=11
    root_frame_residual=12."""
    out = (
        _f_packed_doubles_always(1, pos)
        + _f_packed_doubles_always(2, vel)
        + _f_packed_doubles_always(3, acc)
        + _f_packed_doubles_always(4, tau)
        + _f_packed_doubles_always(5, wrench)
        + _f_packed_doubles_always(9, com)
    )
    if com_vel is not None:
        out += _f_packed_doubles_always(10, com_vel)
    if com_acc is not None:
        out += _f_packed_doubles_always(11, com_acc)
    if root_residual is not None:
        out += _f_packed_doubles_always(12, root_residual)
    return out


def _f_packed_bools(field: int, vals) -> bytes:
    vals = [] if vals is None else list(vals)
    if not vals:
        return b""
    return _f_bytes(field, b"".join(_varint(1 if v else 0) for v in vals))


def _f_packed_floats(field: int, vals) -> bytes:
    a = np.asarray(
        [] if vals is None else vals, dtype="<f4"
    ).reshape(-1)
    if a.size == 0:
        return b""
    return _f_bytes(field, a.tobytes())


def encode_pass_header(ph: Dict) -> bytes:
    """SubjectOnDiskTrialProcessingPassHeader (proto:58-94): the per-trial
    per-pass summary the AddBiomechanics pipeline writes back after each
    processing stage — type=1, dof_positions_observed=2,
    dof_velocities_finite_differenced=3,
    dof_acceleration_finite_differenced=4, marker_rms=5, marker_max=6,
    linear_residual=7, angular_residual=8, joints_max_velocity=9,
    lowpass_cutoff_frequency=10, lowpass_filter_order=11,
    force_plate_cutoff=12."""
    out = _f_varint(1, int(ph.get("type", 0)))
    out += _f_packed_bools(2, ph.get("dof_positions_observed"))
    out += _f_packed_bools(3, ph.get("dof_velocities_finite_differenced"))
    out += _f_packed_bools(4, ph.get("dof_acceleration_finite_differenced"))
    out += _f_packed_floats(5, ph.get("marker_rms"))
    out += _f_packed_floats(6, ph.get("marker_max"))
    out += _f_packed_floats(7, ph.get("linear_residual"))
    out += _f_packed_floats(8, ph.get("angular_residual"))
    out += _f_packed_floats(9, ph.get("joints_max_velocity"))
    if ph.get("lowpass_cutoff_frequency"):
        out += _tag(10, 5) + struct.pack(
            "<f", float(ph["lowpass_cutoff_frequency"])
        )
    out += _f_varint(11, int(ph.get("lowpass_filter_order", 0)))
    out += _f_packed_floats(12, ph.get("force_plate_cutoff"))
    return out


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
      "com_vel"/"com_acc" (T, 3), "root_residual" (T, 6),
      "marker_obs" (T, M, 3), "plate_cop"/"plate_torque"/"plate_force"
      (T, P, 3),
      "acc_obs"/"gyro_obs" (T, nA, 3), "emg_obs" (T, nE),
      "custom_values" (T, nCV),
      "pass_headers": [per-pass dict for encode_pass_header —
        marker_rms/marker_max/linear_residual/angular_residual (T,)
        floats, dof flags, lowpass fields
        (SubjectOnDiskTrialProcessingPassHeader, proto:58-94)],
      "missing_grf_reason" (T,) ints, "tags": [str]]}.
    Missing channels are zero/NaN-filled so frames stay constant-size;
    OPTIONAL channels (com_vel, com_acc, root_residual, acc/gyro/emg/
    custom sensors) are emitted for ALL trials whenever ANY trial
    provides them (constant frame size is a format requirement).
    """
    n_markers = len(marker_names)
    C = len(ground_contact_bodies)
    n_passes = len(pass_types)

    def chan_width(key, ncols):
        """File-level width of an optional channel: max over trials (0 =
        omit the field entirely)."""
        w = 0
        for tr in trials:
            v = tr.get(key)
            if v is not None:
                a = np.asarray(v)
                w = max(w, int(np.prod(a.shape[1:])) // ncols)
        return w

    n_acc = chan_width("acc_obs", 3)
    n_gyro = chan_width("gyro_obs", 3)
    n_emg = chan_width("emg_obs", 1)
    n_custom = chan_width("custom_values", 1)
    use_com_vel = any(tr.get("com_vel") is not None for tr in trials)
    use_com_acc = any(tr.get("com_acc") is not None for tr in trials)
    use_root_res = any(
        tr.get("root_residual") is not None for tr in trials
    )

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
        acc_obs = chan(tr, "acc_obs", T, (n_acc, 3))
        gyro_obs = chan(tr, "gyro_obs", T, (n_gyro, 3))
        emg_obs = chan(tr, "emg_obs", T, (n_emg,))
        custom = chan(tr, "custom_values", T, (n_custom,))
        com_vel = chan(tr, "com_vel", T, (3,)) if use_com_vel else None
        com_acc = chan(tr, "com_acc", T, (3,)) if use_com_acc else None
        root_res = (
            chan(tr, "root_residual", T, (6,)) if use_root_res else None
        )
        frames = []
        for t in range(T):
            sensor = _sensor_frame(
                mk[t], cop[t], ptq[t], pfo[t], custom=custom[t],
                acc=acc_obs[t], gyro=gyro_obs[t], emg=emg_obs[t],
            )
            if sensor_size is None:
                sensor_size = len(sensor)
            assert len(sensor) == sensor_size, (
                "sensor frames must be constant-size: give every trial the "
                "same marker set and plate count"
            )
            blob = sensor
            for _ in range(n_passes):
                pf = _pass_frame(
                    poses[t], vels[t], accs[t], taus[t], wrench[t], com[t],
                    com_vel=None if com_vel is None else com_vel[t],
                    com_acc=None if com_acc is None else com_acc[t],
                    root_residual=None if root_res is None else root_res[t],
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
        header += _f_string_always(6, g)
    for tr, frames, P in zip(trials, trial_frames, n_plates_all):
        sub = _f_string(1, tr.get("name", "trial"))
        mgr = tr.get("missing_grf_reason")
        if mgr is not None:
            sub += _f_bytes(2, b"".join(_varint(int(v)) for v in mgr))
        sub += _f_varint_always(3, len(frames))
        sub += _f_double(4, tr.get("timestep", 0.01))
        pass_headers = tr.get("pass_headers") or [{}] * n_passes
        assert len(pass_headers) == n_passes, (
            "pass_headers must have one dict per processing pass"
        )
        for ptype, ph in zip(pass_types, pass_headers):
            ph = dict(ph)
            ph.setdefault("type", ptype)
            sub += _f_msg(5, encode_pass_header(ph))
        for tag in tr.get("tags", ()):
            sub += _f_string_always(6, tag)
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
        header += _f_string_always(17, m)

    with open(path, "wb") as f:
        f.write(struct.pack("<q", len(header)))
        f.write(header)
        for frames in trial_frames:
            for blob in frames:
                f.write(blob)
