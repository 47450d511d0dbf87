"""Reference-compatible `.b3d` (SubjectOnDisk) reader, pure Python/numpy.

Interop with AddBiomechanics data: reads the reference's binary subject
format (dart/biomechanics/SubjectOnDisk.cpp:307-365 layout — int64 header
size, protobuf `SubjectOnDiskHeader`, then constant-size frames per trial:
one `SubjectOnDiskSensorFrame` blob of `raw_sensor_frame_size` bytes
followed by one `SubjectOnDiskProcessingPassFrame` blob of
`processing_pass_frame_size` bytes per processing pass,
SubjectOnDisk.cpp:955-1050 seek math).

Instead of compiled protobuf classes, a ~60-line protobuf WIRE-FORMAT
decoder interprets the messages with field numbers taken from the schema
(dart/proto/SubjectOnDisk.proto — cited per field below). proto3 wire
format: tag = (field_number << 3) | wire_type; varint(0) / 64-bit(1) /
length-delimited(2) / 32-bit(5); repeated scalars are packed in
length-delimited blobs.
"""

from __future__ import annotations

import dataclasses
import struct
from typing import Dict, List, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# Generic wire decoder
# ---------------------------------------------------------------------------


def _read_varint(buf: bytes, i: int) -> Tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7
        if shift > 70:
            raise ValueError("varint too long (corrupt protobuf)")


def decode_fields(buf: bytes) -> Dict[int, List]:
    """Decode one message into {field_number: [raw values]}.

    varint fields -> int; 64-bit -> float (little-endian double);
    32-bit -> float; length-delimited -> bytes (caller interprets).
    """
    i = 0
    n = len(buf)
    out: Dict[int, List] = {}
    while i < n:
        tag, i = _read_varint(buf, i)
        field = tag >> 3
        wt = tag & 7
        if field == 0:
            raise ValueError("field number 0 (corrupt protobuf)")
        if wt == 0:
            v, i = _read_varint(buf, i)
        elif wt == 1:
            (v,) = struct.unpack_from("<d", buf, i)
            i += 8
        elif wt == 2:
            ln, i = _read_varint(buf, i)
            v = buf[i : i + ln]
            if len(v) != ln:
                raise ValueError("truncated length-delimited field")
            i += ln
        elif wt == 5:
            (v,) = struct.unpack_from("<f", buf, i)
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        out.setdefault(field, []).append(v)
    return out


def _packed_doubles(chunks: List) -> np.ndarray:
    if not chunks:
        return np.zeros(0)
    parts = []
    for c in chunks:
        if isinstance(c, bytes):
            parts.append(np.frombuffer(c, dtype="<f8"))
        else:  # non-packed encoding: one double per entry
            parts.append(np.asarray([c], dtype=np.float64))
    return np.concatenate(parts)


def _packed_floats(chunks: List) -> np.ndarray:
    if not chunks:
        return np.zeros(0, dtype=np.float32)
    parts = []
    for c in chunks:
        if isinstance(c, bytes):
            parts.append(np.frombuffer(c, dtype="<f4"))
        else:
            parts.append(np.asarray([c], dtype=np.float32))
    return np.concatenate(parts)


def _packed_varints(chunks: List) -> List[int]:
    out = []
    for c in chunks:
        if isinstance(c, bytes):
            i = 0
            while i < len(c):
                v, i = _read_varint(c, i)
                out.append(v)
        else:
            out.append(int(c))
    return out


def _strs(chunks: List) -> List[str]:
    return [c.decode("utf-8", errors="replace") for c in chunks]


def _first(fields, num, default=None):
    vals = fields.get(num)
    return vals[0] if vals else default


def _first_int(fields, num, default=0):
    v = _first(fields, num, default)
    return int(v) if v is not None else default


# ---------------------------------------------------------------------------
# Schema mapping (field numbers from dart/proto/SubjectOnDisk.proto)
# ---------------------------------------------------------------------------


def _decode_pass_header(buf: bytes) -> Dict:
    """SubjectOnDiskTrialProcessingPassHeader (proto:58-94)."""
    pf = decode_fields(buf)
    return {
        "type": _first_int(pf, 1),
        "dof_positions_observed": [
            bool(v) for v in _packed_varints(pf.get(2, []))
        ],
        "dof_velocities_finite_differenced": [
            bool(v) for v in _packed_varints(pf.get(3, []))
        ],
        "dof_acceleration_finite_differenced": [
            bool(v) for v in _packed_varints(pf.get(4, []))
        ],
        "marker_rms": _packed_floats(pf.get(5, [])),
        "marker_max": _packed_floats(pf.get(6, [])),
        "linear_residual": _packed_floats(pf.get(7, [])),
        "angular_residual": _packed_floats(pf.get(8, [])),
        "joints_max_velocity": _packed_floats(pf.get(9, [])),
        "lowpass_cutoff_frequency": float(_first(pf, 10, 0.0) or 0.0),
        "lowpass_filter_order": _first_int(pf, 11),
        "force_plate_cutoff": _packed_floats(pf.get(12, [])),
    }


@dataclasses.dataclass
class B3DTrial:
    name: str
    length: int
    timestep: float
    num_passes: int
    missing_grf_reason: List[int]
    num_force_plates: int
    tags: List[str]
    # Per-pass summary written back by processing stages
    # (SubjectOnDiskTrialProcessingPassHeader, proto:58-94).
    pass_headers: List[Dict] = dataclasses.field(default_factory=list)
    original_name: str = ""
    split_index: int = 0
    marker_names_guessed: bool = False


@dataclasses.dataclass
class B3DFrames:
    """Arrays for a contiguous frame range of one trial (first index = t)."""

    # Per processing pass (list over passes):
    pos: List[np.ndarray]  # (T, num_dofs)
    vel: List[np.ndarray]
    acc: List[np.ndarray]
    tau: List[np.ndarray]
    ground_contact_wrench: List[np.ndarray]  # (T, n_contact_bodies * 6)
    com_pos: List[np.ndarray]  # (T, 3)
    com_vel: List[np.ndarray]  # (T, 3) — (T, 0) when absent
    com_acc: List[np.ndarray]
    root_frame_residual: List[np.ndarray]  # (T, 6) — (T, 0) when absent
    # Sensor data:
    marker_obs: np.ndarray  # (T, n_markers, 3), NaN = unobserved
    raw_force_plate_cop: np.ndarray  # (T, n_plates, 3)
    raw_force_plate_torque: np.ndarray
    raw_force_plate_force: np.ndarray
    acc_obs: np.ndarray  # (T, nA*3) — (T, 0) when absent
    gyro_obs: np.ndarray
    emg_obs: np.ndarray  # (T, nE)
    custom_values: np.ndarray  # (T, nCV)


class SubjectOnDiskReader:
    """Reads the reference `.b3d` format (AddBiomechanics subjects)."""

    def __init__(self, path: str):
        self.path = path
        with open(path, "rb") as f:
            header_size = struct.unpack("<q", f.read(8))[0]
            if header_size <= 0 or header_size > 1 << 31:
                raise ValueError(f"bad b3d header size {header_size}")
            header_buf = f.read(header_size)
            if len(header_buf) != header_size:
                raise ValueError("truncated b3d header")
        self._data_start = 8 + header_size
        h = decode_fields(header_buf)
        # SubjectOnDiskHeader fields (SubjectOnDisk.proto:157-178).
        self.num_dofs = _first_int(h, 1)
        self.num_trials = _first_int(h, 2)
        self.raw_sensor_frame_size = _first_int(h, 3)
        self.processing_pass_frame_size = _first_int(h, 4)
        self.version = _first_int(h, 10)
        self.href = _first(h, 11, b"").decode(errors="replace")
        self.notes = _first(h, 12, b"").decode(errors="replace")
        self.biological_sex = _first(h, 13, b"").decode(errors="replace")
        self.height_m = float(_first(h, 14, 0.0) or 0.0)
        self.mass_kg = float(_first(h, 15, 0.0) or 0.0)
        self.age_years = _first_int(h, 16)
        self.ground_contact_bodies = _strs(h.get(6, []))
        self.marker_names = _strs(h.get(17, []))
        self.subject_tags = _strs(h.get(23, []))
        # Passes: SubjectOnDiskPass {pass_type=1, model_osim_text=2}.
        self.pass_types: List[int] = []
        self.pass_osim_texts: List[str] = []
        for pbuf in h.get(5, []):
            pf = decode_fields(pbuf)
            self.pass_types.append(_first_int(pf, 1))
            self.pass_osim_texts.append(
                _first(pf, 2, b"").decode(errors="replace")
            )
        # Trials: SubjectOnDiskTrialHeader (proto:98-130).
        self.trials: List[B3DTrial] = []
        for tbuf in h.get(9, []):
            tf = decode_fields(tbuf)
            self.trials.append(
                B3DTrial(
                    name=_first(tf, 1, b"").decode(errors="replace"),
                    missing_grf_reason=_packed_varints(tf.get(2, [])),
                    length=_first_int(tf, 3),
                    timestep=float(_first(tf, 4, 0.0) or 0.0),
                    num_passes=len(tf.get(5, [])),
                    tags=_strs(tf.get(6, [])),
                    num_force_plates=_first_int(tf, 7),
                    pass_headers=[
                        _decode_pass_header(pb) for pb in tf.get(5, [])
                    ],
                    original_name=_first(tf, 10, b"").decode(
                        errors="replace"
                    ),
                    split_index=_first_int(tf, 11),
                    marker_names_guessed=bool(_first_int(tf, 9)),
                )
            )
        # proto3 omits default-valued fields; derive the count from the
        # trial headers when the int is absent.
        self.num_trials = max(self.num_trials, len(self.trials))

    # -- frame access ------------------------------------------------------

    def _trial_frame_size(self, trial: int) -> int:
        return (
            self.raw_sensor_frame_size
            + self.trials[trial].num_passes * self.processing_pass_frame_size
        )

    def _trial_start_offset(self, trial: int) -> int:
        off = self._data_start
        for i in range(trial):
            off += self.trials[i].length * self._trial_frame_size(i)
        return off

    def read_frames(
        self, trial: int, start: int = 0, count: Optional[int] = None
    ) -> B3DFrames:
        """Read a contiguous range of frames (SubjectOnDisk::readFrames
        parity: per-frame seeking by constant frame size)."""
        th = self.trials[trial]
        if count is None:
            count = th.length - start
        count = max(0, min(count, th.length - start))
        fsize = self._trial_frame_size(trial)
        base = self._trial_start_offset(trial) + start * fsize
        n_passes = th.num_passes
        n_markers = len(self.marker_names)

        per_pass: List[Dict[str, List]] = [
            {"pos": [], "vel": [], "acc": [], "tau": [], "wrench": [],
             "com": [], "com_vel": [], "com_acc": [], "root_res": []}
            for _ in range(n_passes)
        ]
        sensor_extra: Dict[str, List] = {
            "acc": [], "gyro": [], "emg": [], "custom": []
        }
        markers = np.full((count, n_markers, 3), np.nan)
        n_plates = th.num_force_plates
        cop = np.full((count, n_plates, 3), np.nan)
        plate_torque = np.full((count, n_plates, 3), np.nan)
        plate_force = np.full((count, n_plates, 3), np.nan)

        with open(self.path, "rb") as f:
            for t in range(count):
                f.seek(base + t * fsize)
                blob = f.read(fsize)
                sensor = decode_fields(blob[: self.raw_sensor_frame_size])
                # SubjectOnDiskSensorFrame (proto:219-231): marker_obs=2,
                # raw_force_plate_cop=7, _torque=8, _force=9.
                mo = _packed_doubles(sensor.get(2, []))
                if mo.size == 3 * n_markers:
                    markers[t] = mo.reshape(n_markers, 3)
                pc = _packed_doubles(sensor.get(7, []))
                pt = _packed_doubles(sensor.get(8, []))
                pfo = _packed_doubles(sensor.get(9, []))
                if pc.size >= 3 * n_plates and n_plates:
                    cop[t] = pc[: 3 * n_plates].reshape(n_plates, 3)
                if pt.size >= 3 * n_plates and n_plates:
                    plate_torque[t] = pt[: 3 * n_plates].reshape(n_plates, 3)
                if pfo.size >= 3 * n_plates and n_plates:
                    plate_force[t] = pfo[: 3 * n_plates].reshape(n_plates, 3)
                # Optional sensor channels: custom_values=1, acc_obs=3,
                # gyro_obs=4, emg_obs=5 (proto:215-232).
                sensor_extra["custom"].append(
                    _packed_doubles(sensor.get(1, []))
                )
                sensor_extra["acc"].append(
                    _packed_doubles(sensor.get(3, []))
                )
                sensor_extra["gyro"].append(
                    _packed_doubles(sensor.get(4, []))
                )
                sensor_extra["emg"].append(
                    _packed_doubles(sensor.get(5, []))
                )
                for p in range(n_passes):
                    off = self.raw_sensor_frame_size + p * self.processing_pass_frame_size
                    pp = decode_fields(
                        blob[off : off + self.processing_pass_frame_size]
                    )
                    # SubjectOnDiskProcessingPassFrame (proto:181-216):
                    # pos=1 vel=2 acc=3 tau=4 ground_contact_wrench=5
                    # com_pos=9.
                    per_pass[p]["pos"].append(_packed_doubles(pp.get(1, [])))
                    per_pass[p]["vel"].append(_packed_doubles(pp.get(2, [])))
                    per_pass[p]["acc"].append(_packed_doubles(pp.get(3, [])))
                    per_pass[p]["tau"].append(_packed_doubles(pp.get(4, [])))
                    per_pass[p]["wrench"].append(
                        _packed_doubles(pp.get(5, []))
                    )
                    per_pass[p]["com"].append(_packed_doubles(pp.get(9, [])))
                    # com_vel=10, com_acc=11, root_frame_residual=12
                    # (proto:179-213).
                    per_pass[p]["com_vel"].append(
                        _packed_doubles(pp.get(10, []))
                    )
                    per_pass[p]["com_acc"].append(
                        _packed_doubles(pp.get(11, []))
                    )
                    per_pass[p]["root_res"].append(
                        _packed_doubles(pp.get(12, []))
                    )

        def stack(key, p):
            rows = per_pass[p][key]
            width = max((r.size for r in rows), default=0)
            out = np.zeros((count, width))
            for t, r in enumerate(rows):
                out[t, : r.size] = r
            return out

        def stack_rows(rows):
            width = max((r.size for r in rows), default=0)
            out = np.zeros((count, width))
            for t, r in enumerate(rows):
                out[t, : r.size] = r
            return out

        return B3DFrames(
            pos=[stack("pos", p) for p in range(n_passes)],
            vel=[stack("vel", p) for p in range(n_passes)],
            acc=[stack("acc", p) for p in range(n_passes)],
            tau=[stack("tau", p) for p in range(n_passes)],
            ground_contact_wrench=[
                stack("wrench", p) for p in range(n_passes)
            ],
            com_pos=[stack("com", p) for p in range(n_passes)],
            com_vel=[stack("com_vel", p) for p in range(n_passes)],
            com_acc=[stack("com_acc", p) for p in range(n_passes)],
            root_frame_residual=[
                stack("root_res", p) for p in range(n_passes)
            ],
            marker_obs=markers,
            raw_force_plate_cop=cop,
            raw_force_plate_torque=plate_torque,
            raw_force_plate_force=plate_force,
            acc_obs=stack_rows(sensor_extra["acc"]),
            gyro_obs=stack_rows(sensor_extra["gyro"]),
            emg_obs=stack_rows(sensor_extra["emg"]),
            custom_values=stack_rows(sensor_extra["custom"]),
        )


def read_b3d(path: str) -> SubjectOnDiskReader:
    """Open a reference-format .b3d subject file."""
    return SubjectOnDiskReader(path)
