"""C3D mocap loading (reference: biomechanics::C3DLoader over ezc3d).

Uses the native C++ reader (utils/native.py, memory-mapped) — the
data-loader stays native like the reference's — and converts to meters
with NaN-masked occlusions.
"""

from __future__ import annotations

import ctypes
import dataclasses
from typing import List

import numpy as np

from nimblephysics_tpu.utils import native


@dataclasses.dataclass
class C3D:
    """Reference parity: biomechanics::C3D (marker timesteps + labels)."""

    marker_names: List[str]
    marker_timesteps: np.ndarray  # (T, M, 3) meters, NaN = occluded
    frames_per_second: float

    @property
    def num_frames(self) -> int:
        return self.marker_timesteps.shape[0]


def load_c3d(path: str, unit_scale: float = 1e-3) -> C3D:
    """Load a .c3d file (reference: C3DLoader::loadC3D). Coordinates are
    usually millimeters; converted to meters by `unit_scale`."""
    lib = native.load()
    if lib is None:
        raise RuntimeError(
            "native IO library unavailable (g++ build failed?)"
        )
    h = lib.c3d_open(path.encode())
    if not h:
        raise ValueError(f"not a readable C3D file: {path}")
    try:
        n_pts = lib.c3d_num_points(h)
        n_frames = lib.c3d_num_frames(h)
        rate = lib.c3d_frame_rate(h)
        buf = ctypes.create_string_buffer(65536)
        lib.c3d_labels(h, buf, 65536)
        labels = [l for l in buf.value.decode().split("\n") if l]
        if len(labels) < n_pts:
            labels += [f"M{i}" for i in range(len(labels), n_pts)]
        out = np.empty((n_frames, n_pts, 4), dtype=np.float32)
        got = lib.c3d_read_points(
            h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )
        out = out[:got]
        pts = out[..., :3].astype(np.float64) * unit_scale
        occluded = out[..., 3] < 0
        pts[occluded] = np.nan
        return C3D(labels[:n_pts], pts, float(rate))
    finally:
        lib.c3d_close(h)
