"""Build + load the native IO library (native/nimble_io.cpp) via ctypes.

The native layer plays the role the reference's C++ runtime plays around
its solvers: fast binary IO (SubjectOnDisk .b3d, C3D mocap) feeding the
XLA compute path. Compiled on first use with g++ (cached by mtime);
callers must handle `load() is None` (pure-Python fallbacks).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional

_PKG_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_PKG_ROOT, "native", "nimble_io.cpp")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build(src: str, out: str) -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", src, "-o", out],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native IO library; None on failure."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SRC):
        return None
    cache_dir = os.path.join(
        tempfile.gettempdir(), "nimblephysics_tpu_native"
    )
    os.makedirs(cache_dir, exist_ok=True)
    so = os.path.join(cache_dir, "libnimble_io.so")
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(_SRC):
        if not _build(_SRC, so):
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None

    # Signatures.
    lib.b3d_write_start.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.b3d_write_start.restype = ctypes.c_int
    lib.b3d_append_trial.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_uint64,
    ]
    lib.b3d_append_trial.restype = ctypes.c_int
    lib.b3d_open.argtypes = [ctypes.c_char_p]
    lib.b3d_open.restype = ctypes.c_void_p
    lib.b3d_header_json.argtypes = [ctypes.c_void_p]
    lib.b3d_header_json.restype = ctypes.c_char_p
    lib.b3d_set_trials.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.c_int,
    ]
    lib.b3d_read_frames.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int,
        ctypes.c_uint64,
        ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.b3d_read_frames.restype = ctypes.c_int
    lib.b3d_close.argtypes = [ctypes.c_void_p]
    lib.c3d_open.argtypes = [ctypes.c_char_p]
    lib.c3d_open.restype = ctypes.c_void_p
    lib.c3d_num_points.argtypes = [ctypes.c_void_p]
    lib.c3d_num_points.restype = ctypes.c_int
    lib.c3d_num_frames.argtypes = [ctypes.c_void_p]
    lib.c3d_num_frames.restype = ctypes.c_int
    lib.c3d_frame_rate.argtypes = [ctypes.c_void_p]
    lib.c3d_frame_rate.restype = ctypes.c_float
    lib.c3d_labels.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int]
    lib.c3d_labels.restype = ctypes.c_int
    lib.c3d_read_points.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.c3d_read_points.restype = ctypes.c_int
    lib.c3d_close.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return _LIB
