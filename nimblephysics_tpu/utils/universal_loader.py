"""UniversalLoader: load any supported world/robot file by extension.

Reference parity: dart/utils/UniversalLoader.cpp:39-85 (loadWorld /
loadSkeleton dispatch by file extension: .skel -> SkelParser, .urdf ->
DartLoader, .sdf -> SdfParser).
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

from nimblephysics_tpu.simulation.world import World


def load_world(path: str) -> Tuple[World, np.ndarray, np.ndarray]:
    """Load a world file; returns (world, q0, v0). Reference parity:
    nimble.loadWorld (python/nimblephysics/loader.py:12)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".skel":
        from nimblephysics_tpu.utils.skel_parser import parse_skel_world

        return parse_skel_world(path)
    if ext == ".urdf":
        from nimblephysics_tpu.utils.urdf_parser import load_urdf_world

        return load_urdf_world(path)
    if ext == ".sdf":
        from nimblephysics_tpu.utils.sdf_parser import parse_sdf_world

        return parse_sdf_world(path)
    raise ValueError(
        f"[load_world] unsupported extension {ext!r} for {path!r} "
        "(supported: .skel, .urdf, .sdf)"
    )


def abs_path(path: str) -> str:
    """Reference parity: nimble.absPath (loader.py) — resolve relative to
    the caller's cwd."""
    return os.path.abspath(os.path.expanduser(path))
