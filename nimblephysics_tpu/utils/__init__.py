"""I/O layer (reference: dart/utils, SURVEY.md 2.9): parsers, exporters,
resource retrieval, trajectory smoothers, native IO."""

from nimblephysics_tpu.utils.skel_parser import parse_skel_world
from nimblephysics_tpu.utils.urdf_parser import load_urdf_world, parse_urdf
from nimblephysics_tpu.utils.sdf_parser import parse_sdf_world
from nimblephysics_tpu.utils.universal_loader import abs_path, load_world
from nimblephysics_tpu.utils.mjcf_exporter import skeleton_to_mjcf, write_mjcf
from nimblephysics_tpu.utils.mocap_formats import (
    MarkerTrajectories,
    Motion,
    load_amc,
    load_mot,
    load_trc,
    load_vsk_markers,
    write_mot,
    write_trc,
)
from nimblephysics_tpu.utils.smoothers import (
    AccelerationMinimizer,
    AccelerationTrackAndMinimize,
    VelocityMinimizingSmoother,
)
