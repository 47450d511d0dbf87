"""Biomechanics toolkit (reference: dart/biomechanics, SURVEY.md 2.8).

OpenSim model parsing, marker-based mocap fitting (scales + offsets +
batched IK), anthropometric priors, C3D loading (native reader), and the
.b3d SubjectOnDisk streaming format (native reader/writer).
"""

from nimblephysics_tpu.biomechanics.anthropometrics import (
    Anthropometrics,
    MultivariateGaussian,
)
from nimblephysics_tpu.biomechanics.c3d import C3D, load_c3d
from nimblephysics_tpu.biomechanics.ik_initializer import IKInitializer
from nimblephysics_tpu.biomechanics.marker_fitter import (
    MarkerFitResult,
    MarkerFitter,
)
from nimblephysics_tpu.biomechanics.opensim_parser import (
    OpenSimFile,
    parse_osim,
)
from nimblephysics_tpu.biomechanics.scaled_fk import (
    marker_world_positions,
    scaled_forward_kinematics,
)
from nimblephysics_tpu.biomechanics.subject_on_disk import (
    SubjectOnDisk,
    write_b3d,
)
from nimblephysics_tpu.biomechanics.dynamics_fitter import (
    DynamicsFitResult,
    DynamicsFitter,
)
from nimblephysics_tpu.biomechanics.exo import ExoSolverPinnedContact
from nimblephysics_tpu.biomechanics.b3d_reader import (
    SubjectOnDiskReader,
    read_b3d,
)
from nimblephysics_tpu.biomechanics.force_plate import (
    ForcePlate,
    assign_plates_to_bodies,
    grf_generalized_forces,
)
from nimblephysics_tpu.biomechanics.dynamics_fitter import (
    DynamicsFitterWithPlates,
    PlateFitResult,
)
from nimblephysics_tpu.biomechanics.marker_fixer import clean_marker_traces
from nimblephysics_tpu.biomechanics.marker_labeller import (
    MarkerLabeller,
    build_traces,
)
from nimblephysics_tpu.biomechanics.scale_groups import ScaleGroups
from nimblephysics_tpu.biomechanics.b3d_writer import (
    write_b3d_reference_format,
)
from nimblephysics_tpu.biomechanics.streaming import (
    StreamingIK,
    StreamingMocapLab,
)
from nimblephysics_tpu.biomechanics.reports import IKErrorReport
