"""Articulated rigid-body dynamics (reference: dart/dynamics, SURVEY.md 2.1).

Skeleton spec + builder, joint family, FK, RNEA, mass matrix, forward
dynamics, per-joint-type position integration.
"""

from nimblephysics_tpu.dynamics.joints import (
    BALL,
    EULER,
    EULER_FREE,
    FREE,
    PLANAR,
    PRISMATIC,
    REVOLUTE,
    SCREW,
    TRANSLATIONAL,
    TRANSLATIONAL_2D,
    UNIVERSAL,
    WELD,
    JointSpec,
    integrate_positions as joint_integrate_positions,
    joint_body_jacobian,
    joint_transform,
)
from nimblephysics_tpu.dynamics.shapes import ShapeSpec
from nimblephysics_tpu.dynamics.skeleton import (
    BodySpec,
    Skeleton,
    bias_forces,
    body_com_world,
    com_world,
    forward_dynamics,
    forward_kinematics,
    full_kinematics,
    integrate_positions,
    inverse_dynamics,
    mass_matrix,
    mass_matrix_inv,
    passive_forces,
    point_jacobian,
    relative_jacobian,
    relative_transform,
)
from nimblephysics_tpu.dynamics.simple_featherstone import (
    FlatChain,
    aba_forward_dynamics,
    flatten_chain,
)
from nimblephysics_tpu.dynamics.skeleton import default_body_params, mass_and_bias_fused
