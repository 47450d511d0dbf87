"""Constraint layer (reference: dart/constraint + dart/lcpsolver,
SURVEY.md 2.3): LCP assembly from contacts/joint limits and the batched
boxed-LCP solver with active-set implicit differentiation.
"""

from nimblephysics_tpu.constraint.assembly import (
    ConstraintAssembler,
    tangent_basis,
)
from nimblephysics_tpu.constraint.lcp import LcpMeta, boxed_lcp
from nimblephysics_tpu.constraint.lemke import lemke, validate_lcp_solution
