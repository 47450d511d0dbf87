"""Trajectory optimization (reference: dart/trajectory, SURVEY.md 2.5)."""

from nimblephysics_tpu.trajectory.problem import (
    LossFn,
    MultiShot,
    Problem,
    SingleShot,
    TrajectoryRollout,
)
from nimblephysics_tpu.trajectory.optimizers import (
    AugmentedLagrangianOptimizer,
    IPOptOptimizer,
    SGDOptimizer,
    Solution,
)
