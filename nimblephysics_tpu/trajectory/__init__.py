"""Trajectory optimization (reference: dart/trajectory, SURVEY.md 2.5)."""

from nimblephysics_tpu.trajectory.problem import (
    LossFn,
    MultiShot,
    Problem,
    SingleShot,
    TerminalResiduals,
    TrajectoryRollout,
)
from nimblephysics_tpu.trajectory.optimizers import (
    AugmentedLagrangianOptimizer,
    GaussNewtonOptimizer,
    HostInteriorPointOptimizer,
    IPOptOptimizer,
    SGDOptimizer,
    Solution,
)
