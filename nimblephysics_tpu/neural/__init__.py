"""Differentiability layer (reference: dart/neural, SURVEY.md 2.4).

The timestep custom-VJP pipeline, BackpropSnapshot-equivalent Jacobian
API, WithRespectTo differentiation variables, and loss-space mappings.
"""

from nimblephysics_tpu.neural.timestep import (
    Engine,
    StepResult,
    get_engine,
    timestep,
)
