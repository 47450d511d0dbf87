"""Batch-minor (lane-major world batch) TPU throughput engine.

The layout redesign that takes the differentiable step from batch-major
vmap (small trailing dims padded to 128 lanes — the round-1 bottleneck) to
full lane utilization: every array carries the world batch as the trailing
axis, all small-matrix algebra is unrolled (B,)-wide VPU work.

Public surface:
  BatchedEngine(world).step(q, v, control, z_warm) with (nv, B) arrays —
  value- and gradient-equivalent to neural/timestep.Engine.step under
  transposition (tested in tests/test_batched.py).
"""

from nimblephysics_tpu.batched.engine import BatchedEngine, BatchedStepResult
from nimblephysics_tpu.batched.lcp import LCP_REMAT_POLICY
from nimblephysics_tpu.batched.rollout import (
    LADDER_OFF,
    LADDER_ON,
    all_valid,
    deferred_ladder_scan,
)
