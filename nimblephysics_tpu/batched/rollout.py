"""Deferred failure ladder: hoist the LCP fallback lax.cond out of
rollout scans.

The per-step failure ladder (batched/lcp.boxed_lcp_b, the TPU re-design
of the reference's CFM-softened / ignore-friction retry rungs,
dart/constraint/BoxedLcpConstraintSolver.cpp:392-646) is guarded by a
lax.cond on "any world failed validity". Even when ZERO worlds ever take
the ladder, that cond is a fusion barrier inside the scan body — profiled
at ~0.3-0.7 ms/step on a 4096-world training step (benchmarks/README.md).

This module removes the barrier without disarming the ladder:

  1. run the whole scan with the ladder OFF, accumulating a single scalar
     "every step's primary pinned solve was valid for every world" flag
     (a cheap AND in the carry — no fusion barrier);
  2. ONE lax.cond after the scan: if the flag is clean (the overwhelmingly
     common case) the trajectory stands; otherwise re-run the scan with
     the ladder armed per step. The rerun pays ~2x that call's forward
     cost, but only on calls where a world actually failed — exactly the
     calls the reference would have spent extra LCP retries on anyway.

The rerun uses fallback_gradients="reclassify": the reference builds
gradients from the fallback impulse's clamping classification
(BoxedLcpConstraintSolver.cpp:716-734 -> constructMatrices), and in the
deferred scheme that parity costs nothing on the happy path.

NOTE: the predicate must stay a SCALAR for the cond to stay lazy — this
combinator is for the batch-minor engine (worlds in the lane axis), not
for vmapped step functions (vmap would convert the cond to a select that
always runs both branches). Inside shard_map each shard conds on its own
worlds' flag, which is exactly the lazy behavior you want.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

# Engine kwargs for the two scan variants. A step body receives one of
# these dicts and must splat it into engine.step(**ladder_kwargs).
LADDER_OFF = dict(fallback_cfm=0.0, collect_valid=True)
LADDER_ON = dict(fallback_gradients="reclassify")


def all_valid(result) -> jnp.ndarray:
    """Reduce a BatchedStepResult's lcp_valid to the scalar scan flag."""
    if result.lcp_valid is None:
        return jnp.array(True)
    return jnp.all(jax.lax.stop_gradient(result.lcp_valid))


def deferred_ladder_scan(
    body: Callable[[Any, Any, dict], Tuple[Any, Any, jnp.ndarray]],
    carry: Any,
    xs: Any = None,
    length: Optional[int] = None,
    remat_policy=None,
):
    """lax.scan over physics steps with the failure ladder hoisted out.

    body(carry, x, ladder_kwargs) -> (new_carry, out, valid_scalar):
    the user's step body; it must forward `ladder_kwargs` into every
    `engine.step(..., **ladder_kwargs)` call it makes, and return
    `all_valid(result)` (AND-reduced over multiple steps if it makes
    several). When ladder_kwargs is LADDER_ON the returned valid flag is
    ignored.

    remat_policy: optional jax.checkpoint policy applied per scan step
    (e.g. save_from_both_policies(LCP_REMAT_POLICY, dots_saveable)).

    Returns (final_carry, stacked_outs) — identical semantics to running
    the scan with the lazy per-step ladder, minus the per-step cond.
    """

    def off_body(c, x):
        inner, ok = c
        new_inner, out, valid = body(inner, x, LADDER_OFF)
        return (new_inner, ok & valid), out

    def on_body(c, x):
        new_inner, out, _ = body(c, x, LADDER_ON)
        return new_inner, out

    if remat_policy is not None:
        off_body = jax.checkpoint(off_body, policy=remat_policy)
        on_body = jax.checkpoint(on_body, policy=remat_policy)

    (clean_carry, ok), clean_outs = jax.lax.scan(
        off_body, (carry, jnp.array(True)), xs, length=length
    )

    def keep(_):
        return clean_carry, clean_outs

    def rerun(_):
        return jax.lax.scan(on_body, carry, xs, length=length)

    return jax.lax.cond(ok, keep, rerun, None)
