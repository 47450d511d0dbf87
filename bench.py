"""Benchmark: contact-rich env steps/sec, 4096 vmapped half-cheetah worlds.

North-star config (BASELINE.md): >= 1M env-steps/sec on one TPU chip.
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 4096
INNER_STEPS = 20
REPEATS = 3
BASELINE_STEPS_PER_SEC = 1_000_000.0  # north-star target


def main():
    from nimblephysics_tpu.batched import BatchedEngine
    from nimblephysics_tpu.models import half_cheetah

    world, q0, v0 = half_cheetah()
    engine = BatchedEngine(world)  # batch-minor layout: worlds in lanes
    dtype = jnp.float32

    nv = world.num_dofs
    na = world.action_size

    # Batch of worlds: settled-ish start, slight height jitter so contact
    # patterns differ across the batch (realistic LCP load).
    key = jax.random.PRNGKey(0)
    q = jnp.tile(jnp.asarray(q0, dtype)[:, None], (1, BATCH))
    q = q.at[1].add(jax.random.uniform(key, (BATCH,), dtype, -0.02, 0.02))
    v = jnp.tile(jnp.asarray(v0, dtype)[:, None], (1, BATCH))
    actions = 0.5 * jax.random.normal(key, (na, BATCH), dtype)

    nrows = engine.num_rows
    full_actions = engine.action_to_forces(actions)

    @jax.jit
    def rollout(carry, u):
        # Warm-start the LCP from the previous step's impulses (reference
        # parity: cached LCP solutions, World.hpp:690-698).
        def body(c, _):
            q, v, z = c
            r = engine.step(q, v, u, z_warm=z)
            return (r.q, r.v, r.impulses), None

        c, _ = jax.lax.scan(body, carry, None, length=INNER_STEPS)
        return c

    carry = (q, v, jnp.zeros((nrows, BATCH), dtype))
    # Compile + warm up.
    carry = rollout(carry, full_actions)
    jax.block_until_ready(carry)

    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        carry = rollout(carry, full_actions)
        jax.block_until_ready(carry)
        best = min(best, time.perf_counter() - t0)

    steps_per_sec = BATCH * INNER_STEPS / best
    print(
        json.dumps(
            {
                "metric": "halfcheetah_contact_env_steps_per_sec_4096worlds",
                "value": round(steps_per_sec, 1),
                "unit": "steps/sec/chip",
                "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
