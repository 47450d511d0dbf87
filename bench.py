"""Benchmark: contact-rich env steps/sec, 4096 vmapped half-cheetah worlds.

North-star config (BASELINE.md): >= 1M env-steps/sec on one TPU chip.
Prints TWO JSON lines:
  1. fwd+bwd policy-gradient training throughput (BASELINE config #5 — the
     loop users actually run: grad through the contact LCP every step), and
  2. the forward rollout headline (LAST line = the driver-parsed metric,
     continuity with BENCH_r01/r02/r03).
All metrics are also written to benchmarks/bench_results.json.

Solver configuration: SolverConfig.throughput() — the supported
large-batch rollout preset (cond-free always-armed failure ladder, no
sequential PGS polish, 2 refine rounds, 24 APGD iterations). The A/B
table and the gradient-agreement evidence (policy-gradient cosine vs the
default config > 0.999) live in benchmarks/README.md.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 4096
# One jitted call scans INNER_STEPS physics steps. The fixed dispatch
# cost of a device call is ~30 ms on this host (axon tunnel) against
# ~1 ms/step of on-chip compute for 4096 worlds, so short scans measure
# the launch path, not the engine; 100 steps amortizes dispatch below 20%
# and matches how RL users actually roll out (episodes >> 100 steps).
INNER_STEPS = 100
# Training horizon matches the forward measurement (policy-gradient
# horizons in practice are >= 100; at 50 the 30 ms dispatch still eats
# ~13% of the call).
TRAIN_HORIZON = 100
REPEATS = 3
BASELINE_STEPS_PER_SEC = 1_000_000.0  # north-star target


def main():
    from nimblephysics_tpu.batched import LCP_REMAT_POLICY, BatchedEngine
    from nimblephysics_tpu.models import half_cheetah
    from nimblephysics_tpu.simulation.world import SolverConfig

    world, q0, v0 = half_cheetah()
    world.solver = SolverConfig.throughput()
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
        # parity: cached LCP solutions, World.hpp:690-698). The failure
        # ladder is armed cond-free (ladder_mode="always" via the solver
        # config): the rungs run unconditionally and select per world —
        # no fusion barrier, no whole-scan rerun.
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

    # Physics sanity on the measured trajectory: the cheetahs must still
    # be ON the ground (contact-rich), upright-ish, and finite.
    q_end = np.asarray(carry[0])
    assert np.isfinite(q_end).all(), "NaN/inf state after rollout"
    assert float(np.median(q_end[1])) > -0.5, "cheetahs fell through"

    # ------------------------------------------------------------------
    # fwd+bwd: the 4096-world policy-gradient TRAINING step (config #5).
    # Gradient of a horizon-TRAIN_HORIZON rollout loss w.r.t. MLP policy
    # params — the backward pass runs through the contact LCP's implicit
    # active-set derivative every step.
    # ------------------------------------------------------------------
    nv_ = world.num_dofs
    key_p = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key_p)
    hidden = 64
    params = {
        "w1": 0.1 * jax.random.normal(k1, (hidden, 2 * nv_), dtype),
        "b1": jnp.zeros((hidden, 1), dtype),
        "w2": 0.1 * jax.random.normal(k2, (na, hidden), dtype),
        "b2": jnp.zeros((na, 1), dtype),
    }

    def policy(p, s):
        h = jnp.tanh(p["w1"] @ s + p["b1"])
        return p["w2"] @ h + p["b2"]

    def rollout_loss(p, q, v, z):
        def body(c, _):
            q, v, z = c
            s = jnp.concatenate([q, v], axis=0)
            u = engine.action_to_forces(policy(p, s))
            r = engine.step(q, v, u, z_warm=z)
            return (r.q, r.v, r.impulses), r.v[0]

        # Rematerialize each step in the backward pass, but SAVE the LCP
        # seed + active-set masks (LCP_REMAT_POLICY) and matmul outputs
        # (dots_saveable): the recompute then skips the APGD solver
        # iterations and refine-round pinned solves entirely. Measured
        # +15% over no remat and +6% over plain jax.checkpoint on v5e.
        # The always-armed ladder rungs are stop-gradiented forward
        # FLOPs, name-save-pruned from the recompute.
        pol = jax.checkpoint_policies.save_from_both_policies(
            LCP_REMAT_POLICY, jax.checkpoint_policies.dots_saveable
        )
        (qf, vf, zf), vels = jax.lax.scan(
            jax.checkpoint(body, policy=pol), (q, v, z), None,
            length=TRAIN_HORIZON,
        )
        # Forward-progress policy-gradient surrogate: maximize root x-vel.
        return -jnp.mean(vels), (qf, vf, zf)

    @jax.jit
    def train_step(p, q, v, z):
        (loss, (qf, vf, zf)), g = jax.value_and_grad(
            rollout_loss, has_aux=True
        )(p, q, v, z)
        p2 = jax.tree_util.tree_map(lambda a, b: a - 1e-3 * b, p, g)
        return p2, qf, vf, zf, loss

    q_t, v_t, z_t = carry
    params, q_t, v_t, z_t, loss = train_step(params, q_t, v_t, z_t)
    jax.block_until_ready(loss)  # compile + warm up
    best_t = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        params, q_t, v_t, z_t, loss = train_step(params, q_t, v_t, z_t)
        jax.block_until_ready(loss)
        best_t = min(best_t, time.perf_counter() - t0)
    train_steps_per_sec = BATCH * TRAIN_HORIZON / best_t
    assert np.isfinite(float(loss)), "training loss went non-finite"

    results = [
        {
            "metric": "halfcheetah_train_fwdbwd_env_steps_per_sec_4096worlds",
            "value": round(train_steps_per_sec, 1),
            "unit": "steps/sec/chip",
            "vs_baseline": round(
                train_steps_per_sec / BASELINE_STEPS_PER_SEC, 4
            ),
        },
        {
            "metric": "halfcheetah_contact_env_steps_per_sec_4096worlds",
            "value": round(steps_per_sec, 1),
            "unit": "steps/sec/chip",
            "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 4),
        },
    ]
    try:
        import os

        with open(
            os.path.join(os.path.dirname(__file__), "benchmarks",
                         "bench_results.json"), "w"
        ) as f:
            json.dump(results, f, indent=1)
    except OSError:
        pass
    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
