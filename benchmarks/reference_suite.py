"""The reference's Python benchmark suite, ported workload-for-workload.

python/nimblephysics_benchmarks ships four scripts — atlas_bench,
catapult_bench, half_cheetah_bench, jump_worm_bench — each building a
world and timing timestep + backprop (neural.forwardPass +
BackpropSnapshot::benchmarkJacobians). The TPU-native analog of that
loop is a jitted batched rollout and its gradient: this harness times,
for every workload, (a) forward env-steps/sec and (b) fwd+bwd
env-steps/sec (gradient through the contact LCP) on the batch-minor
engine, printing one JSON line per (workload, mode).

Per-Jacobian timing parity (benchmarkJacobians itself) lives in
benchmarks/jacobian_bench.py.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

INNER_STEPS = 100
TRAIN_HORIZON = 50
REPEATS = 3
ATLAS_SDF = "/root/reference/data/sdf/atlas/atlas_v3_no_head.sdf"


def _workloads():
    from nimblephysics_tpu.models import catapult, half_cheetah, jump_worm

    yield "half_cheetah", 4096, half_cheetah
    yield "jump_worm", 4096, jump_worm
    yield "catapult", 4096, catapult
    if os.path.exists(ATLAS_SDF):

        def atlas():
            from nimblephysics_tpu.utils.sdf_parser import parse_sdf_world

            world, q0, v0 = parse_sdf_world(ATLAS_SDF)
            world.gravity = np.array([0.0, -9.81, 0.0])
            world.time_step = 0.01
            world.set_action_space(list(range(6, world.num_dofs)))
            q0 = np.zeros(world.num_dofs)
            q0[0] = -0.5 * np.pi
            q0[4] = -0.01
            return world, q0, np.zeros(world.num_dofs)

        # 33-dof humanoid: smaller batch (atlas_bench.py runs only 2
        # benchmarkJacobians iterations for the same reason).
        yield "atlas", 512, atlas


def _time_best(fn, *args, repeats=REPEATS):
    jax.block_until_ready(fn(*args))  # compile + warm
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def bench_workload(name, batch, factory):
    from nimblephysics_tpu.batched import LCP_REMAT_POLICY, BatchedEngine

    world, q0, v0 = factory()
    engine = BatchedEngine(world)
    dtype = jnp.float32
    nv = world.num_dofs
    na = world.action_size

    key = jax.random.PRNGKey(0)
    q = jnp.tile(jnp.asarray(q0, dtype)[:, None], (1, batch))
    q = q + 0.003 * jax.random.normal(key, q.shape, dtype)
    v = jnp.tile(jnp.asarray(v0, dtype)[:, None], (1, batch))
    z0 = jnp.zeros((engine.num_rows, batch), dtype)

    hidden = 64
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    params = {
        "w1": jax.random.normal(k1, (hidden, 2 * nv), dtype) * 0.1,
        "b1": jnp.zeros((hidden, 1), dtype),
        "w2": jax.random.normal(k2, (na, hidden), dtype) * 0.1,
        "b2": jnp.zeros((na, 1), dtype),
    }

    def policy(p, s):
        h = jnp.tanh(p["w1"] @ s + p["b1"])
        return p["w2"] @ h + p["b2"]

    def body(c, _):
        q, v, z = c
        u = engine.action_to_forces(policy(params, jnp.concatenate([q, v])))
        r = engine.step(q, v, u, z_warm=z)
        return (r.q, r.v, r.impulses), r.v[0]

    @jax.jit
    def fwd(q, v, z):
        (qf, vf, zf), _ = jax.lax.scan(body, (q, v, z), None, length=INNER_STEPS)
        return qf, vf, zf

    t = _time_best(fwd, q, v, z0)
    steps = batch * INNER_STEPS / t
    print(json.dumps({
        "metric": f"{name}_fwd_env_steps_per_sec_{batch}worlds",
        "value": round(steps, 1), "unit": "steps/sec/chip",
    }), flush=True)

    pol = jax.checkpoint_policies.save_from_both_policies(
        LCP_REMAT_POLICY, jax.checkpoint_policies.dots_saveable
    )

    def rollout_loss(p, q, v, z):
        def body_p(c, _):
            q, v, z = c
            u = engine.action_to_forces(policy(p, jnp.concatenate([q, v])))
            r = engine.step(q, v, u, z_warm=z)
            return (r.q, r.v, r.impulses), r.v[0]

        (qf, vf, zf), vels = jax.lax.scan(
            jax.checkpoint(body_p, policy=pol), (q, v, z), None,
            length=TRAIN_HORIZON,
        )
        return -jnp.mean(vels)

    grad = jax.jit(jax.grad(rollout_loss))
    t = _time_best(grad, params, q, v, z0)
    steps = batch * TRAIN_HORIZON / t
    print(json.dumps({
        "metric": f"{name}_fwdbwd_env_steps_per_sec_{batch}worlds",
        "value": round(steps, 1), "unit": "steps/sec/chip",
    }), flush=True)


def main():
    for name, batch, factory in _workloads():
        try:
            bench_workload(name, batch, factory)
        except Exception as e:  # keep the sweep going; report the failure
            print(json.dumps({
                "metric": f"{name}_ERROR", "value": str(e)[:200],
            }), flush=True)


if __name__ == "__main__":
    main()
