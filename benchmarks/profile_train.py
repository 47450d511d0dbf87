"""Profile ONE policy-gradient training step on the real chip.

Writes a perfetto trace (trace.json.gz) under --out (default
/tmp/nt_profile) for op-level attribution of the fwd+bwd step that
bench.py measures. Parse with benchmarks/trace_summary.py (no
tensorboard in this environment).
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/nt_profile")
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--horizon", type=int, default=100)
    ap.add_argument("--mode", choices=["train", "forward"], default="train")
    args = ap.parse_args()

    from nimblephysics_tpu.batched import LCP_REMAT_POLICY, BatchedEngine
    from nimblephysics_tpu.models import half_cheetah
    from nimblephysics_tpu.simulation.world import SolverConfig

    world, q0, v0 = half_cheetah()
    world.solver = SolverConfig.throughput()
    engine = BatchedEngine(world)
    dtype = jnp.float32
    B, H = args.batch, args.horizon

    nv = world.num_dofs
    na = world.action_size
    key = jax.random.PRNGKey(0)
    q = jnp.tile(jnp.asarray(q0, dtype)[:, None], (1, B))
    q = q.at[1].add(jax.random.uniform(key, (B,), dtype, -0.02, 0.02))
    v = jnp.tile(jnp.asarray(v0, dtype)[:, None], (1, B))
    z = jnp.zeros((engine.num_rows, B), dtype)

    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    hidden = 64
    params = {
        "w1": 0.1 * jax.random.normal(k1, (hidden, 2 * nv), dtype),
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

        pol = jax.checkpoint_policies.save_from_both_policies(
            LCP_REMAT_POLICY, jax.checkpoint_policies.dots_saveable
        )
        (qf, vf, zf), vels = jax.lax.scan(
            jax.checkpoint(body, policy=pol), (q, v, z), None, length=H
        )
        return -jnp.mean(vels), (qf, vf, zf)

    if args.mode == "train":

        @jax.jit
        def step_fn(p, q, v, z):
            (loss, (qf, vf, zf)), g = jax.value_and_grad(
                rollout_loss, has_aux=True
            )(p, q, v, z)
            p2 = jax.tree_util.tree_map(lambda a, b: a - 1e-3 * b, p, g)
            return p2, qf, vf, zf, loss

        out = step_fn(params, q, v, z)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        with jax.profiler.trace(args.out):
            out = step_fn(params, q, v, z)
            jax.block_until_ready(out)
        dt = time.perf_counter() - t0
    else:

        @jax.jit
        def step_fn(q, v, z, u):
            def body(c, _):
                q, v, z = c
                r = engine.step(q, v, u, z_warm=z)
                return (r.q, r.v, r.impulses), None

            c, _ = jax.lax.scan(body, (q, v, z), None, length=H)
            return c

        u = engine.action_to_forces(jnp.zeros((na, B), dtype))
        out = step_fn(q, v, z, u)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        with jax.profiler.trace(args.out):
            out = step_fn(q, v, z, u)
            jax.block_until_ready(out)
        dt = time.perf_counter() - t0

    print(f"{args.mode}: {dt*1e3:.1f} ms / {H} steps x {B} worlds "
          f"= {B*H/dt/1e6:.3f}M env-steps/s -> trace in {args.out}")


if __name__ == "__main__":
    main()
