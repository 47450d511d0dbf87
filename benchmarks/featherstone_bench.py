"""Forward-dynamics step cost: cartpole and a 20-link chain.

Reference parity: unittests/benchmarks/bench_Featherstone.cpp
(BM_Cartpole_* :45-95, BM_20_Joint_* :97-140) — the smooth-dynamics step
cost on small and deep articulations, here at batch sizes 1 and 4096 (the
batched regime is what the TPU engine is for).

Run: python benchmarks/featherstone_bench.py [--cpu]
"""

import sys
import time

sys.path.insert(0, ".")

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np


def bench_world(name, skel, batch=4096, steps=20):
    from nimblephysics_tpu.dynamics import (
        forward_dynamics,
        integrate_positions,
    )

    nv = skel.num_dofs
    g = jnp.asarray([0.0, 0.0, -9.81], dtype=jnp.float32)

    def step(q, v):
        a = forward_dynamics(skel, q, v, jnp.zeros(nv, q.dtype), gravity=g)
        v2 = v + 1e-3 * a
        return integrate_positions(skel, q, v2, 1e-3), v2

    @jax.jit
    def roll(qs, vs):
        def body(c, _):
            q, v = c
            return jax.vmap(step)(q, v), None

        return jax.lax.scan(body, (qs, vs), None, length=steps)[0]

    qs = jnp.zeros((batch, nv), jnp.float32)
    vs = jnp.zeros((batch, nv), jnp.float32)
    out = roll(qs, vs)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = roll(*out)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    rate = batch * steps / best
    print(f"{name:24s} nv={nv:3d} batch={batch}: {rate:12,.0f} steps/sec")


def main():
    sys.path.insert(0, "tests")
    from worlds import cartpole
    from nimblephysics_tpu.dynamics import REVOLUTE, Skeleton

    bench_world("cartpole", cartpole())

    chain = Skeleton("chain20")
    parent = -1
    import numpy as np

    T = np.eye(4)
    T[2, 3] = -0.2
    for i in range(20):
        parent = chain.add_joint_and_body(
            REVOLUTE,
            parent=parent,
            axis=[0.0, 1.0, 0.0],
            T_pj=T if i > 0 else np.eye(4),
            mass=1.0,
            inertia=np.eye(3) * 0.01,
        )
    bench_world("20-joint chain", chain, batch=1024)


if __name__ == "__main__":
    main()
