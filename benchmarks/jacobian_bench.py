"""Per-Jacobian timing: analytical vs finite differences, half-cheetah.

Reference parity: BackpropSnapshot::benchmarkJacobians
(dart/neural/BackpropSnapshot.cpp:2027-2067) driven by
python/nimblephysics_benchmarks/half_cheetah_bench.py — time each of the
timestep Jacobians on a contact-rich half-cheetah state, against their
finite-difference counterparts.

Run: python benchmarks/jacobian_bench.py [--cpu]
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


def main():
    from nimblephysics_tpu.models import half_cheetah
    from nimblephysics_tpu.neural import forward_pass
    from nimblephysics_tpu.neural.timestep import Engine

    world, q0, v0 = half_cheetah()
    eng = Engine(world)

    # Settle onto the ground for a contact-rich state.
    q, v = jnp.asarray(q0), jnp.asarray(v0)

    @jax.jit
    def settle(q, v):
        def body(c, _):
            qq, vv = c
            r = eng.step(qq, vv, jnp.zeros(9))
            return (r.q, r.v), None

        return jax.lax.scan(body, (q, v), None, length=300)[0]

    q, v = settle(q, v)
    state = jnp.concatenate([q, v])
    snap = forward_pass(world, state, jnp.zeros(world.action_size))
    n_contacts = int((snap.result.contact_depths > 0).sum())
    print(f"state: {n_contacts} active contacts")

    times = snap.benchmark_jacobians(samples=5)
    for name, t in times.items():
        print(f"  analytical {name:10s}: {t * 1e3:8.2f} ms")

    t0 = time.perf_counter()
    snap.finite_difference_state_jacobian()
    t_fd = time.perf_counter() - t0
    print(f"  finite-difference full state Jacobian: {t_fd * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
