"""Lane-major throughput: 4096 half-cheetahs at >1M env-steps/sec.

The batch-minor engine keeps the world batch in the TPU lane dimension;
states are (2*nv, B) arrays. Run on a TPU host: `python examples/07_*.py`.
"""

import os, sys; sys.path.insert(0, ".")  # run from the repo root
import time

import jax
import jax.numpy as jnp

from nimblephysics_tpu.batched import BatchedEngine
from nimblephysics_tpu.models import half_cheetah

SMOKE = bool(os.environ.get("NT_SMOKE"))  # CI smoke mode: tiny batch
world, q0, v0 = half_cheetah()
engine = BatchedEngine(world)
B = 256 if SMOKE else 4096
LENGTH = 10 if SMOKE else 50
q = jnp.tile(jnp.asarray(q0, jnp.float32)[:, None], (1, B))
v = jnp.zeros((world.num_dofs, B), jnp.float32)
u = engine.action_to_forces(
    0.3 * jax.random.normal(jax.random.PRNGKey(0), (6, B), jnp.float32)
)


@jax.jit
def rollout(q, v):
    def body(c, _):
        q, v, z = c
        r = engine.step(q, v, u, z_warm=z)
        return (r.q, r.v, r.impulses), None

    (q, v, _), _ = jax.lax.scan(
        body, (q, v, jnp.zeros((engine.num_rows, B), jnp.float32)),
        None, length=LENGTH,
    )
    return q, v


q, v = jax.block_until_ready(rollout(q, v))  # compile
t0 = time.perf_counter()
q, v = jax.block_until_ready(rollout(q, v))
dt = time.perf_counter() - t0
print(f"{B * LENGTH / dt:,.0f} env-steps/sec")
