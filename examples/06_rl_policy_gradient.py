"""Differentiable-sim policy gradient: 1024 half-cheetahs on one chip.

BASELINE config #5 — backprop straight through the physics, batch on the
device; swap `make_mesh`/`sharded_train_step` in for multi-chip scaling.
"""
import os, sys, time; sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np
import nimblephysics_tpu as nt

SMOKE = bool(os.environ.get("NT_SMOKE"))  # CI smoke mode: tiny batch
world, q0, v0 = nt.models.half_cheetah()
engine = nt.neural.get_engine(world)
B, HORIZON = (64, 4) if SMOKE else (1024, 16)
key = jax.random.PRNGKey(0)
DT = jnp.zeros(0).dtype  # default float: f32 on TPU, f64 under x64 CI
params = {"w": 0.01 * jax.random.normal(key, (18, 6), DT),
          "b": jnp.zeros(6, DT)}

def policy(p, s):
    return jnp.tanh(s @ p["w"] + p["b"]) * 3.0

def rollout_loss(p, states):
    def body(s, _):
        a = jax.vmap(lambda ss: policy(p, ss))(s)
        s2 = jax.vmap(engine.state_step)(s, a)
        r = s2[:, 0] - s[:, 0] - 1e-3 * jnp.sum(a**2, axis=-1)
        return s2, r
    states2, rs = jax.lax.scan(body, states, None, length=HORIZON)
    return -jnp.mean(jnp.sum(rs, 0)), states2

@jax.jit
def train_step(p, states):
    (loss, states2), g = jax.value_and_grad(rollout_loss, has_aux=True)(p, states)
    p = jax.tree.map(lambda x, gx: x - 3e-3 * gx, p, g)
    return p, states2, loss

states = jnp.tile(jnp.asarray(np.concatenate([q0, v0]), DT)[None], (B, 1))
for it in range(2 if SMOKE else 10):
    t0 = time.perf_counter()
    params, states, loss = train_step(params, states)
    jax.block_until_ready(loss)
    sps = B * HORIZON / (time.perf_counter() - t0)
    print(f"iter {it}: loss {float(loss):+.4f}  ({sps:,.0f} env-steps/s incl. backprop)")
