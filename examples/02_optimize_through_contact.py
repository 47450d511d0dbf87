"""Optimize an initial velocity THROUGH a bounce to hit a target.

The flagship differentiable-physics demo (reference README: gradients
through hard contact): jax.grad through 400 contact steps, plain gradient
descent on the initial state.
"""
import os, sys; sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import nimblephysics_tpu as nt

SMOKE = bool(os.environ.get("NT_SMOKE"))  # CI smoke mode: tiny loops
STEPS = 100 if SMOKE else 400

world, q0, v0 = nt.models.box_drop(height=0.5, restitution=0.6, friction=0.4)
engine = nt.neural.get_engine(world)
TARGET_X = 1.5

@jax.jit
def final_x(v0x):
    def body(s, _):
        return engine.state_step(s, jnp.zeros(6)), None
    state0 = jnp.zeros(12).at[5].set(0.5).at[9].set(v0x)
    s, _ = jax.lax.scan(body, state0, None, length=STEPS)
    return s[3]

loss_grad = jax.jit(jax.value_and_grad(lambda v: (final_x(v) - TARGET_X) ** 2))
v = 0.1
for i in range(3 if SMOKE else 20):
    loss, g = loss_grad(v)
    v -= 0.3 * float(g)
    print(f"iter {i:2d}: v0x={v:+.3f}  landing x={float(final_x(v)):+.3f}")
