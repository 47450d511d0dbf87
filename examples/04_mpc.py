"""Real-time MPC driving a cartpole to a target, with background replans."""
import os, sys, time; sys.path.insert(0, ".")
import jax.numpy as jnp
import numpy as np
import nimblephysics_tpu as nt
from nimblephysics_tpu.realtime import MPCLocal

world, q0, v0 = nt.models.cartpole()
world.set_action_space([0])
engine = nt.neural.get_engine(world)

def loss(poses, vels, forces):
    return (10 * jnp.sum((poses[-1, 0] - 0.4) ** 2)
            + 0.1 * jnp.sum(vels[-1] ** 2) + 1e-5 * jnp.sum(forces**2))

SMOKE = bool(os.environ.get("NT_SMOKE"))  # CI smoke mode: tiny loops
mpc = MPCLocal(world, loss, horizon_steps=20,
               replan_iterations=10 if SMOKE else 40, learning_rate=0.3)
state = jnp.zeros(4)
t = 0.0
for k in range(8 if SMOKE else 80):
    mpc.record_ground_truth_state(t, np.asarray(state))
    mpc.optimize_plan(t)
    u = mpc.get_force(t)
    state = engine.state_step(state, jnp.asarray(u))
    t += world.time_step
    if k % 10 == 0:
        print(f"t={t:.2f}s  cart x={float(state[0]):+.3f}  u={u[0]:+.1f}N")
