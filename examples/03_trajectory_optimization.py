"""Cartpole trajectory optimization with multiple shooting.

Reference parity: the trajectory-optimization tutorial (MultiShot + IPOPT);
here the solver is the on-device augmented-Lagrangian optimizer.
"""
import os, sys; sys.path.insert(0, ".")
import jax.numpy as jnp
import nimblephysics_tpu as nt
from nimblephysics_tpu.trajectory import AugmentedLagrangianOptimizer, MultiShot

SMOKE = bool(os.environ.get("NT_SMOKE"))  # CI smoke mode: tiny loops

world, q0, v0 = nt.models.cartpole()
world.set_action_space([0])

def loss(rollout):
    qf, vf = rollout.poses[-1], rollout.vels[-1]
    return 10 * jnp.sum(qf**2) + 0.5 * jnp.sum(vf**2) + 1e-4 * jnp.sum(rollout.forces**2)

prob = MultiShot(world, loss, steps=40 if SMOKE else 80, shot_length=20)
x0 = prob.initial_guess(jnp.array([0.0, 0.4, 0.0, 0.0]))
opt = AugmentedLagrangianOptimizer(outer_iterations=2 if SMOKE else 8,
                                   inner_iterations=30 if SMOKE else 150,
                                   learning_rate=0.2)
sol = opt.optimize(prob, x0, callback=lambda k, f, v, x: print(
    f"outer {k}: loss {f:.4f}  knot violation {v:.5f}"))
print("final loss:", sol.loss, "| rollout shape:", sol.rollout.poses.shape)
