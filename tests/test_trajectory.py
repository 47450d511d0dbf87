"""Trajectory optimization tests: cartpole swing-up-ish recipes.

Mirrors the reference's comprehensive trajectory tests
(test_CartpoleTrajectory / test_Cartpole — SURVEY.md section 4) at reduced
scale for CI.
"""

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.models import cartpole
from nimblephysics_tpu.trajectory import (
    AugmentedLagrangianOptimizer,
    MultiShot,
    SGDOptimizer,
    SingleShot,
)


def make_problem(cls, steps, **kw):
    world, q0, v0 = cartpole()
    world.set_action_space([0])  # force on the cart only

    def loss(rollout):
        qf = rollout.poses[-1]
        vf = rollout.vels[-1]
        # Drive the cart to x = 0.3 and stop (controllable in-horizon;
        # the machinery under test is gradient flow through the rollout).
        return (
            10.0 * (qf[0] - 0.3) ** 2
            + 0.1 * vf[0] ** 2
            + 1e-5 * jnp.sum(rollout.forces**2)
        )

    prob = cls(world, loss, steps, **kw)
    start = jnp.concatenate([jnp.array([0.0, 0.1]), jnp.zeros(2)])
    x0 = prob.initial_guess(start)
    return prob, x0


class TestSingleShot:
    def test_sgd_reduces_loss(self):
        prob, x0 = make_problem(SingleShot, steps=40)
        opt = SGDOptimizer(iterations=120, learning_rate=0.5)
        sol = opt.optimize(prob, x0)
        assert sol.loss < float(prob.loss(x0)) * 0.05, (
            sol.loss,
            float(prob.loss(x0)),
        )

    def test_final_state_jacobian_shape(self):
        prob, x0 = make_problem(SingleShot, steps=10)
        J = prob.backprop_jacobian_of_final_state(x0)
        assert J.shape == (4, prob.num_variables)
        assert np.all(np.isfinite(np.asarray(J)))


class TestMultiShot:
    def test_knot_constraints_zero_for_consistent_rollout(self):
        prob, x0 = make_problem(MultiShot, steps=40, shot_length=10)
        # Make knots consistent by rolling out and copying end states.
        starts, forces = prob._split(x0)
        states, _ = prob._shot_states(x0)
        nknot = (prob.num_shots - 1) * 2 * prob.nv
        # set each knot to the previous shot's end state, sequentially
        x = np.asarray(x0).copy()
        s0 = prob.start_state
        for i in range(prob.num_shots - 1):
            sh_forces = forces[i]
            def roll(s, us):
                for t in range(us.shape[0]):
                    s = prob.engine.state_step(s, us[t])
                return s
            s0 = roll(s0, sh_forces)
            x[i * 4 : (i + 1) * 4] = np.asarray(s0)
        h = prob.constraints(jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(h), 0.0, atol=1e-10)

    def test_augmented_lagrangian_solves(self):
        prob, x0 = make_problem(MultiShot, steps=40, shot_length=10)
        opt = AugmentedLagrangianOptimizer(
            outer_iterations=6, inner_iterations=80, learning_rate=0.3
        )
        sol = opt.optimize(prob, x0)
        # Knots must be (nearly) consistent and loss reduced.
        assert sol.constraint_violation < 1e-2, sol.constraint_violation
        assert sol.loss < float(prob.loss(x0)) * 0.5
        assert sol.rollout.poses.shape == (40, 2)
