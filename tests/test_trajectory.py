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

    def test_host_interior_point_solves(self):
        """HostInteriorPointOptimizer (the reference's IPOPT TNLP adapter
        role, IPOptOptimizer.cpp:41-129): host NLP engine, device
        derivatives, best-iterate recovery. Uses real IPOPT when cyipopt
        is installed, scipy SLSQP otherwise."""
        from nimblephysics_tpu.trajectory import HostInteriorPointOptimizer

        prob, x0 = make_problem(MultiShot, steps=40, shot_length=10)
        calls = []
        opt = HostInteriorPointOptimizer(max_iterations=120)
        sol = opt.optimize(
            prob, x0, callback=lambda k, f, viol, x: calls.append((f, viol))
        )
        assert len(calls) > 5
        assert sol.constraint_violation < 1e-4, sol.constraint_violation
        assert sol.loss < float(prob.loss(x0)) * 0.2, (
            sol.loss, float(prob.loss(x0))
        )
        assert np.isfinite(np.asarray(sol.rollout.poses)).all()


class TestPinnedForcesAndMappings:
    def test_pinned_force_rows_are_fixed(self):
        """Problem::pinForce parity (Problem.hpp:332-339): pinned control
        rows override the variables and carry no gradient."""
        prob, x0 = make_problem(SingleShot, steps=10)
        pin = np.full(prob.na, 0.37)
        prob.pin_force(3, pin)
        ro = prob.rollout(x0 + 1.0)  # nonzero variables everywhere
        np.testing.assert_allclose(np.asarray(ro.forces[3]), pin)
        g = jax.grad(prob.loss)(x0 + 1.0)
        # Variables for the pinned step have exactly zero gradient.
        s = 3 * prob.na
        np.testing.assert_allclose(
            np.asarray(g[s : s + prob.na]), 0.0, atol=1e-12
        )
        # Unpinned neighbors do carry gradient.
        assert float(jnp.abs(g).max()) > 0

    def test_pinned_force_in_multishot(self):
        prob, x0 = make_problem(MultiShot, steps=20, shot_length=10)
        pin = np.full(prob.na, -0.5)
        prob.pin_force(12, pin)
        ro = prob.rollout(x0)
        np.testing.assert_allclose(np.asarray(ro.forces[12]), pin)

    def test_per_mapping_losses(self):
        """addMapping parity: rollouts carry mapped pos/vel trajectories
        and losses over them differentiate."""
        from nimblephysics_tpu.neural.mappings import IKMapping

        world, q0, v0 = cartpole()
        world.set_action_space([0])
        m = IKMapping(world)
        m.add_linear_body_node(1)  # pole COM world position

        def loss(ro):
            # Drive the pole COM x to 0.2 via the MAPPED space.
            return jnp.sum((ro.mapped["pole"]["pos"][-1, 0] - 0.2) ** 2)

        prob = SingleShot(world, loss, steps=10)
        prob.add_mapping("pole", m)
        x0 = prob.initial_guess(jnp.zeros(4))
        ro = prob.rollout(x0)
        assert ro.mapped["pole"]["pos"].shape == (10, 3)
        assert ro.mapped["pole"]["vel"].shape == (10, 3)
        g = jax.grad(prob.loss)(x0)
        assert bool(jnp.all(jnp.isfinite(g)))
        assert float(jnp.abs(g).max()) > 0
