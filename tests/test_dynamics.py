"""Smooth-dynamics tests: FK, Jacobians, RNEA, mass matrix, energy.

Mirrors the reference's unit tests for dynamics quantities
(test_Geometry/test_JointJacobians/test_Math style: analytical vs finite
differences + physical sanity checks).
"""

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.dynamics import (
    Skeleton,
    bias_forces,
    forward_dynamics,
    forward_kinematics,
    full_kinematics,
    integrate_positions,
    inverse_dynamics,
    mass_matrix,
)
from nimblephysics_tpu.math import finite_difference_jacobian, lie

from worlds import ball_chain, cartpole, double_pendulum, free_box, pendulum

RNG = np.random.RandomState(7)
G = jnp.array([0.0, 0.0, -9.81])


class TestFK:
    def test_pendulum_fk(self):
        sk = pendulum(length=1.0)
        # q=0: body frame origin is 0.5 below the joint (T_cj puts joint at
        # +z/2 in body frame), so world body origin = (0,0,-0.5)
        T = forward_kinematics(sk, jnp.zeros(1))
        np.testing.assert_allclose(T[0][:3, 3], [0, 0, -0.5], atol=1e-12)
        # q=pi/2 about +y: body origin swings to -x... exp([0,pi/2,0]) maps
        # z->... R @ (0,0,-0.5)
        Tq = forward_kinematics(sk, jnp.array([np.pi / 2]))
        R = lie.exp_map_rot(jnp.array([0.0, np.pi / 2, 0.0]))
        np.testing.assert_allclose(
            Tq[0][:3, 3], R @ jnp.array([0, 0, -0.5]), atol=1e-12
        )

    def test_body_velocity_consistent_with_fk(self):
        """V from full_kinematics == vee(T^-1 dT/dt) for random state."""
        for sk in [double_pendulum(), cartpole(), ball_chain(2), free_box()]:
            nv = sk.num_dofs
            q = jnp.array(RNG.randn(nv) * 0.4)
            dq = jnp.array(RNG.randn(nv))
            kin = full_kinematics(sk, q, dq)
            T, dT = jax.jvp(
                lambda qq: forward_kinematics(sk, qq), (q,), (dq,)
            )
            for b in range(sk.num_bodies):
                body = lie.transform_inv(T[b]) @ dT[b]
                V_expected = jnp.concatenate(
                    [lie.unskew(body[:3, :3]), body[:3, 3]]
                )
                np.testing.assert_allclose(
                    kin["V"][b], V_expected, atol=1e-9,
                    err_msg=f"{sk.name} body {b}",
                )

    def test_world_jacobian(self):
        """J_world @ dq == Ad(T_wb) V_body."""
        for sk in [double_pendulum(), cartpole(), ball_chain(2), free_box()]:
            nv = sk.num_dofs
            q = jnp.array(RNG.randn(nv) * 0.4)
            dq = jnp.array(RNG.randn(nv))
            kin = full_kinematics(sk, q, dq)
            for b in range(sk.num_bodies):
                np.testing.assert_allclose(
                    kin["J_world"][b] @ dq,
                    lie.Ad(kin["T_wb"][b]) @ kin["V"][b],
                    atol=1e-9,
                )


class TestRNEA:
    def test_id_fd_roundtrip(self):
        for sk in [pendulum(), double_pendulum(), cartpole(), ball_chain(3), free_box()]:
            nv = sk.num_dofs
            q = jnp.array(RNG.randn(nv) * 0.3)
            dq = jnp.array(RNG.randn(nv) * 0.5)
            tau = jnp.array(RNG.randn(nv))
            ddq = forward_dynamics(sk, q, dq, tau, gravity=G)
            tau_back = inverse_dynamics(sk, q, dq, ddq, gravity=G)
            np.testing.assert_allclose(
                tau_back, tau, atol=1e-8, err_msg=sk.name
            )

    def test_mass_matrix_symmetric_pd(self):
        for sk in [double_pendulum(), cartpole(), ball_chain(3), free_box()]:
            q = jnp.array(RNG.randn(sk.num_dofs) * 0.4)
            M = mass_matrix(sk, q)
            np.testing.assert_allclose(M, M.T, atol=1e-10)
            assert np.all(np.linalg.eigvalsh(np.asarray(M)) > 0)

    def test_mass_matrix_linearity(self):
        sk = double_pendulum()
        q = jnp.array(RNG.randn(2) * 0.5)
        dq = jnp.array(RNG.randn(2))
        M = mass_matrix(sk, q)
        a = jnp.array(RNG.randn(2))
        # ID(q, dq, a) - ID(q, dq, 0) == M a  (M independent of dq)
        lhs = inverse_dynamics(sk, q, dq, a, gravity=G) - inverse_dynamics(
            sk, q, dq, jnp.zeros(2), gravity=G
        )
        np.testing.assert_allclose(lhs, M @ a, atol=1e-9)

    def test_pendulum_analytical(self):
        """Point-pendulum: I_pivot ddq = -m g l sin(q) + tau."""
        m, l = 1.0, 1.0
        sk = pendulum(length=l, mass=m)
        I_com = m * l * l / 12.0
        I_pivot = I_com + m * (l / 2) ** 2
        for qv in [0.0, 0.4, 1.2, -2.0]:
            q = jnp.array([qv])
            ddq = forward_dynamics(
                sk, q, jnp.zeros(1), jnp.array([0.7]), gravity=G
            )
            # Gravity torque about +y axis at angle q: m g (l/2) * (-sin q)?
            # COM offset r = R(q) (0,0,-l/2); torque = r x F, F = (0,0,-mg).
            R = np.asarray(lie.exp_map_rot(np.array([0.0, qv, 0.0])))
            r = R @ np.array([0, 0, -l / 2])
            torque = np.cross(r, [0, 0, -m * 9.81])[1]
            expected = (torque + 0.7) / I_pivot
            np.testing.assert_allclose(ddq[0], expected, atol=1e-9)

    def test_coriolis_vs_fd_of_momentum(self):
        """C(q,dq) (no gravity) matches  Mdot dq - d/dq (0.5 dq' M dq)."""
        sk = ball_chain(2)
        nv = sk.num_dofs
        q = jnp.array(RNG.randn(nv) * 0.4)
        dq = jnp.array(RNG.randn(nv))
        zero_g = jnp.zeros(3)
        C = bias_forces(sk, q, dq, gravity=zero_g)
        Mdot = jax.jvp(lambda qq: mass_matrix(sk, qq), (q,), (dq,))[1]
        ke_grad = jax.grad(lambda qq: 0.5 * dq @ mass_matrix(sk, qq) @ dq)(q)
        np.testing.assert_allclose(C, Mdot @ dq - ke_grad, atol=1e-8)


class TestIntegration:
    def test_energy_conservation_double_pendulum(self):
        """Semi-implicit Euler at small dt approximately conserves energy."""
        sk = double_pendulum()
        dt = 1e-4
        q = jnp.array([0.8, -0.3])
        dq = jnp.zeros(2)

        def energy(q, dq):
            ke = 0.5 * dq @ mass_matrix(sk, q) @ dq
            from nimblephysics_tpu.dynamics import body_com_world

            coms = body_com_world(sk, q)
            masses = jnp.array([b.mass for b in sk.bodies])
            pe = 9.81 * (masses * coms[:, 2]).sum()
            return ke + pe

        e0 = energy(q, dq)

        @jax.jit
        def step(carry, _):
            q, dq = carry
            ddq = forward_dynamics(sk, q, dq, jnp.zeros(2), gravity=G)
            dq2 = dq + dt * ddq
            q2 = integrate_positions(sk, q, dq2, dt)
            return (q2, dq2), None

        (qf, dqf), _ = jax.lax.scan(step, (q, dq), None, length=2000)
        ef = energy(qf, dqf)
        assert abs(float(ef - e0)) < 2e-3, (e0, ef)

    def test_free_body_projectile(self):
        """Torque-free free joint under gravity: COM follows a parabola."""
        sk = free_box()
        dt = 1e-3
        q = jnp.zeros(6)
        dq = jnp.array([0.0, 0.0, 0.0, 1.0, 0.5, 2.0])  # linear vel in body frame

        def step(carry, _):
            q, dq = carry
            ddq = forward_dynamics(sk, q, dq, jnp.zeros(6), gravity=G)
            dq2 = dq + dt * ddq
            q2 = integrate_positions(sk, q, dq2, dt)
            return (q2, dq2), q2

        n = 100
        (qf, dqf), traj = jax.lax.scan(step, (q, dq), None, length=n)
        t = n * dt
        # COM: since R stays ~identity (no initial angular velocity)
        expect = np.array([1.0, 0.5, 2.0]) * t + 0.5 * np.array([0, 0, -9.81]) * t * t
        np.testing.assert_allclose(qf[3:], expect, atol=2e-2)

    def test_free_body_rotation_momentum(self):
        """Zero gravity, initial spin about a principal axis: |w| constant."""
        sk = free_box(size=(0.3, 0.2, 0.1))
        dt = 1e-3
        q = jnp.array(RNG.randn(6) * 0.1)
        dq = jnp.array([2.0, 0.0, 0.0, 0, 0, 0.0])

        def step(carry, _):
            q, dq = carry
            ddq = forward_dynamics(sk, q, dq, jnp.zeros(6), gravity=jnp.zeros(3))
            dq2 = dq + dt * ddq
            q2 = integrate_positions(sk, q, dq2, dt)
            return (q2, dq2), None

        (qf, dqf), _ = jax.lax.scan(step, (q, dq), None, length=500)
        # Angular momentum magnitude conserved (principal axis spin).
        kin0 = full_kinematics(sk, q, dq)
        kinf = full_kinematics(sk, qf, dqf)
        from nimblephysics_tpu.math.spatial import spatial_inertia_matrix

        Gm = spatial_inertia_matrix(
            jnp.asarray(sk.bodies[0].mass),
            jnp.asarray(sk.bodies[0].com),
            jnp.asarray(sk.bodies[0].inertia),
        )
        h0 = np.linalg.norm((Gm @ kin0["V"][0])[:3])
        hf = np.linalg.norm((Gm @ kinf["V"][0])[:3])
        np.testing.assert_allclose(hf, h0, rtol=1e-4)


class TestGradientsSmoke:
    def test_grad_through_rollout(self):
        """jax.grad through a 50-step cartpole rollout vs Ridders FD."""
        sk = cartpole()
        dt = 1e-3

        def rollout(x0):
            q, dq = x0[:2], x0[2:]

            def step(carry, _):
                q, dq = carry
                ddq = forward_dynamics(
                    sk, q, dq, jnp.array([1.0, 0.0]), gravity=G
                )
                dq2 = dq + dt * ddq
                q2 = integrate_positions(sk, q, dq2, dt)
                return (q2, dq2), None

            (qf, dqf), _ = jax.lax.scan(step, (q, dq), None, length=50)
            return (qf**2).sum() + (dqf**2).sum()

        x0 = jnp.array([0.1, 0.6, -0.2, 0.3])
        g = jax.grad(rollout)(x0)
        fd = finite_difference_jacobian(
            lambda x: np.array([rollout(jnp.array(x))]), np.asarray(x0)
        )[0]
        np.testing.assert_allclose(g, fd, rtol=1e-6, atol=1e-8)
