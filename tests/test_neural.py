"""neural layer tests: BackpropSnapshot Jacobians, mass gradients, mappings.

Mirrors the reference's python/tests/unit/neural/test_backprop.py plus the
GradientTestUtils mass/COM differentiation checks.
"""

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu import neural
from nimblephysics_tpu.math import finite_difference_jacobian
from nimblephysics_tpu.neural import (
    BackpropSnapshot,
    IKMapping,
    forward_pass,
    jacobian_wrt,
    GROUP_MASSES,
    POSITION,
)
from nimblephysics_tpu.neural.timestep import Engine, timestep
from nimblephysics_tpu.simulation import World

from worlds import cartpole, free_box, ground_plane


def box_world():
    w = World(time_step=1e-3)
    w.add_skeleton(free_box(size=(0.2, 0.2, 0.2), friction=0.7))
    w.add_skeleton(ground_plane())
    return w


class TestBackpropSnapshot:
    def test_six_jacobians_vs_state_jacobian(self):
        w = box_world()
        q = jnp.zeros(6).at[5].set(0.0995)
        v = jnp.zeros(6).at[3].set(0.2)
        snap = forward_pass(w, jnp.concatenate([q, v]), jnp.zeros(6))
        nv = 6
        S = snap.get_state_jacobian()
        np.testing.assert_allclose(
            S[:nv, :nv], snap.get_pos_pos_jacobian(), atol=1e-12
        )
        np.testing.assert_allclose(
            S[:nv, nv:], snap.get_vel_pos_jacobian(), atol=1e-12
        )
        np.testing.assert_allclose(
            S[nv:, :nv], snap.get_pos_vel_jacobian(), atol=1e-12
        )
        np.testing.assert_allclose(
            S[nv:, nv:], snap.get_vel_vel_jacobian(), atol=1e-12
        )

    def test_state_jacobian_vs_fd(self):
        w = box_world()
        q = jnp.zeros(6).at[5].set(0.0995)
        v = jnp.zeros(6)
        snap = forward_pass(w, jnp.concatenate([q, v]), jnp.zeros(6))
        fd = snap.finite_difference_state_jacobian()
        np.testing.assert_allclose(
            np.asarray(snap.get_state_jacobian()), fd, atol=1e-7
        )

    def test_backprop_matches_jacobian_transpose(self):
        w = box_world()
        q = jnp.zeros(6).at[5].set(0.0995)
        v = jnp.zeros(6).at[3].set(0.4)
        snap = forward_pass(w, jnp.concatenate([q, v]), jnp.zeros(6))
        rng = np.random.RandomState(0)
        gq = jnp.asarray(rng.randn(6))
        gv = jnp.asarray(rng.randn(6))
        g = snap.backprop(gq, gv)
        # J^T products must equal the dense-Jacobian transposes.
        np.testing.assert_allclose(
            g.loss_wrt_position,
            snap.get_pos_pos_jacobian().T @ gq
            + snap.get_pos_vel_jacobian().T @ gv,
            atol=1e-9,
        )
        np.testing.assert_allclose(
            g.loss_wrt_velocity,
            snap.get_vel_pos_jacobian().T @ gq
            + snap.get_vel_vel_jacobian().T @ gv,
            atol=1e-9,
        )

    def test_mass_gradient_vs_fd(self):
        """timestep(world, state, action, mass) differentiates in mass
        through contact (the reference's mass-vel Jacobian)."""
        w = box_world()
        state = jnp.zeros(12).at[5].set(0.0995).at[9].set(0.3)
        masses = jnp.array([1.7, 1.0])  # box + (static) ground

        @jax.jit
        def f(m):
            return timestep(w, state, jnp.zeros(6), m)

        J = jax.jit(jax.jacrev(f))(masses)
        fd = finite_difference_jacobian(
            lambda m: np.asarray(f(jnp.asarray(m))), np.asarray(masses)
        )
        np.testing.assert_allclose(np.asarray(J), fd, atol=1e-6)

    def test_action_jacobian(self):
        w = box_world()
        w.set_action_space([3, 4])  # push in x/y only
        state = jnp.zeros(12).at[5].set(0.0995)
        snap = forward_pass(w, state, jnp.zeros(2))
        J = snap.get_action_jacobian()
        assert J.shape == (12, 2)
        # force-vel for dof 3/4 should show up in the velocity block.
        assert float(jnp.abs(J[9:, :]).max()) > 0


class TestWithRespectTo:
    def test_mass_matrix_jacobian_wrt_position(self):
        from nimblephysics_tpu.dynamics import mass_matrix

        sk = cartpole()
        w = World()
        w.add_skeleton(sk)
        q = jnp.array([0.1, 0.7])
        v = jnp.zeros(2)

        def f(q_, v_, u_, bp):
            return mass_matrix(sk, q_, body_params=bp).reshape(-1)

        J = jacobian_wrt(w, f, POSITION, q, v, jnp.zeros(2))
        fd = finite_difference_jacobian(
            lambda x: np.asarray(
                mass_matrix(sk, jnp.asarray(x)).reshape(-1)
            ),
            np.asarray(q),
        )
        np.testing.assert_allclose(np.asarray(J), fd, atol=1e-8)

    def test_bias_jacobian_wrt_masses(self):
        from nimblephysics_tpu.dynamics import bias_forces

        sk = cartpole()
        w = World(gravity=(0, -9.81, 0))
        w.add_skeleton(sk)
        q = jnp.array([0.1, 0.7])
        v = jnp.array([0.3, -0.5])

        def f(q_, v_, u_, bp):
            return bias_forces(
                sk, q_, v_, gravity=jnp.asarray(w.gravity), body_params=bp
            )

        J = jacobian_wrt(w, f, GROUP_MASSES, q, v, jnp.zeros(2))
        assert J.shape == (2, 2)
        # FD check on the first body's mass.
        from nimblephysics_tpu.dynamics.skeleton import default_body_params

        bp0 = default_body_params(sk)

        def g(m0):
            bp = dict(bp0)
            bp["masses"] = bp0["masses"].at[0].set(m0[0])
            return np.asarray(
                bias_forces(
                    sk, q, v, gravity=jnp.asarray(w.gravity), body_params=bp
                )
            )

        fd = finite_difference_jacobian(g, np.array([sk.bodies[0].mass]))
        np.testing.assert_allclose(np.asarray(J[:, 0:1]), fd, atol=1e-8)


class TestMappings:
    def test_ik_mapping_roundtrip(self):
        sk = cartpole()
        w = World()
        w.add_skeleton(sk)
        m = IKMapping(w).add_spatial_body_node(1)  # the pole
        q = jnp.array([0.3, 0.8])
        target = m.map_pos(q)
        assert target.shape == (6,)
        q_rec = m.inverse_map_pos(target, jnp.array([0.0, 0.5]))
        np.testing.assert_allclose(q_rec, q, atol=1e-8)

    def test_map_vel_is_jacobian_times_v(self):
        sk = cartpole()
        w = World()
        w.add_skeleton(sk)
        m = IKMapping(w).add_linear_body_node(1)
        q = jnp.array([0.2, -0.6])
        v = jnp.array([1.0, 0.5])
        np.testing.assert_allclose(
            m.map_vel(q, v), m.map_pos_jacobian(q) @ v, atol=1e-12
        )

    def test_convert_joint_space_to_world_space(self):
        from nimblephysics_tpu.neural import convert_joint_space_to_world_space

        sk = cartpole()
        w = World()
        w.add_skeleton(sk)
        traj = jnp.stack([jnp.array([0.0, 0.0]), jnp.array([0.5, 1.0])])
        out = convert_joint_space_to_world_space(w, traj)
        assert out.shape == (2, 6)  # 2 bodies x 3 coords
        # cart body x position tracks q[0]
        np.testing.assert_allclose(out[:, 0], traj[:, 0], atol=1e-12)
