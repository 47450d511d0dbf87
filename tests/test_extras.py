"""Tests for raycasts, Recording, IKSolver, Lemke oracle, DynamicsFitter,
ExoSolver (the remaining SURVEY.md section 2 inventory rows)."""

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.collision import raycast
from nimblephysics_tpu.constraint import lemke, validate_lcp_solution
from nimblephysics_tpu.math import solve_ik
from nimblephysics_tpu.simulation import Recording, World

from worlds import ball_chain, free_box, free_sphere, ground_plane


class TestRaycast:
    def make_world(self):
        w = World()
        w.add_skeleton(free_sphere(radius=0.2))
        w.add_skeleton(ground_plane())
        return w

    def test_hits_sphere(self):
        w = self.make_world()
        q = jnp.zeros(6).at[5].set(1.0)  # sphere center at z=1
        hit = raycast(w, q, jnp.array([0.0, 0.0, 3.0]), jnp.array([0.0, 0.0, -1.0]))
        assert bool(hit.hit)
        np.testing.assert_allclose(float(hit.fraction), 1.8, atol=1e-6)
        np.testing.assert_allclose(np.asarray(hit.point), [0, 0, 1.2], atol=1e-6)
        assert int(hit.body) == 0

    def test_hits_ground_when_missing_sphere(self):
        w = self.make_world()
        q = jnp.zeros(6).at[5].set(1.0)
        hit = raycast(w, q, jnp.array([5.0, 0.0, 2.0]), jnp.array([0.0, 0.0, -1.0]))
        assert bool(hit.hit)
        np.testing.assert_allclose(float(hit.fraction), 2.0, atol=1e-6)
        assert int(hit.body) == 1  # the ground body

    def test_miss(self):
        w = self.make_world()
        q = jnp.zeros(6).at[5].set(1.0)
        hit = raycast(w, q, jnp.array([0.0, 0.0, 3.0]), jnp.array([0.0, 0.0, 1.0]))
        assert not bool(hit.hit)

    def test_box_ray(self):
        w = World()
        w.add_skeleton(free_box(size=(0.4, 0.4, 0.4)))
        q = jnp.zeros(6)
        hit = raycast(w, q, jnp.array([2.0, 0.05, 0.05]), jnp.array([-1.0, 0.0, 0.0]))
        assert bool(hit.hit)
        np.testing.assert_allclose(float(hit.fraction), 1.8, atol=1e-6)
        np.testing.assert_allclose(np.asarray(hit.normal), [1, 0, 0], atol=1e-6)


class TestRecording:
    def test_bake_replay_save(self, tmp_path):
        w = World()
        w.add_skeleton(free_box())
        rec = Recording(w)
        for k in range(5):
            rec.bake(np.full(12, float(k)))
        assert rec.num_frames == 5
        np.testing.assert_allclose(rec.get_state(3), 3.0)
        p = str(tmp_path / "rec.npy")
        rec.save(p)
        rec2 = Recording.load(w, p)
        np.testing.assert_allclose(rec2.as_array(), rec.as_array())


class TestIKSolver:
    def test_chain_reaches_target(self):
        from nimblephysics_tpu.dynamics import forward_kinematics

        sk = ball_chain(3, length=0.5)

        def tip(q):
            T = forward_kinematics(sk, q)
            return T[2, :3, 3] + T[2, :3, :3] @ jnp.array([0.0, 0.0, -0.25])

        target = jnp.array([0.4, 0.3, -1.0])
        q = solve_ik(tip, target, jnp.zeros(9) + 0.1, iterations=40)
        np.testing.assert_allclose(np.asarray(tip(q)), target, atol=1e-5)


class TestLemke:
    def test_solves_random_pd_lcps(self):
        rng = np.random.RandomState(0)
        for _ in range(10):
            n = 6
            B = rng.randn(n, n)
            M = B @ B.T + np.eye(n) * 0.1
            q = rng.randn(n)
            z, status = lemke(M, q)
            assert status == 0
            assert validate_lcp_solution(M, q, z, tol=1e-7)

    def test_matches_onchip_solver_frictionless(self):
        """boxed_lcp with no friction rows == Lemke on the same problem."""
        from nimblephysics_tpu.constraint import LcpMeta, boxed_lcp

        rng = np.random.RandomState(1)
        n, r = 6, 6
        Fm = rng.randn(n, r)
        b = rng.randn(n)
        meta = LcpMeta(
            findex=np.full(n, -1, dtype=np.int32),
            is_friction=np.zeros(n, dtype=bool),
            iterations=128,
            k_active=n,
        )
        z1 = np.asarray(
            boxed_lcp(meta, jnp.asarray(Fm), jnp.asarray(b),
                      jnp.zeros(n), jnp.zeros(n))
        )
        M = Fm @ Fm.T
        z2, status = lemke(M, -b)  # our convention: w = A z - b
        assert status == 0
        np.testing.assert_allclose(z1, z2, atol=1e-5)


class TestDynamicsFitter:
    def test_recovers_mass(self):
        """Generate accelerations from heavier true masses; fitting from
        the default model must move masses toward the truth."""
        from nimblephysics_tpu.biomechanics import DynamicsFitter
        from nimblephysics_tpu.dynamics import forward_dynamics
        from nimblephysics_tpu.dynamics.skeleton import default_body_params

        sk = ball_chain(2, length=0.5)
        g = jnp.array([0.0, -9.81, 0.0])
        bp0 = default_body_params(sk)
        # No explicit "inertias": both truth and fitter scale rotational
        # inertia with mass (consistent model family).
        bp_true = {
            "masses": bp0["masses"] * jnp.array([1.6, 1.0]),
            "coms": bp0["coms"],
        }

        rng = np.random.RandomState(0)
        T = 24
        poses = 0.4 * rng.randn(T, 6)
        vels = 0.6 * rng.randn(T, 6)
        # Measured root wrenches (the force-plate analog): without absolute
        # force measurements the problem is scale-invariant in the masses —
        # exactly why the reference fits against GRF data.
        wext = 2.0 * rng.randn(T, 3)
        accs = np.stack(
            [
                np.asarray(
                    forward_dynamics(
                        sk, jnp.asarray(poses[t]), jnp.asarray(vels[t]),
                        jnp.zeros(6).at[:3].set(jnp.asarray(wext[t])),
                        gravity=g, body_params=bp_true,
                    )
                )
                for t in range(T)
            ]
        )
        fitter = DynamicsFitter(
            sk, root_dofs=3, gravity=(0, -9.81, 0), regularize_masses=1e-4,
            regularize_coms=1e3,
        )
        res = fitter.fit(poses, vels, accs, ext_root_wrench=wext,
                         iterations=300, learning_rate=0.03)
        assert abs(res.masses[0] - 1.6) < 0.2, res.masses


class TestExoSolver:
    def test_exo_matches_virtual_accels(self):
        from nimblephysics_tpu.biomechanics import ExoSolverPinnedContact

        real = ball_chain(2)
        virtual = ball_chain(2)
        # Real system has heavier links (wearing the exo).
        for i, b in enumerate(real.bodies):
            object.__setattr__(b, "mass", b.mass * 1.5)
        exo = ExoSolverPinnedContact(real, virtual, exo_dof_indices=range(6))
        q = jnp.asarray(np.random.RandomState(0).randn(6) * 0.3)
        dq = jnp.zeros(6)
        tau_h = jnp.asarray(np.random.RandomState(1).randn(6))
        tau_exo, achieved = exo.solve_exo_torques(q, dq, tau_h)
        target = exo.virtual_acceleration(q, dq, tau_h)
        np.testing.assert_allclose(
            np.asarray(achieved), np.asarray(target), atol=1e-6
        )


class TestSimpleFeatherstone:
    def test_aba_matches_dense(self):
        from nimblephysics_tpu.dynamics import (
            PRISMATIC,
            REVOLUTE,
            Skeleton,
            aba_forward_dynamics,
            flatten_chain,
            forward_dynamics,
        )

        rng = np.random.RandomState(0)
        T = np.eye(4)
        T[2, 3] = -0.3
        sk = Skeleton("chain")
        p = -1
        for i in range(6):
            jt = PRISMATIC if i == 3 else REVOLUTE
            ax = rng.randn(3)
            ax /= np.linalg.norm(ax)
            p = sk.add_joint_and_body(
                jt, parent=p, axis=ax, T_pj=T if i else np.eye(4),
                T_cj=np.eye(4) if i % 2 else T, mass=0.5 + i * 0.2,
                com=rng.randn(3) * 0.05, inertia=np.eye(3) * 0.02,
            )
        chain = flatten_chain(sk)
        g = jnp.array([0.0, 0.0, -9.81])
        q = jnp.asarray(rng.randn(6) * 0.4)
        dq = jnp.asarray(rng.randn(6))
        tau = jnp.asarray(rng.randn(6))
        d1 = forward_dynamics(sk, q, dq, tau, gravity=g)
        d2 = aba_forward_dynamics(chain, q, dq, tau, g)
        np.testing.assert_allclose(np.asarray(d2), np.asarray(d1), atol=1e-8)


class TestDistance:
    def test_min_distance_sphere_above_ground(self):
        from nimblephysics_tpu.collision import distance

        from worlds import free_sphere, ground_plane
        from nimblephysics_tpu.simulation import World

        w = World()
        w.add_skeleton(free_sphere(radius=0.1))
        w.add_skeleton(ground_plane())
        q = jnp.zeros(6).at[5].set(0.5)
        res = distance(w, q)
        np.testing.assert_allclose(float(res.min_distance), 0.4, atol=1e-9)
        # differentiable: d(dist)/d(height) = 1
        g = jax.grad(lambda qq: distance(w, qq).min_distance)(q)
        np.testing.assert_allclose(float(g[5]), 1.0, atol=1e-9)


class TestMappedSnapshot:
    def test_backprop_mapped_matches_chain_rule(self):
        from nimblephysics_tpu.neural import IKMapping, mapped_forward_pass
        from nimblephysics_tpu.simulation import World
        from worlds import cartpole

        w = World(gravity=(0, -9.81, 0))
        w.add_skeleton(cartpole())
        m = IKMapping(w).add_linear_body_node(1)
        state = jnp.array([0.1, 0.3, 0.2, -0.1])
        snap = mapped_forward_pass(w, state, jnp.zeros(2), {"ik": m})
        gpos = jnp.array([1.0, -2.0, 0.5])
        g = snap.backprop_mapped("ik", gpos)
        # chain rule by hand: d(map(q'))/d(inputs) via full jacobians
        Jm = m.map_pos_jacobian(snap.q_next)
        gq_next = Jm.T @ gpos
        expected = snap.get_pos_pos_jacobian().T @ gq_next
        np.testing.assert_allclose(
            np.asarray(g.loss_wrt_position), np.asarray(expected), atol=1e-9
        )
