"""PyTorch-parity façade tests: torch autograd over the JAX engine.

Reference surface being reproduced: python/nimblephysics/timestep.py,
mapping.py, get_height.py, get_lowest_point.py,
get_anthropometric_log_pdf.py, get_marker_dist_to_nearest_vertex.py,
marker_mocap.py, motion_dynamics_dataset.py — every public torch-facing
entry point of the reference Python package.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from nimblephysics_tpu import torch_api as T
from nimblephysics_tpu.models import box_drop, cartpole, half_cheetah


def _finite_diff(f, x, eps=1e-6):
    x = np.asarray(x, dtype=np.float64)
    g = np.zeros_like(x)
    for i in range(x.size):
        xp, xm = x.copy(), x.copy()
        xp.flat[i] += eps
        xm.flat[i] -= eps
        g.flat[i] = (f(xp) - f(xm)) / (2 * eps)
    return g


class TestTimestep:
    def test_forward_matches_jax(self):
        world, q0, v0 = cartpole()
        state = torch.tensor(np.concatenate([q0, v0]))
        action = torch.tensor(np.array([0.3, 0.0]))
        out = T.timestep(world, state, action)
        from nimblephysics_tpu.neural.timestep import timestep as jts

        ref = jts(world, jnp.asarray(state.numpy()), jnp.asarray(action.numpy()))
        np.testing.assert_allclose(out.numpy(), np.asarray(ref), atol=1e-12)

    def test_backward_matches_fd_contact_free(self):
        world, q0, v0 = cartpole()
        state0 = np.concatenate([q0, v0]) + 0.01
        action0 = np.array([0.5, -0.2])

        state = torch.tensor(state0, requires_grad=True)
        action = torch.tensor(action0, requires_grad=True)
        out = T.timestep(world, state, action)
        loss = (out**2).sum()
        loss.backward()

        def f_s(s):
            st = torch.tensor(s)
            return float((T.timestep(world, st, torch.tensor(action0)) ** 2).sum())

        def f_a(a):
            at = torch.tensor(a)
            return float((T.timestep(world, torch.tensor(state0), at) ** 2).sum())

        np.testing.assert_allclose(
            state.grad.numpy(), _finite_diff(f_s, state0), rtol=1e-4, atol=1e-6
        )
        np.testing.assert_allclose(
            action.grad.numpy(), _finite_diff(f_a, action0), rtol=1e-4, atol=1e-6
        )

    def test_backward_through_contact(self):
        world, q0, v0 = box_drop()
        state0 = np.concatenate([q0, v0])
        state0[5] = 0.099  # box (half-size 0.1) in contact with the ground
        state = torch.tensor(state0, requires_grad=True)
        action = torch.zeros(world.action_size, dtype=torch.float64, requires_grad=True)
        out = T.timestep(world, state, action)
        loss = (out**2).sum()
        loss.backward()
        assert np.all(np.isfinite(state.grad.numpy()))
        assert np.any(state.grad.numpy() != 0)

    def test_mass_gradient(self):
        world, q0, v0 = cartpole()
        masses0 = np.array(
            [b.mass for s in world.skeletons for b in s.bodies]
        )
        state = torch.tensor(np.concatenate([q0, v0]) + 0.01)
        action = torch.tensor(np.array([1.0, 0.0]))
        mass = torch.tensor(masses0, requires_grad=True)
        out = T.timestep(world, state, action, mass)
        (out**2).sum().backward()
        g = mass.grad.numpy()

        def f_m(m):
            mt = torch.tensor(m)
            return float((T.timestep(world, state, action, mt) ** 2).sum())

        np.testing.assert_allclose(
            g, _finite_diff(f_m, masses0, eps=1e-5), rtol=1e-3, atol=1e-7
        )

    def test_rollout_trains(self):
        # The reference README demo: optimize actions through timestep.
        world, q0, v0 = cartpole()
        start = np.concatenate([q0, v0])
        start[1] += 0.3  # pole tilted: the optimizer must push it back
        state0 = torch.tensor(start)
        actions = [
            torch.zeros(world.action_size, dtype=torch.float64, requires_grad=True)
            for _ in range(5)
        ]
        opt = torch.optim.Adam(actions, lr=0.1)
        losses = []
        for _ in range(10):
            opt.zero_grad()
            s = state0
            for a in actions:
                s = T.timestep(world, s, a)
            loss = (s**2).sum()
            loss.backward()
            opt.step()
            losses.append(float(loss.detach()))
        assert losses[-1] < losses[0]


class TestMappings:
    def test_map_to_pos_grad(self):
        from nimblephysics_tpu.neural.mappings import IKMapping

        world, q0, v0 = cartpole()
        m = IKMapping(world)
        m.add_linear_body_node(1)
        state0 = np.concatenate([q0, v0]) + 0.05
        state = torch.tensor(state0, requires_grad=True)
        out = T.map_to_pos(world, m, state)
        assert out.shape == (3,)
        (out**2).sum().backward()

        def f(s):
            return float(
                (T.map_to_pos(world, m, torch.tensor(s)) ** 2).sum()
            )

        np.testing.assert_allclose(
            state.grad.numpy(), _finite_diff(f, state0), rtol=1e-5, atol=1e-8
        )

    def test_map_to_vel(self):
        from nimblephysics_tpu.neural.mappings import IKMapping

        world, q0, v0 = cartpole()
        m = IKMapping(world)
        m.add_linear_body_node(1)
        state = torch.tensor(np.concatenate([q0, v0 + 0.3]), requires_grad=True)
        out = T.map_to_vel(world, m, state)
        (out**2).sum().backward()
        assert np.all(np.isfinite(state.grad.numpy()))


class TestSkeletonQueries:
    def _skel(self):
        world, q0, v0 = half_cheetah()
        return world.skeletons[1], q0[: world.num_dofs]  # [0] is the ground

    def test_height_positive_and_scale_grad(self):
        skel, q = self._skel()
        scales = {b.name: torch.ones(3, dtype=torch.float64, requires_grad=True)
                  for b in skel.bodies}
        h = T.get_height(skel, np.asarray(q), scales)
        assert float(h) > 0.1
        h.backward()
        total = sum(float(s.grad.abs().sum()) for s in scales.values())
        assert np.isfinite(total) and total > 0

    def test_height_doubles_with_scale(self):
        skel, q = self._skel()
        ones = {b.name: torch.ones(3, dtype=torch.float64) for b in skel.bodies}
        twos = {b.name: 2 * torch.ones(3, dtype=torch.float64) for b in skel.bodies}
        q0 = np.zeros_like(np.asarray(q))
        h1 = float(T.get_height(skel, q0, ones))
        h2 = float(T.get_height(skel, q0, twos))
        assert h2 == pytest.approx(2 * h1, rel=1e-6)

    def test_lowest_point_grads(self):
        skel, q = self._skel()
        scales = {b.name: torch.ones(3, dtype=torch.float64, requires_grad=True)
                  for b in skel.bodies}
        pos = torch.tensor(np.asarray(q, dtype=np.float64), requires_grad=True)
        low = T.get_lowest_point(skel, pos, scales)
        low.backward()
        # Raising the root (dof 1 = y) raises the lowest point: d(low)/dy = 1.
        assert pos.grad.numpy()[1] == pytest.approx(1.0, abs=1e-9)

    def test_anthropometric_log_pdf(self):
        from nimblephysics_tpu.biomechanics.anthropometrics import (
            Anthropometrics,
            MultivariateGaussian,
        )

        skel, _ = self._skel()
        anthro = Anthropometrics()
        anthro.add_metric("torso_len", 0, 0, 1.0)
        anthro.set_distribution(
            MultivariateGaussian(["torso_len"], np.array([1.0]), np.eye(1) * 0.01)
        )
        scales = {b.name: torch.ones(3, dtype=torch.float64, requires_grad=True)
                  for b in skel.bodies}
        pdf = T.get_anthropometric_log_pdf(skel, anthro, scales)
        pdf.backward()
        # At the mean, gradient wrt the measured body's scale is ~0.
        g0 = scales[skel.bodies[0].name].grad.numpy()
        assert abs(g0[0]) < 1e-6

    def test_marker_dist(self):
        from nimblephysics_tpu.dynamics.queries import body_vertex_table

        skel, _ = self._skel()
        _, bodies = body_vertex_table(skel)
        bi = int(bodies[0])  # first body that actually has shape vertices
        off = torch.tensor([0.0, 0.3, 0.0], dtype=torch.float64, requires_grad=True)
        sc = torch.ones(3, dtype=torch.float64, requires_grad=True)
        d = T.get_marker_dist_to_nearest_vertex(skel, bi, off, sc)
        assert float(d) > 0
        d.backward()
        assert np.all(np.isfinite(off.grad.numpy()))
        assert np.all(np.isfinite(sc.grad.numpy()))


class TestJax2Torch:
    def test_generic_bridge(self):
        f = T.jax2torch(lambda x, y: jnp.sum(x * y) + jnp.sum(x**2))
        x = torch.tensor([1.0, 2.0], dtype=torch.float64, requires_grad=True)
        y = torch.tensor([3.0, 4.0], dtype=torch.float64, requires_grad=True)
        out = f(x, y)
        out.backward()
        np.testing.assert_allclose(x.grad.numpy(), [3 + 2, 4 + 4])
        np.testing.assert_allclose(y.grad.numpy(), [1, 2])


class TestMarkerMocap:
    def test_custom_loss_refinement(self):
        # Tiny synthetic mocap problem on the cartpole skeleton.
        world, q0, v0 = cartpole()
        skel = world.skeletons[0]
        markers_map = {
            "m0": (0, np.array([0.1, 0.0, 0.0])),
            "m1": (1, np.array([0.0, 0.2, 0.0])),
        }
        mocap = T.MarkerMocap(skel, markers_map)

        rng = np.random.default_rng(0)
        TT = 4
        from nimblephysics_tpu.biomechanics.scaled_fk import (
            marker_table,
            marker_world_positions,
        )

        names, bodies, offsets, _ = marker_table(skel)
        qs = 0.1 * rng.standard_normal((TT, skel.num_dofs))
        observed = np.stack(
            [
                np.asarray(
                    marker_world_positions(
                        skel, jnp.asarray(qs[t]), bodies, jnp.asarray(offsets)
                    )
                )
                for t in range(TT)
            ]
        )

        calls = []

        def custom(state: T.MarkerMocapOptimizationState):
            calls.append(1)
            # Penalize deviation of scales from 1 (a typical prior).
            loss = sum(
                ((s - 1.0) ** 2).sum() for s in state.bodyScales.values()
            )
            return loss

        mocap.setCustomLoss(custom, weight=1.0)
        res = mocap.evaluatePerformance(
            observed, refine_iterations=2, outer_iterations=4,
            ik_iterations=2,
        )
        assert len(calls) == 2
        assert res.avg_marker_error < 0.05
        assert np.all(np.isfinite(res.poses))


class TestNativeLossFn:
    def _problem(self, loss_fn):
        from nimblephysics_tpu.trajectory.problem import SingleShot

        world, q0, v0 = cartpole()
        world.set_action_space([0])
        prob = SingleShot(world, loss_fn, steps=8)
        x0 = prob.initial_guess(jnp.asarray(np.concatenate([q0, v0]) + 0.05))
        return prob, x0

    def test_grad_matches_jax_loss(self):
        # Same loss expressed in torch (NativeLossFn) and in pure JAX must
        # produce identical gradients through the rollout.
        def torch_loss(ro: T.NativeTrajectoryRollout):
            return (ro.getPoses()[-1] ** 2).sum() + 0.1 * (
                ro.getControlForces() ** 2
            ).sum()

        def jax_loss(ro):
            return jnp.sum(ro.poses[-1] ** 2) + 0.1 * jnp.sum(ro.forces**2)

        prob_t, x0 = self._problem(T.NativeLossFn(torch_loss))
        prob_j, _ = self._problem(jax_loss)
        l_t = float(prob_t.loss(x0))
        l_j = float(prob_j.loss(x0))
        assert l_t == pytest.approx(l_j, rel=1e-12)
        g_t = jax.grad(prob_t.loss)(x0)
        g_j = jax.grad(prob_j.loss)(x0)
        np.testing.assert_allclose(
            np.asarray(g_t), np.asarray(g_j), rtol=1e-9, atol=1e-12
        )

    def test_optimizes_under_jit(self):
        from nimblephysics_tpu.trajectory.optimizers import SGDOptimizer

        def torch_loss(ro: T.NativeTrajectoryRollout):
            return (ro.getPoses()[-1] ** 2).sum() + (
                ro.getVels()[-1] ** 2
            ).sum()

        prob, x0 = self._problem(T.NativeLossFn(torch_loss))
        l0 = float(prob.loss(x0))
        sol = SGDOptimizer(iterations=25, learning_rate=0.05).optimize(
            prob, x0
        )
        assert float(prob.loss(sol.x)) < l0

    def test_mapped_spaces_visible_to_torch(self):
        from nimblephysics_tpu.neural.mappings import IKMapping
        from nimblephysics_tpu.trajectory.problem import SingleShot

        world, q0, v0 = cartpole()
        world.set_action_space([0])
        m = IKMapping(world)
        m.add_linear_body_node(1)

        def torch_loss(ro: T.NativeTrajectoryRollout):
            assert "pole" in ro.getMappings()
            return ((ro.getPoses("pole")[-1, 0] - 0.2) ** 2).sum()

        prob = SingleShot(world, T.NativeLossFn(torch_loss), steps=6)
        prob.add_mapping("pole", m)
        x0 = prob.initial_guess(jnp.zeros(4))
        g = jax.grad(prob.loss)(x0)
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.abs(g).max()) > 0


class TestMotionDynamicsDataset:
    def test_pages_real_b3d(self, tmp_path):
        import os
        import shutil

        src = "/root/reference/data/b3d/results.b3d"
        if not os.path.exists(src):
            pytest.skip("reference b3d data unavailable")
        shutil.copy(src, tmp_path / "subject.b3d")

        def featurize(subj, trial, t, seed):
            fr = subj.read_frames(trial, t, 1)
            return {"pos": torch.from_numpy(fr.pos[0][0])}

        ds = T.MotionDynamicsDataset(str(tmp_path), featurize)
        assert len(ds) > 0
        item = ds[0]
        assert item["pos"].shape[0] > 0
        # Deep index works too (paging, not preloading).
        item2 = ds[len(ds) - 1]
        assert torch.isfinite(item2["pos"]).all()
