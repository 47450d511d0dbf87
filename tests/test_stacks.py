"""Stacked-body scenarios: box-box SAT manifolds, multi-island worlds.

Mirrors the reference's sphere-stack / multi-group island gradient tests
(test_Gradients.cpp: sphere stacks, multi-group islands)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nimblephysics_tpu.math import finite_difference_jacobian
from nimblephysics_tpu.neural.timestep import Engine
from nimblephysics_tpu.simulation import World

from worlds import free_box, free_sphere, ground_plane


def stack_world():
    w = World(time_step=1e-3)
    w.add_skeleton(free_box(size=(0.2, 0.2, 0.2), friction=0.9))
    w.add_skeleton(free_box(size=(0.15, 0.15, 0.15), friction=0.9))
    w.add_skeleton(ground_plane())
    return w, Engine(w)


class TestF32TinyRotation:
    def test_f32_free_joint_tiny_rotation_no_nan(self):
        """Regression: f32 free-joint states with tiny-but-nonzero rotation
        (theta ~ 1e-11, as produced by settling contact) must not NaN.

        The small-angle Taylor guards were theta^2 < 1e-24 (f64-tuned): in
        f32 theta ~ 1e-11 took the generic branch, whose jvp (Coriolis
        terms) divides by theta^4 ~ 1e-44 — subnormal — giving inf * 0 =
        NaN in bias_forces. Guards are now dtype-aware
        (batched/linalg._taylor_thresh)."""
        from nimblephysics_tpu.batched import BatchedEngine
        from nimblephysics_tpu.models import box_stack

        world, q0, v0 = box_stack(n_boxes=2)
        eng = BatchedEngine(world)
        B = 4
        dtype = jnp.float32
        q = jnp.tile(jnp.asarray(q0, dtype)[:, None], (1, B))
        # The exact failure signature: rotation coords ~1e-11.
        q = q.at[0].add(1.1e-11).at[1].add(-6.4e-12)
        q = q.at[8].add(0.18)  # top-box yaw (SAT feature variation)
        v = jnp.tile(jnp.asarray(v0, dtype)[:, None], (1, B))
        u = jnp.zeros_like(q)
        z = jnp.zeros((eng.num_rows, B), dtype)

        def body(c, _):
            q, v, z = c
            r = eng.step(q, v, u, z_warm=z)
            return (r.q, r.v, r.impulses), None

        (qf, vf, zf), _ = jax.lax.scan(body, (q, v, z), None, length=50)
        assert bool(jnp.isfinite(qf).all()), "q NaN"
        assert bool(jnp.isfinite(vf).all()), "v NaN"
        assert bool(jnp.isfinite(zf).all()), "impulses NaN"


class TestLogSo3BackwardGuards:
    """Regression: log_so3's angle must NOT come from arccos.

    The vjp of arccos at cos = +-1 is cotangent * -1/sqrt(1-cos^2) =
    0 * inf = NaN, so a single identity rotation anywhere in the batch
    (every box_stack world at t=0) poisoned the whole rollout gradient
    — even in f64, even though every downstream use was where-guarded.
    log_so3 now mirrors math/lie.log_map_rot: atan2(|antisym|/2, cos)
    with a double-where on the sqrt (degenerate at theta = 0 AND pi).
    """

    @pytest.mark.parametrize("theta", [0.0, 1e-12, 1e-7, 0.3, 3.1, np.pi])
    def test_log_so3_grad_finite_all_angles(self, theta):
        from nimblephysics_tpu.batched import linalg as bl

        ax = np.array([0.3, -0.5, 0.8])
        ax /= np.linalg.norm(ax)
        w = jnp.asarray((theta * ax)[:, None])

        def roundtrip(w):
            return jnp.sum(bl.log_so3(bl.exp_so3(w)))

        val = bl.log_so3(bl.exp_so3(w))
        if theta < 3.0:  # log is multivalued at the pi cut
            np.testing.assert_allclose(
                np.asarray(val), np.asarray(w), atol=1e-12
            )
        g = jax.grad(roundtrip)(w)
        assert bool(jnp.isfinite(g).all())

    def test_free_joint_integrate_grad_finite_at_identity(self):
        """The failing composition: integrate_positions on a FREE joint at
        the exact-identity orientation (log_so3(exp(0) exp(0)))."""
        from nimblephysics_tpu.batched.articulated import integrate_positions
        from nimblephysics_tpu.batched.engine import BatchedEngine
        from nimblephysics_tpu.models import box_stack

        world, q0, v0 = box_stack(n_boxes=2)
        eng = BatchedEngine(world)
        B = 2
        q = jnp.tile(jnp.asarray(q0)[:, None], (1, B))
        v = jnp.tile(jnp.asarray(v0)[:, None], (1, B))

        gq, gv = jax.grad(
            lambda q, v: jnp.sum(integrate_positions(eng.fw, q, v, 1e-3)),
            argnums=(0, 1),
        )(q, v)
        assert bool(jnp.isfinite(gq).all()) and bool(jnp.isfinite(gv).all())


class TestBoxStackModel:
    def test_box_stack_factory_rests_batched(self):
        """Bundled box_stack model (benchmarks/boxstack_bench.py workload)
        runs on the batched engine and the stack stays standing."""
        from nimblephysics_tpu.batched import BatchedEngine
        from nimblephysics_tpu.models import box_stack

        world, q0, v0 = box_stack(n_boxes=2)
        eng = BatchedEngine(world)
        B = 4
        q = jnp.tile(jnp.asarray(q0)[:, None], (1, B))
        v = jnp.tile(jnp.asarray(v0)[:, None], (1, B))
        u = jnp.zeros_like(q)
        z = jnp.zeros((eng.num_rows, B), q.dtype)

        def body(c, _):
            q, v, z = c
            r = eng.step(q, v, u, z_warm=z)
            return (r.q, r.v, r.impulses), None

        (qf, vf, _), _ = jax.lax.scan(body, (q, v, z), None, length=200)
        # Top box still at its stacked height in every world.
        np.testing.assert_allclose(
            np.asarray(qf[11]), q0[11], atol=8e-3
        )
        assert float(jnp.abs(vf).max()) < 5e-2


class TestBoxStack:
    def test_two_boxes_rest_stacked(self):
        w, eng = stack_world()
        # Bottom box resting at z=0.1, top box on it at z=0.275.
        q = jnp.zeros(12).at[5].set(0.0999).at[11].set(0.2747)
        v = jnp.zeros(12)

        def body(c, _):
            q, v = c
            r = eng.step(q, v, jnp.zeros(12))
            return (r.q, r.v), None

        (qf, vf), _ = jax.lax.scan(body, (q, v), None, length=400)
        # Both boxes still stacked (heights preserved within a few mm).
        assert abs(float(qf[5]) - 0.1) < 8e-3, float(qf[5])
        assert abs(float(qf[11]) - 0.275) < 12e-3, float(qf[11])
        # Nothing drifts sideways.
        np.testing.assert_allclose(np.asarray(qf[3:5]), 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(qf[9:11]), 0.0, atol=1e-6)
        assert float(jnp.abs(vf).max()) < 1e-2

    def test_multi_island_independence(self):
        """Two separated spheres = two islands in one block LCP: each must
        behave exactly as it would alone (reference: multi-group islands)."""
        w2 = World(time_step=1e-3)
        w2.add_skeleton(free_sphere(radius=0.1))
        w2.add_skeleton(free_sphere(radius=0.1))
        w2.add_skeleton(ground_plane())
        eng2 = Engine(w2)
        q = jnp.zeros(12).at[5].set(0.0995).at[9].set(3.0).at[11].set(0.0995)
        v = jnp.zeros(12).at[3].set(0.4)  # only sphere 1 slides
        r = eng2.step(q, v, jnp.zeros(12))
        # Sphere 2 (x = 3) must be entirely unaffected by sphere 1.
        w_single = World(time_step=1e-3)
        w_single.add_skeleton(free_sphere(radius=0.1))
        w_single.add_skeleton(ground_plane())
        eng_s = Engine(w_single)
        r_s = eng_s.step(
            jnp.zeros(6).at[5].set(0.0995), jnp.zeros(6), jnp.zeros(6)
        )
        np.testing.assert_allclose(
            np.asarray(r.v[6:]), np.asarray(r_s.v), atol=1e-9
        )

    def test_grad_through_stack(self):
        """State Jacobian of the stacked configuration vs FD (box-box SAT
        manifold + ground contacts simultaneously active)."""
        w, eng = stack_world()
        q = jnp.zeros(12).at[5].set(0.0995).at[11].set(0.2742)
        v = jnp.zeros(12).at[9].set(0.2)  # top box sliding

        @jax.jit
        def f(x):
            r = eng.step(x[:12], x[12:], jnp.zeros(12))
            return jnp.concatenate([r.q, r.v])

        x0 = jnp.concatenate([q, v])
        J = jax.jit(jax.jacrev(f))(x0)
        fd = finite_difference_jacobian(
            lambda x: np.asarray(f(jnp.asarray(x))), np.asarray(x0)
        )
        np.testing.assert_allclose(np.asarray(J), fd, atol=5e-6)
