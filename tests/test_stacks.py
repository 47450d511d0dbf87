"""Stacked-body scenarios: box-box SAT manifolds, multi-island worlds.

Mirrors the reference's sphere-stack / multi-group island gradient tests
(test_Gradients.cpp: sphere stacks, multi-group islands)."""

import jax
import jax.numpy as jnp
import numpy as np

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
