"""Contact physics + gradient-through-LCP tests.

Mirrors the reference's comprehensive gradient battery
(unittests/comprehensive/test_Gradients.cpp: blocks on ground with
static/slipping friction, sphere stacks, bouncing, multi-group islands)
and GradientTestUtils' analytical-vs-FD strategy (SURVEY.md section 4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nimblephysics_tpu.math import finite_difference_jacobian
from nimblephysics_tpu.neural.timestep import Engine
from nimblephysics_tpu.simulation import World

from worlds import free_box, free_sphere, ground_plane, pendulum

MU_G = 9.81


def make_box_world(friction=0.8, restitution=0.0, dt=1e-3):
    w = World(time_step=dt)
    w.add_skeleton(
        free_box(size=(0.2, 0.2, 0.2), friction=friction, restitution=restitution)
    )
    w.add_skeleton(ground_plane(mu=friction))
    return w, Engine(w)


def make_sphere_world(friction=0.5, restitution=0.0, dt=1e-3):
    w = World(time_step=dt)
    w.add_skeleton(
        free_sphere(radius=0.1, friction=friction, restitution=restitution)
    )
    w.add_skeleton(ground_plane())
    return w, Engine(w)


def state_jac_vs_fd(eng, q, v, ctrl, atol=1e-6):
    nv = q.shape[0]

    @jax.jit
    def f(x):
        res = eng.step(x[:nv], x[nv:], ctrl)
        return jnp.concatenate([res.q, res.v])

    x0 = jnp.concatenate([q, v])
    J = jax.jit(jax.jacrev(f))(x0)
    fd = finite_difference_jacobian(
        lambda x: np.asarray(f(jnp.array(x))), np.asarray(x0)
    )
    np.testing.assert_allclose(np.asarray(J), fd, atol=atol)
    return J


class TestContactPhysics:
    def test_box_rests_on_ground(self):
        w, eng = make_box_world()
        q = jnp.zeros(6).at[5].set(0.3)
        v = jnp.zeros(6)

        def body(carry, _):
            q, v = carry
            r = eng.step(q, v, jnp.zeros(6))
            return (r.q, r.v), None

        (qf, vf), _ = jax.lax.scan(body, (q, v), None, length=600)
        assert abs(float(qf[5]) - 0.1) < 5e-3
        assert abs(float(vf[5])) < 1e-8
        # No lateral drift:
        np.testing.assert_allclose(qf[3:5], 0.0, atol=1e-10)

    def test_kinetic_friction_deceleration(self):
        """Sliding box decelerates at mu * g."""
        mu = 0.4
        w, eng = make_box_world(friction=mu)
        q = jnp.zeros(6).at[5].set(0.0999)
        v = jnp.zeros(6).at[3].set(1.0)
        r = jax.jit(eng.step)(q, v, jnp.zeros(6))
        dv = float(r.v[3] - v[3])
        np.testing.assert_allclose(-dv / w.time_step, mu * MU_G, rtol=2e-2)

    def test_static_friction_holds(self):
        """Tangential push below mu*m*g: box must not slide."""
        mu = 0.8
        w, eng = make_box_world(friction=mu)
        q = jnp.zeros(6).at[5].set(0.0999)
        v = jnp.zeros(6)
        push = jnp.zeros(6).at[3].set(0.5 * mu * MU_G)  # half the limit
        r = eng.step(q, v, push)
        assert abs(float(r.v[3])) < 1e-10
        # Above the limit it must slide:
        push2 = jnp.zeros(6).at[3].set(2.0 * mu * MU_G)
        r2 = eng.step(q, v, push2)
        assert float(r2.v[3]) > 1e-4

    def test_restitution_bounce(self):
        """Sphere hits ground at v: leaves at ~ -e * v (when above
        the bouncing threshold)."""
        e = 0.7
        w, eng = make_sphere_world(restitution=e)
        q = jnp.zeros(6).at[5].set(0.0995)
        v = jnp.zeros(6).at[5].set(-2.0)
        r = eng.step(q, v, jnp.zeros(6))
        np.testing.assert_allclose(float(r.v[5]), e * 2.0, rtol=2e-2)

    def test_no_bounce_below_threshold(self):
        """Approach speed * e below 0.1 m/s: inelastic stop
        (reference DART_BOUNCING_VELOCITY_THRESHOLD)."""
        e = 0.5
        w, eng = make_sphere_world(restitution=e)
        q = jnp.zeros(6).at[5].set(0.0999)
        v = jnp.zeros(6).at[5].set(-0.15)  # e*v = 0.075 < 0.1
        r = eng.step(q, v, jnp.zeros(6))
        assert abs(float(r.v[5])) < 1e-6

    def test_two_spheres_collide(self):
        """Head-on equal-mass sphere collision: velocity exchange-ish
        (perfectly inelastic here: both stop at the contact)."""
        w = World(time_step=1e-3)
        w.add_skeleton(free_sphere(radius=0.1))
        w.add_skeleton(free_sphere(radius=0.1))
        eng = Engine(w)
        q = jnp.zeros(12).at[3].set(-0.0999).at[9].set(0.0999)
        v = jnp.zeros(12).at[3].set(1.0).at[9].set(-1.0)
        r = eng.step(q, v, jnp.zeros(12))
        # Inelastic: both x-velocities -> 0 (momentum conserved).
        assert abs(float(r.v[3])) < 1e-8
        assert abs(float(r.v[9])) < 1e-8

    def test_joint_limit_stops_pendulum(self):
        sk = pendulum()
        object.__setattr__(sk.joints[0], "position_upper", np.array([0.5]))
        object.__setattr__(sk.joints[0], "position_lower", np.array([-0.5]))
        w = World(time_step=1e-3)
        w.add_skeleton(sk)
        eng = Engine(w)
        assert eng.assembler.num_rows == 2
        q = jnp.array([0.5001])  # just past the upper limit
        v = jnp.array([1.0])  # still moving outward
        r = eng.step(q, v, jnp.zeros(1))
        assert float(r.v[0]) <= 1e-10  # limit impulse kills outward motion


class TestContactGradients:
    """Analytical Jacobians of the full contact step vs Ridders FD."""

    def test_resting_box(self):
        w, eng = make_box_world()
        q = jnp.zeros(6).at[5].set(0.0995)
        v = jnp.zeros(6)
        state_jac_vs_fd(eng, q, v, jnp.zeros(6), atol=1e-7)

    def test_sliding_box(self):
        w, eng = make_box_world(friction=0.6)
        q = jnp.zeros(6).at[5].set(0.0995)
        v = jnp.zeros(6).at[3].set(0.5).at[4].set(-0.2)
        state_jac_vs_fd(eng, q, v, jnp.zeros(6), atol=1e-7)

    def test_static_friction_grad(self):
        """Zero-velocity zero-force friction rows stay differentiable
        (the reference's CLAMPING tie-break)."""
        w, eng = make_box_world(friction=0.8)
        q = jnp.zeros(6).at[5].set(0.0995)
        v = jnp.zeros(6)
        push = jnp.zeros(6).at[3].set(2.0)  # below static limit ~ 7.8 N
        state_jac_vs_fd(eng, q, v, push, atol=1e-7)

    def test_grad_wrt_action(self):
        w, eng = make_box_world(friction=0.6)
        q = jnp.zeros(6).at[5].set(0.0995)
        v = jnp.zeros(6).at[3].set(0.3)

        @jax.jit
        def f(u):
            r = eng.step(q, v, u)
            return jnp.concatenate([r.q, r.v])

        u0 = jnp.zeros(6).at[3].set(1.0)
        J = jax.jit(jax.jacrev(f))(u0)
        fd = finite_difference_jacobian(
            lambda u: np.asarray(f(jnp.array(u))), np.asarray(u0)
        )
        np.testing.assert_allclose(np.asarray(J), fd, atol=1e-7)

    def test_bouncing_sphere_grad(self):
        w, eng = make_sphere_world(restitution=0.7)
        q = jnp.zeros(6).at[5].set(0.0995)
        v = jnp.zeros(6).at[5].set(-2.0)
        state_jac_vs_fd(eng, q, v, jnp.zeros(6), atol=1e-6)

    def test_rollout_grad_through_contact(self):
        """Gradient through a 30-step rollout incl. impact vs FD."""
        w, eng = make_sphere_world(friction=0.5)
        dt = w.time_step

        @jax.jit
        def loss(x0):
            def body(carry, _):
                q, v = carry
                r = eng.step(q, v, jnp.zeros(6))
                return (r.q, r.v), None

            (qf, vf), _ = jax.lax.scan(
                body, (x0[:6], x0[6:]), None, length=30
            )
            return (qf[3] ** 2) + (qf[5] - 0.1) ** 2 + 0.1 * (vf**2).sum()

        x0 = (
            jnp.zeros(12)
            .at[5]
            .set(0.105)  # 5mm above ground, will impact mid-rollout
            .at[6]
            .set(0.4)  # forward velocity
        )
        g = jax.jit(jax.grad(loss))(x0)
        fd = finite_difference_jacobian(
            lambda x: np.array([loss(jnp.array(x))]), np.asarray(x0)
        )[0]
        np.testing.assert_allclose(np.asarray(g), fd, atol=1e-6)

    def test_vmap_batch_consistency(self):
        """vmapped contact steps == per-world steps (batch axis parity)."""
        w, eng = make_box_world(friction=0.5)
        qs = jnp.zeros((8, 6)).at[:, 5].set(jnp.linspace(0.098, 0.12, 8))
        vs = jnp.zeros((8, 6)).at[:, 3].set(jnp.linspace(-0.5, 0.5, 8))
        ctrl = jnp.zeros((8, 6))

        def one(q, v, u):
            r = eng.step(q, v, u)
            return jnp.concatenate([r.q, r.v])

        batched = jax.vmap(one)(qs, vs, ctrl)
        for i in range(8):
            np.testing.assert_allclose(
                batched[i], one(qs[i], vs[i], ctrl[i]), atol=1e-12
            )
