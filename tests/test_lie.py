"""Lie-group math tests: exp/log roundtrips, Jacobian identities, FD checks.

Mirrors the reference's unittests/unit/test_Geometry.cpp strategy: verify
analytical formulas against finite differences (Ridders).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nimblephysics_tpu.math import (
    Ad,
    ad,
    ad_apply,
    dad_apply,
    euler_to_matrix,
    exp_map,
    exp_map_rot,
    finite_difference_jacobian,
    log_map,
    log_map_rot,
    matrix_to_euler_xyz,
    matrix_to_euler_zyx,
    rp_to_transform,
    skew,
    so3_left_jacobian,
    so3_left_jacobian_inv,
    so3_right_jacobian,
    so3_right_jacobian_inv,
    so3_right_jacobian_time_deriv,
    transform_inv,
    transform_point,
)

RNG = np.random.RandomState(42)


def random_w(scale=1.0):
    return RNG.randn(3) * scale


class TestExpLog:
    def test_exp_rot_orthogonal(self):
        for _ in range(10):
            R = exp_map_rot(jnp.array(random_w()))
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
            assert abs(float(jnp.linalg.det(R)) - 1.0) < 1e-12

    def test_exp_log_roundtrip(self):
        for scale in [1e-8, 1e-4, 0.1, 1.0, 2.0]:
            w = jnp.array(random_w(scale))
            w2 = log_map_rot(exp_map_rot(w))
            np.testing.assert_allclose(w2, w, atol=1e-9)

    def test_log_near_pi(self):
        for axis in [np.array([1.0, 0, 0]), np.array([0, 1.0, 0]),
                     np.array([0.3, -0.5, 0.8]) / np.linalg.norm([0.3, -0.5, 0.8])]:
            w = jnp.array(axis * (np.pi - 1e-4))
            w2 = log_map_rot(exp_map_rot(w))
            np.testing.assert_allclose(
                exp_map_rot(w2), exp_map_rot(w), atol=1e-6
            )

    def test_exp_zero(self):
        np.testing.assert_allclose(exp_map_rot(jnp.zeros(3)), np.eye(3))
        np.testing.assert_allclose(log_map_rot(jnp.eye(3)), np.zeros(3))

    def test_se3_exp_log_roundtrip(self):
        for _ in range(5):
            xi = jnp.array(RNG.randn(6))
            T = exp_map(xi)
            np.testing.assert_allclose(log_map(T), xi, atol=1e-9)

    def test_grad_at_zero_is_finite(self):
        g = jax.jacobian(lambda w: exp_map_rot(w).reshape(-1))(jnp.zeros(3))
        assert np.all(np.isfinite(g))
        # d(exp)/dw at 0 = d(skew)/dw
        expected = jax.jacobian(lambda w: skew(w).reshape(-1))(jnp.zeros(3))
        np.testing.assert_allclose(g, expected, atol=1e-12)


class TestJacobians:
    def test_right_jacobian_definition(self):
        """J_r maps coordinate rates to body angular velocity:
        exp(-w) d/dt exp(w) = [J_r(w) w_dot]x."""
        w = jnp.array(random_w())
        dw = jnp.array(random_w())
        R = exp_map_rot(w)
        dR = jax.jvp(exp_map_rot, (w,), (dw,))[1]
        omega_body = jnp.array(
            [
                (R.T @ dR)[2, 1],
                (R.T @ dR)[0, 2],
                (R.T @ dR)[1, 0],
            ]
        )
        np.testing.assert_allclose(
            so3_right_jacobian(w) @ dw, omega_body, atol=1e-10
        )

    def test_left_right_transpose(self):
        w = jnp.array(random_w())
        np.testing.assert_allclose(
            so3_left_jacobian(w).T, so3_right_jacobian(w), atol=1e-12
        )

    def test_inverses(self):
        for scale in [1e-7, 0.5, 2.5]:
            w = jnp.array(random_w(scale))
            np.testing.assert_allclose(
                so3_left_jacobian(w) @ so3_left_jacobian_inv(w),
                np.eye(3),
                atol=1e-9,
            )
            np.testing.assert_allclose(
                so3_right_jacobian(w) @ so3_right_jacobian_inv(w),
                np.eye(3),
                atol=1e-9,
            )

    def test_time_deriv_vs_fd(self):
        w = random_w()
        dw = random_w()

        def f(eps):
            return np.asarray(so3_right_jacobian(jnp.array(w + eps * dw)))

        from nimblephysics_tpu.math import ridders_derivative

        fd = ridders_derivative(f)
        np.testing.assert_allclose(
            so3_right_jacobian_time_deriv(jnp.array(w), jnp.array(dw)),
            fd,
            atol=1e-8,
        )


class TestAdjoint:
    def test_Ad_composition(self):
        T1 = exp_map(jnp.array(RNG.randn(6)))
        T2 = exp_map(jnp.array(RNG.randn(6)))
        np.testing.assert_allclose(Ad(T1 @ T2), Ad(T1) @ Ad(T2), atol=1e-10)

    def test_ad_is_bracket(self):
        V = jnp.array(RNG.randn(6))
        W = jnp.array(RNG.randn(6))
        # ad(V) W = vee([V^, W^])
        np.testing.assert_allclose(ad(V) @ W, ad_apply(V, W), atol=1e-12)

    def test_dad_is_transpose(self):
        V = jnp.array(RNG.randn(6))
        F = jnp.array(RNG.randn(6))
        np.testing.assert_allclose(dad_apply(V, F), ad(V).T @ F, atol=1e-12)

    def test_transform_inv(self):
        T = exp_map(jnp.array(RNG.randn(6)))
        np.testing.assert_allclose(
            T @ transform_inv(T), np.eye(4), atol=1e-12
        )

    def test_transform_point(self):
        T = exp_map(jnp.array(RNG.randn(6)))
        p = jnp.array(RNG.randn(3))
        hom = T @ jnp.concatenate([p, jnp.ones(1)])
        np.testing.assert_allclose(transform_point(T, p), hom[:3], atol=1e-12)


class TestEuler:
    @pytest.mark.parametrize("order", ["xyz", "zyx", "zxy", "xzy", "yxz", "yzx"])
    def test_euler_orthogonal(self, order):
        a = jnp.array(RNG.randn(3) * 0.5)
        R = euler_to_matrix(a, order)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)

    def test_euler_xyz_roundtrip(self):
        a = jnp.array([0.3, -0.4, 0.9])
        np.testing.assert_allclose(
            matrix_to_euler_xyz(euler_to_matrix(a, "xyz")), a, atol=1e-10
        )

    def test_euler_zyx_roundtrip(self):
        a = jnp.array([0.3, -0.4, 0.9])
        np.testing.assert_allclose(
            matrix_to_euler_zyx(euler_to_matrix(a, "zyx")), a, atol=1e-10
        )


class TestFiniteDifference:
    def test_ridders_jacobian(self):
        A = RNG.randn(4, 3)

        def f(x):
            return A @ x + np.sin(x).sum()

        x0 = RNG.randn(3)
        J = finite_difference_jacobian(f, x0)
        expected = A + np.cos(x0)[None, :]
        np.testing.assert_allclose(J, expected, atol=1e-9)
