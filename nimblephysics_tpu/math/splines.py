"""Spline / 1-D function primitives for CustomJoints and smoothers.

Reference parity: the OpenSim function family consumed by the reference's
CustomJoint (dart/dynamics/CustomJoint + dart/biomechanics/OpenSimParser):
LinearFunction, Constant, PolynomialFunction, SimmSpline (natural cubic),
MultiplierFunction. Knots are static (trace-time constants); evaluation is
jit/grad-safe in the input coordinate.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True, eq=False)
class Fn:
    """Tagged 1-D function spec (static)."""

    kind: str  # 'linear' | 'constant' | 'polynomial' | 'spline'
    params: Tuple  # static numpy payloads
    scale: float = 1.0  # MultiplierFunction wrapper

    def __call__(self, x):
        return self.scale * _eval(self, x)

    def derivative(self, x):
        import jax

        return jax.grad(lambda xx: self(xx))(x)


def linear(a: float, b: float) -> Fn:
    """f(x) = a x + b (OpenSim LinearFunction coefficients [a, b])."""
    return Fn("linear", (float(a), float(b)))


def constant(v: float) -> Fn:
    return Fn("constant", (float(v),))


def polynomial(coeffs) -> Fn:
    """f(x) = sum_i c_i x^(n-1-i) (OpenSim PolynomialFunction order)."""
    return Fn("polynomial", (np.asarray(coeffs, dtype=np.float64),))


def simm_spline(xs, ys) -> Fn:
    """Natural cubic spline through (xs, ys) (OpenSim SimmSpline).

    Second derivatives are precomputed on the host (static knots); the
    evaluation clamps to linear extrapolation outside the knot range, like
    the reference's spline handling.
    """
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    n = len(xs)
    assert n >= 2
    if n == 2:
        a = (ys[1] - ys[0]) / (xs[1] - xs[0])
        return linear(a, ys[0] - a * xs[0])
    # Tridiagonal solve for natural-spline second derivatives.
    h = np.diff(xs)
    A = np.zeros((n, n))
    r = np.zeros(n)
    A[0, 0] = 1.0
    A[-1, -1] = 1.0
    for i in range(1, n - 1):
        A[i, i - 1] = h[i - 1] / 6.0
        A[i, i] = (h[i - 1] + h[i]) / 3.0
        A[i, i + 1] = h[i] / 6.0
        r[i] = (ys[i + 1] - ys[i]) / h[i] - (ys[i] - ys[i - 1]) / h[i - 1]
    m = np.linalg.solve(A, r)  # second derivatives at knots
    return Fn("spline", (xs, ys, m))


def multiplier(inner: Fn, scale: float) -> Fn:
    return Fn(inner.kind, inner.params, scale=float(scale) * inner.scale)


def _eval(fn: Fn, x):
    if fn.kind == "constant":
        (v,) = fn.params
        return jnp.asarray(v, dtype=jnp.result_type(x, float)) + 0.0 * x
    if fn.kind == "linear":
        a, b = fn.params
        return a * x + b
    if fn.kind == "polynomial":
        (c,) = fn.params
        out = jnp.zeros_like(x)
        for ci in c:
            out = out * x + ci
        return out
    if fn.kind == "spline":
        xs, ys, m = fn.params
        xs_j = jnp.asarray(xs)
        ys_j = jnp.asarray(ys)
        m_j = jnp.asarray(m)
        n = len(xs)
        i = jnp.clip(jnp.searchsorted(xs_j, x) - 1, 0, n - 2)
        x0, x1 = xs_j[i], xs_j[i + 1]
        y0, y1 = ys_j[i], ys_j[i + 1]
        m0, m1 = m_j[i], m_j[i + 1]
        h = x1 - x0
        t = (x - x0) / h
        # Clamped-domain cubic; linear extrapolation outside.
        val = (
            (1 - t) * y0
            + t * y1
            + ((1 - t) ** 3 - (1 - t)) * m0 * h * h / 6.0
            + (t**3 - t) * m1 * h * h / 6.0
        )
        # Endpoint slopes for extrapolation.
        s0 = (ys_j[1] - ys_j[0]) / (xs_j[1] - xs_j[0]) - (
            xs_j[1] - xs_j[0]
        ) * m_j[0] / 3.0 - (xs_j[1] - xs_j[0]) * m_j[1] / 6.0
        sN = (ys_j[-1] - ys_j[-2]) / (xs_j[-1] - xs_j[-2]) + (
            xs_j[-1] - xs_j[-2]
        ) * m_j[-1] / 3.0 + (xs_j[-1] - xs_j[-2]) * m_j[-2] / 6.0
        below = x < xs_j[0]
        above = x > xs_j[-1]
        val = jnp.where(below, ys_j[0] + s0 * (x - xs_j[0]), val)
        val = jnp.where(above, ys_j[-1] + sN * (x - xs_j[-1]), val)
        return val
    raise NotImplementedError(fn.kind)
