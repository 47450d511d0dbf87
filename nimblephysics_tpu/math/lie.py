"""Lie-group math core: SO(3)/SE(3) exp/log, adjoints, left/right Jacobians.

TPU-native re-design of the reference Lie-group geometry surface
(reference: dart/math/Geometry.hpp:85-370 — expMap, logMap, AdT, and the
SO(3) left/right Jacobian family). Everything here is pure JAX, written to
be `jit`/`vmap`/`grad`-safe, including at the theta -> 0 singularity (we use
the double-`where` trick so gradients never see a division by zero).

Conventions (match the reference / DART):
  * Spatial vectors are ordered [angular; linear] (w; v).
  * SO(3) coordinates are rotation-vector / log-map coordinates.
  * `Ad(T)` is the 6x6 adjoint of an SE(3) transform T = (R, p):
        Ad(T) = [[R, 0], [ [p]x R, R ]]
  * `ad(V)` is the 6x6 adjoint of a twist V = (w, v):
        ad(V) = [[ [w]x, 0 ], [ [v]x, [w]x ]]
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Threshold below which we switch to Taylor series for the sin/cos ratio
# coefficients. Safe for both f32 and f64.
_EPS = 1e-6


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """3-vector -> 3x3 skew-symmetric matrix, [v]x u = v x u.

    Reference parity: math::makeSkewSymmetric (dart/math/Geometry.cpp).
    Supports leading batch dims.
    """
    v = jnp.asarray(v)
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def unskew(m: jnp.ndarray) -> jnp.ndarray:
    """Inverse of `skew` (antisymmetric part extraction)."""
    return jnp.stack(
        [
            0.5 * (m[..., 2, 1] - m[..., 1, 2]),
            0.5 * (m[..., 0, 2] - m[..., 2, 0]),
            0.5 * (m[..., 1, 0] - m[..., 0, 1]),
        ],
        axis=-1,
    )


def _sin_cos_coeffs(theta_sq: jnp.ndarray):
    """Numerically safe (A, B, C) with
        A = sin(t)/t, B = (1-cos(t))/t^2, C = (t - sin(t))/t^3.

    Uses Taylor expansions near 0 behind a double-`where` so both the value
    and its gradient are finite at t = 0.
    """
    small = theta_sq < _EPS
    # Safe theta^2 for the non-small branch (avoid 0 division under grad).
    ts = jnp.where(small, jnp.ones_like(theta_sq), theta_sq)
    t = jnp.sqrt(ts)
    a_big = jnp.sin(t) / t
    b_big = (1.0 - jnp.cos(t)) / ts
    c_big = (t - jnp.sin(t)) / (ts * t)
    # Taylor series in theta^2.
    a_small = 1.0 - theta_sq / 6.0 + theta_sq * theta_sq / 120.0
    b_small = 0.5 - theta_sq / 24.0 + theta_sq * theta_sq / 720.0
    c_small = 1.0 / 6.0 - theta_sq / 120.0 + theta_sq * theta_sq / 5040.0
    A = jnp.where(small, a_small, a_big)
    B = jnp.where(small, b_small, b_big)
    C = jnp.where(small, c_small, c_big)
    return A, B, C


def exp_map_rot(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues' formula: rotation vector -> rotation matrix.

    Reference parity: math::expMapRot (dart/math/Geometry.hpp:320).
    """
    w = jnp.asarray(w)
    theta_sq = jnp.sum(w * w, axis=-1)
    A, B, _ = _sin_cos_coeffs(theta_sq)
    W = skew(w)
    WW = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + A[..., None, None] * W + B[..., None, None] * WW


def log_map_rot(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> rotation vector (inverse of exp_map_rot).

    Reference parity: math::logMap (dart/math/Geometry.hpp).
    Safe at theta = 0; near theta = pi uses the diagonal-based extraction.
    """
    R = jnp.asarray(R)
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)

    # Generic branch: w = theta / (2 sin theta) * unskew(R - R^T) * 2
    antisym = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    # atan2-based angle: well-conditioned at BOTH theta=0 and theta=pi
    # (arccos loses ~4 decimal digits near pi in f32). Double-where guard:
    # ||antisym|| has a NaN gradient at 0, which happens at theta = 0 AND
    # theta = pi — mask the sqrt input in both regimes.
    asq = jnp.sum(antisym * antisym, axis=-1)
    a_degenerate = asq < 1e-24
    sin_theta_raw = 0.5 * jnp.sqrt(jnp.where(a_degenerate, 1.0, asq))
    theta_generic = jnp.arctan2(sin_theta_raw, cos_theta)
    theta_degenerate = jnp.where(
        cos_theta > 0.0, jnp.zeros_like(cos_theta), jnp.full_like(cos_theta, jnp.pi)
    )
    theta = jnp.where(a_degenerate, theta_degenerate, theta_generic)
    sin_theta = jnp.sin(theta)
    near_zero = theta < 1e-5
    near_pi = theta > jnp.pi - 1e-3

    safe_sin = jnp.where(near_zero | near_pi, jnp.ones_like(sin_theta), sin_theta)
    w_generic = (theta / (2.0 * safe_sin))[..., None] * antisym
    # Near zero: w ~ antisym/2 * (1 + theta^2/6)
    w_zero = 0.5 * antisym * (1.0 + theta[..., None] ** 2 / 6.0)

    # Near pi: R ~ I + 2 B ww^T/theta^2 - ... use (R + I)/2 diagonal trick.
    # w_i^2 = theta^2 (R_ii + 1 - cos) / (2 (1 - cos)); signs from antisym
    # (degenerate exactly at pi, where sign is arbitrary / non-unique).
    one_minus_cos = jnp.maximum(1.0 - cos_theta, 1e-12)
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    w_sq = (
        theta[..., None] ** 2
        * jnp.maximum(diag - cos_theta[..., None], 0.0)
        / one_minus_cos[..., None]
    )
    # Double-where: sqrt has an infinite gradient at 0; only evaluate it
    # where the near-pi branch is actually selected.
    w_sq_safe = jnp.where(near_pi[..., None], w_sq, 1.0)
    w_abs = jnp.sqrt(w_sq_safe)
    # Determine signs: prefer signs of antisym; fall back to off-diagonal
    # products relative to the largest component.
    sign = jnp.where(antisym >= 0.0, 1.0, -1.0)
    # Off-diagonal corrections: if antisym entries vanish at exactly pi,
    # use R_ij + R_ji terms keyed off the largest-magnitude axis.
    largest = jnp.argmax(w_abs, axis=-1)
    off = jnp.stack(
        [
            R[..., 0, 1] + R[..., 1, 0],
            R[..., 0, 2] + R[..., 2, 0],
            R[..., 1, 2] + R[..., 2, 1],
        ],
        axis=-1,
    )  # pairs (01, 02, 12)

    def _pi_signs(largest_idx, off_v, sign_v):
        s0 = jnp.where(
            largest_idx == 0,
            jnp.stack(
                [
                    jnp.ones_like(off_v[..., 0]),
                    jnp.where(off_v[..., 0] >= 0, 1.0, -1.0),
                    jnp.where(off_v[..., 1] >= 0, 1.0, -1.0),
                ],
                axis=-1,
            ),
            jnp.where(
                largest_idx[..., None] == 1,
                jnp.stack(
                    [
                        jnp.where(off_v[..., 0] >= 0, 1.0, -1.0),
                        jnp.ones_like(off_v[..., 0]),
                        jnp.where(off_v[..., 2] >= 0, 1.0, -1.0),
                    ],
                    axis=-1,
                ),
                jnp.stack(
                    [
                        jnp.where(off_v[..., 1] >= 0, 1.0, -1.0),
                        jnp.where(off_v[..., 2] >= 0, 1.0, -1.0),
                        jnp.ones_like(off_v[..., 0]),
                    ],
                    axis=-1,
                ),
            ),
        )
        return s0

    pi_sign = _pi_signs(largest, off, sign)
    w_pi = w_abs * pi_sign

    w = jnp.where(near_zero[..., None], w_zero, w_generic)
    w = jnp.where(near_pi[..., None], w_pi, w)
    return w


def exp_map(xi: jnp.ndarray) -> jnp.ndarray:
    """SE(3) exponential: twist [w; v] -> 4x4 homogeneous transform.

    Reference parity: math::expMap (dart/math/Geometry.hpp:306).
    T = (exp([w]x), V(w) v) with V the left Jacobian of SO(3).
    """
    xi = jnp.asarray(xi)
    w = xi[..., :3]
    v = xi[..., 3:]
    R = exp_map_rot(w)
    V = so3_left_jacobian(w)
    p = jnp.einsum("...ij,...j->...i", V, v)
    return rp_to_transform(R, p)


def log_map(T: jnp.ndarray) -> jnp.ndarray:
    """SE(3) log: 4x4 transform -> twist [w; v]."""
    R = T[..., :3, :3]
    p = T[..., :3, 3]
    w = log_map_rot(R)
    Vinv = so3_left_jacobian_inv(w)
    v = jnp.einsum("...ij,...j->...i", Vinv, p)
    return jnp.concatenate([w, v], axis=-1)


def so3_left_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian J_l of SO(3): d/dt exp(w + t dw) * exp(-w) = [J_l dw]x.

    J_l(w) = I + B [w]x + C [w]x^2 with B = (1-cos)/t^2, C = (t-sin)/t^3.
    """
    w = jnp.asarray(w)
    theta_sq = jnp.sum(w * w, axis=-1)
    _, B, C = _sin_cos_coeffs(theta_sq)
    W = skew(w)
    WW = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + B[..., None, None] * W + C[..., None, None] * WW


def so3_right_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """Right Jacobian J_r(w) = J_l(-w) = J_l(w)^T.

    Reference parity: math::so3RightJacobian (dart/math/Geometry.hpp:349
    family). Maps coordinate rates q-dot to body angular velocity:
    omega_body = J_r(q) q-dot.
    """
    w = jnp.asarray(w)
    theta_sq = jnp.sum(w * w, axis=-1)
    _, B, C = _sin_cos_coeffs(theta_sq)
    W = skew(w)
    WW = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - B[..., None, None] * W + C[..., None, None] * WW


def _jac_inv_coeff(theta_sq: jnp.ndarray) -> jnp.ndarray:
    """Coefficient D = (1/t^2) - (1+cos)/(2 t sin) used by J^{-1}, safe at 0."""
    small = theta_sq < _EPS
    ts = jnp.where(small, jnp.ones_like(theta_sq), theta_sq)
    t = jnp.sqrt(ts)
    d_big = 1.0 / ts - (1.0 + jnp.cos(t)) / (2.0 * t * jnp.sin(t))
    d_small = 1.0 / 12.0 + theta_sq / 720.0 + theta_sq * theta_sq / 30240.0
    return jnp.where(small, d_small, d_big)


def so3_left_jacobian_inv(w: jnp.ndarray) -> jnp.ndarray:
    """Inverse of the SO(3) left Jacobian."""
    w = jnp.asarray(w)
    theta_sq = jnp.sum(w * w, axis=-1)
    D = _jac_inv_coeff(theta_sq)
    W = skew(w)
    WW = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - 0.5 * W + D[..., None, None] * WW


def so3_right_jacobian_inv(w: jnp.ndarray) -> jnp.ndarray:
    """Inverse of the SO(3) right Jacobian."""
    w = jnp.asarray(w)
    theta_sq = jnp.sum(w * w, axis=-1)
    D = _jac_inv_coeff(theta_sq)
    W = skew(w)
    WW = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + 0.5 * W + D[..., None, None] * WW


def so3_right_jacobian_time_deriv(w: jnp.ndarray, dw: jnp.ndarray) -> jnp.ndarray:
    """d/dt J_r(w(t)) with w-dot = dw.

    Reference parity: math::so3RightJacobianTimeDeriv
    (dart/math/Geometry.hpp:349). Computed with forward-mode AD (exact).
    """
    return jax.jvp(so3_right_jacobian, (w,), (dw,))[1]


def so3_left_jacobian_time_deriv(w: jnp.ndarray, dw: jnp.ndarray) -> jnp.ndarray:
    """d/dt J_l(w(t))."""
    return jax.jvp(so3_left_jacobian, (w,), (dw,))[1]


def so3_right_jacobian_time_deriv_deriv(
    w: jnp.ndarray, dw: jnp.ndarray, index: int
) -> jnp.ndarray:
    """d/dw_index of so3_right_jacobian_time_deriv (second derivative).

    Reference parity: math::so3RightJacobianTimeDerivDeriv
    (dart/math/Geometry.hpp:349).
    """
    f = lambda ww: so3_right_jacobian_time_deriv(ww, dw)
    basis = jnp.zeros_like(w).at[index].set(1.0)
    return jax.jvp(f, (w,), (basis,))[1]


# ---------------------------------------------------------------------------
# SE(3) transforms as 4x4 homogeneous matrices
# ---------------------------------------------------------------------------


def rp_to_transform(R: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Assemble a 4x4 homogeneous transform from rotation + translation."""
    R = jnp.asarray(R)
    p = jnp.asarray(p)
    batch = jnp.broadcast_shapes(R.shape[:-2], p.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    p = jnp.broadcast_to(p, batch + (3,))
    top = jnp.concatenate([R, p[..., :, None]], axis=-1)
    bottom = jnp.zeros(batch + (1, 4), dtype=R.dtype)
    bottom = bottom.at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def transform_inv(T: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a rigid transform (uses orthogonality of R)."""
    R = T[..., :3, :3]
    p = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return rp_to_transform(Rt, -jnp.einsum("...ij,...j->...i", Rt, p))


def transform_point(T: jnp.ndarray, pt: jnp.ndarray) -> jnp.ndarray:
    """Apply rigid transform to a 3D point."""
    return (
        jnp.einsum("...ij,...j->...i", T[..., :3, :3], pt) + T[..., :3, 3]
    )


def transform_vector(T: jnp.ndarray, vec: jnp.ndarray) -> jnp.ndarray:
    """Apply only the rotation of a transform to a 3D vector."""
    return jnp.einsum("...ij,...j->...i", T[..., :3, :3], vec)


def Ad(T: jnp.ndarray) -> jnp.ndarray:
    """6x6 adjoint of an SE(3) transform, [angular; linear] ordering.

    Reference parity: math::AdT (dart/math/Geometry.hpp). Maps a twist
    expressed in frame B to frame A when T = T_AB:
        V_A = Ad(T_AB) V_B.
    """
    R = T[..., :3, :3]
    p = T[..., :3, 3]
    pR = skew(p) @ R
    zero = jnp.zeros_like(R)
    top = jnp.concatenate([R, zero], axis=-1)
    bottom = jnp.concatenate([pR, R], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def Ad_inv(T: jnp.ndarray) -> jnp.ndarray:
    """Ad(T^{-1}) without forming the inverse transform explicitly."""
    return Ad(transform_inv(T))


def dAd(T: jnp.ndarray) -> jnp.ndarray:
    """Dual adjoint (co-adjoint) mapping wrenches: F_A = dAd(T_BA) F_B.

    dAd(T) = Ad(T)^T. Reference parity: math::dAdT / dAdInvT.
    """
    return jnp.swapaxes(Ad(T), -1, -2)


def ad(V: jnp.ndarray) -> jnp.ndarray:
    """6x6 adjoint of a twist (Lie bracket matrix): ad(V) W = [V, W].

    Reference parity: math::ad (dart/math/Geometry.hpp).
    """
    w = V[..., :3]
    v = V[..., 3:]
    W = skew(w)
    Vx = skew(v)
    zero = jnp.zeros_like(W)
    top = jnp.concatenate([W, zero], axis=-1)
    bottom = jnp.concatenate([Vx, W], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def ad_apply(V: jnp.ndarray, W6: jnp.ndarray) -> jnp.ndarray:
    """ad(V) applied to a twist W (cheaper than forming the matrix)."""
    w, v = V[..., :3], V[..., 3:]
    ww, wv = W6[..., :3], W6[..., 3:]
    top = jnp.cross(w, ww)
    bottom = jnp.cross(v, ww) + jnp.cross(w, wv)
    return jnp.concatenate([top, bottom], axis=-1)


def dad_apply(V: jnp.ndarray, F: jnp.ndarray) -> jnp.ndarray:
    """Dual adjoint applied to a wrench: dad(V) F = ad(V)^T F.

    With F = [m; f]: ad(V)^T F = [ [w]x^T m + [v]x^T f ; [w]x^T f ]
                               = [ -w x m - v x f ; -w x f ].
    """
    w, v = V[..., :3], V[..., 3:]
    m, f = F[..., :3], F[..., 3:]
    top = -jnp.cross(w, m) - jnp.cross(v, f)
    bottom = -jnp.cross(w, f)
    return jnp.concatenate([top, bottom], axis=-1)


# ---------------------------------------------------------------------------
# Euler angles (reference: eulerXYZToMatrix family, Geometry.hpp:141)
# ---------------------------------------------------------------------------

_AXES = {
    "x": jnp.array([1.0, 0.0, 0.0]),
    "y": jnp.array([0.0, 1.0, 0.0]),
    "z": jnp.array([0.0, 0.0, 1.0]),
}


def _axis_rot(axis: str, angle: jnp.ndarray) -> jnp.ndarray:
    a = _AXES[axis].astype(jnp.result_type(angle, float))
    return exp_map_rot(a * angle[..., None])


def euler_to_matrix(angles: jnp.ndarray, order: str = "xyz") -> jnp.ndarray:
    """Intrinsic Euler-angle composition R = R_o0(a0) R_o1(a1) R_o2(a2).

    Reference parity: math::eulerXYZToMatrix and siblings
    (dart/math/Geometry.hpp:141 family). `order` is e.g. 'xyz', 'zyx', 'zxy'.
    """
    order = order.lower()
    R = _axis_rot(order[0], angles[..., 0])
    for i, ax in enumerate(order[1:], start=1):
        R = R @ _axis_rot(ax, angles[..., i])
    return R


def matrix_to_euler_xyz(R: jnp.ndarray) -> jnp.ndarray:
    """Extract intrinsic XYZ Euler angles from a rotation matrix."""
    # R = Rx(a) Ry(b) Rz(c); R[0,2] = sin(b)
    b = jnp.arcsin(jnp.clip(R[..., 0, 2], -1.0, 1.0))
    a = jnp.arctan2(-R[..., 1, 2], R[..., 2, 2])
    c = jnp.arctan2(-R[..., 0, 1], R[..., 0, 0])
    return jnp.stack([a, b, c], axis=-1)


def matrix_to_euler_zyx(R: jnp.ndarray) -> jnp.ndarray:
    """Extract intrinsic ZYX Euler angles from a rotation matrix."""
    # R = Rz(a) Ry(b) Rx(c); R[2,0] = -sin(b)
    b = jnp.arcsin(jnp.clip(-R[..., 2, 0], -1.0, 1.0))
    a = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    c = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    return jnp.stack([a, b, c], axis=-1)
