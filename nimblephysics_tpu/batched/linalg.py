"""Batch-minor ("structure of arrays") small-matrix algebra for TPU.

Every array here carries the world-batch as the TRAILING axis, so it lands
in the TPU lane dimension (128 lanes): a (3, B) vector batch or a
(6, 6, B) matrix batch is processed as full-width VPU ops with the small
physics dimensions in sublanes. This is the layout fix for the round-1
bottleneck: batch-MAJOR (B, 3) arrays pad 3 -> 128 lanes and waste ~40x
of both HBM bandwidth and VPU throughput.

All matrix products are expressed as broadcast multiply + reduce over the
leading (static, tiny) axes — never `dot_general` — so XLA keeps the lane
layout and fuses chains of them. Factorizations (Cholesky, triangular
solves) are unrolled over the static small dimension; each emitted op is a
(B,)-wide VPU instruction.

Design reference: the flat-array layout the reference prototypes for speed
in dart/dynamics/SimpleFeatherstone.hpp:17-75, generalized to a lane-minor
world batch.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import solve_triangular as _solve_triangular

# Above this matrix dimension, factorizations switch from the unrolled
# lane-major path (fastest for the small per-world systems the engine is
# built around, but O(n^2)-O(n^3) in emitted HLO ops) to XLA's native
# batched Cholesky / triangular-solve (O(1) ops to compile, tuned blocked
# kernels) with a layout round-trip (n, n, B) <-> (B, n, n). The unrolled
# path at n = 120 emits ~300k HLO ops and stalls XLA for tens of minutes
# (the round-4 box-stack compile blowup); the native path compiles in
# seconds and the O(n^3) FLOPs dominate the transpose cost at this size.
_NATIVE_N = 48


def mv(A, x):
    """(m, k, B) @ (k, B) -> (m, B)."""
    return jnp.sum(A * x[None, :, :], axis=1)


def mtv(A, x):
    """A^T x: (k, m, B), (k, B) -> (m, B)."""
    return jnp.sum(A * x[:, None, :], axis=0)


def mm(A, B):
    """(m, k, B-or-1) @ (k, n, B-or-1) -> (m, n, B)."""
    return jnp.sum(A[:, :, None, :] * B[None, :, :, :], axis=1)


def mtm(A, B):
    """A^T B: (k, m, *) , (k, n, *) -> (m, n, B)."""
    return jnp.sum(A[:, :, None, :] * B[:, None, :, :], axis=0)


def transpose(A):
    """Matrix transpose on the leading two axes."""
    return jnp.swapaxes(A, 0, 1)


def cross(a, b):
    """(3, B) x (3, B) -> (3, B)."""
    return jnp.stack(
        [
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        ]
    )


def cross_cols(p, A):
    """[p]x applied to every column: (3, B), (3, n, B) -> (3, n, B)."""
    return jnp.stack(
        [
            p[1, None] * A[2] - p[2, None] * A[1],
            p[2, None] * A[0] - p[0, None] * A[2],
            p[0, None] * A[1] - p[1, None] * A[0],
        ]
    )


def outer(a, b):
    """(m, B), (n, B) -> (m, n, B)."""
    return a[:, None, :] * b[None, :, :]


def dot(a, b):
    """(k, B) . (k, B) -> (B,)."""
    return jnp.sum(a * b, axis=0)


def eye(n, dtype, B: int = 1):
    return jnp.broadcast_to(np.eye(n, dtype=np.float64).astype(dtype)[..., None], (n, n, B))


def const(M, dtype):
    """Static numpy matrix/vector -> batch-minor broadcastable constant."""
    return jnp.asarray(np.asarray(M), dtype=dtype)[..., None]


def gram(U, V):
    """Batched Gram product U^T V: (n, r, B) x (n, s, B) -> (r, s, B).

    Small problems use broadcast multiply + lane-major reduce (fuses into
    neighboring elementwise chains). Large ones (n*r*s above ~32k per
    lane) switch to einsum/dot_general so XLA contracts on the MXU
    instead of materializing an (n, r, s, B) broadcast — at Atlas/
    box-stack scale (n in the thousands, r >= 30) the broadcast form is
    both a compile-size and an HBM-traffic hazard.
    """
    n, r = U.shape[0], U.shape[1]
    s = V.shape[1]
    if n * r * s <= 32768:
        return jnp.sum(U[:, :, None, :] * V[:, None, :, :], axis=0)
    return jnp.einsum("irb,isb->rsb", U, V, optimize=True)


def cholesky(A, eps: float = 0.0):
    """Lower-Cholesky of an SPD batch: (n, n, B) -> (n, n, B).

    n < _NATIVE_N: unrolled — each emitted op is (B,)-wide; total ~n^3/6
    FMAs + n sqrt/div, with `eps` guarding the pivot (A must be SPD up to
    roundoff). n >= _NATIVE_N: XLA's native batched Cholesky (callers at
    this size — the engine mass matrix and the LCP pinned solve — ridge
    their inputs, so the pivot guard is not needed).
    """
    n = A.shape[0]
    if n >= _NATIVE_N:
        return jnp.moveaxis(
            jnp.linalg.cholesky(jnp.moveaxis(A, -1, 0)), 0, -1
        )
    L: List[List] = [[None] * n for _ in range(n)]
    zero = jnp.zeros_like(A[0, 0])
    for j in range(n):
        s = A[j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(jnp.maximum(s, eps if eps else 1e-30))
        inv_d = 1.0 / d
        L[j][j] = d
        for i in range(j + 1, n):
            s = A[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d
    rows = [
        jnp.stack([L[i][j] if j <= i else zero for j in range(n)])
        for i in range(n)
    ]
    return jnp.stack(rows)


def solve_tri_lower(L, B):
    """L Y = B with L (n, n, B) lower-triangular, B (n, m, B) -> Y."""
    n = L.shape[0]
    if n >= _NATIVE_N:
        Y = _solve_triangular(
            jnp.moveaxis(L, -1, 0), jnp.moveaxis(B, -1, 0), lower=True
        )
        return jnp.moveaxis(Y, 0, -1)
    Y: List = [None] * n
    for i in range(n):
        s = B[i]
        for k in range(i):
            s = s - L[i, k][None, :] * Y[k]
        Y[i] = s / L[i, i][None, :]
    return jnp.stack(Y)


def solve_tri_upper_t(L, B):
    """L^T X = B (back substitution), B (n, m, B) -> X."""
    n = L.shape[0]
    if n >= _NATIVE_N:
        X = _solve_triangular(
            jnp.moveaxis(L, -1, 0),
            jnp.moveaxis(B, -1, 0),
            lower=True,
            trans=1,
        )
        return jnp.moveaxis(X, 0, -1)
    X: List = [None] * n
    for i in reversed(range(n)):
        s = B[i]
        for k in range(i + 1, n):
            s = s - L[k, i][None, :] * X[k]
        X[i] = s / L[i, i][None, :]
    return jnp.stack(X)


def solve_tri_lower_vec(L, b):
    """L y = b with b (n, B) -> y (n, B)."""
    return solve_tri_lower(L, b[:, None, :])[:, 0, :]


def solve_tri_upper_t_vec(L, b):
    return solve_tri_upper_t(L, b[:, None, :])[:, 0, :]


def spd_solve(A, b, eps: float = 0.0):
    """A x = b for SPD A (n, n, B), b (n, B); unrolled Cholesky solve."""
    L = cholesky(A, eps=eps)
    return solve_tri_upper_t_vec(L, solve_tri_lower_vec(L, b))


# -- Block-diagonal factorizations (multi-skeleton worlds) -----------------
#
# The world mass matrix is block-diagonal across skeletons (no generalized
# coordinate couples two trees), so an N-skeleton world factors as N small
# independent Choleskys instead of one (nv, nv) dense one: a 20-box stack
# is twenty 6x6 lane-major factorizations (on the fast unrolled path)
# rather than a 120x120 dense solve — linear compile size AND ~nv^2/36x
# fewer FLOPs. The reference reaches the same structure through per-
# skeleton Featherstone passes (dart/dynamics/Skeleton.cpp
# computeForwardDynamics — each skeleton owns its own mass matrix).


def block_cholesky(Ms: Sequence) -> List:
    """Per-block lower Cholesky: [(nd, nd, B)] -> [(nd, nd, B)].

    Zero-dof blocks (fixed/static skeletons) pass through unchanged.
    """
    return [cholesky(M) if M.shape[0] else M for M in Ms]


def block_solve_tri_lower(
    Ls: Sequence, slices: Sequence[Tuple[int, int]], B
):
    """Block-diag L Y = B; B (n, m, B) split along axis 0 by `slices`."""
    return jnp.concatenate(
        [
            solve_tri_lower(L, B[s:e]) if e > s else B[s:e]
            for L, (s, e) in zip(Ls, slices)
        ],
        axis=0,
    )


def block_solve_tri_upper_t(
    Ls: Sequence, slices: Sequence[Tuple[int, int]], B
):
    """Block-diag L^T X = B; B (n, m, B) split along axis 0 by `slices`."""
    return jnp.concatenate(
        [
            solve_tri_upper_t(L, B[s:e]) if e > s else B[s:e]
            for L, (s, e) in zip(Ls, slices)
        ],
        axis=0,
    )


def block_solve_tri_lower_vec(Ls, slices, b):
    return block_solve_tri_lower(Ls, slices, b[:, None, :])[:, 0, :]


def block_solve_tri_upper_t_vec(Ls, slices, b):
    return block_solve_tri_upper_t(Ls, slices, b[:, None, :])[:, 0, :]


def rodrigues(axis_K, axis_K2, theta, dtype):
    """Rotation about a STATIC axis: R = I + sin(t) K + (1 - cos(t)) K^2.

    axis_K / axis_K2 are static numpy (3,3) [K]x and [K]x^2 matrices;
    theta is (B,). Returns (3, 3, B).
    """
    s = jnp.sin(theta)[None, None, :]
    c1 = (1.0 - jnp.cos(theta))[None, None, :]
    I = const(np.eye(3), dtype)
    return I + const(axis_K, dtype) * s + const(axis_K2, dtype) * c1


def _taylor_thresh(dtype):
    """theta^2 cutoff for small-angle Taylor branches, dtype-aware.

    Must be LARGE enough that the generic branch's derivatives never see
    theta^4 underflow to subnormals (f32: theta ~ 1e-11 makes theta^4 ~
    1e-44 -> inf*0 -> NaN in jvp through (1-cos t)/t^2 — the box-stack
    f32 blowup), and small enough that the Taylor error is below machine
    eps. t2 < finfo.eps gives Taylor error O(t2^2) < eps^2 on both sides."""
    return float(jnp.finfo(dtype).eps)


def exp_so3(w):
    """Batched exp map: (3, B) -> (3, 3, B), AD-safe at ||w|| -> 0."""
    t2 = jnp.sum(w * w, axis=0)
    small = t2 < _taylor_thresh(w.dtype)
    t2s = jnp.where(small, 1.0, t2)
    t = jnp.sqrt(t2s)
    # sin(t)/t and (1-cos t)/t^2 with Taylor guards.
    a = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(t) / t)
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(t)) / t2s)
    K = skew(w)
    K2 = mm(K, K)
    I = jnp.broadcast_to(
        jnp.eye(3, dtype=w.dtype)[..., None], K.shape
    )
    return I + a[None, None, :] * K + b[None, None, :] * K2


def so3_right_jacobian_b(w):
    """Batched right Jacobian of SO(3): (3, B) -> (3, 3, B).

    Jr(w) = I - (1-cos t)/t^2 [w]x + (t - sin t)/t^3 [w]x^2, Taylor-guarded.
    """
    t2 = jnp.sum(w * w, axis=0)
    small = t2 < _taylor_thresh(w.dtype)
    t2s = jnp.where(small, 1.0, t2)
    t = jnp.sqrt(t2s)
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(t)) / t2s)
    c = jnp.where(small, 1.0 / 6.0 - t2 / 120.0, (t - jnp.sin(t)) / (t2s * t))
    K = skew(w)
    K2 = mm(K, K)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype)[..., None], K.shape)
    return I - b[None, None, :] * K + c[None, None, :] * K2


def log_so3(R):
    """Batched log map: (3, 3, B) -> (3, B), AD-safe near identity and pi.

    Mirrors math/lie.py log_map_rot's double-where guards. The angle
    comes from atan2(|antisym|/2, cos) — NOT arccos: the vjp of
    arccos at cos = +-1 is 0 * inf = NaN even when the downstream
    cotangent is zero (an identity rotation anywhere in the batch
    poisoned the whole backward pass — the box-stack NaN).
    """
    tr = R[0, 0] + R[1, 1] + R[2, 2]
    cos_t = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    v = jnp.stack(
        [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]]
    )
    # ||v|| = 2 sin t; guard the sqrt where sin t -> 0 (t = 0 AND t = pi).
    asq = jnp.sum(v * v, axis=0)
    a_degen = asq < 4.0 * _taylor_thresh(R.dtype)
    sin_raw = 0.5 * jnp.sqrt(jnp.where(a_degen, 1.0, asq))
    t_gen = jnp.arctan2(sin_raw, cos_t)
    t_degen = jnp.where(cos_t > 0.0, 0.0, jnp.pi)
    t = jnp.where(a_degen, t_degen, t_gen)
    sin_t = jnp.sin(t)
    small = jnp.abs(sin_t) < 1e-6
    near_pi = cos_t < -1.0 + 1e-6
    # Generic branch: w = t / (2 sin t) * v.
    coef = jnp.where(small, 0.5 + t * t / 12.0, t / jnp.where(small, 1.0, 2.0 * sin_t))
    w_gen = coef[None, :] * v
    # Near pi: w = pi * unit column of (R + I)/2 diagonal-dominant axis.
    Bp = (R + jnp.eye(3, dtype=R.dtype)[..., None]) * 0.5
    d = jnp.stack([Bp[0, 0], Bp[1, 1], Bp[2, 2]])
    k = jnp.argmax(d, axis=0)
    axis_cols = jnp.stack([Bp[:, 0], Bp[:, 1], Bp[:, 2]])  # (3cols, 3, B)
    col = jnp.take_along_axis(
        axis_cols, k[None, None, :].repeat(3, axis=1), axis=0
    )[0]
    nrm = jnp.sqrt(jnp.maximum(jnp.sum(col * col, axis=0), 1e-30))
    w_pi = (t[None, :]) * col / nrm[None, :]
    sgn = jnp.where(
        jnp.sum(w_pi * v, axis=0) < 0.0, -1.0, 1.0
    )
    w_pi = w_pi * sgn[None, :]
    return jnp.where(near_pi[None, :], w_pi, w_gen)


def skew(w):
    """(3, B) -> (3, 3, B)."""
    z = jnp.zeros_like(w[0])
    return jnp.stack(
        [
            jnp.stack([z, -w[2], w[1]]),
            jnp.stack([w[2], z, -w[0]]),
            jnp.stack([-w[1], w[0], z]),
        ]
    )


def ad_apply(V, U):
    """Spatial cross product ad_V U for [w; v] twists: (6, B) each."""
    w1, v1 = V[:3], V[3:]
    w2, v2 = U[:3], U[3:]
    return jnp.concatenate([cross(w1, w2), cross(v1, w2) + cross(w1, v2)])


def dad_apply(V, F):
    """Dual spatial cross ad(V)^T F for wrenches [m; f]: (6, B) each.

    Matches math/lie.dad_apply: dad(V, F) = [-w x m - v x f; -w x f].
    """
    w, v = V[:3], V[3:]
    m, f = F[:3], F[3:]
    return jnp.concatenate([-cross(w, m) - cross(v, f), -cross(w, f)])
