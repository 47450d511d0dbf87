"""Batched boxed LCP: fixed-iteration PGS + differentiable active-set polish.

TPU-native re-design of the reference contact solve
(dart/constraint/BoxedLcpConstraintSolver.cpp: buildLcpInputs:190,
solveLcp:352 — Dantzig pivoting with PGS/CFM fallbacks) and of its gradient
machinery (dart/neural/ConstrainedGroupGradientMatrices.cpp:482
`constructMatrices` CLAMPING / UPPER_BOUND / NOT_CLAMPING classification;
dart/neural/BackpropSnapshot.cpp:868-923 dQ formulas). Pivoting solvers are
branch-heavy and hostile to jit/vmap; instead the solve is staged so the
*entire* gradient path is ordinary JAX AD:

  1. PGS (fixed iterations, under stop_gradient): find the active set of
       w = A z - b,  0 <= z_n,  |z_f| <= mu z_{findex}.
  2. Classify rows CLAMPING / UPPER_BOUND / NOT_CLAMPING from the PGS
     solution (discrete masks, stop_gradient) with the reference's
     tie-breaks: zero-force zero-velocity rows stay CLAMPING so static
     friction remains differentiable; near-zero A columns are NOT_CLAMPING
     (ConstrainedGroupGradientMatrices.cpp:494-611).
  3. Polish: exactly re-solve the pinned clamping subsystem
       Q z_C = b_C,   Q = (A P)|_C,
     with P = identity on CLAMPING rows + signed-mu coupling on UPPER_BOUND
     friction rows (the reference's E matrix), via RIDGE-regularized least
     squares — redundant coplanar contacts make Q singular, and the
     min-norm solution is the idiomatic analog of the reference's
     `opportunisticallyStandardizeResults` (ConstrainedGroupGradient
     Matrices.hpp:103-115: "least-squares-minimal LCP solution for
     determinism"). This step is PLAIN DIFFERENTIABLE JAX: jax.grad through
     it IS the active-set implicit derivative (BackpropSnapshot math),
     consistent with the forward value to machine precision, and it
     furnishes mu-gradients for free (beyond the reference).
  4. Accept the polished solution only where it satisfies the boxed LCP;
     otherwise keep the (gradient-stopped) PGS iterate — matching the
     reference's guard that standardization never degrade the solution.

Everything is masked arithmetic with static shapes: classification under
vmap is per-world boolean masks, and the dense solves are small batched
matmuls — exactly what the MXU wants.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True, eq=False)  # identity hash: jit-static
class LcpMeta:
    """Static row metadata for one world's constraint block.

    findex[i] = index of the normal row bounding friction row i, else -1
    (reference: ConstraintInfo::findex, ContactConstraint.cpp:385-389).
    """

    findex: np.ndarray  # (n,) int32
    is_friction: np.ndarray  # (n,) bool
    iterations: int = 32
    tol: float = 1e-9  # classification tolerance
    ridge: float = 1e-10  # relative Tikhonov regularization of the polish
    refine_rounds: int = 4  # active-set refinement rounds (masked Dantzig)

    @property
    def n(self) -> int:
        return len(self.findex)


def _pgs(meta: LcpMeta, A: jnp.ndarray, b: jnp.ndarray, mu: jnp.ndarray,
         z0: jnp.ndarray) -> jnp.ndarray:
    """Fixed-iteration projected Gauss-Seidel (reference fallback solver:
    PgsBoxedLcpSolver — here the primary, since fixed iteration counts map
    to jit). Rows unroll statically; sweeps run under lax.scan."""
    n = meta.n
    diag = jnp.diagonal(A, axis1=-2, axis2=-1)
    inv_diag = jnp.where(diag > 1e-12, 1.0 / jnp.maximum(diag, 1e-12), 0.0)
    isf = meta.is_friction
    fidx = meta.findex

    def sweep(z, _):
        for i in range(n):
            r = b[..., i] - jnp.einsum("...j,...j->...", A[..., i, :], z)
            zi = z[..., i] + r * inv_diag[..., i]
            if isf[i]:
                bound = mu[..., i] * z[..., fidx[i]]
                zi = jnp.clip(zi, -bound, bound)
            else:
                zi = jnp.maximum(zi, 0.0)
            z = z.at[..., i].set(zi)
        return z, None

    z, _ = jax.lax.scan(sweep, z0, None, length=meta.iterations)
    return z


def _classify(meta: LcpMeta, A, b, mu, z):
    """CLAMPING / UPPER_BOUND masks from a solved LCP (discrete)."""
    tol = meta.tol
    w = jnp.einsum("...ij,...j->...i", A, z) - b
    isf = jnp.asarray(meta.is_friction)
    fidx = jnp.asarray(np.maximum(meta.findex, 0))
    bound = mu * z[..., fidx]

    col_norm = jnp.linalg.norm(A, axis=-2)
    degenerate = col_norm < 1e-9

    # Normal / joint-limit rows: active if pushing, or the zero/zero
    # tie-break (reference :507-513).
    n_clamp = (z > tol) | (jnp.abs(w) < tol)
    # Friction rows.
    no_normal = bound <= tol
    at_bound = (~no_normal) & (jnp.abs(z) >= bound - tol)
    f_clamp = (~no_normal) & (~at_bound)

    clamping = jnp.where(isf, f_clamp, n_clamp) & ~degenerate
    upper = jnp.where(isf, at_bound, jnp.zeros_like(at_bound)) & ~degenerate
    return clamping, upper


def _build_P(meta: LcpMeta, mu, sign_u, clamping, upper, dtype):
    """P maps clamping impulses to all rows: identity on C, signed-mu
    coupling on UB friction rows (the reference's E matrix)."""
    n = meta.n
    c = clamping.astype(dtype)
    batch = c.shape[:-1]
    P = jnp.zeros(batch + (n, n), dtype=dtype)
    idx = jnp.arange(n)
    P = P.at[..., idx, idx].set(c)
    fidx = jnp.asarray(np.maximum(meta.findex, 0))
    coeff = jnp.where(upper, sign_u * mu, jnp.zeros_like(mu))
    norm_clamp = clamping.astype(dtype)[..., fidx]
    P = P.at[..., idx, fidx].add(coeff * norm_clamp)
    return P


def _ridge_solve(meta: LcpMeta, M, rhs):
    """Least-squares solve of M x = rhs via Tikhonov-regularized normal
    equations (differentiable; min-norm-ish for singular M)."""
    n = meta.n
    MtM = jnp.swapaxes(M, -1, -2) @ M
    scale = jnp.trace(MtM, axis1=-2, axis2=-1) / n + 1.0
    eps = meta.ridge * scale
    reg = MtM + eps[..., None, None] * jnp.eye(n, dtype=M.dtype)
    Mtr = jnp.einsum("...ji,...j->...i", M, rhs)
    cho = jax.scipy.linalg.cho_factor(reg)
    return jax.scipy.linalg.cho_solve(cho, Mtr)


def _lcp_valid(meta: LcpMeta, A, b, mu, z):
    """Is z a valid boxed-LCP solution (within tolerance)?"""
    w = jnp.einsum("...ij,...j->...i", A, z) - b
    isf = jnp.asarray(meta.is_friction)
    fidx = jnp.asarray(np.maximum(meta.findex, 0))
    bound = mu * z[..., fidx]
    tol = 1e-7
    ok_n = jnp.where(isf, True, (z >= -tol) & (w >= -10 * tol))
    ok_f = jnp.where(isf, jnp.abs(z) <= bound + tol, True)
    finite = jnp.all(jnp.isfinite(z), axis=-1)
    return jnp.all(ok_n & ok_f, axis=-1) & finite


def _pinned_solve(meta: LcpMeta, A, b, mu, clamping, upper, sign_u):
    """Exactly solve the pinned active-set system; returns z over all rows."""
    dtype = A.dtype
    n = meta.n
    S = clamping.astype(dtype)
    P = _build_P(meta, mu, sign_u, clamping, upper, dtype)
    eye = jnp.eye(n, dtype=dtype)
    M = S[..., :, None] * (A @ P) * S[..., None, :] + (
        eye - S[..., :, None] * eye
    )
    zc = _ridge_solve(meta, M, S * b)
    return jnp.einsum("...ij,...j->...i", P, zc)


def _refine_masks(meta: LcpMeta, A, b, mu, clamping, upper, sign_u):
    """One masked-Dantzig refinement round: exact-solve the current active
    set, then fix misclassifications (negative pinned normals leave C,
    violated complementarity joins C, friction beyond its cone moves to
    UPPER_BOUND, UB rows pulling inward return to CLAMPING).

    The reference resolves these cases inside Dantzig pivoting + the
    documented tie-breaks; here they are data-parallel mask updates.
    """
    tol = meta.tol
    z = _pinned_solve(meta, A, b, mu, clamping, upper, sign_u)
    w = jnp.einsum("...ij,...j->...i", A, z) - b
    isf = jnp.asarray(meta.is_friction)
    fidx = jnp.asarray(np.maximum(meta.findex, 0))
    bound = mu * jnp.maximum(z[..., fidx], 0.0)
    degenerate = jnp.linalg.norm(A, axis=-2) < 1e-9

    # Normal / limit rows.
    n_clamp = jnp.where(
        clamping,
        z > -tol,  # stay unless the pinned impulse went negative
        w < -tol,  # join if the gap rate is being violated
    )
    # Friction rows.
    no_normal = bound <= tol
    over = jnp.abs(z) > bound + tol
    new_sign = jnp.where(jnp.abs(z) > tol, jnp.sign(z), sign_u)
    # UB rows: at +bound the complementary velocity must push outward
    # (w <= tol); if it pulls inward the row returns to CLAMPING.
    ub_consistent = jnp.where(sign_u > 0, w <= tol, w >= -tol)
    f_clamp = jnp.where(
        upper,
        ~ub_consistent & ~no_normal,
        ~over & ~no_normal,
    )
    f_upper = jnp.where(
        upper,
        ub_consistent & ~no_normal,
        over & ~no_normal,
    )
    clamping2 = jnp.where(isf, f_clamp, n_clamp) & ~degenerate
    upper2 = jnp.where(isf, f_upper, jnp.zeros_like(f_upper)) & ~degenerate
    return clamping2, upper2, new_sign


def boxed_lcp(meta: LcpMeta, A, b, mu, z_warm):
    """Solve the boxed LCP; jax.grad through this IS the active-set
    implicit derivative (see module docstring). Leading batch dims OK.

    Pipeline: PGS warm solve -> classify -> K rounds of masked-Dantzig
    active-set refinement (all under stop_gradient) -> one final
    differentiable pinned solve -> accept iff it satisfies the LCP.

    Args:
      A (n, n): J M^-1 J^T (+ cfm I); b (n,): -J v_pre + bounce terms;
      mu (n,): per-row friction coefficient (friction rows only);
      z_warm (n,): warm start (reference: cached LCP solution,
      World.hpp:690-698).
    Returns z (n,) impulses.
    """
    sg = jax.lax.stop_gradient
    As, bs, mus = sg(A), sg(b), sg(mu)
    z_pgs = _pgs(meta, As, bs, mus, sg(z_warm))
    clamping, upper = _classify(meta, As, bs, mus, z_pgs)
    sign_u = jnp.sign(z_pgs)
    for _ in range(meta.refine_rounds):
        clamping, upper, sign_u = _refine_masks(
            meta, As, bs, mus, clamping, upper, sign_u
        )

    # Final solve under gradient with the (discrete, stopped) active set.
    z_pol = _pinned_solve(meta, A, b, mu, clamping, upper, sign_u)

    valid = _lcp_valid(meta, As, bs, mus, sg(z_pol))
    return jnp.where(valid[..., None], z_pol, z_pgs)
