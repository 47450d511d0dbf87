"""Batched boxed LCP in factored (low-rank) form, with a differentiable
active-set polish.

TPU-native re-design of the reference contact solve
(dart/constraint/BoxedLcpConstraintSolver.cpp: buildLcpInputs:190,
solveLcp:352 — Dantzig pivoting with PGS/CFM fallbacks) and of its gradient
machinery (dart/neural/ConstrainedGroupGradientMatrices.cpp:482
`constructMatrices` CLAMPING / UPPER_BOUND / NOT_CLAMPING classification;
dart/neural/BackpropSnapshot.cpp:868-923 dQ formulas).

Key TPU design decisions:

  * FACTORED OPERATOR. The Delassus matrix A = J M^-1 J^T has rank <= nv
    (the world's dof count), so the solver never materializes the n x n
    matrix: it works with F = J L^-T (n x r, M = L L^T), and A y =
    F (F^T y) + cfm y. For a half-cheetah (n = 123 rows, r = 9) this cuts
    per-world memory from n^2 to n*r — HBM bandwidth is the TPU
    bottleneck, and the n^2 form dominated the whole step cost.
  * The iterative seed is APGD (one pair of skinny matvecs per iteration,
    MXU-friendly) or row-sequential PGS kept O(n*r) per sweep via the
    running projection u = F^T z.
  * Active-set polish: classify rows from the seed solution (discrete,
    stop_gradient) with the reference's tie-breaks, run a few rounds of
    masked-Dantzig refinement, then exactly re-solve the pinned clamping
    system — GATHERED to a static K x K block (clamping count is
    rank-bounded) via one-hot matmuls, ridge-regularized for redundant
    coplanar manifolds (the analog of the reference's least-squares
    `opportunisticallyStandardizeResults`). The final solve is plain
    differentiable JAX: jax.grad through it IS the active-set implicit
    derivative (the BackpropSnapshot math), exactly consistent with the
    forward value, with mu-gradients for free.
  * A solution is accepted only if it satisfies the boxed LCP; otherwise
    the (gradient-stopped) seed iterate is kept.

Everything is masked arithmetic with static shapes — classification under
vmap is per-world boolean masks, and all dense algebra is small batched
matmuls.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

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
    # Constant box bounds per row (used by servo/mimic motor rows,
    # reference: ServoMotorConstraint force limits). Friction rows ignore
    # these (their box is +-mu z_n); normal rows default to [0, inf).
    lo_const: Optional[np.ndarray] = None  # (n,)
    hi_const: Optional[np.ndarray] = None  # (n,)
    iterations: int = 64
    tol: float = 1e-9  # classification tolerance (floored per dtype)
    ridge: float = 1e-10  # relative Tikhonov regularization (floored per dtype)
    refine_rounds: int = 3  # active-set refinement rounds (masked Dantzig)
    # Projected Gauss-Seidel polish sweeps run on the iterative seed AFTER
    # APGD (reference: the PGS secondary solver,
    # BoxedLcpConstraintSolver.cpp:550-570). APGD alone plateaus on
    # wedged friction-coupled islands (the findex coupling makes the
    # problem a quasi-LCP where fixed-point GS converges but accelerated
    # gradients stall): measured on 4096 half-cheetahs, 16 sweeps take
    # the "seed fails validity when the pinned solve also failed" count
    # from 62 worlds/step to 4.
    seed_pgs_sweeps: int = 16
    k_active: int = 0  # gathered active-set size (0 = full n); set to
    # ~2*nv+8 by the assembler — clamping count is rank-bounded
    solver: str = "apgd"  # iterative seed solver: "apgd" (batched matvecs
    # -> MXU) or "pgs" (row sweeps, O(n r) via running u = F^T z)

    @property
    def n(self) -> int:
        return len(self.findex)


def subset_meta(meta: LcpMeta, rows: np.ndarray, nv: int) -> LcpMeta:
    """Restrict a row plan to `rows` (a static constraint island).

    Friction rows must travel with their bounding normal row (they share a
    contact, hence a skeleton pair, hence an island), so findex remaps
    cleanly. nv = the island's dof count (re-sizes k_active). Reference
    analog: ConstraintSolver's per-island ConstrainedGroups each get their
    own LCP (ConstraintSolver.cpp:723-793) — here the grouping is the
    plan-time connected component over the POTENTIAL pair graph.
    """
    rows = np.asarray(rows, dtype=np.int64)
    pos = np.full(meta.n, -1, dtype=np.int64)
    pos[rows] = np.arange(len(rows))
    fi = meta.findex[rows]
    fi_new = np.where(fi >= 0, pos[np.maximum(fi, 0)], -1).astype(np.int32)
    if np.any((fi >= 0) & (fi_new < 0)):
        raise ValueError("friction row split from its normal row")
    return dataclasses.replace(
        meta,
        findex=fi_new,
        is_friction=meta.is_friction[rows],
        lo_const=None if meta.lo_const is None else meta.lo_const[rows],
        hi_const=None if meta.hi_const is None else meta.hi_const[rows],
        k_active=min(len(rows), max(16, 2 * nv + 8)),
    )


def _dtype_tol(meta: LcpMeta, dtype) -> float:
    eps = float(jnp.finfo(dtype).eps)
    return max(meta.tol, 100.0 * eps)


def _dtype_ridge(meta: LcpMeta, dtype) -> float:
    eps = float(jnp.finfo(dtype).eps)
    return max(meta.ridge, 50.0 * eps)


def _const_bounds(meta: LcpMeta, dtype):
    n = meta.n
    lo = (
        jnp.asarray(meta.lo_const, dtype=dtype)
        if meta.lo_const is not None
        else jnp.zeros(n, dtype=dtype)
    )
    hi = (
        jnp.asarray(meta.hi_const, dtype=dtype)
        if meta.hi_const is not None
        else jnp.full(n, jnp.inf, dtype=dtype)
    )
    return lo, hi


def _Av(F, cfm, y):
    """A y = F (F^T y) + cfm y without materializing A."""
    u = jnp.einsum("...nr,...n->...r", F, y)
    return jnp.einsum("...nr,...r->...n", F, u) + cfm * y


def _diag_A(F, cfm):
    return jnp.sum(F * F, axis=-1) + cfm


def _pgs(meta: LcpMeta, F, cfm, b, mu, z0):
    """Row-sequential projected Gauss-Seidel on the factored operator:
    maintains u = F^T z so each row update is O(r)
    (reference fallback solver: PgsBoxedLcpSolver)."""
    n = meta.n
    diag = _diag_A(F, cfm)
    inv_diag = jnp.where(diag > 1e-12, 1.0 / jnp.maximum(diag, 1e-12), 0.0)
    isf = meta.is_friction
    fidx = meta.findex
    lo_c, hi_c = _const_bounds(meta, F.dtype)

    def sweep(carry, _):
        z, u = carry
        for i in range(n):
            Fi = F[..., i, :]
            Az_i = jnp.einsum("...r,...r->...", Fi, u) + cfm * z[..., i]
            zi = z[..., i] + (b[..., i] - Az_i) * inv_diag[..., i]
            if isf[i]:
                bound = mu[..., i] * z[..., fidx[i]]
                zi = jnp.clip(zi, -bound, bound)
            else:
                zi = jnp.clip(zi, lo_c[i], hi_c[i])
            u = u + Fi * (zi - z[..., i])[..., None]
            z = z.at[..., i].set(zi)
        return (z, u), None

    u0 = jnp.einsum("...nr,...n->...r", F, z0)
    (z, _), _ = jax.lax.scan(sweep, (z0, u0), None, length=meta.iterations)
    return z


def _apgd(meta: LcpMeta, F, cfm, b, mu, z0):
    """Accelerated projected gradient (Nesterov) on 0.5 z'Az - b'z over the
    boxed set; two skinny matvecs per iteration. Only needs to identify
    the active set — the refinement supplies the exact solution."""
    isf = jnp.asarray(meta.is_friction)
    fidx = jnp.asarray(np.maximum(meta.findex, 0))

    # Spectral-norm upper bound via a few power iterations (cheap skinny
    # matvecs). AD-safe at F = 0 (no active contacts): norms guarded with
    # the double-where trick, step floored by the diagonal scale.
    v = jnp.ones_like(b)
    for _ in range(6):
        v2 = _Av(F, cfm, v)
        n2 = jnp.sum(v2 * v2, axis=-1, keepdims=True)
        zero = n2 < 1e-24
        v = jnp.where(zero, 0.0, v2 / jnp.sqrt(jnp.where(zero, 1.0, n2)))
    ray = jnp.einsum("...n,...n->...", v, _Av(F, cfm, v))
    L = jnp.maximum(ray * 1.05, jnp.max(_diag_A(F, cfm), axis=-1)) + 1e-9
    step = 1.0 / L

    lo_c, hi_c = _const_bounds(meta, F.dtype)

    def proj(y):
        zn = jnp.where(isf, y, jnp.clip(y, lo_c, hi_c))
        bound = mu * jnp.maximum(zn[..., fidx], 0.0)
        return jnp.where(isf, jnp.clip(y, -bound, bound), zn)

    def body(carry, _):
        z, z_prev, t = carry
        beta = (t - 1.0) / (t + 2.0)
        y = z + beta * (z - z_prev)
        g = _Av(F, cfm, y) - b
        z_new = proj(y - step[..., None] * g)
        return (z_new, z, t + 1.0), None

    (z, _, _), _ = jax.lax.scan(
        body, (z0, z0, jnp.zeros(b.shape[:-1], dtype=b.dtype)), None,
        length=meta.iterations,
    )
    return z


def _classify(meta: LcpMeta, F, cfm, b, mu, z):
    """CLAMPING / UPPER_BOUND / fixed-bound masks from a solved LCP
    (discrete), with the reference tie-breaks (zero/zero -> CLAMPING
    :507-513; degenerate diagonal -> NOT_CLAMPING :564-580). Non-friction
    rows may carry constant box bounds (servo/mimic motors); rows pinned at
    a finite bound are returned in `at_hi` / implied at-lo."""
    tol = _dtype_tol(meta, z.dtype)
    w = _Av(F, cfm, z) - b
    isf = jnp.asarray(meta.is_friction)
    fidx = jnp.asarray(np.maximum(meta.findex, 0))
    bound = mu * z[..., fidx]
    degenerate = _diag_A(F, cfm) < 1e-9
    lo_c, hi_c = _const_bounds(meta, z.dtype)

    inside = (z > lo_c + tol) & (z < hi_c - tol)
    n_clamp = inside | (jnp.abs(w) < tol)
    at_hi = (~n_clamp) & (z >= hi_c - tol) & jnp.isfinite(hi_c)
    no_normal = bound <= tol
    at_bound = (~no_normal) & (jnp.abs(z) >= bound - tol)
    f_clamp = (~no_normal) & (~at_bound)

    clamping = jnp.where(isf, f_clamp, n_clamp) & ~degenerate
    upper = jnp.where(isf, at_bound, jnp.zeros_like(at_bound)) & ~degenerate
    at_hi = jnp.where(isf, False, at_hi) & ~degenerate
    return clamping, upper, at_hi


def _ridge_solve(meta: LcpMeta, M, rhs, polish: bool = True):
    """Least-squares solve of M x = rhs via Tikhonov-regularized normal
    equations (differentiable; min-norm-ish for singular M — the analog of
    the reference's least-squares standardization).

    polish=True adds one iterative-refinement step (cancels the ridge bias
    so complementarity residuals stay at solver precision); intermediate
    active-set refinement rounds skip it — only the classification signs
    matter there."""
    k = M.shape[-1]
    MtM = jnp.swapaxes(M, -1, -2) @ M
    scale = jnp.trace(MtM, axis1=-2, axis2=-1) / k + 1.0
    eps = _dtype_ridge(meta, M.dtype) * scale
    reg = MtM + eps[..., None, None] * jnp.eye(k, dtype=M.dtype)
    Mtr = jnp.einsum("...ji,...j->...i", M, rhs)
    cho = jax.scipy.linalg.cho_factor(reg)
    x = jax.scipy.linalg.cho_solve(cho, Mtr)
    if not polish:
        return x
    r = Mtr - jnp.einsum(
        "...ji,...jk,...k->...i", M, M, x
    )
    return x + jax.scipy.linalg.cho_solve(cho, r)


def _lcp_valid(meta: LcpMeta, F, cfm, b, mu, z):
    """Is z a valid boxed-LCP solution? Tolerances are SCALE-AWARE: the
    residual w carries the ridge bias of the standardized solve, which
    grows with the impulse/velocity magnitudes — an absolute threshold
    wrongly rejects heavy resting stacks (and silently kills their
    gradients via the seed fallback)."""
    w = _Av(F, cfm, z) - b
    isf = jnp.asarray(meta.is_friction)
    fidx = jnp.asarray(np.maximum(meta.findex, 0))
    bound = mu * z[..., fidx]
    tol = max(1e-7, 1000.0 * float(jnp.finfo(z.dtype).eps))
    scale_w = 1.0 + jnp.max(jnp.abs(b), axis=-1, keepdims=True)
    scale_z = 1.0 + jnp.max(jnp.abs(z), axis=-1, keepdims=True)
    lo_c, hi_c = _const_bounds(meta, z.dtype)
    near_hi = (z >= hi_c - tol * scale_z) & jnp.isfinite(hi_c)
    ok_n = jnp.where(
        isf,
        True,
        (z >= lo_c - tol * scale_z)
        & (z <= hi_c + tol * scale_z)
        & (near_hi | (w >= -10 * tol * scale_w)),
    )
    ok_f = jnp.where(isf, jnp.abs(z) <= bound + tol * scale_z, True)
    finite = jnp.all(jnp.isfinite(z), axis=-1)
    return jnp.all(ok_n & ok_f, axis=-1) & finite


def _pinned_solve(meta: LcpMeta, F, cfm, b, mu, clamping, upper, sign_u,
                  at_hi=None, polish: bool = True):
    """Exactly solve the pinned active-set system; returns z over all rows.

    With P = diag(c) + E (UB friction coupled to its normal row by
    signed mu), the clamping system is (A P)|_C z_C = b_C. In factored
    form A P = F H^T + cfm P with H = P^T F, and the system is GATHERED
    to a static K x K block (K = meta.k_active; clamping count is bounded
    by rank(A) <= r) via one-hot matmuls — MXU-friendly, no n x n objects.
    """
    dtype = F.dtype
    n = meta.n
    r = F.shape[-1]
    K = min(meta.k_active, n) if meta.k_active else n
    S = clamping.astype(dtype)
    fidx_np = np.maximum(meta.findex, 0)
    fidx = jnp.asarray(fidx_np)
    coeff = jnp.where(upper, sign_u * mu, jnp.zeros_like(mu)) * S[..., fidx]

    # H = P^T F: rows combine as H_j = c_j F_j + sum_{u: findex(u)=j}
    # coeff_u F_u. The assembler's fixed layout (normal at 3c, frictions
    # at 3c+1/3c+2 with findex = 3c) makes this static slicing — no TPU
    # scatters. Fallback: one-hot matmul with a static coupling matrix.
    H = F * S[..., :, None]
    fr = np.where(meta.findex >= 0)[0]
    if len(fr) > 0:
        C3 = int(fr.max()) + 1  # contact block size (3 * num_contacts)
        contact_layout = (
            C3 % 3 == 0
            and np.array_equal(fr, np.setdiff1d(np.arange(C3), np.arange(0, C3, 3)))
            and np.array_equal(fidx_np[fr].reshape(-1, 2).T[0], np.arange(0, C3, 3))
            and np.array_equal(fidx_np[fr].reshape(-1, 2).T[1], np.arange(0, C3, 3))
        )
        contrib = F * coeff[..., :, None]
        if contact_layout:
            Hn = (
                H[..., 0:C3:3, :]
                + contrib[..., 1:C3:3, :]
                + contrib[..., 2:C3:3, :]
            )
            Hc = jnp.stack(
                [Hn, H[..., 1:C3:3, :], H[..., 2:C3:3, :]], axis=-2
            ).reshape(H.shape[:-2] + (C3, r))
            H = jnp.concatenate([Hc, H[..., C3:, :]], axis=-2)
        else:
            E0 = np.zeros((n, n))
            E0[fr, fidx_np[fr]] = 1.0  # static coupling matrix
            H = H + jnp.einsum(
                "un,...ur->...nr", jnp.asarray(E0, dtype=dtype), contrib
            )

    # Rows pinned at finite constant bounds contribute a FIXED impulse
    # (servo/mimic motor rows at their force limits): shift the rhs by
    # A z_fixed and add z_fixed back at the end. Zero-cost when the meta
    # declares no constant bounds.
    has_boxes = meta.lo_const is not None or meta.hi_const is not None
    if has_boxes and at_hi is not None:
        lo_c, hi_c = _const_bounds(meta, dtype)
        lo_safe = jnp.where(jnp.isfinite(lo_c), lo_c, 0.0)
        hi_safe = jnp.where(jnp.isfinite(hi_c), hi_c, 0.0)
        isf_m = jnp.asarray(meta.is_friction)
        not_c = (~clamping) & (~isf_m)
        z_fixed = jnp.where(
            not_c, jnp.where(at_hi, hi_safe, lo_safe), 0.0
        )
        b_eff = b - _Av(F, cfm, z_fixed)
    else:
        z_fixed = None
        b_eff = b

    def apply_P(zc):
        out = S * zc + coeff * zc[..., fidx]
        if z_fixed is not None:
            out = out + z_fixed
        return out

    # Gather clamping rows first into a K-row system. top_k instead of a
    # full argsort (TPU sorts are slow); score = clamping-major with
    # ascending-index tie-break keeps the selection stable.
    idx = jnp.arange(n, dtype=dtype)
    score = clamping.astype(dtype) * (2.0 * n) - idx
    _, sel = jax.lax.top_k(score, K)
    G = jax.nn.one_hot(sel, n, dtype=dtype)  # (..., K, n)
    m = jnp.take_along_axis(S, sel, axis=-1)  # (..., K)
    GF = G @ F  # (..., K, r)
    GH = G @ H  # (..., K, r)
    Q = GF @ jnp.swapaxes(GH, -1, -2)  # (..., K, K) = (G A P G^T) - cfm part
    if not isinstance(cfm, (int, float)) or cfm != 0.0:
        # cfm * (G P G^T): UB rows are never in the selection (they are
        # not clamping), so the gathered P block is diag(c)|sel.
        Q = Q + cfm * jnp.eye(K, dtype=dtype) * m[..., :, None]
    eyeK = jnp.eye(K, dtype=dtype)
    Qm = m[..., :, None] * Q * m[..., None, :] + (
        eyeK - m[..., :, None] * eyeK
    )
    rhs = jnp.einsum("...kn,...n->...k", G, b_eff) * m
    zcK = _ridge_solve(meta, Qm, rhs, polish=polish)
    z_C = jnp.einsum("...k,...kn->...n", zcK * m, G)
    return apply_P(z_C)


def _refine_masks(meta: LcpMeta, F, cfm, b, mu, clamping, upper, sign_u,
                  at_hi):
    """One masked-Dantzig refinement round: exact-solve the current active
    set, then fix misclassifications (negative pinned normals leave C,
    violated complementarity joins C, friction beyond its cone moves to
    UPPER_BOUND, UB rows pulling inward return to CLAMPING). The reference
    resolves these inside Dantzig pivoting; here they are data-parallel
    mask updates."""
    tol = _dtype_tol(meta, F.dtype)
    # Cheap solve: intermediate rounds only need classification signs.
    z = _pinned_solve(meta, F, cfm, b, mu, clamping, upper, sign_u,
                      at_hi=at_hi, polish=False)
    w = _Av(F, cfm, z) - b
    isf = jnp.asarray(meta.is_friction)
    fidx = jnp.asarray(np.maximum(meta.findex, 0))
    bound = mu * jnp.maximum(z[..., fidx], 0.0)
    degenerate = _diag_A(F, cfm) < 1e-9
    lo_c, hi_c = _const_bounds(meta, F.dtype)

    went_over = clamping & (z > hi_c + tol) & jnp.isfinite(hi_c)
    n_clamp = jnp.where(
        clamping,
        (z > lo_c - tol) & ~went_over,  # leave C if past either bound
        # join C if the complementarity sign is violated at the bound
        jnp.where(at_hi, w > tol, w < -tol),
    )
    at_hi2 = jnp.where(
        clamping,
        went_over,  # clamped row that blew past its upper limit
        jnp.where(at_hi, w <= tol, False),
    ) & jnp.isfinite(hi_c)
    no_normal = bound <= tol
    over = jnp.abs(z) > bound + tol
    new_sign = jnp.where(jnp.abs(z) > tol, jnp.sign(z), sign_u)
    ub_consistent = jnp.where(sign_u > 0, w <= tol, w >= -tol)
    f_clamp = jnp.where(upper, ~ub_consistent & ~no_normal, ~over & ~no_normal)
    f_upper = jnp.where(upper, ub_consistent & ~no_normal, over & ~no_normal)
    clamping2 = jnp.where(isf, f_clamp, n_clamp) & ~degenerate
    upper2 = jnp.where(isf, f_upper, jnp.zeros_like(f_upper)) & ~degenerate
    at_hi2 = jnp.where(isf, False, at_hi2) & ~degenerate
    return clamping2, upper2, new_sign, at_hi2


def boxed_lcp(meta: LcpMeta, F, b, mu, z_warm, cfm=0.0, fallback_cfm=1e-4):
    """Solve the boxed LCP with A = F F^T + cfm I (factored Delassus).

    jax.grad through this IS the active-set implicit derivative (module
    docstring). Leading batch dims allowed on all array args.

    Failure ladder (reference parity: BoxedLcpConstraintSolver.cpp:392-646
    Dantzig -> PGS -> CFM-softened retries -> ignore-friction): if the
    pinned active-set solution fails the validity check, re-solve the same
    active set with a CFM-softened operator (A + fallback_cfm I); if that
    also fails, drop the friction rows entirely (normals-only solve); the
    gradient-carrying iterative seed remains the last resort.

    Args:
      F (n, r): J L^-T with M = L L^T (so A = J M^-1 J^T + cfm I);
      b (n,): -J v_pre + bounce terms; mu (n,): per-row friction
      coefficients; z_warm (n,): warm start (reference: cached LCP
      solution, World.hpp:690-698); cfm: constraint-force mixing constant;
      fallback_cfm: softening constant for the retry rung (reference:
      World fallback CFM knob, World.hpp:650-663).
    Returns z (n,) impulses.
    """
    sg = jax.lax.stop_gradient
    Fs, bs, mus = sg(F), sg(b), sg(mu)
    seed_fn = _apgd if meta.solver == "apgd" else _pgs
    # The seed is DIFFERENTIABLE (unrolled iterations): where the pinned
    # polish is rejected (rare: inconsistent active set on wedged /
    # ill-conditioned states), the fallback still carries approximate
    # gradients instead of none. Classification and refinement stay on
    # gradient-stopped values (discrete masks).
    z_seed = seed_fn(meta, F, cfm, b, mu, z_warm)
    if meta.solver == "apgd" and meta.seed_pgs_sweeps:
        # PGS polish: the reference's secondary solver
        # (BoxedLcpConstraintSolver.cpp:550-570) folded into the seed —
        # fixed-point Gauss-Seidel resolves the friction-coupled
        # quasi-LCPs where accelerated gradients stall, so the seed is a
        # legitimate shipping impulse when the pinned polish is rejected.
        z_seed = _pgs(
            dataclasses.replace(meta, iterations=meta.seed_pgs_sweeps),
            F, cfm, b, mu, z_seed,
        )
    clamping, upper, at_hi = _classify(meta, Fs, cfm, bs, mus, sg(z_seed))
    sign_u = jnp.sign(sg(z_seed))
    for _ in range(meta.refine_rounds):
        clamping, upper, sign_u, at_hi = _refine_masks(
            meta, Fs, cfm, bs, mus, clamping, upper, sign_u, at_hi
        )

    # Final solve under gradient with the (discrete, stopped) active set.
    z_pol = _pinned_solve(
        meta, F, cfm, b, mu, clamping, upper, sign_u, at_hi=at_hi
    )
    valid = sg(_lcp_valid(meta, Fs, cfm, bs, mus, sg(z_pol)))
    # The (PGS-polished) seed is the first fallback rung when it is a
    # valid solution itself (reference order: Dantzig primary -> PGS
    # secondary -> cfm-softened retries).
    valid_seed = sg(_lcp_valid(meta, Fs, cfm, bs, mus, sg(z_seed)))

    if fallback_cfm:
        # Rung 2: CFM-softened re-solve of the same active set. Validity
        # is judged against the SOFTENED operator (the softened problem is
        # the one being solved, as in the reference's cfm retries).
        soft = cfm + fallback_cfm
        z_soft = _pinned_solve(
            meta, F, soft, b, mu, clamping, upper, sign_u, at_hi=at_hi
        )
        valid_soft = sg(
            _lcp_valid(meta, Fs, soft, bs, mus, sg(z_soft))
        )
        # Rung 3: ignore friction (normals only; reference's last resort).
        isf = jnp.asarray(meta.is_friction)
        clamp_nf = clamping & ~isf
        upper_nf = jnp.zeros_like(upper)
        z_nf = _pinned_solve(
            meta, F, soft, b, mu, clamp_nf, upper_nf, sign_u, at_hi=at_hi
        )
        z_nf = jnp.where(isf, jnp.zeros_like(z_nf), z_nf)
        valid_nf = sg(
            _lcp_valid(
                meta, Fs, soft, bs,
                jnp.zeros_like(mus),  # friction-free validity
                sg(z_nf),
            )
        )
        z_fb = jnp.where(
            valid_seed[..., None],
            z_seed,
            jnp.where(
                valid_soft[..., None],
                z_soft,
                jnp.where(valid_nf[..., None], z_nf, z_seed),
            ),
        )
    else:
        z_fb = z_seed
    return jnp.where(valid[..., None], z_pol, z_fb)
