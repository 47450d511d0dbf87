"""Batch-minor boxed LCP: same algorithm as constraint/lcp.py, with the
world batch in the trailing (lane) axis and the pinned active-set solve
done in the RANK-FACTORED space (two r x r SPD solves instead of a
gathered K x K system — no top_k / one-hot needed).

Semantics parity with constraint/lcp.boxed_lcp (the reference LCP +
gradient machinery re-design: dart/constraint/BoxedLcpConstraintSolver.cpp
solveLcp:352, dart/neural/ConstrainedGroupGradientMatrices.cpp
constructMatrices:482 classification and tie-breaks,
dart/neural/BackpropSnapshot.cpp:868-923 active-set implicit gradients):

  * APGD/PGS iterative seed (gradient-carrying, unrolled),
  * CLAMPING / UPPER_BOUND / NOT_CLAMPING classification with the
    reference tie-breaks, masked-Dantzig refinement rounds,
  * exact differentiable re-solve of the pinned clamping system,
  * scale-aware validity check with seed fallback.

Pinned solve (rank-factored): the clamping block of A P is U V^T with
U = S (.) F and V = S (.) H (H = P^T F), rank <= r. Solve U V^T x = S b by
x = V alpha:  beta = (U^T U + eps)^-1 U^T b_S ;  alpha = (V^T V + eps)^-1
beta. Then U V^T x = proj_range(U) b_S = b_S for a consistent active set —
and the whole path is plain differentiable JAX, so jax.grad through it IS
the active-set implicit derivative.

All shapes: F (n, r, B), b/mu/z (n, B).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.batched import linalg as bl
from nimblephysics_tpu.constraint.lcp import LcpMeta, _dtype_ridge, _dtype_tol


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
    return lo[:, None], hi[:, None]


def _Av(F, cfm, y):
    """A y = F (F^T y) + cfm y; F (n, r, B), y (n, B)."""
    u = jnp.sum(F * y[:, None, :], axis=0)  # (r, B)
    return jnp.sum(F * u[None, :, :], axis=1) + cfm * y


def _diag_A(F, cfm):
    return jnp.sum(F * F, axis=1) + cfm  # (n, B)


def _apgd(meta: LcpMeta, F, cfm, b, mu, z0):
    """Accelerated projected gradient seed (batched, trailing batch)."""
    isf = np.asarray(meta.is_friction)
    fidx = np.asarray(np.maximum(meta.findex, 0))
    isf_j = jnp.asarray(isf)[:, None]

    v = jnp.ones_like(b)
    for _ in range(6):
        v2 = _Av(F, cfm, v)
        n2 = jnp.sum(v2 * v2, axis=0, keepdims=True)
        zero = n2 < 1e-24
        v = jnp.where(zero, 0.0, v2 / jnp.sqrt(jnp.where(zero, 1.0, n2)))
    ray = jnp.sum(v * _Av(F, cfm, v), axis=0)
    L = jnp.maximum(ray * 1.05, jnp.max(_diag_A(F, cfm), axis=0)) + 1e-9
    step = (1.0 / L)[None, :]

    lo_c, hi_c = _const_bounds(meta, F.dtype)

    def proj(y):
        zn = jnp.where(isf_j, y, jnp.clip(y, lo_c, hi_c))
        bound = mu * jnp.maximum(zn[fidx], 0.0)
        return jnp.where(isf_j, jnp.clip(y, -bound, bound), zn)

    betas = jnp.asarray(
        [(k - 1.0) / (k + 2.0) for k in range(meta.iterations)],
        dtype=F.dtype,
    )

    def body(carry, beta):
        z, z_prev = carry
        y = z + beta * (z - z_prev)
        g = _Av(F, cfm, y) - b
        z_new = proj(y - step * g)
        return (z_new, z), None

    (z, _), _ = jax.lax.scan(body, (z0, z0), betas)
    return z


def _pgs(meta: LcpMeta, F, cfm, b, mu, z0):
    """Row-sequential PGS sweeps via the running projection u = F^T z.

    Small systems unroll the row loop in Python (each op (B,)-wide, no
    dynamic slicing). Above ~96 rows the loop is ROLLED into a fori_loop
    with dynamic row indexing: identical sweep order and arithmetic, but
    O(1) emitted HLO instead of O(n) per sweep — a 1320-row 10-box stack
    would otherwise emit ~200k ops and stall XLA (round-4 compile bomb).
    """
    n = meta.n
    diag = _diag_A(F, cfm)
    inv_diag = jnp.where(diag > 1e-12, 1.0 / jnp.maximum(diag, 1e-12), 0.0)
    isf = np.asarray(meta.is_friction)
    fidx = np.asarray(np.maximum(meta.findex, 0))
    lo_c, hi_c = _const_bounds(meta, F.dtype)
    u0 = jnp.sum(F * z0[:, None, :], axis=0)

    if n > 96:
        isf_j = jnp.asarray(isf)
        fidx_j = jnp.asarray(fidx)
        lo_j = jnp.broadcast_to(lo_c, (n, 1))
        hi_j = jnp.broadcast_to(hi_c, (n, 1))

        def row(i, carry):
            z, u = carry
            Fi = jax.lax.dynamic_index_in_dim(F, i, 0, keepdims=False)
            zi_old = jax.lax.dynamic_index_in_dim(z, i, 0, keepdims=False)
            Az_i = jnp.sum(Fi * u, axis=0) + cfm * zi_old
            zi = zi_old + (b[i] - Az_i) * inv_diag[i]
            bound = mu[i] * z[fidx_j[i]]
            zi = jnp.where(
                isf_j[i],
                jnp.clip(zi, -bound, bound),
                jnp.clip(zi, lo_j[i, 0], hi_j[i, 0]),
            )
            u = u + Fi * (zi - zi_old)[None, :]
            z = jax.lax.dynamic_update_index_in_dim(z, zi, i, 0)
            return (z, u)

        def sweep(carry, _):
            return jax.lax.fori_loop(0, n, row, carry), None

        (z, _), _ = jax.lax.scan(
            sweep, (z0, u0), None, length=meta.iterations
        )
        return z

    def sweep(carry, _):
        z, u = carry
        for i in range(n):
            Fi = F[i]  # (r, B)
            Az_i = jnp.sum(Fi * u, axis=0) + cfm * z[i]
            zi = z[i] + (b[i] - Az_i) * inv_diag[i]
            if isf[i]:
                bound = mu[i] * z[fidx[i]]
                zi = jnp.clip(zi, -bound, bound)
            else:
                zi = jnp.clip(zi, lo_c[i], hi_c[i])
            u = u + Fi * (zi - z[i])[None, :]
            z = z.at[i].set(zi)
        return (z, u), None

    (z, _), _ = jax.lax.scan(sweep, (z0, u0), None, length=meta.iterations)
    return z


def _classify(meta: LcpMeta, F, cfm, b, mu, z):
    """Same tie-break rules as constraint/lcp._classify, trailing batch."""
    tol = _dtype_tol(meta, z.dtype)
    w = _Av(F, cfm, z) - b
    isf = jnp.asarray(meta.is_friction)[:, None]
    fidx = np.asarray(np.maximum(meta.findex, 0))
    bound = mu * z[fidx]
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


def _build_UV(meta: LcpMeta, F, mu, clamping, upper, sign_u):
    """U = S (.) F and V = S (.) P^T F for the pinned clamping system."""
    dtype = F.dtype
    n = meta.n
    S = clamping.astype(dtype)  # (n, B)
    fidx_np = np.maximum(meta.findex, 0)
    coeff = jnp.where(upper, sign_u * mu, jnp.zeros_like(mu)) * S[fidx_np]

    H = F * S[:, None, :]
    fr = np.where(meta.findex >= 0)[0]
    if len(fr) > 0:
        contrib = F * coeff[:, None, :]
        C3 = int(fr.max()) + 1
        contact_layout = (
            C3 % 3 == 0
            and np.array_equal(
                fr, np.setdiff1d(np.arange(C3), np.arange(0, C3, 3))
            )
            and np.array_equal(
                fidx_np[fr].reshape(-1, 2).T[0], np.arange(0, C3, 3)
            )
            and np.array_equal(
                fidx_np[fr].reshape(-1, 2).T[1], np.arange(0, C3, 3)
            )
        )
        if contact_layout:
            Hn = H[0:C3:3] + contrib[1:C3:3] + contrib[2:C3:3]
            Hc = jnp.stack([Hn, H[1:C3:3], H[2:C3:3]], axis=1).reshape(
                (C3,) + H.shape[1:]
            )
            H = jnp.concatenate([Hc, H[C3:]], axis=0)
        else:
            for u in fr:  # sparse static scatter (rare layout)
                H = H.at[int(fidx_np[u])].add(contrib[u])
    U = F * S[:, None, :]
    return U, H, S, coeff


def _pinned_solve(
    meta: LcpMeta, F, cfm, b, mu, clamping, upper, sign_u, at_hi=None,
    polish: bool = True,
):
    """Differentiable exact solve of the pinned active set (rank-factored).

    See module docstring. cfm must be 0 (assembler default); a nonzero cfm
    falls back to folding cfm into the diagonal of the r x r systems
    (approximate for cfm ~ ridge scale, exact at cfm = 0).
    """
    dtype = F.dtype
    r = F.shape[1]
    U, H, S, coeff = _build_UV(meta, F, mu, clamping, upper, sign_u)
    fidx_np = np.maximum(meta.findex, 0)

    has_boxes = meta.lo_const is not None or meta.hi_const is not None
    if has_boxes and at_hi is not None:
        lo_c, hi_c = _const_bounds(meta, dtype)
        lo_safe = jnp.where(jnp.isfinite(lo_c), lo_c, 0.0)
        hi_safe = jnp.where(jnp.isfinite(hi_c), hi_c, 0.0)
        isf_m = jnp.asarray(meta.is_friction)[:, None]
        not_c = (~clamping) & (~isf_m)
        z_fixed = jnp.where(not_c, jnp.where(at_hi, hi_safe, lo_safe), 0.0)
        b_eff = b - _Av(F, cfm, z_fixed)
    else:
        z_fixed = None
        b_eff = b

    bS = b_eff * S
    ridge = _dtype_ridge(meta, dtype)

    def spd(P, rhs):
        tr = sum(P[i, i] for i in range(r))
        eps = ridge * (tr / r + 1.0)
        Preg = P + eps[None, None, :] * jnp.eye(r, dtype=dtype)[..., None]
        return bl.spd_solve(Preg, rhs)

    if cfm:
        # Exact cfm path (fallback ladder rung): solve
        # (U V^T + cfm I)|_S x = rhs via Woodbury — x = (rhs - U w)/cfm
        # with (cfm I_r + V^T U) w = V^T rhs. The small nonsymmetric r x r
        # system is solved through ridge normal equations.
        K = cfm * jnp.eye(r, dtype=dtype)[..., None] + bl.gram(H, U)
        # (r, r, B) = cfm I + V^T U

        def solve_once(rhs_S):
            Vt_rhs = jnp.sum(H * rhs_S[:, None, :], axis=0)  # (r, B)
            KtK = jnp.sum(K[:, :, None, :] * K[:, None, :, :], axis=0)
            Kt_rhs = jnp.sum(K * Vt_rhs[:, None, :], axis=0)
            w = spd(KtK, Kt_rhs)
            x = (rhs_S - jnp.sum(U * w[None, :, :], axis=1)) / cfm
            return x * S  # supported on the clamping rows

    else:

        def solve_once(rhs_S):
            P1 = bl.gram(U, U)
            P2 = bl.gram(H, H)
            Ut_rhs = jnp.sum(U * rhs_S[:, None, :], axis=0)  # (r, B)
            beta = spd(P1, Ut_rhs)
            alpha = spd(P2, beta)
            # x = V alpha, (n, B)
            return jnp.sum(H * alpha[None, :, :], axis=1)

    x = solve_once(bS)
    if polish:
        # One iterative-refinement step cancels the ridge bias.
        resid = bS - _UVt(U, H, x)
        x = x + solve_once(resid)

    z = S * x + coeff * x[fidx_np]
    if z_fixed is not None:
        z = z + z_fixed
    return z


def _UVt(U, V, x):
    """(U V^T) x for skinny U, V (n, r, B), x (n, B)."""
    u = jnp.sum(V * x[:, None, :], axis=0)  # (r, B)
    return jnp.sum(U * u[None, :, :], axis=1)


def _refine_masks(
    meta: LcpMeta, F, cfm, b, mu, clamping, upper, sign_u, at_hi
):
    """Masked-Dantzig refinement round (parity with constraint/lcp)."""
    tol = _dtype_tol(meta, F.dtype)
    z = _pinned_solve(
        meta, F, cfm, b, mu, clamping, upper, sign_u, at_hi=at_hi,
        polish=False,
    )
    w = _Av(F, cfm, z) - b
    isf = jnp.asarray(meta.is_friction)[:, None]
    fidx = np.asarray(np.maximum(meta.findex, 0))
    bound = mu * jnp.maximum(z[fidx], 0.0)
    degenerate = _diag_A(F, cfm) < 1e-9
    lo_c, hi_c = _const_bounds(meta, F.dtype)

    went_over = clamping & (z > hi_c + tol) & jnp.isfinite(hi_c)
    n_clamp = jnp.where(
        clamping,
        (z > lo_c - tol) & ~went_over,
        jnp.where(at_hi, w > tol, w < -tol),
    )
    at_hi2 = jnp.where(
        clamping, went_over, jnp.where(at_hi, w <= tol, False)
    ) & jnp.isfinite(hi_c)
    no_normal = bound <= tol
    over = jnp.abs(z) > bound + tol
    new_sign = jnp.where(jnp.abs(z) > tol, jnp.sign(z), sign_u)
    ub_consistent = jnp.where(sign_u > 0, w <= tol, w >= -tol)
    f_clamp = jnp.where(
        upper, ~ub_consistent & ~no_normal, ~over & ~no_normal
    )
    f_upper = jnp.where(upper, ub_consistent & ~no_normal, over & ~no_normal)
    clamping2 = jnp.where(isf, f_clamp, n_clamp) & ~degenerate
    upper2 = jnp.where(isf, f_upper, jnp.zeros_like(f_upper)) & ~degenerate
    at_hi2 = jnp.where(isf, False, at_hi2) & ~degenerate
    return clamping2, upper2, new_sign, at_hi2


def _lcp_valid(meta: LcpMeta, F, cfm, b, mu, z):
    """Scale-aware boxed-LCP validity (parity with constraint/lcp)."""
    w = _Av(F, cfm, z) - b
    isf = jnp.asarray(meta.is_friction)[:, None]
    fidx = np.asarray(np.maximum(meta.findex, 0))
    bound = mu * z[fidx]
    tol = max(1e-7, 1000.0 * float(jnp.finfo(z.dtype).eps))
    scale_w = 1.0 + jnp.max(jnp.abs(b), axis=0, keepdims=True)
    scale_z = 1.0 + jnp.max(jnp.abs(z), axis=0, keepdims=True)
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
    finite = jnp.all(jnp.isfinite(z), axis=0)
    return jnp.all(ok_n & ok_f, axis=0) & finite


def boxed_lcp_b(meta: LcpMeta, F, b, mu, z_warm, cfm=0.0, fallback_cfm=1e-4,
                fallback_gradients=False, return_valid=False,
                ladder_mode="lazy"):
    """Batch-minor boxed LCP solve; see constraint/lcp.boxed_lcp
    (including the CFM-softened / ignore-friction failure ladder,
    BoxedLcpConstraintSolver.cpp:392-646 parity).

    fallback_gradients controls how ladder-resolved worlds differentiate:

      * False (default) stop-gradients the ladder output: worlds whose
        primary pinned solve failed validity keep their robust forward
        impulse but contribute ZERO impulse gradient. NOTE this is an
        approximation that diverges from the reference, which DOES build
        gradients from the fallback impulse's clamping classification
        (BoxedLcpConstraintSolver.cpp:716-734 registerLCPResults with the
        softened mX -> ConstrainedGroupGradientMatrices::constructMatrices;
        only friction rows are zeroed on the ignore-friction rung,
        ConstrainedGroupGradientMatrices.cpp:620). We accept the
        divergence on the LAZY per-step path because the ladder cond's
        VJP costs ~30% of a training step even when no world takes it.
      * "reclassify" matches the reference: the ladder impulse is
        re-classified and ONE differentiable pinned solve with the
        softened cfm provides its gradients (friction rows zeroed for
        worlds that fell to the ignore-friction rung). Use from the
        deferred-ladder rerun path (batched/rollout.py), where the cost
        only hits calls that actually failed.
      * True differentiates the ladder branch directly (cond VJP cost).

    With return_valid=True also returns a per-world (B,) bool
    (stop-gradiented): True when the shipped impulse solves its LCP
    (pinned solve valid OR the PGS-polished seed fallback valid) — the
    hook for hoisting the failure ladder out of a rollout scan
    (batched/rollout.py).

    ladder_mode selects how the armed ladder is scheduled:

      * "lazy": guard the rungs with a lax.cond on "any world failed
        validity" — pays nothing when every island is healthy, but the
        cond is a fusion barrier inside rollout scans and its VJP is
        expensive (benchmarks/README.md).
      * "always": run the rungs UNCONDITIONALLY and select per world.
        No cond, no fusion barrier, no cond-VJP: the two extra pinned
        solves are pure forward FLOPs, and with fallback_gradients=False
        they are stop-gradiented AND pruned from the jax.checkpoint
        backward recompute (the final impulse is name-saved). The right
        mode for throughput rollouts where a handful of worlds fail
        validity on most steps, which made the lazy cond fire (and the
        deferred-scan rerun trigger) on essentially every call.

    Args: F (n, r, B), b/mu/z_warm (n, B). Returns z (n, B)
    [, valid (B,)].
    """
    from jax.ad_checkpoint import checkpoint_name

    sg = jax.lax.stop_gradient
    Fs, bs, mus = sg(F), sg(b), sg(mu)
    if meta.solver == "apgd":
        # Pallas fast path on TPU (F stays in VMEM for all iterations);
        # pure-JAX seed elsewhere (batched/lcp_pallas.py).
        from nimblephysics_tpu.batched.lcp_pallas import apgd_seed_tpu

        z_seed = apgd_seed_tpu(meta, F, b, mu, z_warm, cfm)
    else:
        z_seed = _pgs(meta, F, cfm, b, mu, z_warm)
    # Named for LCP_REMAT_POLICY (see module bottom): saving the seed and
    # the refined active-set masks lets jax.checkpoint's backward-recompute
    # prune the APGD iterations and every refine-round pinned solve —
    # recompute rebuilds only FK/M/Cholesky/collide + ONE pinned solve.
    z_seed = checkpoint_name(z_seed, "lcp_seed")
    clamping, upper, at_hi = _classify(meta, Fs, cfm, bs, mus, sg(z_seed))
    sign_u = jnp.sign(sg(z_seed))
    for _ in range(meta.refine_rounds):
        clamping, upper, sign_u, at_hi = _refine_masks(
            meta, Fs, cfm, bs, mus, clamping, upper, sign_u, at_hi
        )
    clamping = checkpoint_name(clamping, "lcp_masks")
    upper = checkpoint_name(upper, "lcp_masks")
    at_hi = checkpoint_name(at_hi, "lcp_masks")
    sign_u = checkpoint_name(sign_u, "lcp_masks")
    z_pol = _pinned_solve(
        meta, F, cfm, b, mu, clamping, upper, sign_u, at_hi=at_hi
    )
    valid = checkpoint_name(
        sg(_lcp_valid(meta, Fs, cfm, bs, mus, sg(z_pol))), "lcp_masks"
    )
    # The (PGS-polished) seed is the first fallback rung when it is a
    # valid solution itself (reference order: Dantzig primary -> PGS
    # secondary -> cfm rungs, BoxedLcpConstraintSolver.cpp:461-570).
    # With seed_pgs_sweeps=16 this covers almost every pinned-solve
    # rejection, so the cfm-ladder cond below triggers on the much rarer
    # "BOTH the pinned solve and the seed are invalid" event instead of
    # firing for every marginal world.
    valid_seed = checkpoint_name(
        sg(_lcp_valid(meta, Fs, cfm, bs, mus, sg(z_seed))), "lcp_masks"
    )

    if fallback_cfm:
        # Ladder rungs are LAZY: lax.cond on "any world failed validity"
        # (a scalar — the batch axis is explicit here, not vmapped), so
        # the throughput path pays nothing when every island is healthy.
        def run_ladder(_):
            soft = cfm + fallback_cfm
            z_soft = _pinned_solve(
                meta, F, soft, b, mu, clamping, upper, sign_u, at_hi=at_hi
            )
            valid_soft = sg(
                _lcp_valid(meta, Fs, soft, bs, mus, sg(z_soft))
            )
            isf = jnp.asarray(meta.is_friction)[:, None]
            clamp_nf = clamping & ~isf
            upper_nf = jnp.zeros_like(upper)
            z_nf = _pinned_solve(
                meta, F, soft, b, mu, clamp_nf, upper_nf, sign_u,
                at_hi=at_hi,
            )
            z_nf = jnp.where(isf, jnp.zeros_like(z_nf), z_nf)
            valid_nf = sg(
                _lcp_valid(
                    meta, Fs, soft, bs, jnp.zeros_like(mus), sg(z_nf)
                )
            )
            z_fb_raw = jnp.where(
                valid_seed[None, :],
                z_seed,
                jnp.where(
                    valid_soft[None, :],
                    z_soft,
                    jnp.where(valid_nf[None, :], z_nf, z_seed),
                ),
            )
            if fallback_gradients == "reclassify":
                # Reference-parity gradients for ladder-resolved worlds:
                # classify the FINAL fallback impulse and differentiate
                # one pinned solve with the softened cfm
                # (BoxedLcpConstraintSolver.cpp:716-734 ->
                # constructMatrices on the ladder mX). Worlds that fell
                # to the ignore-friction rung classify with mu = 0, so
                # friction rows carry no gradient
                # (mDeliberatelyIgnoreFriction,
                # ConstrainedGroupGradientMatrices.cpp:620).
                mu_cls = jnp.where(
                    valid_soft[None, :], mus, jnp.zeros_like(mus)
                )
                mu_g = jnp.where(valid_soft[None, :], mu, sg(mu))
                c2, u2, hi2 = _classify(
                    meta, Fs, soft, bs, mu_cls, sg(z_fb_raw)
                )
                s2 = jnp.sign(sg(z_fb_raw))
                z_grad = _pinned_solve(
                    meta, F, soft, b, mu_g, c2, u2, s2, at_hi=hi2
                )
                return sg(z_fb_raw) + (z_grad - sg(z_grad))
            return z_fb_raw

        if ladder_mode == "always":
            z_fb = run_ladder(None)
        else:
            z_fb = jax.lax.cond(
                jnp.all(valid | valid_seed), lambda _: z_seed, run_ladder,
                None,
            )
        if not fallback_gradients:
            z_fb = sg(z_fb)
    else:
        z_fb = z_seed if fallback_gradients else sg(z_seed)
    z_out = jnp.where(valid[None, :], z_pol, z_fb)
    # Name-save the final impulse too: the backward recompute then reads
    # z from residuals instead of re-running the ladder cond (the where's
    # vjp needs only `valid`, also saved; z_pol's own vjp is unaffected).
    z_out = checkpoint_name(z_out, "lcp_seed")
    if return_valid:
        # "The shipped impulse solves its LCP": either the pinned solve
        # was valid, or the (PGS-polished) seed fallback is itself valid.
        # This is the deferred-ladder rerun trigger (batched/rollout.py).
        return z_out, valid | valid_seed
    return z_out


# Remat policy for training rollouts: `jax.checkpoint(step, policy=
# LCP_REMAT_POLICY)` saves ONLY the LCP seed + active-set masks (a few
# (n, B) arrays per step — KBs against the step's MBs of intermediates).
# The backward-pass recompute then dead-code-eliminates the APGD solver
# iterations and the refine-round pinned solves, re-running just the
# smooth dynamics + one differentiable pinned solve. The reference's
# analog: BackpropSnapshot caches the clamping/upper-bound index sets at
# forward time and replays only the implicit solve in the backward
# (dart/neural/BackpropSnapshot.cpp:868-923).
LCP_REMAT_POLICY = jax.checkpoint_policies.save_only_these_names(
    "lcp_seed", "lcp_masks"
)
