"""Pallas TPU kernel for the batch-minor APGD seed solve.

Why: the APGD seed (batched/lcp._apgd) is the hot inner loop of the
contact step — 32 iterations, each reading the factored Delassus operator
F (n, r, B) from HBM twice. At the bench shape (60, 9, 4096 f32) that is
~0.5 GB of HBM traffic per step for ~1 MFLOP of math. This kernel tiles
the world batch over the lane dimension, loads each F block into VMEM
ONCE, and runs the full power-iteration + Nesterov loop on-chip: HBM
traffic drops to a single read of F.

Design notes (see /opt/skills/guides/pallas_guide.md):
  * grid = (B / BLOCK_B,); every operand is blocked only in the batch
    (minor) axis; static row metadata (friction mask, findex one-hot,
    box bounds) broadcasts to every program via a constant index_map.
  * The rank axis r is passed as r SEPARATE (n, BLOCK) refs and unrolled
    in Python: Mosaic rejects the implicit-dimension relayouts that
    3-D middle-axis reductions produce, and r <= ~12 keeps the unroll
    small. All in-kernel values are clean 2-D (sublane, lane) tiles.
  * The friction-cone gather z[findex] is expressed as a static one-hot
    matmul (Sel @ z) — MXU-friendly and gather-free.
  * The kernel is used as a gradient-stopped SEED: classification and the
    differentiable pinned solve downstream are unchanged; one
    differentiable projected-gradient step is re-attached on top so the
    rare polish-rejected fallback still carries (approximate) gradients —
    matching the pure-JAX seed's role.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.constraint.lcp import LcpMeta


def _static_rows(meta: LcpMeta, dtype):
    n = meta.n
    isf = meta.is_friction.astype(np.float32)
    Sel = np.zeros((n, n), dtype=np.float32)
    fr = np.where(meta.findex >= 0)[0]
    Sel[fr, np.maximum(meta.findex, 0)[fr]] = 1.0
    lo = (
        np.asarray(meta.lo_const, dtype=np.float32)
        if meta.lo_const is not None
        else np.zeros(n, dtype=np.float32)
    )
    hi = (
        np.asarray(meta.hi_const, dtype=np.float32)
        if meta.hi_const is not None
        else np.full(n, np.inf, dtype=np.float32)
    )
    big = np.float32(3.4e38)
    hi = np.minimum(hi, big)
    lo = np.maximum(lo, -big)
    return (
        jnp.asarray(isf, dtype=dtype),
        jnp.asarray(Sel, dtype=dtype),
        jnp.asarray(lo, dtype=dtype),
        jnp.asarray(hi, dtype=dtype),
    )


def _apgd_kernel(*refs, r: int, iterations: int, cfm: float,
                 pgs_sweeps: int = 0, isf_rows=(), fidx_rows=()):
    F = [refs[j][...] for j in range(r)]  # r x (n, BLOCK), all in VMEM
    b = refs[r][...]  # (n, BLOCK)
    mu = refs[r + 1][...]
    z0 = refs[r + 2][...]
    isf = refs[r + 3][...]  # (n, 1)
    Sel = refs[r + 4][...]  # (n, n)
    lo = refs[r + 5][...]  # (n, 1)
    hi = refs[r + 6][...]
    out_ref = refs[r + 7]
    shape = b.shape

    def Av(y):
        out = cfm * y
        for j in range(r):
            uj = jnp.sum(F[j] * y, axis=0, keepdims=True)  # (1, BLOCK)
            out = out + F[j] * jnp.broadcast_to(uj, shape)
        return out

    # Spectral-norm upper bound (6 power iterations).
    v = jnp.ones_like(b)
    for _ in range(6):
        v2 = Av(v)
        n2 = jnp.maximum(jnp.sum(v2 * v2, axis=0, keepdims=True), 1e-24)
        v = v2 * jnp.broadcast_to(jax.lax.rsqrt(n2), shape)
    ray = jnp.sum(v * Av(v), axis=0, keepdims=True)  # (1, BLOCK)
    # diagonal of A per row, then max over rows:
    diag_rows = sum(F[j] * F[j] for j in range(r)) + cfm  # (n, BLOCK)
    diag_max = jnp.max(diag_rows, axis=0, keepdims=True)
    L = jnp.maximum(ray * 1.05, diag_max) + 1e-9
    step = jnp.broadcast_to(1.0 / L, shape)

    def proj(y):
        zn = jnp.where(isf > 0, y, jnp.clip(y, lo, hi))
        # bound = mu * max(Sel @ zn, 0): the findex gather as a matmul.
        zsel = jnp.dot(Sel, zn, preferred_element_type=zn.dtype)
        bound = mu * jnp.maximum(zsel, 0.0)
        return jnp.where(isf > 0, jnp.clip(y, -bound, bound), zn)

    def body(k, carry):
        z, z_prev = carry
        kf = k.astype(b.dtype)
        beta = (kf - 1.0) / (kf + 2.0)
        y = z + beta * (z - z_prev)
        g = Av(y) - b
        z_new = proj(y - step * g)
        return (z_new, z)

    z, _ = jax.lax.fori_loop(0, iterations, body, (z0, z0))

    if pgs_sweeps:
        # Projected Gauss-Seidel polish (the reference's PGS secondary,
        # BoxedLcpConstraintSolver.cpp:550-570), fully unrolled over the
        # static row order with z kept as per-row SSA values — no
        # dynamic-update-slice, everything stays in VMEM/registers.
        # Semantics identical to batched/lcp._pgs (same sweep order, same
        # bound formula), so the non-TPU pure-JAX path matches.
        n = b.shape[0]
        diag = sum(F[j] * F[j] for j in range(r)) + cfm  # (n, BLOCK)
        inv_diag = jnp.where(diag > 1e-12,
                             1.0 / jnp.maximum(diag, 1e-12), 0.0)
        zr = [z[i : i + 1] for i in range(n)]
        ur = [
            jnp.sum(F[j] * z, axis=0, keepdims=True) for j in range(r)
        ]  # running u = F^T z, r x (1, BLOCK)
        Frow = [[F[j][i : i + 1] for j in range(r)] for i in range(n)]
        for _ in range(pgs_sweeps):
            for i in range(n):
                Az_i = cfm * zr[i]
                for j in range(r):
                    Az_i = Az_i + Frow[i][j] * ur[j]
                zi = zr[i] + (b[i : i + 1] - Az_i) * inv_diag[i : i + 1]
                if isf_rows[i]:
                    bound = mu[i : i + 1] * zr[fidx_rows[i]]
                    zi = jnp.clip(zi, -bound, bound)
                else:
                    zi = jnp.clip(zi, lo[i : i + 1], hi[i : i + 1])
                d = zi - zr[i]
                for j in range(r):
                    ur[j] = ur[j] + Frow[i][j] * d
                zr[i] = zi
        z = jnp.concatenate(zr, axis=0)

    out_ref[...] = z


@functools.partial(jax.jit, static_argnums=(0, 5, 6))
def apgd_pallas(
    meta: LcpMeta, F, b, mu, z0, cfm: float = 0.0, block_b: int = 512
):
    """Pallas APGD seed: F (n, r, B), b/mu/z0 (n, B) -> z (n, B).

    B must be a multiple of block_b (the caller falls back otherwise).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, r, B = F.shape
    assert B % block_b == 0, (B, block_b)
    dtype = F.dtype
    isf, Sel, lo, hi = _static_rows(meta, dtype)
    isf2 = isf[:, None]
    lo2 = lo[:, None]
    hi2 = hi[:, None]
    F_js = [F[:, j, :] for j in range(r)]

    grid = (B // block_b,)
    bspec = lambda shape, imap: pl.BlockSpec(
        shape, imap, memory_space=pltpu.VMEM
    )
    batch2 = lambda: bspec((n, block_b), lambda i: (0, i))
    const2 = lambda rows, cols: bspec((rows, cols), lambda i: (0, 0))

    kernel = functools.partial(
        _apgd_kernel, r=r, iterations=int(meta.iterations), cfm=float(cfm),
        pgs_sweeps=int(getattr(meta, "seed_pgs_sweeps", 0)),
        isf_rows=tuple(bool(x) for x in meta.is_friction),
        fidx_rows=tuple(int(x) for x in np.maximum(meta.findex, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=(
            [bspec((n, block_b), lambda i: (0, i)) for _ in range(r)]
            + [batch2(), batch2(), batch2()]  # b, mu, z0
            + [const2(n, 1), const2(n, n), const2(n, 1), const2(n, 1)]
        ),
        out_specs=batch2(),
        out_shape=jax.ShapeDtypeStruct((n, B), dtype),
    )(*F_js, b, mu, z0, isf2, Sel, lo2, hi2)


def _pick_block(n: int, r: int, B: int, pgs_polish: bool) -> int:
    """Largest lane-block size whose kernel fits scoped VMEM (0 = none).

    Every (n, block) tile costs 4*n*block bytes and the kernel's live set
    is ~(3r + 12) tiles (F refs + loop carries + power-iteration temps),
    plus ~(r + 8) more when the unrolled PGS polish keeps per-row SSA
    values alive. Below 128 lanes the kernel stops paying for itself —
    return 0 and let the caller use the pure-JAX seed. This is how
    Atlas/box-stack-class LCPs with hundreds of rows avoid the Mosaic
    scoped-VMEM stack OOM observed at (n=144, r=18, block=512): 21 MB
    against the 16 MB limit."""
    tiles = 3 * r + 12 + ((r + 8) if pgs_polish else 0)
    budget = 14 * 1024 * 1024
    for cand in (512, 256, 128):
        if B % cand == 0 and 4 * n * cand * tiles <= budget:
            return cand
    return 0


def apgd_seed_tpu(meta: LcpMeta, F, b, mu, z0, cfm=0.0):
    """APGD seed with the Pallas fast path on TPU (gradient-stopped) plus
    ONE differentiable projected-gradient step re-attached. NOTE: the
    re-attached step's gradients only reach the output when the caller
    enables fallback_gradients (boxed_lcp_b defaults to False, which
    stop-gradients every seed-fallback path); it exists so that callers
    who DO differentiate the fallback (fallback_gradients=True, or the
    deferred-ladder rerun) get an approximate-gradient seed instead of a
    constant. Non-TPU backends use the pure-JAX seed unchanged."""
    import dataclasses

    from jax.ad_checkpoint import checkpoint_name

    from nimblephysics_tpu.batched.lcp import (
        _apgd,
        _Av,
        _const_bounds,
        _diag_A,
        _pgs,
    )

    def pure_seed():
        z = _apgd(meta, F, cfm, b, mu, z0)
        if meta.seed_pgs_sweeps:
            z = _pgs(
                dataclasses.replace(meta, iterations=meta.seed_pgs_sweeps),
                F, cfm, b, mu, z,
            )
        return z

    if jax.default_backend() != "tpu" or not isinstance(cfm, (int, float)):
        return pure_seed()
    n, r, B = F.shape

    block = _pick_block(n, r, B, bool(getattr(meta, "seed_pgs_sweeps", 0)))
    if block == 0:
        return pure_seed()
    sg = jax.lax.stop_gradient
    z_pal = apgd_pallas(
        meta, sg(F), sg(b), sg(mu), sg(z0), float(cfm), block
    )
    # Name-save the RAW kernel output as well: the differentiable PGD
    # step below consumes z_pal, so without this the remat recompute
    # must re-run the Pallas kernel to linearize that step (profiled:
    # a second 50-iteration apgd_pallas instance inside the backward
    # while loop). With z_pal saved the kernel is dead in the recompute.
    z_pal = checkpoint_name(z_pal, "lcp_seed")
    # One differentiable PGD step on top (re-attaches gradient flow).
    isf = jnp.asarray(meta.is_friction)[:, None]
    fidx = np.asarray(np.maximum(meta.findex, 0))
    lo_c, hi_c = _const_bounds(meta, F.dtype)
    step = 1.0 / (4.0 * jnp.max(_diag_A(F, cfm), axis=0) + 1e-9)
    y = z_pal - step[None, :] * (_Av(F, cfm, z_pal) - b)
    zn = jnp.where(isf, y, jnp.clip(y, lo_c, hi_c))
    bound = mu * jnp.maximum(zn[fidx], 0.0)
    return jnp.where(isf, jnp.clip(y, -bound, bound), zn)
