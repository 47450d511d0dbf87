"""Block-diagonal mass-matrix factorization + the native large-n linalg path.

The batched engine factors M per skeleton (articulated.mass_matrix_blocks
— M is block-diagonal across skeletons, mirroring the reference's
per-skeleton Skeleton::getMassMatrix ownership) and batched/linalg
switches from the unrolled lane-major factorizations to XLA's native
batched Cholesky / triangular solves above `_NATIVE_N` (the round-4
box-stack compile blowup: unrolled n=120 Cholesky emits ~300k HLO ops).
Both paths must agree numerically with the dense/unrolled references.
"""

import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.batched import linalg as bl
from nimblephysics_tpu.batched.articulated import (
    FlatWorld,
    fk,
    mass_matrix,
    mass_matrix_blocks,
)


def _spd(rng, n, B, scale=1.0):
    A_ = rng.standard_normal((B, n, n)) * scale
    A_ = A_ @ np.swapaxes(A_, 1, 2) + n * np.eye(n)
    return jnp.moveaxis(jnp.asarray(A_), 0, -1)  # (n, n, B)


def test_mass_matrix_blocks_match_dense():
    from nimblephysics_tpu.models import box_stack

    world, q0, _ = box_stack(n_boxes=3)
    fw = FlatWorld(world)
    B = 4
    rng = np.random.default_rng(0)
    q = jnp.asarray(
        np.tile(np.asarray(q0)[:, None], (1, B))
        + 0.01 * rng.standard_normal((len(q0), B))
    )
    R_wb, p_wb, W, _, _ = fk(fw, q)
    M = np.asarray(mass_matrix(fw, R_wb, p_wb, W))
    blocks = mass_matrix_blocks(fw, R_wb, p_wb, W)
    slices = world.dof_slices()
    assert len(blocks) == len(slices)
    off_diag = M.copy()
    for (s, e), blk in zip(slices, blocks):
        assert blk.shape[:2] == (e - s, e - s)
        if e > s:
            np.testing.assert_allclose(M[s:e, s:e], np.asarray(blk), rtol=1e-12)
        off_diag[s:e, s:e] = 0.0
    # No generalized coordinate couples two skeletons.
    assert np.all(off_diag == 0.0)
    # The welded ground contributes an empty block, not a crash.
    assert blocks[-1].shape[:2] == (0, 0)


def test_block_solves_match_dense(monkeypatch):
    rng = np.random.default_rng(1)
    B, m = 3, 5
    sizes = [6, 0, 4, 7]
    slices, c = [], 0
    for nd in sizes:
        slices.append((c, c + nd))
        c += nd
    n = c
    Ms = [_spd(rng, nd, B) for nd in sizes]
    dense = np.zeros((n, n, B))
    for (s, e), Mb in zip(slices, Ms):
        dense[s:e, s:e] = np.asarray(Mb)
    rhs = jnp.asarray(rng.standard_normal((n, m, B)))
    Ls = bl.block_cholesky(Ms)
    Ld = bl.cholesky(jnp.asarray(dense))
    np.testing.assert_allclose(
        np.asarray(bl.block_solve_tri_lower(Ls, slices, rhs)),
        np.asarray(bl.solve_tri_lower(Ld, rhs)),
        rtol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(bl.block_solve_tri_upper_t(Ls, slices, rhs)),
        np.asarray(bl.solve_tri_upper_t(Ld, rhs)),
        rtol=1e-10,
    )


def test_native_path_matches_unrolled(monkeypatch):
    """Same inputs through both code paths (threshold moved, not n)."""
    rng = np.random.default_rng(2)
    n, m, B = 12, 5, 3
    A = _spd(rng, n, B)
    rhs = jnp.asarray(rng.standard_normal((n, m, B)))
    b = jnp.asarray(rng.standard_normal((n, B)))
    L_u = bl.cholesky(A)
    Y_u = bl.solve_tri_lower(L_u, rhs)
    X_u = bl.solve_tri_upper_t(L_u, rhs)
    s_u = bl.spd_solve(A, b)
    monkeypatch.setattr(bl, "_NATIVE_N", 8)  # n=12 now takes native
    L_n = bl.cholesky(A)
    np.testing.assert_allclose(np.asarray(L_u), np.asarray(L_n), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(Y_u), np.asarray(bl.solve_tri_lower(L_n, rhs)), rtol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(X_u), np.asarray(bl.solve_tri_upper_t(L_n, rhs)), rtol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(s_u), np.asarray(bl.spd_solve(A, b)), rtol=1e-9
    )


def test_native_path_large_system():
    """A genuinely large SPD solve runs on the native path end to end."""
    rng = np.random.default_rng(3)
    n, B = bl._NATIVE_N + 12, 2
    A = _spd(rng, n, B)
    b = jnp.asarray(rng.standard_normal((n, B)))
    x = bl.spd_solve(A, b)
    resid = np.asarray(bl.mv(A, x) - b)
    assert np.max(np.abs(resid)) < 1e-8
