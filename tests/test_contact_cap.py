"""Fixed-capacity active-contact selection (SolverConfig.contact_cap).

The compile-time-static TPU analog of runtime broadphase culling
(dart/constraint/ConstraintSolver.cpp:542-640 builds constraints only for
broadphase-surviving pairs): each lane solves its LCP on the `cap`
deepest potential contact slots (top-k by penetration, friction rows
riding with their normal), with unselected slots contributing zero
impulse. Exact whenever <= cap slots actually penetrate — which these
tests assert against the full monolithic solve — and the row count drops
from O(bodies^2) potential-pair slots to O(cap).

Also covers the two compile-scalability paths the cap composes with:
the rolled (fori_loop) PGS for >96-row systems and the einsum Gram
switch in batched/linalg.gram (both must match their small-system
unrolled forms bit-for-bit up to reassociation).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nimblephysics_tpu.batched import BatchedEngine
from nimblephysics_tpu.batched import linalg as bl
from nimblephysics_tpu.models import box_stack, half_cheetah


def _engines(world, cap):
    solver0 = world.solver
    eng_full = BatchedEngine(world)
    world.solver = dataclasses.replace(solver0, contact_cap=cap)
    try:
        eng_cap = BatchedEngine(world)
    finally:
        world.solver = solver0
    return eng_full, eng_cap


def _batch(world, q0, B=4, seed=0, jitter=0.002):
    rng = np.random.default_rng(seed)
    nv = world.num_dofs
    q = jnp.asarray(
        np.tile(np.asarray(q0)[:, None], (1, B))
        + jitter * rng.standard_normal((nv, B))
    )
    v = jnp.asarray(0.02 * rng.standard_normal((nv, B)))
    return q, v, jnp.zeros((nv, B))


def test_cap_plan():
    world, _, _ = box_stack(n_boxes=3)
    eng_full, eng_cap = _engines(world, cap=16)
    assert eng_full.contact_cap is None
    assert eng_cap.contact_cap == 16
    C3 = 3 * eng_cap.bcollider.num_contacts
    extras = eng_full.meta.n - C3
    assert eng_cap.meta_cap.n == 3 * 16 + extras
    fi = eng_cap.meta_cap.findex
    isf = eng_cap.meta_cap.is_friction
    assert np.array_equal(fi >= 0, isf)
    assert np.all(fi[fi >= 0] == np.repeat(np.arange(0, 48, 3), 2))
    # A cap >= the slot count disables selection (nothing to cull).
    _, eng_nocap = _engines(world, cap=1000)
    assert eng_nocap.contact_cap is None


def test_cap_step_matches_full_solve():
    """cap >= the truly-active set => identical step to solver tolerance."""
    world, q0, _ = box_stack(n_boxes=3)
    eng_full, eng_cap = _engines(world, cap=16)
    q, v, u = _batch(world, q0)
    r_f = eng_full.step(q, v, u)
    r_c = eng_cap.step(q, v, u)
    np.testing.assert_allclose(np.asarray(r_c.q), np.asarray(r_f.q),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(r_c.v), np.asarray(r_f.v),
                               atol=5e-6)
    np.testing.assert_allclose(
        np.asarray(r_c.impulses), np.asarray(r_f.impulses), atol=5e-6
    )
    assert float(jnp.max(jnp.abs(r_c.impulses))) > 0.0


def test_cap_gradients_match_full_solve():
    world, q0, _ = box_stack(n_boxes=2)
    eng_full, eng_cap = _engines(world, cap=12)
    q, v, u = _batch(world, q0, B=2)

    def loss_of(engine):
        def loss(qq, vv):
            r = engine.step(qq, vv, u)
            return jnp.sum(r.q**2) + jnp.sum(r.v**2)

        return jax.grad(loss, argnums=(0, 1))(q, v)

    gq_c, gv_c = loss_of(eng_cap)
    gq_f, gv_f = loss_of(eng_full)
    np.testing.assert_allclose(np.asarray(gq_c), np.asarray(gq_f),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gv_c), np.asarray(gv_f),
                               rtol=1e-4, atol=1e-6)


def test_cap_rollout_stack_stands():
    """50 warm-started capped steps: the stack neither sinks nor launches."""
    world, q0, _ = box_stack(n_boxes=3)
    _, eng = _engines(world, cap=16)
    B = 3
    q, v, u = _batch(world, q0, B=B)

    @jax.jit
    def roll(q, v):
        def body(c, _):
            q, v, z = c
            r = eng.step(q, v, u, z_warm=z)
            return (r.q, r.v, r.impulses), None

        (q, v, z), _ = jax.lax.scan(
            body, (q, v, jnp.zeros((eng.num_rows, B))), None, length=50
        )
        return q, v

    qf, vf = roll(q, v)
    assert np.isfinite(np.asarray(qf)).all()
    top = float(jnp.median(qf[6 * 2 + 5]))
    assert abs(top - float(np.asarray(q0)[6 * 2 + 5])) < 0.02
    assert float(jnp.max(jnp.abs(vf))) < 1.0


def test_cap_not_applied_to_islanded_or_small_worlds():
    world, _, _ = half_cheetah()
    solver0 = world.solver
    world.solver = dataclasses.replace(solver0, contact_cap=1000)
    try:
        eng = BatchedEngine(world)
    finally:
        world.solver = solver0
    assert eng.contact_cap is None  # fewer slots than the cap


def test_rolled_pgs_matches_unrolled():
    """>96-row systems take the fori_loop PGS; same sweeps, same result."""
    from nimblephysics_tpu.batched.lcp import _pgs
    from nimblephysics_tpu.constraint.lcp import LcpMeta

    rng = np.random.default_rng(3)
    n_contacts, r, B = 40, 6, 3  # 120 rows > the 96-row switch
    n = 3 * n_contacts
    findex = np.full(n, -1, dtype=np.int32)
    isf = np.zeros(n, dtype=bool)
    for c in range(n_contacts):
        findex[3 * c + 1] = findex[3 * c + 2] = 3 * c
        isf[3 * c + 1] = isf[3 * c + 2] = True
    meta_big = LcpMeta(findex=findex, is_friction=isf, iterations=8)
    F = jnp.asarray(rng.standard_normal((n, r, B)) * 0.3)
    b = jnp.asarray(rng.standard_normal((n, B)))
    mu = jnp.full((n, B), 0.8)
    z0 = jnp.zeros((n, B))
    assert n > 96  # takes the rolled fori_loop path
    z_rolled = _pgs(meta_big, F, 0.0, b, mu, z0)

    # Oracle: an independent numpy Gauss-Seidel with the same sweep order.
    Fn = np.asarray(F)
    bn = np.asarray(b)
    mun = np.asarray(mu)
    z = np.zeros((n, B))
    u = np.zeros((r, B))
    diag = (Fn * Fn).sum(axis=1)
    inv_diag = np.where(diag > 1e-12, 1.0 / np.maximum(diag, 1e-12), 0.0)
    for _ in range(8):
        for i in range(n):
            Az_i = (Fn[i] * u).sum(axis=0)
            zi = z[i] + (bn[i] - Az_i) * inv_diag[i]
            if isf[i]:
                bound = mun[i] * z[findex[i]]
                zi = np.clip(zi, -bound, bound)
            else:
                zi = np.maximum(zi, 0.0)
            u = u + Fn[i] * (zi - z[i])[None, :]
            z[i] = zi
    np.testing.assert_allclose(np.asarray(z_rolled), z, rtol=1e-9,
                               atol=1e-12)


def test_gram_einsum_matches_broadcast():
    rng = np.random.default_rng(4)
    # Big enough to take the einsum branch (n*r*s > 32768).
    n, r, B = 1200, 6, 5
    U = jnp.asarray(rng.standard_normal((n, r, B)))
    V = jnp.asarray(rng.standard_normal((n, r, B)))
    got = bl.gram(U, V)
    want = jnp.sum(U[:, :, None, :] * V[:, None, :, :], axis=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-10)
    # Small shapes stay on the broadcast path and agree trivially.
    Us, Vs = U[:10], V[:10]
    np.testing.assert_allclose(
        np.asarray(bl.gram(Us, Vs)),
        np.asarray(jnp.sum(Us[:, :, None, :] * Vs[:, None, :, :], axis=0)),
        rtol=1e-12,
    )
