"""Plan-time constraint islands (batched/engine._build_islands).

The TPU-static analog of the reference's per-step union-find island
grouping (dart/constraint/ConstraintSolver.cpp:723-793 updateConstraints
-> ConstrainedGroups): the LCP is partitioned by connected components of
the POTENTIAL collision-pair graph over dynamic skeletons, with static
(0-dof) bodies never merging components. A world of N mutually-filtered
boxes over a ground plane solves N independent 6-dof LCPs instead of one
dense 6N-dof one; single-component worlds keep the monolithic path
unchanged.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nimblephysics_tpu.batched import BatchedEngine
from nimblephysics_tpu.models import box_stack, half_cheetah


def _scatter_world(n_boxes=3, filtered=True):
    """n free boxes over ground, inter-box collision filtered off."""
    world, q0, v0 = box_stack(n_boxes=n_boxes)
    if filtered:
        for i in range(n_boxes):
            for j in range(i + 1, n_boxes):
                world.collision_overrides[(i, j)] = False
    # Spread the boxes out horizontally and drop them all to just above
    # the plane (box i's free-joint translation dofs are 6i+3 .. 6i+5).
    q = np.asarray(q0, dtype=np.float64).copy()
    sizes = [0.2 * (0.75**i) for i in range(n_boxes)]
    for i in range(n_boxes):
        q[6 * i + 3] = 1.0 * i
        q[6 * i + 4] = 0.0
        q[6 * i + 5] = sizes[i] / 2 - 1e-4
    return world, q, np.asarray(v0, dtype=np.float64)


def test_single_component_worlds_stay_monolithic():
    world, _, _ = half_cheetah()
    assert BatchedEngine(world).islands is None
    world, _, _ = box_stack(n_boxes=3)  # unfiltered: box-box pairs merge
    assert BatchedEngine(world).islands is None


def test_partition_structure():
    n_boxes = 3
    world, _, _ = _scatter_world(n_boxes)
    engine = BatchedEngine(world)
    islands = engine.islands
    assert islands is not None and len(islands) == n_boxes
    all_rows = np.concatenate([rows for rows, _, _ in islands])
    assert sorted(all_rows.tolist()) == list(range(engine.num_rows))
    all_dofs = np.concatenate([dofs for _, dofs, _ in islands])
    assert sorted(all_dofs.tolist()) == list(range(world.num_dofs))
    for rows, dofs, meta in islands:
        assert len(dofs) == 6  # one free box each
        assert meta.n == len(rows)
        # findex stays internally consistent after the remap.
        fi = meta.findex
        assert np.all(fi[fi >= 0] < meta.n)
        assert np.array_equal(fi >= 0, meta.is_friction)


def _step_both(world, q, v, B=4, seed=0, body_params=None):
    rng = np.random.default_rng(seed)
    nv = world.num_dofs
    qb = jnp.asarray(
        np.tile(q[:, None], (1, B)) + 0.003 * rng.standard_normal((nv, B))
    )
    vb = jnp.asarray(0.05 * rng.standard_normal((nv, B)))
    u = jnp.zeros((nv, B))

    eng_i = BatchedEngine(world)
    assert eng_i.islands is not None
    solver0 = world.solver
    world.solver = dataclasses.replace(solver0, contact_islands=False)
    try:
        eng_m = BatchedEngine(world)
        assert eng_m.islands is None
        r_m = eng_m.step(qb, vb, u, body_params=body_params)
    finally:
        world.solver = solver0
    r_i = eng_i.step(qb, vb, u, body_params=body_params)
    return r_i, r_m


def test_island_step_matches_monolithic():
    world, q, v = _scatter_world(3)
    r_i, r_m = _step_both(world, q, v)
    np.testing.assert_allclose(
        np.asarray(r_i.q), np.asarray(r_m.q), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(r_i.v), np.asarray(r_m.v), atol=5e-6
    )
    np.testing.assert_allclose(
        np.asarray(r_i.impulses), np.asarray(r_m.impulses), atol=5e-6
    )
    # The step actually resolved contacts (boxes rest on the plane).
    assert float(jnp.max(jnp.abs(r_i.impulses))) > 0.0


def test_island_gradients_match_monolithic():
    world, q, v = _scatter_world(2)
    nv = world.num_dofs
    B = 2
    qb = jnp.asarray(np.tile(q[:, None], (1, B)))
    vb = jnp.zeros((nv, B))
    u0 = jnp.zeros((nv, B))

    def loss_fn(engine):
        def loss(qq, vv):
            r = engine.step(qq, vv, u0)
            return jnp.sum(r.q**2) + jnp.sum(r.v**2)

        return jax.grad(loss, argnums=(0, 1))(qb, vb)

    eng_i = BatchedEngine(world)
    solver0 = world.solver
    world.solver = dataclasses.replace(solver0, contact_islands=False)
    try:
        eng_m = BatchedEngine(world)
    finally:
        world.solver = solver0
    gq_i, gv_i = loss_fn(eng_i)
    gq_m, gv_m = loss_fn(eng_m)
    np.testing.assert_allclose(
        np.asarray(gq_i), np.asarray(gq_m), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(gv_i), np.asarray(gv_m), rtol=1e-4, atol=1e-6
    )


def test_island_collect_valid_and_warmstart():
    world, q, v = _scatter_world(2)
    engine = BatchedEngine(world)
    B = 3
    nv = world.num_dofs
    qb = jnp.asarray(np.tile(q[:, None], (1, B)))
    vb = jnp.zeros((nv, B))
    u = jnp.zeros((nv, B))
    r1 = engine.step(qb, vb, u, collect_valid=True)
    assert r1.lcp_valid is not None and r1.lcp_valid.shape == (B,)
    assert bool(jnp.all(r1.lcp_valid))
    # Warm-started second step consumes the island-ordered impulses.
    r2 = engine.step(r1.q, r1.v, u, z_warm=r1.impulses)
    assert np.all(np.isfinite(np.asarray(r2.q)))
