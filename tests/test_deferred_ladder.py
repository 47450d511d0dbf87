"""Deferred failure ladder (batched/rollout.py): the LCP fallback cond
hoisted out of rollout scans, with reference-parity fallback gradients.

Reference analog: the ladder itself is BoxedLcpConstraintSolver.cpp:
392-646; fallback gradients from the ladder impulse's classification are
:716-734 (registerLCPResults with the softened mX -> constructMatrices).
"""

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.batched import lcp as blcp
from nimblephysics_tpu.batched.rollout import (
    LADDER_OFF,
    LADDER_ON,
    all_valid,
    deferred_ladder_scan,
)

import worlds
from test_lcp_ladder import _contact_meta, _B, _F, _MU


def _wedged_batch(B=3):
    meta = _contact_meta(2)
    F_b = jnp.asarray(np.repeat(_F[:, :, None], B, axis=2))
    b_b = jnp.asarray(np.repeat(_B[:, None], B, axis=1))
    mu_b = jnp.asarray(np.repeat(_MU[:, None], B, axis=1))
    return meta, F_b, b_b, mu_b


def test_return_valid_flags_wedged_worlds():
    meta, F_b, b_b, mu_b = _wedged_batch()
    z, valid = blcp.boxed_lcp_b(
        meta, F_b, b_b, mu_b, jnp.zeros_like(b_b), cfm=0.0,
        fallback_cfm=0.0, return_valid=True,
    )
    assert not np.asarray(valid).any()
    # healthy island: valid everywhere
    meta1 = _contact_meta(1)
    F1 = jnp.asarray([[1.0, 0.0], [0.0, 0.5], [0.3, 0.1]])[:, :, None]
    b1 = jnp.asarray([0.2, 0.0, 0.0])[:, None]
    mu1 = jnp.asarray([0.0, 0.9, 0.9])[:, None]
    _, valid1 = blcp.boxed_lcp_b(
        meta1, F1, b1, mu1, jnp.zeros_like(b1), cfm=0.0,
        fallback_cfm=0.0, return_valid=True,
    )
    assert np.asarray(valid1).all()


def test_reclassify_same_impulse_nonzero_gradients():
    """fallback_gradients='reclassify' keeps the ladder's forward impulse
    bit-for-bit while attaching gradients from the reclassified pinned
    solve (the reference recipe); the default stop-gradient path returns
    zero gradients for the same wedged worlds."""
    meta, F_b, b_b, mu_b = _wedged_batch()
    z0 = jnp.zeros_like(b_b)

    def solve(b, mode):
        return blcp.boxed_lcp_b(
            meta, F_b, b, mu_b, z0, cfm=0.0, fallback_cfm=1e-4,
            fallback_gradients=mode,
        )

    z_plain = solve(b_b, False)
    z_recls = solve(b_b, "reclassify")
    np.testing.assert_array_equal(np.asarray(z_plain), np.asarray(z_recls))

    g_plain = jax.grad(lambda b: jnp.sum(solve(b, False) ** 2))(b_b)
    g_recls = jax.grad(lambda b: jnp.sum(solve(b, "reclassify") ** 2))(b_b)
    assert np.allclose(np.asarray(g_plain), 0.0)
    g = np.asarray(g_recls)
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0.0


def test_combinator_keeps_clean_scan():
    """Healthy worlds: the deferred scan returns the ladder-free result
    and never takes the rerun branch."""
    calls = {"on": 0}

    def body(c, x, lk):
        if lk is LADDER_ON:
            calls["on"] += 1  # trace-time marker: rerun branch traced
            return c + 1.0, c, jnp.array(True)
        return c + 1.0, c, jnp.array(True)

    final, outs = deferred_ladder_scan(body, jnp.array(0.0), None, length=4)
    assert float(final) == 4.0
    np.testing.assert_allclose(np.asarray(outs), [0, 1, 2, 3])


def test_combinator_rerun_on_failure():
    """A failing step flips the scan to the ladder-armed rerun."""

    def body(c, x, lk):
        armed = lk is LADDER_ON
        out = c + (10.0 if armed else 1.0)
        return out, out, jnp.array(False)  # every step reports failure

    final, outs = deferred_ladder_scan(body, jnp.array(0.0), None, length=3)
    np.testing.assert_allclose(np.asarray(outs), [10.0, 20.0, 30.0])
    assert float(final) == 30.0


def test_engine_deferred_matches_lazy_trajectory():
    """Box-on-ground rollout: deferred-ladder scan == per-step lazy
    ladder trajectories (healthy contacts -> both take the primary
    solve)."""
    from nimblephysics_tpu.batched import BatchedEngine
    from nimblephysics_tpu.simulation.world import World

    world = World(gravity=(0.0, 0.0, -9.81), time_step=0.001)
    world.add_skeleton(worlds.free_box(restitution=0.2))
    world.add_skeleton(worlds.ground_plane())
    eng = BatchedEngine(world)
    B = 4
    dtype = jnp.float64
    q = jnp.zeros((world.num_dofs, B), dtype)
    q = q.at[5].set(jnp.asarray([0.2, 0.15, 0.12, 0.3], dtype))
    v = jnp.zeros_like(q)
    u = jnp.zeros_like(q)
    nrows = eng.num_rows
    z0 = jnp.zeros((nrows, B), dtype)

    def lazy(carry):
        def body(c, _):
            qq, vv, zz = c
            r = eng.step(qq, vv, u, z_warm=zz)
            return (r.q, r.v, r.impulses), None

        c, _ = jax.lax.scan(body, carry, None, length=20)
        return c

    def deferred(carry):
        def body(c, _, lk):
            qq, vv, zz = c
            r = eng.step(qq, vv, u, z_warm=zz, **lk)
            return (r.q, r.v, r.impulses), None, all_valid(r)

        c, _ = deferred_ladder_scan(body, carry, None, length=20)
        return c

    ql, vl, _ = lazy((q, v, z0))
    qd, vd, _ = deferred((q, v, z0))
    np.testing.assert_allclose(np.asarray(ql), np.asarray(qd), atol=1e-12)
    np.testing.assert_allclose(np.asarray(vl), np.asarray(vd), atol=1e-12)
