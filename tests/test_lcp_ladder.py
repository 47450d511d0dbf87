"""LCP failure ladder (reference parity: BoxedLcpConstraintSolver.cpp:
392-646 Dantzig -> PGS -> CFM-softened retries -> ignore-friction).

The wedged island below (found by randomized search over friction-coupled
contact LCPs, high mu) defeats the pinned active-set polish: without the
ladder the solver silently keeps the iterative seed, which does NOT
satisfy the (softened) LCP; with the ladder the CFM rung returns a valid
solution of the softened problem.
"""

import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.constraint import lcp as slcp
from nimblephysics_tpu.batched import lcp as blcp


def _contact_meta(C):
    n = 3 * C
    findex = np.full(n, -1, np.int32)
    isf = np.zeros(n, bool)
    for c in range(C):
        findex[3 * c + 1] = 3 * c
        findex[3 * c + 2] = 3 * c
        isf[3 * c + 1] = True
        isf[3 * c + 2] = True
    return slcp.LcpMeta(
        findex=findex, is_friction=isf, iterations=24, refine_rounds=3
    )


# The wedged island (2 contacts, mu ~ 25, rank-2 Delassus).
_F = np.array(
    [
        [-0.331251, 0.316671],
        [0.418912, 0.296337],
        [-0.190547, 0.004128],
        [-0.104258, -0.010608],
        [0.102123, -0.012412],
        [-0.083917, -0.617333],
    ]
)
_B = np.array([0.003603, -0.015651, 0.0003, 0.012215, -0.002442, -0.00458])
_MU = np.array([0.0, 25.286028, 25.286028, 0.0, 25.286028, 25.286028])


def test_cfm_ladder_rescues_wedged_island():
    meta = _contact_meta(2)
    F, b, mu = jnp.asarray(_F), jnp.asarray(_B), jnp.asarray(_MU)
    z0 = jnp.zeros(6)
    soft = 1e-4

    z_no = slcp.boxed_lcp(meta, F, b, mu, z0, cfm=0.0, fallback_cfm=0.0)
    z_yes = slcp.boxed_lcp(meta, F, b, mu, z0, cfm=0.0, fallback_cfm=soft)

    ok_no = bool(slcp._lcp_valid(meta, F, soft, b, mu, z_no))
    ok_yes = bool(slcp._lcp_valid(meta, F, soft, b, mu, z_yes))
    assert not ok_no, "island no longer wedged — pick a harder case"
    assert ok_yes, "CFM ladder failed to rescue the wedged island"


def test_cfm_ladder_batched_rescues_too():
    """The batched ladder must also produce a VALID softened solution on
    the wedged island. (Exact value parity with the single-world path is
    NOT asserted: on an adversarial island the two pinned-solve
    implementations can accept different rungs of the ladder — both valid
    solutions of their softened problems.)"""
    meta = _contact_meta(2)
    B = 3
    F_b = jnp.asarray(np.repeat(_F[:, :, None], B, axis=2))
    b_b = jnp.asarray(np.repeat(_B[:, None], B, axis=1))
    mu_b = jnp.asarray(np.repeat(_MU[:, None], B, axis=1))
    z_no = blcp.boxed_lcp_b(
        meta, F_b, b_b, mu_b, jnp.zeros((6, B)), cfm=0.0, fallback_cfm=0.0
    )
    z_yes = blcp.boxed_lcp_b(
        meta, F_b, b_b, mu_b, jnp.zeros((6, B)), cfm=0.0, fallback_cfm=1e-4
    )
    ok_no = np.asarray(blcp._lcp_valid(meta, F_b, 1e-4, b_b, mu_b, z_no))
    ok_yes = np.asarray(blcp._lcp_valid(meta, F_b, 1e-4, b_b, mu_b, z_yes))
    assert not ok_no.any(), "island no longer wedged for the batched path"
    assert ok_yes.all(), "batched CFM ladder failed to rescue"


def test_always_mode_matches_lazy():
    """ladder_mode="always" (cond-free rungs + per-world select — the
    SolverConfig.throughput() scheduling) must ship the SAME impulses as
    the lazy cond ladder, on both wedged and healthy islands."""
    meta = _contact_meta(2)
    B = 4
    F_b = np.repeat(_F[:, :, None], B, axis=2)
    b_b = np.repeat(_B[:, None], B, axis=1)
    mu_b = np.repeat(_MU[:, None], B, axis=1)
    # Make lanes 2-3 healthy resting contacts so the batch mixes worlds
    # that take the ladder with worlds that must not be perturbed by it.
    F_b[:, :, 2:] = np.array(
        [[1.0, 0.0], [0.0, 0.5], [0.3, 0.1],
         [0.9, 0.05], [0.1, 0.6], [0.2, 0.2]]
    )[:, :, None]
    b_b[:, 2:] = np.array([0.2, 0.0, 0.0, 0.15, 0.0, 0.0])[:, None]
    mu_b[:, 2:] = np.array([0.0, 0.9, 0.9, 0.0, 0.9, 0.9])[:, None]
    F_b, b_b, mu_b = jnp.asarray(F_b), jnp.asarray(b_b), jnp.asarray(mu_b)
    z0 = jnp.zeros((6, B))
    z_lazy, ok_lazy = blcp.boxed_lcp_b(
        meta, F_b, b_b, mu_b, z0, fallback_cfm=1e-4,
        ladder_mode="lazy", return_valid=True,
    )
    z_alw, ok_alw = blcp.boxed_lcp_b(
        meta, F_b, b_b, mu_b, z0, fallback_cfm=1e-4,
        ladder_mode="always", return_valid=True,
    )
    # atol: XLA fuses the inline rungs differently from the cond branch
    # (measured max |dz| = 1.4e-14 on the 100-magnitude wedged impulses).
    np.testing.assert_allclose(np.asarray(z_lazy), np.asarray(z_alw),
                               rtol=0, atol=1e-11)
    np.testing.assert_array_equal(np.asarray(ok_lazy), np.asarray(ok_alw))
    # And on an all-healthy batch (where the lazy cond never fires).
    Fh, bh, muh = F_b[:, :, 2:], b_b[:, 2:], mu_b[:, 2:]
    zh0 = jnp.zeros((6, B - 2))
    z_l = blcp.boxed_lcp_b(meta, Fh, bh, muh, zh0, fallback_cfm=1e-4,
                           ladder_mode="lazy")
    z_a = blcp.boxed_lcp_b(meta, Fh, bh, muh, zh0, fallback_cfm=1e-4,
                           ladder_mode="always")
    np.testing.assert_allclose(np.asarray(z_l), np.asarray(z_a),
                               rtol=0, atol=1e-11)


def test_throughput_preset_physics_parity():
    """SolverConfig.throughput() (always-armed ladder, pgs polish off,
    refine2/it24) must track the default solver knobs on a warm-started
    contact rollout — the supported preset behind bench.py."""
    import jax

    from nimblephysics_tpu.batched import BatchedEngine
    from nimblephysics_tpu.models import half_cheetah
    from nimblephysics_tpu.simulation.world import SolverConfig

    world, q0, v0 = half_cheetah()
    eng_def = BatchedEngine(world)
    world_t, _, _ = half_cheetah()
    world_t.solver = SolverConfig.throughput()
    eng_thr = BatchedEngine(world_t)

    B = 3
    q = jnp.tile(jnp.asarray(q0)[:, None], (1, B))
    q = q.at[1].add(jnp.asarray([0.0, 0.01, -0.01]))
    v = jnp.tile(jnp.asarray(v0)[:, None], (1, B))

    def roll(eng, q, v):
        z = jnp.zeros((eng.num_rows, B))

        def body(c, _):
            q, v, z = c
            r = eng.step(q, v, jnp.zeros((world.num_dofs, B)), z_warm=z)
            return (r.q, r.v, r.impulses), None

        (qf, vf, _), _ = jax.lax.scan(body, (q, v, z), None, length=30)
        return qf, vf

    q_d, v_d = roll(eng_def, q, v)
    q_t, v_t = roll(eng_thr, q, v)
    assert np.isfinite(np.asarray(q_t)).all()
    np.testing.assert_allclose(np.asarray(q_t), np.asarray(q_d),
                               rtol=0, atol=5e-4)
    np.testing.assert_allclose(np.asarray(v_t), np.asarray(v_d),
                               rtol=0, atol=5e-3)


def test_ladder_does_not_perturb_healthy_islands():
    """On a clean resting contact the ladder must be inert (identical z)."""
    meta = _contact_meta(1)
    F = jnp.asarray([[1.0, 0.0], [0.0, 0.5], [0.3, 0.1]])
    b = jnp.asarray([0.2, 0.0, 0.0])
    mu = jnp.asarray([0.0, 0.9, 0.9])
    z0 = jnp.zeros(3)
    z_no = slcp.boxed_lcp(meta, F, b, mu, z0, cfm=0.0, fallback_cfm=0.0)
    z_yes = slcp.boxed_lcp(meta, F, b, mu, z0, cfm=0.0, fallback_cfm=1e-4)
    np.testing.assert_allclose(np.asarray(z_no), np.asarray(z_yes), atol=0)


def test_pallas_block_picker_fits_vmem():
    """Lane-block selection for the Pallas APGD kernel: the flagship
    bench shape keeps the full 512-lane block, box-stack-class shapes
    step down, Atlas-class LCPs fall back to the pure-JAX seed (0)."""
    from nimblephysics_tpu.batched.lcp_pallas import _pick_block

    budget = 14 * 1024 * 1024
    # half-cheetah bench shape: unchanged fast path.
    assert _pick_block(60, 9, 4096, False) == 512
    assert _pick_block(60, 9, 4096, True) == 512
    # the observed Mosaic OOM shape (n=144, r=18, pgs polish on) must
    # not pick 512.
    blk = _pick_block(144, 18, 4096, True)
    assert 0 < blk < 512
    assert 4 * 144 * blk * (3 * 18 + 12 + 18 + 8) <= budget
    # hundreds-of-rows LCPs: no block fits -> pure-JAX seed.
    assert _pick_block(360, 60, 1024, True) == 0
    # block must divide the batch.
    assert _pick_block(60, 9, 100, False) == 0
