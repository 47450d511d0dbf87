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
