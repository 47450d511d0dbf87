"""Bundled programmatic humanoid (models/human.py — the reference's
bundled Rajagopal model convenience, python/nimblephysics/models/
rajagopal.py, as a programmatic skeleton)."""

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.models import human_standing, rajagopal_humanoid


def test_topology_and_anthropometry():
    sk, markers = rajagopal_humanoid(total_mass=75.16, height=1.70)
    assert sk.num_dofs == 38  # 6 root + 2*7 legs + 3 lumbar + 3 neck + 2*7 arms
    assert sk.num_bodies == 19
    assert len(markers) >= 20
    total = sum(b.mass for b in sk.bodies)
    assert abs(total - 75.16) / 75.16 < 0.05  # de Leva fractions ~sum to 1
    names = {b.name for b in sk.bodies}
    for expect in ("pelvis", "torso", "femur_r", "tibia_l", "calcn_r",
                   "humerus_l", "ulna_r", "hand_l", "head"):
        assert expect in names, expect


def test_marker_fk_is_differentiable():
    from nimblephysics_tpu.biomechanics.scaled_fk import (
        marker_table,
        marker_world_positions,
    )

    sk, _ = rajagopal_humanoid()
    names, bodies, offsets, _fixed = marker_table(sk)
    q = jnp.zeros(sk.num_dofs)

    def f(q):
        return marker_world_positions(
            sk, q, jnp.asarray(bodies), jnp.asarray(offsets)
        )

    pts = f(q)
    assert pts.shape == (len(names), 3)
    assert bool(jnp.all(jnp.isfinite(pts)))
    g = jax.jacrev(f)(q)
    assert bool(jnp.all(jnp.isfinite(g)))
    # Left/right marker symmetry at the zero pose.
    idx = {n: i for i, n in enumerate(names)}
    for pair in (("RASI", "LASI"), ("RKNE", "LKNE"), ("RANK", "LANK")):
        r, l = np.asarray(pts[idx[pair[0]]]), np.asarray(pts[idx[pair[1]]])
        np.testing.assert_allclose(r[[0, 1]], l[[0, 1]], atol=1e-9)
        np.testing.assert_allclose(r[2], -l[2], atol=1e-9)


def test_standing_world_steps():
    from nimblephysics_tpu.neural.timestep import Engine

    w, q0, v0 = human_standing()
    eng = Engine(w)
    q, v = jnp.asarray(q0), jnp.asarray(v0)

    @jax.jit
    def roll(q, v):
        def body(c, _):
            q, v = c
            r = eng.step(q, v, jnp.zeros(w.num_dofs))
            return (r.q, r.v), None

        return jax.lax.scan(body, (q, v), None, length=50)[0]

    qf, vf = roll(q, v)
    assert bool(jnp.all(jnp.isfinite(qf)))
    # Still standing: pelvis above half its initial height after 50 ms.
    assert float(qf[4]) > 0.5 * float(q0[4])
