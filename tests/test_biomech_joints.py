"""The four biomechanics joint types (VERDICT round-1 missing #6):
Ellipsoid, Scapulathoracic, ConstantCurve, ConstantCurveIncompressible
(reference: dart/dynamics/{EllipsoidJoint,ScapulathoracicJoint,
ConstantCurveJoint,ConstantCurveIncompressibleJoint}.cpp).

Checks: transform properties (rigid, on-surface translation), body
Jacobian S(q) consistency vs finite differences of Q(q), and full
dynamics (mass matrix PD, FD-consistent timestep Jacobians) with each
joint inside a skeleton.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nimblephysics_tpu.dynamics import joints as J
from nimblephysics_tpu.dynamics.skeleton import (
    Skeleton,
    mass_matrix,
)
from nimblephysics_tpu.math import finite_difference_jacobian
from nimblephysics_tpu.neural.timestep import Engine
from nimblephysics_tpu.simulation.world import World


def _spec(jt, props=None):
    return J.JointSpec(
        joint_type=jt, name="j", parent=-1, child=0, q_index=0,
        T_pj=np.eye(4), T_cj=np.eye(4), props=props,
    )


TYPES = [
    (J.ELLIPSOID_JOINT, {"radii": (0.07, 0.05, 0.09)}),
    (
        J.SCAPULATHORACIC,
        {
            "radii": (0.07, 0.05, 0.09),
            "winging_axis_offset": (0.02, -0.01),
            "winging_axis_direction": 0.4,
        },
    ),
    (J.CONSTANT_CURVE, {"neutral": (0.0, 0.0, 0.0, 0.3)}),
    (
        J.CONSTANT_CURVE_INCOMPRESSIBLE,
        {"length": 0.35, "neutral": (0.05, 0.0, -0.02)},
    ),
]
IDS = [t[0] for t in TYPES]


@pytest.mark.parametrize("jt,props", TYPES, ids=IDS)
def test_transform_is_rigid(jt, props):
    spec = _spec(jt, props)
    rng = np.random.RandomState(0)
    for _ in range(4):
        q = jnp.asarray(0.5 * rng.randn(J.num_dofs(jt)))
        T = np.asarray(J.joint_transform(spec, q))
        R = T[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-12)
        assert np.allclose(T[3], [0, 0, 0, 1])


def test_ellipsoid_translation_stays_on_ellipsoid():
    radii = np.array([0.07, 0.05, 0.09])
    spec = _spec(J.ELLIPSOID_JOINT, {"radii": tuple(radii)})
    rng = np.random.RandomState(1)
    for _ in range(6):
        q = jnp.asarray(0.8 * rng.randn(3))
        p = np.asarray(J.joint_transform(spec, q))[:3, 3]
        # (p / radii) is on the unit sphere.
        np.testing.assert_allclose(np.sum((p / radii) ** 2), 1.0, atol=1e-10)


def test_constant_curve_arc_length():
    """The bent-rod translation approaches straight length at zero bend
    and shortens the chord with curvature (constant-curvature arc)."""
    spec = _spec(J.CONSTANT_CURVE, {})
    # Straight: q = 0 bend, length 0.4 -> translation (0, 0.4, 0).
    p = np.asarray(
        J.joint_transform(spec, jnp.asarray([0.0, 0.0, 0.0, 0.4]))
    )[:3, 3]
    np.testing.assert_allclose(p, [0.0, 0.4, 0.0], atol=1e-9)
    # Bent: chord shorter than arc length.
    p = np.asarray(
        J.joint_transform(spec, jnp.asarray([0.7, 0.0, 0.0, 0.4]))
    )[:3, 3]
    assert np.linalg.norm(p) < 0.4
    # Chord of a circular arc with angle theta: 2 r sin(theta/2).
    theta = 0.7
    r = 0.4 / theta
    np.testing.assert_allclose(
        np.linalg.norm(p), 2 * r * np.sin(theta / 2), atol=1e-9
    )


@pytest.mark.parametrize("jt,props", TYPES, ids=IDS)
def test_body_jacobian_vs_fd(jt, props):
    """S(q) columns (from the generic AD fallback) match FD of Q:
    vee(Q^-1 dQ/dq_j)."""
    spec = _spec(jt, props)
    nd = J.num_dofs(jt)
    rng = np.random.RandomState(2)
    q = 0.4 * rng.randn(nd)
    S = np.asarray(J.joint_body_jacobian(spec, jnp.asarray(q)))
    assert S.shape == (6, nd)
    h = 1e-7
    from nimblephysics_tpu.math import lie

    for j in range(nd):
        qp, qm = q.copy(), q.copy()
        qp[j] += h
        qm[j] -= h
        Qp = np.asarray(J.joint_transform(spec, jnp.asarray(qp)))
        Qm = np.asarray(J.joint_transform(spec, jnp.asarray(qm)))
        Q0 = np.asarray(J.joint_transform(spec, jnp.asarray(q)))
        dQ = (Qp - Qm) / (2 * h)
        body = np.linalg.inv(Q0) @ dQ
        w = np.array([body[2, 1], body[0, 2], body[1, 0]])
        v = body[:3, 3]
        np.testing.assert_allclose(S[:3, j], w, atol=1e-6)
        np.testing.assert_allclose(S[3:, j], v, atol=1e-6)


@pytest.mark.parametrize("jt,props", TYPES, ids=IDS)
def test_dynamics_with_joint(jt, props):
    """A skeleton containing the joint steps with FD-consistent dynamics."""
    sk = Skeleton(f"test_{jt}")
    sk.add_joint_and_body(
        jt, parent=-1, name="seg", props=props, mass=1.5,
        com=(0.0, 0.05, 0.0), inertia=np.eye(3) * 0.01,
    )
    w = World(gravity=(0.0, -9.81, 0.0), time_step=0.001)
    w.add_skeleton(sk)
    eng = Engine(w)
    nd = sk.num_dofs
    rng = np.random.RandomState(3)
    q = jnp.asarray(0.3 * rng.randn(nd))
    v = jnp.asarray(0.3 * rng.randn(nd))
    u = jnp.asarray(0.1 * rng.randn(nd))

    M = np.asarray(mass_matrix(sk, q))
    assert np.linalg.eigvalsh(M).min() > 0, "mass matrix not PD"

    @jax.jit
    def f(state):
        r = eng.step(state[:nd], state[nd:], u)
        return jnp.concatenate([r.q, r.v])

    x0 = np.concatenate([np.asarray(q), np.asarray(v)])
    J_ad = np.asarray(jax.jacfwd(f)(jnp.asarray(x0)))
    J_fd = finite_difference_jacobian(
        lambda x: np.asarray(f(jnp.asarray(x))), x0
    )
    np.testing.assert_allclose(J_ad, J_fd, atol=2e-6, rtol=2e-6)
