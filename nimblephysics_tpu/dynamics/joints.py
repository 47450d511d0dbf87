"""Joint type definitions: transform Q(q), body Jacobian S(q), integration.

TPU-native re-design of the reference joint family (dart/dynamics/*Joint*,
19 concrete types via CRTP GenericJoint — SURVEY.md section 2.1). Instead of
virtual dispatch, each joint type is a set of pure functions keyed by a
static type tag; skeletons unroll over their (static) joint list at trace
time, so XLA sees straight-line code with no ragged control flow.

Conventions (match the reference):
  * Relative transform of child body w.r.t. parent body:
        T_rel(q) = T_pj @ Q(q) @ inv(T_cj)
    with T_pj = transformFromParentBodyNode, T_cj = transformFromChildBodyNode
    (reference: dart/dynamics/Joint.hpp relative-transform contract).
  * Relative spatial velocity of the child body, in the child body frame:
        V = Ad(T_cj) S(q) qdot
    where S(q) is the *body* (right) Jacobian of Q: (Q^-1 Qdot)^vee = S qdot.
    (Verified against FreeJoint::getRelativeJacobianStatic,
    dart/dynamics/FreeJoint.cpp:536 — non-identity-Jacobian convention.)
  * Position integration is per-type `integrate_positions(q, dq, dt)`
    (reference: Joint::integratePositionsExplicit, Joint.hpp:590):
    Euclidean for single-dof/translational joints, exp-map composition for
    ball/free (FreeJoint/BallJoint::integratePositionsExplicit).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.math import lie

# Static joint type tags.
REVOLUTE = "revolute"
PRISMATIC = "prismatic"
SCREW = "screw"
UNIVERSAL = "universal"
BALL = "ball"
EULER = "euler"
TRANSLATIONAL = "translational"
TRANSLATIONAL_2D = "translational2d"
PLANAR = "planar"
FREE = "free"
EULER_FREE = "eulerfree"
WELD = "weld"
CUSTOM = "custom"  # spline-driven (OpenSim)
# Biomechanics joint types (reference: dart/dynamics/EllipsoidJoint.hpp,
# ScapulathoracicJoint.hpp, ConstantCurveJoint.hpp,
# ConstantCurveIncompressibleJoint.hpp — the shoulder/spine joints
# OpenSim models need). Parameters live in JointSpec.props.
ELLIPSOID_JOINT = "ellipsoid"
SCAPULATHORACIC = "scapulathoracic"
CONSTANT_CURVE = "constantcurve"
CONSTANT_CURVE_INCOMPRESSIBLE = "constantcurveincompressible"

_NUM_DOFS = {
    REVOLUTE: 1,
    PRISMATIC: 1,
    SCREW: 1,
    UNIVERSAL: 2,
    BALL: 3,
    EULER: 3,
    TRANSLATIONAL: 3,
    TRANSLATIONAL_2D: 2,
    PLANAR: 3,
    FREE: 6,
    EULER_FREE: 6,
    WELD: 0,
    ELLIPSOID_JOINT: 3,
    SCAPULATHORACIC: 4,
    CONSTANT_CURVE: 4,
    CONSTANT_CURVE_INCOMPRESSIBLE: 3,
}


def num_dofs(joint_type: str) -> int:
    return _NUM_DOFS[joint_type]


@dataclasses.dataclass(frozen=True, eq=False)
class CustomJointDef:
    """CustomJoint definition (reference: dart/dynamics/CustomJoint — the
    spline-driven joint OpenSim models need; SURVEY.md 2.1 joint #4).

    Six TransformAxis entries (3 rotations then 3 translations), each a
    1-D function of one of the joint's coordinates (or a constant):
      R = exp(rot_axes[0] * f0) @ exp(rot_axes[1] * f1) @ exp(rot_axes[2] * f2)
      p = sum_i trans_axes[i] * f_{3+i}
    """

    n_dofs: int
    rot_axes: "np.ndarray"  # (3, 3) rows = axes
    trans_axes: "np.ndarray"  # (3, 3)
    functions: tuple  # 6 x math.splines.Fn
    drives: tuple  # 6 x int: coordinate index driving each axis (-1 = none)


@dataclasses.dataclass(frozen=True, eq=False)  # identity hash: jit-static
class JointSpec:
    """Static description of one joint (trace-time constant).

    Mirrors the reference's Joint::Properties (transforms, axes, limits,
    damping/spring/friction coefficients) as a hashable pytree-free spec.
    """

    joint_type: str
    name: str
    parent: int  # parent body index; -1 = world
    child: int  # child body index
    q_index: int  # offset into the skeleton's q vector
    # Fixed frame offsets (4x4 homogeneous, numpy — static constants):
    T_pj: np.ndarray  # transformFromParentBodyNode
    T_cj: np.ndarray  # transformFromChildBodyNode
    # Axes: shape (ndof_axes, 3); meaning depends on type.
    axes: Optional[np.ndarray] = None
    euler_order: str = "xyz"
    screw_pitch: float = 0.0
    # Per-dof coefficients:
    damping: Optional[np.ndarray] = None
    spring_stiffness: Optional[np.ndarray] = None
    rest_position: Optional[np.ndarray] = None
    position_lower: Optional[np.ndarray] = None
    position_upper: Optional[np.ndarray] = None
    velocity_limit: Optional[np.ndarray] = None
    force_limit: Optional[np.ndarray] = None
    custom: Optional["CustomJointDef"] = None  # for joint_type == CUSTOM
    # Per-type static parameters for the biomechanics joints:
    #   ellipsoid/scapulathoracic: radii (3,), euler_order, flip (3|4,),
    #     winging_axis_offset (2,), winging_axis_direction (scalar)
    #   constantcurve(.incompressible): neutral (3|4,), flip (3,),
    #     length (incompressible only)
    props: Optional[dict] = None

    @property
    def num_dofs(self) -> int:
        if self.joint_type == CUSTOM:
            return self.custom.n_dofs
        return _NUM_DOFS[self.joint_type]

    def _coeff(self, field, default):
        v = getattr(self, field)
        if v is None:
            return np.full((self.num_dofs,), default, dtype=np.float64)
        return np.asarray(v, dtype=np.float64)

    def damping_vec(self):
        return self._coeff("damping", 0.0)

    def spring_vec(self):
        return self._coeff("spring_stiffness", 0.0)

    def rest_vec(self):
        return self._coeff("rest_position", 0.0)

    def pos_lower_vec(self):
        return self._coeff("position_lower", -np.inf)

    def pos_upper_vec(self):
        return self._coeff("position_upper", np.inf)

    def force_limit_vec(self):
        return self._coeff("force_limit", np.inf)

    def velocity_limit_vec(self):
        return self._coeff("velocity_limit", np.inf)


# ---------------------------------------------------------------------------
# Q(q): joint-frame transform
# ---------------------------------------------------------------------------


def joint_transform(spec: JointSpec, q: jnp.ndarray) -> jnp.ndarray:
    """Joint configuration transform Q(q) as a 4x4 matrix."""
    t = spec.joint_type
    dtype = q.dtype if hasattr(q, "dtype") else jnp.float64
    if t == WELD:
        return jnp.eye(4, dtype=dtype)
    if t == REVOLUTE:
        axis = jnp.asarray(spec.axes[0], dtype=dtype)
        return lie.rp_to_transform(
            lie.exp_map_rot(axis * q[0]), jnp.zeros(3, dtype=dtype)
        )
    if t == PRISMATIC:
        axis = jnp.asarray(spec.axes[0], dtype=dtype)
        return lie.rp_to_transform(jnp.eye(3, dtype=dtype), axis * q[0])
    if t == SCREW:
        axis = jnp.asarray(spec.axes[0], dtype=dtype)
        return lie.rp_to_transform(
            lie.exp_map_rot(axis * q[0]), axis * (q[0] * spec.screw_pitch)
        )
    if t == UNIVERSAL:
        a0 = jnp.asarray(spec.axes[0], dtype=dtype)
        a1 = jnp.asarray(spec.axes[1], dtype=dtype)
        R = lie.exp_map_rot(a0 * q[0]) @ lie.exp_map_rot(a1 * q[1])
        return lie.rp_to_transform(R, jnp.zeros(3, dtype=dtype))
    if t == BALL:
        return lie.rp_to_transform(
            lie.exp_map_rot(q), jnp.zeros(3, dtype=dtype)
        )
    if t == EULER:
        return lie.rp_to_transform(
            lie.euler_to_matrix(q, spec.euler_order), jnp.zeros(3, dtype=dtype)
        )
    if t == TRANSLATIONAL:
        return lie.rp_to_transform(jnp.eye(3, dtype=dtype), q)
    if t == TRANSLATIONAL_2D:
        a0 = jnp.asarray(spec.axes[0], dtype=dtype)
        a1 = jnp.asarray(spec.axes[1], dtype=dtype)
        return lie.rp_to_transform(jnp.eye(3, dtype=dtype), a0 * q[0] + a1 * q[1])
    if t == PLANAR:
        # Two translations in the plane + rotation about the plane normal.
        a0 = jnp.asarray(spec.axes[0], dtype=dtype)  # trans axis 1
        a1 = jnp.asarray(spec.axes[1], dtype=dtype)  # trans axis 2
        normal = jnp.cross(a0, a1)
        return lie.rp_to_transform(
            lie.exp_map_rot(normal * q[2]), a0 * q[0] + a1 * q[1]
        )
    if t == FREE:
        # q = [logmap rotation; translation]
        # (reference: FreeJoint::convertToTransform, FreeJoint.cpp:74).
        return lie.rp_to_transform(lie.exp_map_rot(q[:3]), q[3:])
    if t == EULER_FREE:
        return lie.rp_to_transform(
            lie.euler_to_matrix(q[:3], spec.euler_order), q[3:]
        )
    if t in (ELLIPSOID_JOINT, SCAPULATHORACIC):
        # Reference: EllipsoidJoint::updateRelativeTransform
        # (EllipsoidJoint.cpp:128-162) / ScapulathoracicJoint.cpp:154-198.
        pr = spec.props or {}
        radii = jnp.asarray(pr.get("radii", (1.0, 1.0, 1.0)), dtype=dtype)
        flip = np.asarray(pr.get("flip", np.ones(4)))
        order = pr.get("euler_order", "xyz")
        # Euler ball conjugated into +90Z space.
        eulerR = jnp.asarray(
            [[0.0, 1.0, 0.0], [-1.0, 0.0, 0.0], [0.0, 0.0, 1.0]],
            dtype=dtype,
        )
        Re = lie.euler_to_matrix(
            q[:3] * jnp.asarray(flip[:3], dtype=dtype), order
        )
        R = eulerR.T @ Re @ eulerR
        p = (R @ jnp.asarray([0.0, 0.0, 1.0], dtype=dtype)) * radii
        if t == SCAPULATHORACIC:
            # Winging: rotation about an axis in the XY plane, offset in
            # the tangent plane (ScapulathoracicJoint.cpp:158-169).
            alpha = float(pr.get("winging_axis_direction", 0.0))
            off = np.asarray(pr.get("winging_axis_offset", (0.0, 0.0)))
            wdir = jnp.asarray(
                [-np.sin(alpha), np.cos(alpha), 0.0], dtype=dtype
            )
            Rw = lie.exp_map_rot(wdir * (q[3] * float(flip[3])))
            wo = jnp.asarray([off[0], off[1], 0.0], dtype=dtype)
            # T(wo) Rw T(-wo) composed after the ellipsoid surface.
            p_w = wo - Rw @ wo
            R_full = R @ Rw
            p_full = R @ p_w + p
            return lie.rp_to_transform(R_full, p_full)
        return lie.rp_to_transform(R, p)
    if t in (CONSTANT_CURVE, CONSTANT_CURVE_INCOMPRESSIBLE):
        # Reference: ConstantCurveJoint::updateRelativeTransform
        # (ConstantCurveJoint.cpp:105-150): XZY euler bend + a
        # constant-curvature rod of length d bent away from vertical.
        pr = spec.props or {}
        neutral = jnp.asarray(
            pr.get("neutral", np.zeros(num_dofs(t))), dtype=dtype
        )
        flip = jnp.asarray(pr.get("flip", np.ones(3)), dtype=dtype)
        pos = q + neutral
        if t == CONSTANT_CURVE:
            d = pos[3]
        else:
            d = jnp.asarray(float(pr.get("length", 1.0)), dtype=dtype)
        R = lie.euler_to_matrix(pos[:3] * flip, "xzy")
        cx, sx = jnp.cos(pos[0]), jnp.sin(pos[0])
        cz, sz = jnp.cos(pos[1]), jnp.sin(pos[1])
        linear_angle = jnp.stack([-sz, cx * cz, cz * sx])
        sin_theta2 = linear_angle[0] ** 2 + linear_angle[2] ** 2
        small = sin_theta2 < 1e-6
        sin_theta = jnp.sqrt(jnp.where(small, 1.0, sin_theta2))
        theta = jnp.arcsin(jnp.clip(sin_theta, -1.0, 1.0))
        r = d / jnp.where(small, 1.0, theta)
        horiz = r - r * jnp.cos(theta)
        vert = r * sin_theta
        p_bent = jnp.stack(
            [
                horiz * linear_angle[0] / sin_theta,
                vert,
                horiz * linear_angle[2] / sin_theta,
            ]
        )
        p_vert = R @ (jnp.asarray([0.0, 1.0, 0.0], dtype=dtype) * d)
        p = jnp.where(small, p_vert, p_bent)
        return lie.rp_to_transform(R, p)
    if t == CUSTOM:
        cj = spec.custom
        zero = jnp.zeros((), dtype=dtype)
        vals = [
            fn(q[d]) if d >= 0 else fn(zero)
            for fn, d in zip(cj.functions, cj.drives)
        ]
        R = jnp.eye(3, dtype=dtype)
        for i in range(3):
            ax = jnp.asarray(cj.rot_axes[i], dtype=dtype)
            R = R @ lie.exp_map_rot(ax * vals[i])
        p = jnp.zeros(3, dtype=dtype)
        for i in range(3):
            p = p + jnp.asarray(cj.trans_axes[i], dtype=dtype) * vals[3 + i]
        return lie.rp_to_transform(R, p)
    raise NotImplementedError(f"joint type {t}")


# ---------------------------------------------------------------------------
# S(q): body Jacobian of Q in the joint frame, shape (6, ndof)
# ---------------------------------------------------------------------------


def _body_jacobian_autodiff(spec: JointSpec, q: jnp.ndarray) -> jnp.ndarray:
    """Generic body Jacobian via AD: column j = vee(Q^-1 dQ/dq_j).

    Used for joint types without a hand-written closed form. Exactness is
    guaranteed by construction; cost is ndof jvp's of `joint_transform`
    at trace time (fused by XLA).
    """
    n = spec.num_dofs

    def col(e):
        Q, dQ = jax.jvp(lambda qq: joint_transform(spec, qq), (q,), (e,))
        body = lie.transform_inv(Q) @ dQ
        w = lie.unskew(body[:3, :3])
        v = body[:3, 3]
        return jnp.concatenate([w, v])

    eye = jnp.eye(n, dtype=q.dtype)
    return jnp.stack([col(eye[j]) for j in range(n)], axis=1)


def joint_body_jacobian(spec: JointSpec, q: jnp.ndarray) -> jnp.ndarray:
    """S(q): maps qdot to the joint-frame body twist of Q. Shape (6, ndof)."""
    t = spec.joint_type
    dtype = q.dtype if hasattr(q, "dtype") else jnp.float64
    if t == WELD:
        return jnp.zeros((6, 0), dtype=dtype)
    if t == REVOLUTE:
        axis = jnp.asarray(spec.axes[0], dtype=dtype)
        return jnp.concatenate([axis, jnp.zeros(3, dtype=dtype)])[:, None]
    if t == PRISMATIC:
        axis = jnp.asarray(spec.axes[0], dtype=dtype)
        return jnp.concatenate([jnp.zeros(3, dtype=dtype), axis])[:, None]
    if t == SCREW:
        axis = jnp.asarray(spec.axes[0], dtype=dtype)
        return jnp.concatenate([axis, axis * spec.screw_pitch])[:, None]
    if t == BALL:
        # omega_body = J_r(q) qdot (right-Jacobian convention; reference:
        # BallJoint non-identity-Jacobian branch, BallJoint.cpp).
        Jr = lie.so3_right_jacobian(q)
        return jnp.concatenate([Jr, jnp.zeros((3, 3), dtype=dtype)], axis=0)
    if t == TRANSLATIONAL:
        return jnp.concatenate(
            [jnp.zeros((3, 3), dtype=dtype), jnp.eye(3, dtype=dtype)], axis=0
        )
    if t == TRANSLATIONAL_2D:
        A = jnp.stack(
            [
                jnp.asarray(spec.axes[0], dtype=dtype),
                jnp.asarray(spec.axes[1], dtype=dtype),
            ],
            axis=1,
        )
        return jnp.concatenate([jnp.zeros((3, 2), dtype=dtype), A], axis=0)
    if t == FREE:
        # Closed form (matches FreeJoint::getRelativeJacobianStatic without
        # the T_cj factor, which the skeleton applies via Ad(T_cj)):
        # S = [[J_r(w), 0], [0, exp(-w)]].
        Jr = lie.so3_right_jacobian(q[:3])
        Rt = lie.exp_map_rot(-q[:3])
        z = jnp.zeros((3, 3), dtype=dtype)
        return jnp.block([[Jr, z], [z, Rt]])
    # UNIVERSAL, EULER, PLANAR, EULER_FREE: exact AD fallback.
    return _body_jacobian_autodiff(spec, q)


def joint_body_jacobian_dot(
    spec: JointSpec, q: jnp.ndarray, dq: jnp.ndarray
) -> jnp.ndarray:
    """Time derivative S-dot(q, qdot) = (dS/dq) qdot, exact via jvp.

    Reference parity: Joint::getRelativeJacobianTimeDeriv family.
    """
    if spec.num_dofs == 0:
        return jnp.zeros((6, 0), dtype=q.dtype)
    return jax.jvp(lambda qq: joint_body_jacobian(spec, qq), (q,), (dq,))[1]


# ---------------------------------------------------------------------------
# Position integration (reference: Joint::integratePositionsExplicit)
# ---------------------------------------------------------------------------


def integrate_positions(
    spec: JointSpec, q: jnp.ndarray, dq: jnp.ndarray, dt
) -> jnp.ndarray:
    """q_{t+1} = integrate(q_t, dq, dt), per joint type.

    Ball/free joints compose on the group through the joint's own relative
    Jacobian so that d(q_next)/d(dq) -> dt * I as dt -> 0 stays consistent
    with the reference (FreeJoint/BallJoint::integratePositionsExplicit,
    non-identity-Jacobian branch).
    """
    t = spec.joint_type
    if t == BALL:
        S = lie.so3_right_jacobian(q)
        R_next = lie.exp_map_rot(q) @ lie.exp_map_rot(S @ dq * dt)
        return lie.log_map_rot(R_next)
    if t == FREE:
        # T_next = Q(q) * (expRot(xi_w), xi_v) with xi = S(q) dq dt, in the
        # joint frame — rotation composes on the group, translation is
        # integrated directly (same structure as the reference's
        # FreeJoint::integratePositionsExplicit, which composes
        # convertToTransform(J dq dt); exactly equal when T_cj = I).
        S = joint_body_jacobian(spec, q)
        xi = S @ dq * dt
        Q = joint_transform(spec, q)
        Q_next = Q @ lie.rp_to_transform(lie.exp_map_rot(xi[:3]), xi[3:])
        w = lie.log_map_rot(Q_next[:3, :3])
        return jnp.concatenate([w, Q_next[:3, 3]])
    # Euclidean coordinates.
    return q + dq * dt
