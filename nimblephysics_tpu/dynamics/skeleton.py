"""Skeleton: static articulated-tree spec + batched differentiable dynamics.

TPU-native re-design of the reference Skeleton/BodyNode machinery
(dart/dynamics/Skeleton.cpp computeForwardDynamics:13296,
computeInverseDynamics:13317; BodyNode ABA sweeps, BodyNode.cpp:2046-2159).

Design (SURVEY.md section 7): a skeleton is a *static* topology descriptor
captured at trace time — joints unroll into straight-line XLA code (no
ragged control flow), state is plain (q, v) vectors, and everything here is
a pure function composable with jit/vmap/grad. Dynamics quantities are
computed matrix-first (dense M, bias C via RNEA; forward dynamics via
Cholesky solve) because for the target regime — small nv, thousands of
batched worlds — batched dense linear algebra on the MXU beats a serialized
O(n) ABA recursion, and the explicit M^-1 is reused by the contact LCP
(A = J M^-1 J^T) and its gradients.

Conventions: spatial vectors [angular; linear] in the *body frame* of each
link; world gravity enters as a fictitious base acceleration.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.math import lie
from nimblephysics_tpu.math.spatial import spatial_inertia_matrix
from nimblephysics_tpu.dynamics import joints as J
from nimblephysics_tpu.dynamics.joints import JointSpec
from nimblephysics_tpu.dynamics.shapes import ShapeSpec


@dataclasses.dataclass(frozen=True, eq=False)  # identity hash: jit-static
class BodySpec:
    """Static per-body data: inertia + attached shapes.

    Reference parity: dynamics::BodyNode properties + dynamics::Inertia.
    """

    name: str
    mass: float
    com: np.ndarray  # (3,) in body frame
    inertia: np.ndarray  # (3,3) about COM, body frame
    shapes: Tuple[ShapeSpec, ...] = ()


class Skeleton:
    """Static articulated tree. One joint per body, parents precede children.

    Builder parity with the reference's createXJointAndBodyNodePair API
    (dart/dynamics/Skeleton.hpp): `add_joint_and_body`.
    Hash/eq are identity so a Skeleton can be a jit static argument.
    """

    def __init__(self, name: str = "skeleton"):
        from nimblephysics_tpu.common.infra import NameManager

        self.name = name
        self.joints: List[JointSpec] = []
        self.bodies: List[BodySpec] = []
        # Unique-name bookkeeping (reference: common::NameManager instances
        # on Skeleton for BodyNodes/Joints/DOFs, Skeleton.cpp name issuing).
        self.body_names = NameManager(f"{name}::bodies", "body")
        self.joint_names = NameManager(f"{name}::joints", "joint")
        # Mocap markers: name -> (body index, local offset (3,), fixed).
        # Reference parity: dynamics::Marker attached to BodyNodes.
        self.markers: Dict[str, Tuple[int, np.ndarray, bool]] = {}
        # Collision filter flags (reference parity: DART Skeleton
        # self-collision check — disabled by default — and the adjacent
        # body check, dart/collision/CollisionFilter.hpp:91-111 /
        # BodyNodeCollisionFilter). When self-collision is enabled,
        # joint-adjacent pairs still only collide if adjacent_body_check
        # is also enabled.
        self.self_collision_enabled = False
        self.adjacent_body_check = False
        self._frozen = False

    def set_self_collision_check(self, enabled: bool) -> None:
        self.self_collision_enabled = bool(enabled)

    def set_adjacent_body_check(self, enabled: bool) -> None:
        self.adjacent_body_check = bool(enabled)

    def add_marker(
        self, name: str, body: int, offset, fixed: bool = False
    ) -> None:
        self.markers[name] = (
            int(body),
            np.asarray(offset, dtype=np.float64),
            bool(fixed),
        )

    # -- builder ----------------------------------------------------------

    def add_joint_and_body(
        self,
        joint_type: str,
        parent: int = -1,
        name: Optional[str] = None,
        T_pj: Optional[np.ndarray] = None,
        T_cj: Optional[np.ndarray] = None,
        axis: Optional[Sequence] = None,
        axes: Optional[Sequence] = None,
        mass: float = 1.0,
        com: Sequence = (0.0, 0.0, 0.0),
        inertia: Optional[np.ndarray] = None,
        shapes: Sequence[ShapeSpec] = (),
        euler_order: str = "xyz",
        screw_pitch: float = 0.0,
        damping: Optional[Sequence] = None,
        spring_stiffness: Optional[Sequence] = None,
        rest_position: Optional[Sequence] = None,
        position_lower: Optional[Sequence] = None,
        position_upper: Optional[Sequence] = None,
        velocity_limit: Optional[Sequence] = None,
        force_limit: Optional[Sequence] = None,
        custom=None,
        props: Optional[dict] = None,
    ) -> int:
        """Append a joint + child body; returns the new body index."""
        assert not self._frozen, "Skeleton already in use (trace-time frozen)"
        idx = len(self.bodies)
        assert parent < idx, "parents must be added before children"
        if axes is None and axis is not None:
            axes = [axis]
        axes_np = (
            np.asarray(axes, dtype=np.float64).reshape(-1, 3)
            if axes is not None
            else None
        )
        # NameManager issues a unique name on collision (reference
        # behavior: Skeleton::addEntryToBodyNodeNameMgr).
        body_name = self.body_names.issue_new_name(name or f"body{idx}")
        spec = JointSpec(
            joint_type=joint_type,
            name=f"{body_name}_joint",
            parent=parent,
            child=idx,
            q_index=self.num_dofs,
            T_pj=np.eye(4) if T_pj is None else np.asarray(T_pj, dtype=np.float64),
            T_cj=np.eye(4) if T_cj is None else np.asarray(T_cj, dtype=np.float64),
            axes=axes_np,
            euler_order=euler_order,
            screw_pitch=screw_pitch,
            damping=None if damping is None else np.asarray(damping, np.float64),
            spring_stiffness=(
                None
                if spring_stiffness is None
                else np.asarray(spring_stiffness, np.float64)
            ),
            rest_position=(
                None if rest_position is None else np.asarray(rest_position, np.float64)
            ),
            position_lower=(
                None if position_lower is None else np.asarray(position_lower, np.float64)
            ),
            position_upper=(
                None if position_upper is None else np.asarray(position_upper, np.float64)
            ),
            velocity_limit=(
                None if velocity_limit is None else np.asarray(velocity_limit, np.float64)
            ),
            force_limit=(
                None if force_limit is None else np.asarray(force_limit, np.float64)
            ),
            custom=custom,
            props=props,
        )
        if inertia is None:
            inertia = np.eye(3) * 0.1 * mass
        body = BodySpec(
            name=body_name,
            mass=float(mass),
            com=np.asarray(com, dtype=np.float64),
            inertia=np.asarray(inertia, dtype=np.float64),
            shapes=tuple(shapes),
        )
        self.joints.append(spec)
        self.bodies.append(body)
        self.body_names.add_name(body_name, idx)
        self.joint_names.add_name(spec.name, idx)
        return idx

    # -- static properties --------------------------------------------------

    @property
    def num_bodies(self) -> int:
        return len(self.bodies)

    @property
    def num_dofs(self) -> int:
        return sum(j.num_dofs for j in self.joints)

    def dof_names(self) -> List[str]:
        out = []
        for j in self.joints:
            for k in range(j.num_dofs):
                out.append(f"{j.name}_{k}")
        return out

    def body_index(self, name: str) -> int:
        for i, b in enumerate(self.bodies):
            if b.name == name:
                return i
        raise KeyError(name)

    def joint_slices(self) -> List[Tuple[int, int]]:
        return [(j.q_index, j.q_index + j.num_dofs) for j in self.joints]

    # numpy vectors of per-dof coefficients (static constants)
    def damping_coeffs(self) -> np.ndarray:
        return (
            np.concatenate([j.damping_vec() for j in self.joints])
            if self.joints
            else np.zeros(0)
        )

    def spring_stiffnesses(self) -> np.ndarray:
        return np.concatenate([j.spring_vec() for j in self.joints])

    def rest_positions(self) -> np.ndarray:
        return np.concatenate([j.rest_vec() for j in self.joints])

    def position_lower_limits(self) -> np.ndarray:
        return np.concatenate([j.pos_lower_vec() for j in self.joints])

    def position_upper_limits(self) -> np.ndarray:
        return np.concatenate([j.pos_upper_vec() for j in self.joints])

    def force_limits(self) -> np.ndarray:
        return np.concatenate([j.force_limit_vec() for j in self.joints])

    def velocity_limits(self) -> np.ndarray:
        return np.concatenate([j.velocity_limit_vec() for j in self.joints])

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other

    def __repr__(self):
        return (
            f"Skeleton({self.name!r}, bodies={self.num_bodies}, "
            f"dofs={self.num_dofs})"
        )


# ---------------------------------------------------------------------------
# Kinematics
# ---------------------------------------------------------------------------


def _joint_q(skel: Skeleton, q: jnp.ndarray, i: int) -> jnp.ndarray:
    j = skel.joints[i]
    return q[j.q_index : j.q_index + j.num_dofs]


def relative_transform(
    spec: JointSpec,
    q_j: jnp.ndarray,
    s_parent=None,
    s_child=None,
) -> jnp.ndarray:
    """T of child body w.r.t. parent body: T_pj Q(q) T_cj^-1.

    Body scales (reference: Joint::setParentScale/setChildScale,
    dart/dynamics/Joint.cpp:1523-1545) multiply the joint-offset
    TRANSLATIONS: T_pj's by the parent body's scale, T_cj's by the
    child's. Differentiable in the scales (GROUP_SCALES variable).
    """
    dtype = q_j.dtype if q_j.size else jnp.result_type(float)
    T_pj = jnp.asarray(spec.T_pj, dtype=dtype)
    if s_parent is not None:
        T_pj = T_pj.at[:3, 3].set(T_pj[:3, 3] * s_parent)
    if s_child is None:
        T_cj_inv = jnp.asarray(np.linalg.inv(spec.T_cj), dtype=dtype)
    else:
        T_cj = jnp.asarray(spec.T_cj, dtype=dtype)
        T_cj_inv = lie.transform_inv(
            T_cj.at[:3, 3].set(T_cj[:3, 3] * s_child)
        )
    return T_pj @ J.joint_transform(spec, q_j) @ T_cj_inv


def relative_jacobian(
    spec: JointSpec, q_j: jnp.ndarray, s_child=None
) -> jnp.ndarray:
    """Relative Jacobian in the child body frame: Ad(T_cj) S(q). (6, ndof)."""
    dtype = q_j.dtype if q_j.size else jnp.result_type(float)
    T_cj = jnp.asarray(spec.T_cj, dtype=dtype)
    if s_child is not None:
        T_cj = T_cj.at[:3, 3].set(T_cj[:3, 3] * s_child)
    return lie.Ad(T_cj) @ J.joint_body_jacobian(spec, q_j)


def forward_kinematics(skel: Skeleton, q: jnp.ndarray) -> jnp.ndarray:
    """World transforms of every body, stacked (num_bodies, 4, 4)."""
    Ts: List[jnp.ndarray] = []
    for i, spec in enumerate(skel.joints):
        T_rel = relative_transform(spec, _joint_q(skel, q, i))
        T = T_rel if spec.parent < 0 else Ts[spec.parent] @ T_rel
        Ts.append(T)
    return jnp.stack(Ts) if Ts else jnp.zeros((0, 4, 4), dtype=q.dtype)


class Kinematics(Dict):
    """Plain dict subclass for readable access to kinematics products."""


def _scale_of(scales, i, dtype):
    if scales is None or i < 0:
        return None
    return scales[i]


def full_kinematics(
    skel: Skeleton,
    q: jnp.ndarray,
    dq: Optional[jnp.ndarray] = None,
    scales: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """FK + body twists + world-frame system Jacobians in one pass.

    `scales` (nb, 3) applies per-body joint-offset scaling (GROUP_SCALES).

    Returns dict with:
      T_wb   (nb, 4, 4)  world transform of each body
      V      (nb, 6)     body-frame spatial velocity (if dq given)
      J_world(nb, 6, nv) world-frame (about world origin) system Jacobian:
                         Ad(T_wb) V_body = J_world @ dq
    """
    nv = skel.num_dofs
    dtype = q.dtype
    Ts: List[jnp.ndarray] = []
    Vs: List[jnp.ndarray] = []
    Jw: List[jnp.ndarray] = []
    for i, spec in enumerate(skel.joints):
        q_j = _joint_q(skel, q, i)
        T_rel = relative_transform(
            spec, q_j,
            s_parent=_scale_of(scales, spec.parent, dtype),
            s_child=_scale_of(scales, i, dtype),
        )
        J_rel = relative_jacobian(
            spec, q_j, s_child=_scale_of(scales, i, dtype)
        )  # (6, nd) child-body frame
        if spec.parent < 0:
            T = T_rel
            Jw_i = jnp.zeros((6, nv), dtype=dtype)
        else:
            T = Ts[spec.parent] @ T_rel
            Jw_i = Jw[spec.parent]
        AdT = lie.Ad(T)
        if spec.num_dofs > 0:
            s, e = spec.q_index, spec.q_index + spec.num_dofs
            Jw_i = Jw_i.at[:, s:e].add(AdT @ J_rel)
        Ts.append(T)
        Jw.append(Jw_i)
        if dq is not None:
            V_par = (
                jnp.zeros(6, dtype=dtype)
                if spec.parent < 0
                else lie.Ad(lie.transform_inv(T_rel)) @ Vs[spec.parent]
            )
            dq_j = dq[spec.q_index : spec.q_index + spec.num_dofs]
            Vs.append(V_par + J_rel @ dq_j)
    out = {
        "T_wb": jnp.stack(Ts) if Ts else jnp.zeros((0, 4, 4), dtype=dtype),
        "J_world": jnp.stack(Jw) if Jw else jnp.zeros((0, 6, nv), dtype=dtype),
    }
    if dq is not None:
        out["V"] = jnp.stack(Vs) if Vs else jnp.zeros((0, 6), dtype=dtype)
    return out


def body_com_world(skel: Skeleton, q: jnp.ndarray) -> jnp.ndarray:
    """World-frame COM position of each body, (nb, 3)."""
    T = forward_kinematics(skel, q)
    coms = jnp.stack(
        [jnp.asarray(b.com, dtype=q.dtype) for b in skel.bodies]
    )
    return jax.vmap(lie.transform_point)(T, coms)


def com_world(skel: Skeleton, q: jnp.ndarray) -> jnp.ndarray:
    """Whole-skeleton COM (mass-weighted)."""
    coms = body_com_world(skel, q)
    masses = jnp.asarray([b.mass for b in skel.bodies], dtype=q.dtype)
    return (coms * masses[:, None]).sum(0) / masses.sum()


def point_jacobian(
    J_world: jnp.ndarray, point_world: jnp.ndarray
) -> jnp.ndarray:
    """Linear-velocity Jacobian (3, nv) of a world point rigidly attached to
    a body, from that body's world-frame system Jacobian (6, nv).

    v_point = J_lin + omega x p  ==>  rows = J_world[3:] - [p]x J_world[:3].
    """
    return J_world[3:] - lie.skew(point_world) @ J_world[:3]


# ---------------------------------------------------------------------------
# Dynamics: RNEA inverse dynamics, mass matrix, forward dynamics
# ---------------------------------------------------------------------------

DEFAULT_GRAVITY = np.array([0.0, 0.0, -9.81])


def default_body_params(skel: Skeleton, dtype=jnp.float64) -> Dict[str, jnp.ndarray]:
    """Dynamic body-parameter pytree with the spec values as defaults.

    These are the differentiation variables of the reference's
    WithRespectToMass / GROUP_MASSES / GROUP_COMS / GROUP_INERTIAS
    (dart/neural/WithRespectTo.hpp:62-75): pass a (modified) params pytree
    into the dynamics functions and differentiate with jax.grad.
    """
    return {
        "masses": jnp.asarray([b.mass for b in skel.bodies], dtype=dtype),
        "coms": jnp.stack(
            [jnp.asarray(b.com, dtype=dtype) for b in skel.bodies]
        )
        if skel.bodies
        else jnp.zeros((0, 3), dtype=dtype),
        "inertias": jnp.stack(
            [jnp.asarray(b.inertia, dtype=dtype) for b in skel.bodies]
        )
        if skel.bodies
        else jnp.zeros((0, 3, 3), dtype=dtype),
    }


def _spatial_inertias(
    skel: Skeleton, dtype, body_params: Optional[Dict] = None
) -> List[jnp.ndarray]:
    if body_params is None:
        return [
            spatial_inertia_matrix(
                jnp.asarray(b.mass, dtype=dtype),
                jnp.asarray(b.com, dtype=dtype),
                jnp.asarray(b.inertia, dtype=dtype),
            )
            for b in skel.bodies
        ]
    masses = body_params.get("masses")
    coms = body_params.get("coms")
    inertias = body_params.get("inertias")
    scales = body_params.get("scales")
    out = []
    for i, b in enumerate(skel.bodies):
        m = (
            masses[i]
            if masses is not None
            else jnp.asarray(b.mass, dtype=dtype)
        )
        c = coms[i] if coms is not None else jnp.asarray(b.com, dtype=dtype)
        # Default: scale the spec rotational inertia with mass (the
        # reference's mass-only differentiation keeps inertia/mass fixed
        # shape — inertia scales linearly in mass for fixed geometry).
        if inertias is not None:
            I = inertias[i]
        else:
            I = jnp.asarray(b.inertia, dtype=dtype) * (
                m / jnp.asarray(b.mass, dtype=dtype)
            )
        if scales is not None:
            # Body dimension scaling (reference: Inertia::rescale,
            # dart/dynamics/Inertia.cpp:600-608): COM offsets scale
            # linearly, the moment (an integral of m r r) scales by the
            # outer product s s^T.
            s = scales[i]
            c = c * s
            I = I * (s[:, None] * s[None, :])
        out.append(spatial_inertia_matrix(m, c, I))
    return out


def inverse_dynamics(
    skel: Skeleton,
    q: jnp.ndarray,
    dq: jnp.ndarray,
    ddq: jnp.ndarray,
    f_ext_body: Optional[jnp.ndarray] = None,
    gravity: Optional[jnp.ndarray] = None,
    body_params: Optional[Dict] = None,
) -> jnp.ndarray:
    """Recursive Newton-Euler: generalized forces for given accelerations.

    Reference parity: Skeleton::computeInverseDynamics
    (dart/dynamics/Skeleton.cpp:13317). Gravity enters as a fictitious base
    acceleration; `f_ext_body` is an optional (nb, 6) array of external
    wrenches expressed in each body's own frame.

    Pure function; unrolls over the (static) joint list. All quantities are
    body-frame spatial vectors [w; v].
    """
    dtype = q.dtype
    nv = skel.num_dofs
    if gravity is None:
        gravity = jnp.asarray(DEFAULT_GRAVITY, dtype=dtype)
    else:
        gravity = jnp.asarray(gravity, dtype=dtype)
    G = _spatial_inertias(skel, dtype, body_params)
    scales = body_params.get("scales") if body_params else None

    # Forward sweep.
    T_rels: List[jnp.ndarray] = []
    Vs: List[jnp.ndarray] = []
    As: List[jnp.ndarray] = []
    Jrels: List[jnp.ndarray] = []
    base_acc = jnp.concatenate([jnp.zeros(3, dtype=dtype), -gravity])
    for i, spec in enumerate(skel.joints):
        q_j = _joint_q(skel, q, i)
        dq_j = dq[spec.q_index : spec.q_index + spec.num_dofs]
        ddq_j = ddq[spec.q_index : spec.q_index + spec.num_dofs]
        s_par = _scale_of(scales, spec.parent, dtype)
        s_chi = _scale_of(scales, i, dtype)
        T_rel = relative_transform(spec, q_j, s_parent=s_par, s_child=s_chi)
        J_rel = relative_jacobian(spec, q_j, s_child=s_chi)
        if spec.num_dofs > 0:
            T_cj = jnp.asarray(spec.T_cj, dtype=dtype)
            if s_chi is not None:
                T_cj = T_cj.at[:3, 3].set(T_cj[:3, 3] * s_chi)
            J_rel_dot = lie.Ad(T_cj) @ (
                J.joint_body_jacobian_dot(spec, q_j, dq_j)
            )
        else:
            J_rel_dot = jnp.zeros((6, 0), dtype=dtype)
        Ad_inv_Trel = lie.Ad(lie.transform_inv(T_rel))
        if spec.parent < 0:
            V_par = jnp.zeros(6, dtype=dtype)
            A_par = base_acc
        else:
            V_par = Vs[spec.parent]
            A_par = As[spec.parent]
        sj = J_rel @ dq_j
        V_i = Ad_inv_Trel @ V_par + sj
        A_i = (
            Ad_inv_Trel @ A_par
            + lie.ad_apply(V_i, sj)
            + J_rel_dot @ dq_j
            + J_rel @ ddq_j
        )
        T_rels.append(T_rel)
        Vs.append(V_i)
        As.append(A_i)
        Jrels.append(J_rel)

    # Backward sweep.
    F: List[Optional[jnp.ndarray]] = [None] * skel.num_bodies
    tau = jnp.zeros(nv, dtype=dtype)
    for i in reversed(range(skel.num_bodies)):
        spec = skel.joints[i]
        Fi = G[i] @ As[i] - lie.dad_apply(Vs[i], G[i] @ Vs[i])
        if f_ext_body is not None:
            Fi = Fi - f_ext_body[i]
        # accumulate already-computed children contributions
        if F[i] is not None:
            Fi = Fi + F[i]
        if spec.parent >= 0:
            # wrench transmitted to parent: dAd(inv(T_rel)) F_i
            contrib = lie.Ad(lie.transform_inv(T_rels[i])).T @ Fi
            F[spec.parent] = (
                contrib if F[spec.parent] is None else F[spec.parent] + contrib
            )
        if spec.num_dofs > 0:
            s, e = spec.q_index, spec.q_index + spec.num_dofs
            tau = tau.at[s:e].set(Jrels[i].T @ Fi)
    return tau


def bias_forces(
    skel: Skeleton,
    q: jnp.ndarray,
    dq: jnp.ndarray,
    f_ext_body: Optional[jnp.ndarray] = None,
    gravity: Optional[jnp.ndarray] = None,
    body_params: Optional[Dict] = None,
) -> jnp.ndarray:
    """C(q, dq) including gravity and external forces (zero-acceleration ID).

    Reference parity: Skeleton::getCoriolisAndGravityForces.
    """
    return inverse_dynamics(
        skel, q, dq, jnp.zeros_like(dq), f_ext_body=f_ext_body,
        gravity=gravity, body_params=body_params,
    )


def mass_matrix(
    skel: Skeleton, q: jnp.ndarray, body_params: Optional[Dict] = None
) -> jnp.ndarray:
    """Joint-space inertia matrix M(q), (nv, nv), symmetric PD.

    Computed as the (exact) linearization of RNEA in ddq — XLA vectorizes
    the nv forward-mode passes into batched dense algebra (CRBA-equivalent
    result; reference: Skeleton::getMassMatrix).
    """
    nv = skel.num_dofs
    zero = jnp.zeros(nv, dtype=q.dtype)
    # ID(q, 0, a) = M a + g  (affine in a); jacfwd extracts exactly M.
    M = jax.jacfwd(
        lambda a: inverse_dynamics(
            skel, q, zero, a, gravity=jnp.zeros(3, dtype=q.dtype),
            body_params=body_params,
        )
    )(zero)
    return 0.5 * (M + M.T)


def mass_matrix_inv(skel: Skeleton, q: jnp.ndarray) -> jnp.ndarray:
    """M(q)^-1 via Cholesky (reference: getInvMassMatrix)."""
    M = mass_matrix(skel, q)
    eye = jnp.eye(skel.num_dofs, dtype=q.dtype)
    cho = jax.scipy.linalg.cho_factor(M)
    return jax.scipy.linalg.cho_solve(cho, eye)


def mass_and_bias_fused(
    skel: Skeleton,
    q: jnp.ndarray,
    v: jnp.ndarray,
    gravity: Optional[jnp.ndarray] = None,
    body_params: Optional[Dict] = None,
    kin: Optional[Dict] = None,
):
    """(M, bias) from ONE kinematics pass — the TPU fast path.

    Instead of nv forward-mode RNEA passes (mass_matrix) plus a bias RNEA,
    use world-frame operators on the stacked body Jacobians:
        M(q)  = sum_b J_b^T G_w,b J_b            (one einsum, MXU)
        bias  = Mdot v - 1/2 d(v^T M v)/dq - g_gen   (Lagrangian identity,
                one jvp + one reverse pass)
        g_gen = sum_b J_b^T [c_b x m g; m g]     (gravity wrench)
    Exactly equals the RNEA quantities (tested); ~3x fewer ops per step and
    the kinematics pass is shared with collision. Returns (M, bias, kin).
    """
    dtype = q.dtype
    nv = skel.num_dofs
    if gravity is None:
        gravity = jnp.asarray(DEFAULT_GRAVITY, dtype=dtype)
    else:
        gravity = jnp.asarray(gravity, dtype=dtype)

    scales = body_params.get("scales") if body_params else None

    def M_of(qq, kin_in=None):
        k = (
            kin_in
            if kin_in is not None
            else full_kinematics(skel, qq, scales=scales)
        )
        Jw = k["J_world"]  # (nb, 6, nv)
        G = _spatial_inertias(skel, dtype, body_params)
        Ad_inv = jax.vmap(lambda T: lie.Ad(lie.transform_inv(T)))(k["T_wb"])
        G_w = jnp.einsum(
            "bji,bjk,bkl->bil", Ad_inv, jnp.stack(G), Ad_inv
        )
        M = jnp.einsum("bin,bij,bjm->nm", Jw, G_w, Jw)
        return 0.5 * (M + M.T), k

    M, kin_out = M_of(q, kin)

    # Mdot v via jvp; dKE/dq via one reverse pass (shares the M graph).
    Mdot = jax.jvp(lambda qq: M_of(qq)[0], (q,), (v,))[1]
    ke_grad = jax.grad(lambda qq: 0.5 * v @ M_of(qq)[0] @ v)(q)

    # Generalized gravity force about the world origin.
    Jw = kin_out["J_world"]
    bp = body_params or {}
    masses = bp.get("masses")
    if masses is None:
        masses = jnp.asarray([b.mass for b in skel.bodies], dtype=dtype)
    coms = bp.get("coms")
    if coms is None:
        coms = jnp.stack(
            [jnp.asarray(b.com, dtype=dtype) for b in skel.bodies]
        )
    if scales is not None:
        coms = coms * scales
    c_w = jax.vmap(lie.transform_point)(kin_out["T_wb"], coms)
    f = masses[:, None] * gravity[None, :]  # (nb, 3)
    wrench = jnp.concatenate([jnp.cross(c_w, f), f], axis=-1)  # (nb, 6)
    g_gen = jnp.einsum("bin,bi->n", Jw, wrench)

    bias = Mdot @ v - ke_grad - g_gen
    return M, bias, kin_out


def passive_forces(skel: Skeleton, q: jnp.ndarray, dq: jnp.ndarray) -> jnp.ndarray:
    """Joint spring + damping generalized forces (added to control).

    Reference parity: per-joint damping/spring terms applied in the
    reference's forward-dynamics force accumulation.
    """
    d = jnp.asarray(skel.damping_coeffs(), dtype=q.dtype)
    k = jnp.asarray(skel.spring_stiffnesses(), dtype=q.dtype)
    q0 = jnp.asarray(skel.rest_positions(), dtype=q.dtype)
    return -d * dq - k * (q - q0)


def forward_dynamics(
    skel: Skeleton,
    q: jnp.ndarray,
    dq: jnp.ndarray,
    tau: jnp.ndarray,
    f_ext_body: Optional[jnp.ndarray] = None,
    gravity: Optional[jnp.ndarray] = None,
    body_params: Optional[Dict] = None,
) -> jnp.ndarray:
    """ddq = M^-1 (tau + passive - C). Smooth (constraint-free) dynamics.

    Reference parity: Skeleton::computeForwardDynamics
    (dart/dynamics/Skeleton.cpp:13296) — same result as the ABA sweeps,
    computed matrix-first for the TPU.
    """
    M = mass_matrix(skel, q, body_params=body_params)
    C = bias_forces(
        skel, q, dq, f_ext_body=f_ext_body, gravity=gravity,
        body_params=body_params,
    )
    rhs = tau + passive_forces(skel, q, dq) - C
    cho = jax.scipy.linalg.cho_factor(M)
    return jax.scipy.linalg.cho_solve(cho, rhs)


def integrate_positions(
    skel: Skeleton, q: jnp.ndarray, dq: jnp.ndarray, dt
) -> jnp.ndarray:
    """Per-joint-type explicit position integration (exp-map for ball/free).

    Reference parity: Skeleton::integratePositionsExplicit
    (dart/dynamics/Skeleton.cpp:9458) + Joint::integratePositionsExplicit.
    """
    parts = []
    for i, spec in enumerate(skel.joints):
        if spec.num_dofs == 0:
            continue
        s, e = spec.q_index, spec.q_index + spec.num_dofs
        parts.append(J.integrate_positions(spec, q[s:e], dq[s:e], dt))
    if not parts:
        return q
    return jnp.concatenate(parts)
