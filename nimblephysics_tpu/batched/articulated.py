"""Batch-minor articulated-body kinematics and dynamics over a flattened
world (all skeletons merged into one forest of joints/bodies).

This is the throughput engine for the reference's hot loop
(dart/dynamics/Skeleton.cpp computeForwardDynamics:13296 and the
per-world batch of dart/trajectory/MultiShot.cpp thread parallelism,
SURVEY.md section 2.10): thousands of worlds stepped in lockstep, with the
world batch in the TPU lane dimension (see batched/linalg.py).

Key structural identity exploited here: the world-frame (about the world
origin) Jacobian column of dof d is Ad(T_w,joint(d)) S_d — the SAME for
every body that has d as an ancestor. So ONE (6, nv, B) array `W` plus a
static (nb, nv) ancestor mask replaces all per-body Jacobians.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.batched import linalg as bl
from nimblephysics_tpu.dynamics import joints as J
from nimblephysics_tpu.simulation.world import World

_CONST_S_TYPES = (
    J.REVOLUTE,
    J.PRISMATIC,
    J.SCREW,
    J.TRANSLATIONAL,
    J.TRANSLATIONAL_2D,
    J.WELD,
)

# Joint types whose batched Q/S go through the generic machinery: Q via a
# lane-vmapped single-joint transform, S via per-dof jvp of Q (exact).
_GENERIC_TYPES = (
    J.CUSTOM,
    J.ELLIPSOID_JOINT,
    J.SCAPULATHORACIC,
    J.CONSTANT_CURVE,
    J.CONSTANT_CURVE_INCOMPRESSIBLE,
)

SUPPORTED_TYPES = _CONST_S_TYPES + (
    J.BALL, J.FREE, J.UNIVERSAL, J.PLANAR, J.EULER, J.EULER_FREE,
) + _GENERIC_TYPES


def _skew_np(a):
    return np.array(
        [[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]],
        dtype=np.float64,
    )


def _spatial_inertia_np(mass, com, inertia):
    """Static 6x6 spatial inertia in numpy f64 (parity with
    math/spatial.spatial_inertia_matrix, [angular; linear] ordering)."""
    c = _skew_np(np.asarray(com, dtype=np.float64))
    m = float(mass)
    I = np.asarray(inertia, dtype=np.float64)
    G = np.zeros((6, 6))
    G[:3, :3] = I + m * (c @ c.T)
    G[:3, 3:] = m * c
    G[3:, :3] = m * c.T
    G[3:, 3:] = m * np.eye(3)
    return G


def _Ad_np(T):
    R, p = T[:3, :3], T[:3, 3]
    out = np.zeros((6, 6))
    out[:3, :3] = R
    out[3:, 3:] = R
    out[3:, :3] = _skew_np(p) @ R
    return out


@dataclasses.dataclass(frozen=True, eq=False)
class _JointPlan:
    """Static per-joint data for the flattened world (identity hash)."""

    spec: "J.JointSpec"
    parent: int  # GLOBAL parent body index, -1 = world
    q_index: int  # GLOBAL dof offset
    num_dofs: int
    R_pj: np.ndarray
    p_pj: np.ndarray
    R_ci: np.ndarray  # T_cj^-1 rotation
    p_ci: np.ndarray
    Ad_cj: np.ndarray  # 6x6 Ad(T_cj)
    R_cj: np.ndarray  # T_cj rotation (for scaled-anchor variants)
    p_cj: np.ndarray  # T_cj translation (scaled by the child body scale)
    S_const: Optional[np.ndarray]  # (6, nd) if constant in q, else None
    S_local: Optional[np.ndarray] = None  # joint-frame S for const-S types


class FlatWorld:
    """Static flattened plan of a World for the batch-minor engine."""

    def __init__(self, world: World):
        self.world = world
        self.joints: List[_JointPlan] = []
        self.G_body: List[np.ndarray] = []  # static (6,6) spatial inertias
        body_off = world.body_offsets()
        dof_off = [s for s, _ in world.dof_slices()]
        for si, skel in enumerate(world.skeletons):
            for j in skel.joints:
                if j.joint_type not in SUPPORTED_TYPES:
                    raise NotImplementedError(
                        f"batched engine: joint type {j.joint_type!r} "
                        "not yet supported"
                    )
                T_ci = np.linalg.inv(j.T_cj)
                S_const = None
                S_local = None
                if j.joint_type in _CONST_S_TYPES:
                    S_local = np.zeros((6, j.num_dofs))
                    if j.joint_type == J.REVOLUTE:
                        S_local[:3, 0] = j.axes[0]
                    elif j.joint_type == J.PRISMATIC:
                        S_local[3:, 0] = j.axes[0]
                    elif j.joint_type == J.SCREW:
                        S_local[:3, 0] = j.axes[0]
                        S_local[3:, 0] = j.axes[0] * j.screw_pitch
                    elif j.joint_type == J.TRANSLATIONAL:
                        S_local[3:, :] = np.eye(3)
                    elif j.joint_type == J.TRANSLATIONAL_2D:
                        S_local[3:, 0] = j.axes[0]
                        S_local[3:, 1] = j.axes[1]
                    S_const = _Ad_np(j.T_cj) @ S_local
                self.joints.append(
                    _JointPlan(
                        spec=j,
                        parent=(
                            body_off[si] + j.parent if j.parent >= 0 else -1
                        ),
                        q_index=dof_off[si] + j.q_index,
                        num_dofs=j.num_dofs,
                        R_pj=j.T_pj[:3, :3].copy(),
                        p_pj=j.T_pj[:3, 3].copy(),
                        R_ci=T_ci[:3, :3].copy(),
                        p_ci=T_ci[:3, 3].copy(),
                        Ad_cj=_Ad_np(j.T_cj),
                        R_cj=j.T_cj[:3, :3].copy(),
                        p_cj=j.T_cj[:3, 3].copy(),
                        S_const=S_const,
                        S_local=S_local,
                    )
                )
            for b in skel.bodies:
                self.G_body.append(_spatial_inertia_np(b.mass, b.com, b.inertia))
        # Flat body specs (for body-parameter overrides in the engine).
        self.body_specs = [b for s in world.skeletons for b in s.bodies]
        self.nb = len(self.joints)
        self.nv = world.num_dofs

        # Static ancestor-dof mask: anc[b, d] = 1 iff dof d moves body b.
        self.anc = np.zeros((self.nb, self.nv))
        for bi, jp in enumerate(self.joints):
            k = bi
            while k >= 0:
                jk = self.joints[k]
                self.anc[bi, jk.q_index : jk.q_index + jk.num_dofs] = 1.0
                k = jk.parent
        # children[b] = list of child body indices.
        self.children: List[List[int]] = [[] for _ in range(self.nb)]
        for bi, jp in enumerate(self.joints):
            if jp.parent >= 0:
                self.children[jp.parent].append(bi)

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


# ---------------------------------------------------------------------------
# Batched joint-local quantities
# ---------------------------------------------------------------------------


def _joint_Q(jp: _JointPlan, qj, dtype):
    """Joint transform Q(q) batched: returns (R (3,3,B), p (3,B)).

    Matches dynamics/joints.joint_transform per type.
    """
    t = jp.spec.joint_type
    B = qj.shape[-1] if qj.size else 1
    if t == J.WELD:
        return bl.const(np.eye(3), dtype), bl.const(np.zeros(3), dtype)
    if t == J.REVOLUTE or t == J.SCREW:
        a = jp.spec.axes[0]
        K = _skew_np(a)
        R = bl.rodrigues(K, K @ K, qj[0], dtype)
        if t == J.SCREW:
            p = bl.const(a, dtype) * (qj[0] * jp.spec.screw_pitch)[None, :]
        else:
            p = jnp.zeros((3, B), dtype=dtype)
        return R, p
    if t == J.PRISMATIC:
        return (
            bl.const(np.eye(3), dtype),
            bl.const(jp.spec.axes[0], dtype) * qj[0][None, :],
        )
    if t == J.TRANSLATIONAL:
        return bl.const(np.eye(3), dtype), qj
    if t == J.TRANSLATIONAL_2D:
        p = (
            bl.const(jp.spec.axes[0], dtype) * qj[0][None, :]
            + bl.const(jp.spec.axes[1], dtype) * qj[1][None, :]
        )
        return bl.const(np.eye(3), dtype), p
    if t == J.BALL:
        return bl.exp_so3(qj), jnp.zeros((3, qj.shape[-1]), dtype=dtype)
    if t == J.FREE:
        return bl.exp_so3(qj[:3]), qj[3:]
    if t == J.UNIVERSAL:
        a0, a1 = jp.spec.axes[0], jp.spec.axes[1]
        K0, K1 = _skew_np(a0), _skew_np(a1)
        R = bl.mm(
            bl.rodrigues(K0, K0 @ K0, qj[0], dtype),
            bl.rodrigues(K1, K1 @ K1, qj[1], dtype),
        )
        return R, jnp.zeros((3, qj.shape[-1]), dtype=dtype)
    if t == J.PLANAR:
        a0, a1 = jp.spec.axes[0], jp.spec.axes[1]
        n = np.cross(a0, a1)
        Kn = _skew_np(n)
        R = bl.rodrigues(Kn, Kn @ Kn, qj[2], dtype)
        p = (
            bl.const(a0, dtype) * qj[0][None, :]
            + bl.const(a1, dtype) * qj[1][None, :]
        )
        return R, p
    if t in (J.EULER, J.EULER_FREE):
        R = _euler_R(jp.spec.euler_order, qj, dtype)
        if t == J.EULER:
            return R, jnp.zeros((3, qj.shape[-1]), dtype=dtype)
        return R, qj[3:]
    if t == J.CUSTOM:
        # Spline-driven OpenSim joint (dynamics/joints.py CUSTOM parity):
        # R = prod_i exp(rot_axes[i] * f_i), p = sum_i trans_axes[i] * f_i,
        # with each f_i an elementwise spline of one coordinate -> all
        # batched ops on (B,) angles.
        cj = jp.spec.custom
        B_ = qj.shape[-1]
        zero = jnp.zeros((B_,), dtype=dtype)
        vals = [
            fn(qj[d]) if d >= 0 else fn(zero) + zero
            for fn, d in zip(cj.functions, cj.drives)
        ]
        R = None
        for i in range(3):
            a = np.asarray(cj.rot_axes[i], dtype=np.float64)
            K = _skew_np(a)
            Ri = bl.rodrigues(K, K @ K, vals[i] + zero, dtype)
            R = Ri if R is None else bl.mm(R, Ri)
        p = jnp.zeros((3, B_), dtype=dtype)
        for i in range(3):
            p = p + bl.const(cj.trans_axes[i], dtype) * (
                vals[3 + i] + zero
            )[None, :]
        return R, p
    if t in _GENERIC_TYPES:
        # Biomech joints (ellipsoid / scapulathoracic / constant-curve ±
        # incompressible): the single-joint transform lane-vmapped. These
        # are smooth per-joint small ops — vmap over the trailing axis
        # lowers to the same batched elementwise XLA as hand-unrolling.
        T = jax.vmap(
            lambda qq: J.joint_transform(jp.spec, qq), in_axes=1, out_axes=2
        )(qj)
        return T[:3, :3], T[:3, 3]
    raise NotImplementedError(t)


_AXIS_VEC = {"x": np.array([1.0, 0, 0]), "y": np.array([0, 1.0, 0]),
             "z": np.array([0, 0, 1.0])}


def _euler_R(order, qj, dtype):
    """Intrinsic Euler composition of static-axis Rodrigues rotations."""
    R = None
    for i, ax in enumerate(order.lower()):
        a = _AXIS_VEC[ax]
        K = _skew_np(a)
        Ri = bl.rodrigues(K, K @ K, qj[i], dtype)
        R = Ri if R is None else bl.mm(R, Ri)
    return R


def _scaled_Ad_cj(jp: _JointPlan, s_chi, dtype, B):
    """Ad(T_cj) with the anchor translation scaled by the child body scale
    (GROUP_SCALES): [[R, 0], [skew(p*s) R, R]], batched (6, 6, B)."""
    Rc = jnp.broadcast_to(bl.const(jp.R_cj, dtype), (3, 3, B))
    p = bl.const(jp.p_cj, dtype) * s_chi  # (3, B)
    z33 = jnp.zeros((3, 3, B), dtype=dtype)
    top = jnp.concatenate([Rc, z33], axis=1)
    bot = jnp.concatenate([bl.mm(bl.skew(p), Rc), Rc], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def _joint_S(jp: _JointPlan, qj, dtype, s_chi=None):
    """Child-body-frame relative Jacobian S = Ad(T_cj) S_joint(q).

    Returns (6, nd, B) (or a broadcastable (6, nd, 1) constant).
    Matches dynamics/joints.joint_body_jacobian composed with Ad(T_cj);
    `s_chi` (3, B) applies the child body scale to the T_cj anchor.
    """
    t = jp.spec.joint_type
    if jp.S_const is not None:
        if s_chi is None:
            return bl.const(jp.S_const, dtype)
        B = s_chi.shape[-1]
        return bl.mm(
            _scaled_Ad_cj(jp, s_chi, dtype, B), bl.const(jp.S_local, dtype)
        )
    B = qj.shape[-1]
    z33 = jnp.zeros((3, 3, B), dtype=dtype)
    if t == J.BALL:
        Jr = bl.so3_right_jacobian_b(qj)
        S = jnp.concatenate([Jr, z33], axis=0)
    elif t == J.FREE:
        Jr = bl.so3_right_jacobian_b(qj[:3])
        Rt = bl.exp_so3(-qj[:3])
        top = jnp.concatenate([Jr, z33], axis=1)
        bot = jnp.concatenate([z33, Rt], axis=1)
        S = jnp.concatenate([top, bot], axis=0)
    elif t == J.UNIVERSAL:
        a0, a1 = jp.spec.axes[0], jp.spec.axes[1]
        K1 = _skew_np(a1)
        Rm = bl.rodrigues(K1, K1 @ K1, -qj[1], dtype)  # exp(-a1 q1)
        col0_w = bl.mv(Rm, jnp.broadcast_to(bl.const(a0, dtype), (3, B)))
        col1_w = jnp.broadcast_to(bl.const(a1, dtype), (3, B))
        w = jnp.stack([col0_w, col1_w], axis=1)  # (3, 2, B)
        S = jnp.concatenate([w, jnp.zeros((3, 2, B), dtype=dtype)], axis=0)
    elif t == J.PLANAR:
        a0, a1 = jp.spec.axes[0], jp.spec.axes[1]
        n = np.cross(a0, a1)
        Kn = _skew_np(n)
        Rt = bl.rodrigues(Kn, Kn @ Kn, -qj[2], dtype)  # R^T = exp(-n q2)
        v0 = bl.mv(Rt, jnp.broadcast_to(bl.const(a0, dtype), (3, B)))
        v1 = bl.mv(Rt, jnp.broadcast_to(bl.const(a1, dtype), (3, B)))
        zv = jnp.zeros((3, B), dtype=dtype)
        nw = jnp.broadcast_to(bl.const(n, dtype), (3, B))
        top = jnp.stack([zv, zv, nw], axis=1)
        bot = jnp.stack([v0, v1, zv], axis=1)
        S = jnp.concatenate([top, bot], axis=0)
    elif t in (J.EULER, J.EULER_FREE):
        # Body angular Jacobian of intrinsic R = R1 R2 R3: column i =
        # (R_{i+1..3})^T a_i (later rotations rotate earlier axes back).
        order = jp.spec.euler_order.lower()
        cols = []
        for i, ax in enumerate(order):
            a = jnp.broadcast_to(bl.const(_AXIS_VEC[ax], dtype), (3, B))
            c = a
            for k2 in range(i + 1, 3):
                ak = _AXIS_VEC[order[k2]]
                Kk = _skew_np(ak)
                c = bl.mv(bl.rodrigues(Kk, Kk @ Kk, -qj[k2], dtype), c)
            cols.append(c)
        w = jnp.stack(cols, axis=1)  # (3, 3, B)
        if t == J.EULER:
            S = jnp.concatenate(
                [w, jnp.zeros((3, 3, B), dtype=dtype)], axis=0
            )
        else:
            Rt = bl.transpose(_euler_R(order, qj, dtype))
            z33b = jnp.zeros((3, 3, B), dtype=dtype)
            top = jnp.concatenate([w, z33b], axis=1)
            bot = jnp.concatenate([z33b, Rt], axis=1)
            S = jnp.concatenate([top, bot], axis=0)
    elif t in _GENERIC_TYPES:
        # Generic exact body Jacobian via per-dof jvp of the batched Q:
        # column j = [vee(R^T dR/dq_j); R^T dp/dq_j].
        nd = jp.num_dofs

        def Q_of(qq):
            return _joint_Q(jp, qq, dtype)

        R0, p0 = Q_of(qj)
        Rt0 = bl.transpose(R0)
        cols_w, cols_v = [], []
        for jdx in range(nd):
            tang = jnp.zeros_like(qj).at[jdx].set(1.0)
            (_, _), (dR, dp) = jax.jvp(Q_of, (qj,), (tang,))
            M = bl.mm(Rt0, dR)  # (3, 3, B) ~ skew(w)
            w = jnp.stack([M[2, 1], M[0, 2], M[1, 0]])
            cols_w.append(w)
            cols_v.append(bl.mv(Rt0, dp))
        S = jnp.concatenate(
            [jnp.stack(cols_w, axis=1), jnp.stack(cols_v, axis=1)], axis=0
        )
    else:
        raise NotImplementedError(t)
    if s_chi is None:
        return bl.mm(bl.const(jp.Ad_cj, dtype), S)
    return bl.mm(_scaled_Ad_cj(jp, s_chi, dtype, B), S)


def _joint_S_dot_dq(jp: _JointPlan, qj, dqj, dtype, s_chi=None):
    """(d/dt S(q)) dq = jvp of q -> S(q) dq along dq (exact, generic).

    Zero for constant-S joint types. Reference parity:
    Joint::getRelativeJacobianTimeDeriv applied to dq.
    """
    if jp.S_const is not None or jp.num_dofs == 0:
        return jnp.zeros((6, qj.shape[-1]), dtype=dtype)
    f = lambda qq: bl.mv(_joint_S(jp, qq, dtype, s_chi=s_chi), dqj)
    return jax.jvp(f, (qj,), (dqj,))[1]


def _rel_transform(jp: _JointPlan, qj, dtype, s_par=None, s_chi=None):
    """T_rel = T_pj Q(q) T_cj^-1 batched: returns (R (3,3,B), p (3,B)).

    s_par/s_chi (3, B): GROUP_SCALES anchor scaling — T_pj's translation
    scales with the PARENT body, T_cj's with the CHILD (reference:
    Joint::setParentScale/setChildScale, dart/dynamics/Joint.cpp:1523).
    """
    Rq, pq = _joint_Q(jp, qj, dtype)
    # Q T_cj^-1   (bl.mv/mm broadcast (.., 1) constants against (.., B))
    R1 = bl.mm(Rq, bl.const(jp.R_ci, dtype))
    if s_chi is None:
        p_ci = bl.const(jp.p_ci, dtype) + jnp.zeros_like(pq)
    else:
        # inv(T_cj scaled) translation: -R_cj^T (p_cj * s_child).
        p_ci = -bl.mv(
            jnp.broadcast_to(
                bl.const(jp.R_ci, dtype), (3, 3, s_chi.shape[-1])
            ),
            bl.const(jp.p_cj, dtype) * s_chi,
        )
    p1 = bl.mv(Rq, p_ci) + pq
    # T_pj (...)
    R = bl.mm(bl.const(jp.R_pj, dtype), R1)
    p_pj = bl.const(jp.p_pj, dtype)
    if s_par is not None:
        p_pj = p_pj * s_par
    p = bl.mv(bl.const(jp.R_pj, dtype), p1) + p_pj
    return R, p


def _adinv_twist(R, p, V):
    """Ad(T^-1) V for T = (R, p), V (6, B): [R^T w; R^T (v - p x w)]."""
    w, v = V[:3], V[3:]
    return jnp.concatenate(
        [bl.mtv(R, w), bl.mtv(R, v - bl.cross(p, w))]
    )


def _dad_transmit(R, p, F):
    """Ad(T^-1)^T F — wrench transmitted to the parent frame.

    = [R m + p x (R f); R f] for F = [m; f].
    """
    m, f = F[:3], F[3:]
    Rf = bl.mv(R, f)
    return jnp.concatenate([bl.mv(R, m) + bl.cross(p, Rf), Rf])


# ---------------------------------------------------------------------------
# FK + world Jacobian + dynamics
# ---------------------------------------------------------------------------


def _slice_q(fw: FlatWorld, q, jp: _JointPlan):
    return q[jp.q_index : jp.q_index + jp.num_dofs]


def fk(fw: FlatWorld, q, scales=None):
    """FK + world Jacobian columns.

    scales: optional (nb, 3, B) per-body GROUP_SCALES anchor scaling.
    Returns (R_wb list[(3,3,B)], p_wb list[(3,B)], W (6, nv, B),
    S_list (child-frame relative Jacobians), rel list[(R, p)]).
    """
    dtype = q.dtype
    B = q.shape[-1]

    def s_of(i):
        if scales is None or i < 0:
            return None
        return jnp.broadcast_to(scales[i], (3, B))

    R_wb: List = []
    p_wb: List = []
    rels: List = []
    S_list: List = []
    W_cols: List = [None] * len(fw.joints)
    for bi, jp in enumerate(fw.joints):
        qj = _slice_q(fw, q, jp)
        Rr, pr = _rel_transform(
            jp, qj, dtype, s_par=s_of(jp.parent), s_chi=s_of(bi)
        )
        if jp.parent < 0:
            Rw = jnp.broadcast_to(Rr, (3, 3, B))
            pw = jnp.broadcast_to(pr, (3, B))
        else:
            Rp, pp = R_wb[jp.parent], p_wb[jp.parent]
            Rw = bl.mm(Rp, Rr)
            pw = bl.mv(Rp, jnp.broadcast_to(pr, (3, B))) + pp
        R_wb.append(Rw)
        p_wb.append(pw)
        rels.append((Rr, pr))
        S = (
            _joint_S(jp, qj, dtype, s_chi=s_of(bi))
            if jp.num_dofs
            else None
        )
        S_list.append(S)
        if jp.num_dofs:
            Sb = jnp.broadcast_to(S, (6, jp.num_dofs, B))
            ang = bl.mm(Rw, Sb[:3])
            lin = bl.cross_cols(pw, ang) + bl.mm(Rw, Sb[3:])
            W_cols[bi] = jnp.concatenate([ang, lin], axis=0)
    # Assemble W in global dof order.
    cols = []
    for bi, jp in enumerate(fw.joints):
        if jp.num_dofs:
            cols.append((jp.q_index, W_cols[bi]))
    cols.sort(key=lambda t: t[0])
    W = (
        jnp.concatenate([c for _, c in cols], axis=1)
        if cols
        else jnp.zeros((6, 0, B), dtype=dtype)
    )
    return R_wb, p_wb, W, S_list, rels


def bias_forces(fw: FlatWorld, q, v, rels, S_list, gravity, G_list=None,
                scales=None):
    """C(q, v) incl. gravity via batched RNEA (zero acceleration).

    Matches dynamics/skeleton.bias_forces (body-frame spatial recursion).
    G_list: optional per-body (6, 6, B)/(6, 6, 1) spatial inertias
    (body-parameter overrides); defaults to the static spec inertias.
    """
    dtype = q.dtype
    B = q.shape[-1]

    def s_of(i):
        if scales is None or i < 0:
            return None
        return jnp.broadcast_to(scales[i], (3, B))
    g = np.asarray(gravity, dtype=np.float64)
    base_acc = bl.const(np.concatenate([np.zeros(3), -g]), dtype)
    V: List = [None] * fw.nb
    A: List = [None] * fw.nb
    Sdq: List = [None] * fw.nb
    for bi, jp in enumerate(fw.joints):
        Rr, pr = rels[bi]
        Rr = jnp.broadcast_to(Rr, (3, 3, B))
        pr = jnp.broadcast_to(pr, (3, B))
        if jp.parent < 0:
            Vp = jnp.zeros((6, B), dtype=dtype)
            Ap = jnp.broadcast_to(base_acc, (6, B))
        else:
            Vp, Ap = V[jp.parent], A[jp.parent]
        if jp.num_dofs:
            qj = _slice_q(fw, q, jp)
            dqj = _slice_q(fw, v, jp)
            sj = bl.mv(jnp.broadcast_to(S_list[bi], (6, jp.num_dofs, B)), dqj)
            sdot = _joint_S_dot_dq(jp, qj, dqj, dtype, s_chi=s_of(bi))
        else:
            sj = jnp.zeros((6, B), dtype=dtype)
            sdot = jnp.zeros((6, B), dtype=dtype)
        Vi = _adinv_twist(Rr, pr, Vp) + sj
        Ai = _adinv_twist(Rr, pr, Ap) + bl.ad_apply(Vi, sj) + sdot
        V[bi], A[bi], Sdq[bi] = Vi, Ai, sj
    # Backward sweep.
    F: List = [None] * fw.nb
    tau_parts: Dict[int, jnp.ndarray] = {}
    for bi in reversed(range(fw.nb)):
        jp = fw.joints[bi]
        Gb = (
            G_list[bi] if G_list is not None else bl.const(fw.G_body[bi], dtype)
        )
        Fi = bl.mv(jnp.broadcast_to(Gb, (6, 6, B)), A[bi]) - bl.dad_apply(
            V[bi], bl.mv(jnp.broadcast_to(Gb, (6, 6, B)), V[bi])
        )
        if F[bi] is not None:
            Fi = Fi + F[bi]
        if jp.parent >= 0:
            Rr, pr = rels[bi]
            contrib = _dad_transmit(
                jnp.broadcast_to(Rr, (3, 3, B)),
                jnp.broadcast_to(pr, (3, B)),
                Fi,
            )
            F[jp.parent] = (
                contrib if F[jp.parent] is None else F[jp.parent] + contrib
            )
        if jp.num_dofs:
            tau_parts[jp.q_index] = bl.mtv(
                jnp.broadcast_to(S_list[bi], (6, jp.num_dofs, B)), Fi
            )
    parts = [tau_parts[k] for k in sorted(tau_parts)]
    return (
        jnp.concatenate(parts, axis=0)
        if parts
        else jnp.zeros((0, B), dtype=dtype)
    )


def mass_matrix_blocks(fw: FlatWorld, R_wb, p_wb, W, G_list=None):
    """Per-skeleton diagonal blocks of the CRBA mass matrix.

    Returns a list of (nd_s, nd_s, B) dense blocks aligned with
    fw.world.dof_slices(). The world mass matrix is block-diagonal across
    skeletons (no generalized coordinate couples two trees), so callers
    that only factor/solve with M (the engine) should stay in block form:
    a 20-box stack is twenty 6x6 lane-major Choleskys instead of one
    120x120 dense factorization. Reference parity: per-skeleton
    Skeleton::getMassMatrix (each skeleton owns its own M).
    """
    dtype = W.dtype
    B = W.shape[-1]
    # World-frame spatial inertia per body: X^T G X, X = Ad(T_wb^-1).
    Gc: List = [None] * fw.nb
    for bi in range(fw.nb):
        R, p = R_wb[bi], p_wb[bi]
        Rt = bl.transpose(R)
        mRtP = -bl.mm(Rt, bl.skew(p))
        top = jnp.concatenate([Rt, jnp.zeros((3, 3, B), dtype=dtype)], axis=1)
        bot = jnp.concatenate([mRtP, Rt], axis=1)
        X = jnp.concatenate([top, bot], axis=0)  # (6, 6, B)
        Gb = (
            G_list[bi] if G_list is not None else bl.const(fw.G_body[bi], dtype)
        )
        GX = bl.mm(Gb, X)
        Gc[bi] = bl.mtm(X, GX)
    # Composite accumulation up the tree (world frame: plain adds).
    for bi in reversed(range(fw.nb)):
        jp = fw.joints[bi]
        if jp.parent >= 0:
            Gc[jp.parent] = Gc[jp.parent] + Gc[bi]

    # Blocks M[dofs_i, dofs_j] = W_i^T Gc_j W_j for i ancestor-or-self of j.
    blocks: Dict[Tuple[int, int], jnp.ndarray] = {}
    cols_of = {}
    for bi, jp in enumerate(fw.joints):
        if jp.num_dofs:
            cols_of[bi] = W[:, jp.q_index : jp.q_index + jp.num_dofs, :]
    for bj, jpj in enumerate(fw.joints):
        if not jpj.num_dofs:
            continue
        Yj = bl.mm(Gc[bj], cols_of[bj])  # (6, ndj, B)
        k = bj
        while k >= 0:
            jpk = fw.joints[k]
            if jpk.num_dofs:
                blocks[(jpk.q_index, jpj.q_index)] = bl.mtm(cols_of[k], Yj)
            k = jpk.parent
    # Assemble per-skeleton dense blocks, mirroring symmetric sub-blocks.
    zero = jnp.zeros((B,), dtype=dtype)
    out: List = []
    for s, e in fw.world.dof_slices():
        nd = e - s
        if nd == 0:  # fixed/static skeleton (e.g. welded ground)
            out.append(jnp.zeros((0, 0, B), dtype=dtype))
            continue
        grid = [[zero for _ in range(nd)] for _ in range(nd)]
        for (qi, qj), blk in blocks.items():
            if not (s <= qi < e):
                continue  # joint-Jacobian blocks never straddle skeletons
            ni, nj = blk.shape[0], blk.shape[1]
            for a in range(ni):
                for b in range(nj):
                    grid[qi - s + a][qj - s + b] = blk[a, b]
                    grid[qj - s + b][qi - s + a] = blk[a, b]
        out.append(jnp.stack([jnp.stack(row) for row in grid]))
    return out


def mass_matrix(fw: FlatWorld, R_wb, p_wb, W, G_list=None):
    """World-frame CRBA: M (nv, nv, B) dense (zeros across skeletons).

    Reference parity: Skeleton::getMassMatrix (same values; computed with
    world-frame composites instead of body-frame CRBA sweeps). G_list:
    optional per-body spatial-inertia overrides (body parameters). Hot
    paths should prefer mass_matrix_blocks — this dense form exists for
    the Jacobian/API surface (e.g. World.getMassMatrix parity).
    """
    dtype = W.dtype
    B = W.shape[-1]
    nv = fw.nv
    blocks = mass_matrix_blocks(fw, R_wb, p_wb, W, G_list=G_list)
    zero = jnp.zeros((B,), dtype=dtype)
    grid = [[zero for _ in range(nv)] for _ in range(nv)]
    for (s, e), blk in zip(fw.world.dof_slices(), blocks):
        for a in range(e - s):
            for b in range(e - s):
                grid[s + a][s + b] = blk[a, b]
    return jnp.stack([jnp.stack(row) for row in grid])


def integrate_positions(fw: FlatWorld, q, v, dt):
    """Per-joint-type explicit position integration, batched.

    Matches dynamics/joints.integrate_positions (exp-map for ball/free).
    """
    dtype = q.dtype
    parts: List = []
    for jp in fw.joints:
        if jp.num_dofs == 0:
            continue
        qj = _slice_q(fw, q, jp)
        dqj = _slice_q(fw, v, jp)
        t = jp.spec.joint_type
        if t == J.BALL:
            Jr = bl.so3_right_jacobian_b(qj)
            Rn = bl.mm(bl.exp_so3(qj), bl.exp_so3(bl.mv(Jr, dqj) * dt))
            parts.append((jp.q_index, bl.log_so3(Rn)))
        elif t == J.FREE:
            w = qj[:3]
            Jr = bl.so3_right_jacobian_b(w)
            xi_w = bl.mv(Jr, dqj[:3]) * dt
            xi_v = bl.mv(bl.exp_so3(-w), dqj[3:]) * dt
            Rq = bl.exp_so3(w)
            Rn = bl.mm(Rq, bl.exp_so3(xi_w))
            pn = qj[3:] + bl.mv(Rq, xi_v)
            parts.append(
                (jp.q_index, jnp.concatenate([bl.log_so3(Rn), pn], axis=0))
            )
        else:
            parts.append((jp.q_index, qj + dqj * dt))
    parts.sort(key=lambda x: x[0])
    return jnp.concatenate([p for _, p in parts], axis=0)
