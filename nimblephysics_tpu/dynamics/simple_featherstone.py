"""SimpleFeatherstone: flat-array O(n) ABA forward dynamics via lax.scan.

Reference parity: dart/dynamics/SimpleFeatherstone.hpp:17-75
(`JointAndBody` flat arrays + `FeatherstoneScratchSpace` recursion) — the
reference's stripped-down articulated-body algorithm for single-dof serial
structures, which SURVEY.md calls "the closest thing in the reference to
the TPU kernel layout".

Here the recursion is two `lax.scan`s over stacked per-joint arrays
(parent pointers restricted to chains: parent = i - 1 or world). For deep
chains this O(n) path beats the dense O(n^3) matrix route; for the small-n
batched regime the dense route usually wins on the MXU — both are exposed.

All quantities are body-frame spatial vectors [w; v].
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.dynamics import joints as JT
from nimblephysics_tpu.dynamics.skeleton import Skeleton, _spatial_inertias
from nimblephysics_tpu.math import lie


class FlatChain(NamedTuple):
    """Stacked per-joint constants (the reference's JointAndBody arrays)."""

    S: jnp.ndarray  # (n, 6) joint motion subspace in the child body frame
    T_static: jnp.ndarray  # (n, 4, 4) parent-body->child-body at q = 0 parts:
    # T_rel(q) = T_pj Q(q) T_cj^-1; for 1-dof joints we store T_pj and
    # T_cj^-1 separately to rebuild T_rel(q) in the scan.
    T_pj: jnp.ndarray  # (n, 4, 4)
    T_cj_inv: jnp.ndarray  # (n, 4, 4)
    axis: jnp.ndarray  # (n, 3)
    is_prismatic: jnp.ndarray  # (n,) bool
    G: jnp.ndarray  # (n, 6, 6) spatial inertias


def flatten_chain(skel: Skeleton, dtype=jnp.float64) -> FlatChain:
    """Populate flat arrays from a serial single-dof skeleton
    (reference: SimpleFeatherstone::populateFromSkeleton)."""
    n = skel.num_bodies
    S = np.zeros((n, 6))
    axis = np.zeros((n, 3))
    prism = np.zeros(n, dtype=bool)
    T_pj = np.zeros((n, 4, 4))
    T_cj_inv = np.zeros((n, 4, 4))
    for i, spec in enumerate(skel.joints):
        assert spec.num_dofs == 1 and spec.joint_type in (
            JT.REVOLUTE,
            JT.PRISMATIC,
        ), "SimpleFeatherstone handles single-dof revolute/prismatic chains"
        assert spec.parent == i - 1, "SimpleFeatherstone expects a chain"
        a = spec.axes[0]
        axis[i] = a
        prism[i] = spec.joint_type == JT.PRISMATIC
        T_pj[i] = spec.T_pj
        T_cj_inv[i] = np.linalg.inv(spec.T_cj)
        Ad_cj = np.asarray(lie.Ad(jnp.asarray(spec.T_cj)))
        s_joint = (
            np.concatenate([np.zeros(3), a])
            if prism[i]
            else np.concatenate([a, np.zeros(3)])
        )
        S[i] = Ad_cj @ s_joint
    G = jnp.stack(_spatial_inertias(skel, dtype))
    return FlatChain(
        S=jnp.asarray(S, dtype),
        T_static=jnp.zeros((n, 4, 4), dtype),
        T_pj=jnp.asarray(T_pj, dtype),
        T_cj_inv=jnp.asarray(T_cj_inv, dtype),
        axis=jnp.asarray(axis, dtype),
        is_prismatic=jnp.asarray(prism),
        G=G,
    )


def aba_forward_dynamics(
    chain: FlatChain,
    q: jnp.ndarray,
    dq: jnp.ndarray,
    tau: jnp.ndarray,
    gravity: jnp.ndarray,
) -> jnp.ndarray:
    """O(n) articulated-body algorithm over the chain; returns ddq.

    Three scans (reference: SimpleFeatherstone::forwardDynamics's
    backward/forward passes over scratch space):
      1. outward: transforms, velocities, bias terms
      2. inward: articulated inertias + bias forces
      3. outward: accelerations.
    """
    n = q.shape[-1]
    dtype = q.dtype

    # Per-joint relative transform and velocity-dependent terms (parallel).
    def joint_T(i):
        a = chain.axis[i]
        R = jnp.where(
            chain.is_prismatic[i],
            jnp.eye(3, dtype=dtype),
            lie.exp_map_rot(a * q[i]),
        )
        p = jnp.where(chain.is_prismatic[i], a * q[i], jnp.zeros(3, dtype))
        Q = lie.rp_to_transform(R, p)
        return chain.T_pj[i] @ Q @ chain.T_cj_inv[i]

    T_rel = jax.vmap(joint_T)(jnp.arange(n))
    Ad_inv = jax.vmap(lambda T: lie.Ad(lie.transform_inv(T)))(T_rel)

    # 1. outward: V_i = Ad(T^-1) V_parent + S_i dq_i
    def vel_scan(V_par, x):
        Adi, Si, dqi = x
        V = Adi @ V_par + Si * dqi
        return V, V

    base_acc = jnp.concatenate([jnp.zeros(3, dtype), -gravity])
    _, V = jax.lax.scan(
        vel_scan, jnp.zeros(6, dtype), (Ad_inv, chain.S, dq)
    )
    # Velocity products: c_i = ad(V_i) S_i dq_i ; bias force
    # p_i = -ad*(V_i)(G_i V_i).
    cvel = jax.vmap(lambda Vi, Si, dqi: lie.ad_apply(Vi, Si * dqi))(
        V, chain.S, dq
    )
    pbias = jax.vmap(lambda Vi, Gi: -lie.dad_apply(Vi, Gi @ Vi))(V, chain.G)

    # 2. inward: articulated inertia G^A and bias p^A.
    def art_scan(carry, x):
        GA_child, pA_child, Ad_child = carry
        Gi, pi, ci, Si, taui, Adi = x
        GA = Gi + jnp.swapaxes(Ad_child, -1, -2) @ GA_child @ Ad_child
        pA = pi + jnp.swapaxes(Ad_child, -1, -2) @ pA_child
        # Project through the joint of THIS body for the parent's view:
        GS = GA @ Si
        sGs = Si @ GS + 1e-12
        u = taui - Si @ (pA + GA @ ci)
        GA_proj = GA - jnp.outer(GS, GS) / sGs
        pA_proj = pA + GA @ ci + GS * (u / sGs)
        return (GA_proj, pA_proj, Adi), (GA, pA, u, sGs)

    zero6 = jnp.zeros((6, 6), dtype)
    (_, _, _), (GA, pA, u, sGs) = jax.lax.scan(
        art_scan,
        (zero6, jnp.zeros(6, dtype), jnp.eye(6, dtype=dtype) * 0.0),
        (chain.G[::-1], pbias[::-1], cvel[::-1], chain.S[::-1],
         tau[::-1], Ad_inv[::-1]),
    )
    GA, pA, u, sGs = GA[::-1], pA[::-1], u[::-1], sGs[::-1]

    # 3. outward: accelerations. Note u already contains the velocity-bias
    # contribution through p^a = p^A + G^A c, so ddq uses only the
    # transformed parent acceleration.
    def acc_scan(A_par, x):
        Adi, GAi, ui, sGsi, Si, ci = x
        A_t = Adi @ A_par
        ddqi = (ui - Si @ (GAi @ A_t)) / sGsi
        A = A_t + ci + Si * ddqi
        return A, ddqi

    _, ddq = jax.lax.scan(
        acc_scan, base_acc, (Ad_inv, GA, u, sGs, chain.S, cvel)
    )
    return ddq
