"""IKInitializer: closed-form pose bootstrap from marker clouds.

Reference parity: dart/biomechanics/IKInitializer.hpp (4.2k LoC) — the
closed-form pipeline the production MarkerFitter starts from:

  1. SEGMENT POSES: every body with >= 3 markers gets a per-frame rigid
     transform by Kabsch/Procrustes between its model-frame marker offsets
     and the observed cloud.
  2. JOINT CENTERS: for joints whose parent and child both have segment
     poses, the classic symmetric center-of-rotation estimate (SCoRE,
     Ehrig et al. 2006 — the same closed-form family the reference's
     `closedFormMDSJointCenterSolver`/`leastSquaresConcentricSphereFit`
     implement): solve the linear least squares
         [R_p(t), -R_c(t)] [c_p; c_c] = p_c(t) - p_p(t)   for all t.
  3. POSE RECOVERY: the root joint's 6-dof pose comes from its segment
     transform; interior joint coordinates from the relative segment
     rotations projected through each joint's coordinate map
     (Q_est = T_pj^-1 T_parent^-1 T_child T_cj, then log-map / axis
     projection per joint type).

All numpy (host-side preprocessing); the result seeds the vmapped
Gauss-Newton IK in MarkerFitter.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from nimblephysics_tpu.biomechanics.scaled_fk import marker_table
from nimblephysics_tpu.dynamics.skeleton import Skeleton


def _kabsch(P: np.ndarray, Q: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Rigid (R, t) minimizing |R P + t - Q| (rows = points)."""
    cp, cq = P.mean(axis=0), Q.mean(axis=0)
    H = (P - cp).T @ (Q - cq)
    U, _, Vt = np.linalg.svd(H)
    d = np.sign(np.linalg.det(Vt.T @ U.T))
    R = Vt.T @ np.diag([1.0, 1.0, d]) @ U.T
    return R, cq - R @ cp


def _log_rot(R: np.ndarray) -> np.ndarray:
    cos_t = np.clip((np.trace(R) - 1.0) / 2.0, -1.0, 1.0)
    t = np.arccos(cos_t)
    if t < 1e-8:
        return np.zeros(3)
    if np.pi - t < 1e-5:
        A = (R + np.eye(3)) / 2.0
        axis = np.sqrt(np.maximum(np.diag(A), 0.0))
        axis = axis / max(np.linalg.norm(axis), 1e-12)
        v = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
        if v @ axis < 0:
            axis = -axis
        return t * axis
    v = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    return t / (2.0 * np.sin(t)) * v


class IKInitializer:
    def __init__(self, skel: Skeleton, root_translation_dofs=None):
        self.skel = skel
        self.names, self.bodies, self.offsets, _ = marker_table(skel)
        # body -> marker row indices (static).
        self.body_markers: Dict[int, np.ndarray] = {}
        for b in range(skel.num_bodies):
            rows = np.where(self.bodies == b)[0]
            if len(rows) >= 3:
                self.body_markers[b] = rows
        j0 = skel.joints[0] if skel.joints else None
        if root_translation_dofs is None:
            root_translation_dofs = []
            if j0 is not None:
                if j0.joint_type == "free":
                    root_translation_dofs = [3, 4, 5]
                elif j0.joint_type == "translational":
                    root_translation_dofs = [0, 1, 2]
                elif j0.joint_type == "custom" and j0.custom is not None:
                    # OpenSim ground-pelvis CustomJoint: the coordinates
                    # driving the three translation axes.
                    root_translation_dofs = [
                        d for d in j0.custom.drives[3:6] if d >= 0
                    ]
        self.root_dofs = list(root_translation_dofs)
        self._joint_fit_cache = {}

    # -- step 1: per-frame segment poses -----------------------------------

    def estimate_segment_poses(
        self, observed: np.ndarray
    ) -> Dict[int, Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """{body: (R (T,3,3), p (T,3), valid (T,))} for marker-rich bodies."""
        T = observed.shape[0]
        out = {}
        for b, rows in self.body_markers.items():
            local = self.offsets[rows]
            R = np.tile(np.eye(3), (T, 1, 1))
            p = np.zeros((T, 3))
            valid = np.zeros(T, dtype=bool)
            for t in range(T):
                obs = observed[t, rows]
                seen = ~np.isnan(obs[:, 0])
                if seen.sum() >= 3:
                    R[t], p[t] = _kabsch(local[seen], obs[seen])
                    valid[t] = True
            out[b] = (R, p, valid)
        return out

    # -- step 2: closed-form joint centers (SCoRE) --------------------------

    def estimate_joint_centers(
        self, observed: np.ndarray, segment_poses=None
    ) -> Dict[int, dict]:
        """{child_body: {"parent_local", "child_local", "world" (T,3),
        "rms"}} for joints with marker-rich parent AND child."""
        seg = segment_poses or self.estimate_segment_poses(observed)
        out = {}
        for bi, spec in enumerate(self.skel.joints):
            if spec.parent < 0 or bi not in seg or spec.parent not in seg:
                continue
            Rc, pc, vc = seg[bi]
            Rp, pp, vp = seg[spec.parent]
            frames = np.where(vc & vp)[0]
            if len(frames) < 5:
                continue
            # [R_p, -R_c] [c_p; c_c] = p_c - p_p  stacked over frames.
            A = np.zeros((3 * len(frames), 6))
            b = np.zeros(3 * len(frames))
            for k, t in enumerate(frames):
                A[3 * k : 3 * k + 3, :3] = Rp[t]
                A[3 * k : 3 * k + 3, 3:] = -Rc[t]
                b[3 * k : 3 * k + 3] = pc[t] - pp[t]
            x, *_ = np.linalg.lstsq(A, b, rcond=None)
            c_p, c_c = x[:3], x[3:]
            world = np.einsum("tij,j->ti", Rc[frames], c_c) + pc[frames]
            world_p = np.einsum("tij,j->ti", Rp[frames], c_p) + pp[frames]
            rms = float(
                np.sqrt(np.mean(np.sum((world - world_p) ** 2, axis=1)))
            )
            full_world = np.full((observed.shape[0], 3), np.nan)
            full_world[frames] = 0.5 * (world + world_p)
            out[bi] = {
                "parent_local": c_p,
                "child_local": c_c,
                "world": full_world,
                "rms": rms,
            }
        return out

    # -- step 3: pose recovery ----------------------------------------------

    def _fit_joint_q(self, spec, Q_est: np.ndarray) -> np.ndarray:
        """Invert Q(q) ~= Q_est for ANY joint type (free/ball/revolute/
        custom/...) via a few Gauss-Newton steps on the 12-entry transform
        residual. Closed-form seeds for free/ball/revolute; the GN handles
        the rest (incl. OpenSim CustomJoint spline-driven pelvis joints)."""
        import jax
        import jax.numpy as jnp

        from nimblephysics_tpu.dynamics import joints as JT

        nd = spec.num_dofs
        q0 = np.zeros(nd)
        tt = spec.joint_type
        # Cheap closed-form seeds where exact.
        if tt == JT.FREE:
            q0[:3] = _log_rot(Q_est[:3, :3])
            q0[3:6] = Q_est[:3, 3]
            return q0
        if tt == JT.BALL:
            return _log_rot(Q_est[:3, :3])
        if tt == JT.REVOLUTE:
            q0[0] = _log_rot(Q_est[:3, :3]) @ spec.axes[0]
            return q0
        if tt == JT.PRISMATIC:
            q0[0] = Q_est[:3, 3] @ spec.axes[0]
            return q0
        if id(spec) not in self._joint_fit_cache:

            def resid(q, target):
                Q = JT.joint_transform(spec, q)
                return (Q[:3, :] - target).reshape(-1)

            def gn(target):
                def body(q, _):
                    r = resid(q, target)
                    J = jax.jacfwd(lambda qq: resid(qq, target))(q)
                    JtJ = J.T @ J + 1e-8 * jnp.eye(nd)
                    return q - jnp.linalg.solve(JtJ, J.T @ r), None

                q, _ = jax.lax.scan(
                    body, jnp.zeros(nd, dtype=jnp.float64), None, length=8
                )
                return q

            self._joint_fit_cache[id(spec)] = jax.jit(gn)
        return np.asarray(
            self._joint_fit_cache[id(spec)](
                jnp.asarray(Q_est[:3, :], dtype=jnp.float64)
            )
        )

    def initialize(
        self, observed: np.ndarray, use_segment_poses: bool = True
    ) -> np.ndarray:
        """(T, M, 3) NaN-masked markers -> (T, nq) initial poses."""
        T = observed.shape[0]
        nq = self.skel.num_dofs
        poses = np.zeros((T, nq))
        seg = self.estimate_segment_poses(observed) if use_segment_poses else {}

        for t in range(T):
            # World transform per body where estimated (else via parent).
            for bi, spec in enumerate(self.skel.joints):
                if spec.num_dofs == 0:
                    continue
                s = spec.q_index
                have_child = bi in seg and seg[bi][2][t]
                have_parent = (
                    spec.parent < 0
                    or (spec.parent in seg and seg[spec.parent][2][t])
                )
                if not (have_child and have_parent):
                    continue
                Rc, pc, _ = seg[bi]
                T_child = np.eye(4)
                T_child[:3, :3] = Rc[t]
                T_child[:3, 3] = pc[t]
                if spec.parent < 0:
                    T_parent = np.eye(4)
                else:
                    Rp, pp, _ = seg[spec.parent]
                    T_parent = np.eye(4)
                    T_parent[:3, :3] = Rp[t]
                    T_parent[:3, 3] = pp[t]
                # Q_est = T_pj^-1 T_parent^-1 T_child T_cj.
                Q = (
                    np.linalg.inv(spec.T_pj)
                    @ np.linalg.inv(T_parent)
                    @ T_child
                    @ spec.T_cj
                )
                poses[t, s : s + spec.num_dofs] = self._fit_joint_q(spec, Q)

            # Root translation fallback: centroid alignment when the root
            # body itself has no Kabsch estimate this frame.
            root_est = 0 in seg and seg[0][2][t]
            if not root_est and self.root_dofs:
                obs = observed[t]
                seen = ~np.isnan(obs[:, 0])
                if seen.sum() >= 3:
                    from nimblephysics_tpu.biomechanics.scaled_fk import (
                        marker_world_positions,
                    )
                    import jax.numpy as jnp

                    model = np.asarray(
                        marker_world_positions(
                            self.skel,
                            jnp.zeros(nq),
                            self.bodies,
                            jnp.asarray(self.offsets),
                        )
                    )
                    delta = obs[seen].mean(axis=0) - model.mean(axis=0)
                    for k, d in enumerate(self.root_dofs[:3]):
                        poses[t, d] = delta[k]
        return poses


def _rot_about(axis: np.ndarray, angle: float) -> np.ndarray:
    K = np.array(
        [
            [0, -axis[2], axis[1]],
            [axis[2], 0, -axis[0]],
            [-axis[1], axis[0], 0],
        ]
    )
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * (K @ K)
