"""Constraint assembly: contacts + joint limits -> boxed LCP inputs.

TPU-native re-design of the reference constraint pipeline
(dart/constraint/ConstraintSolver.cpp:542-810 — update constraints from
collision, group, solve; dart/constraint/ContactConstraint.cpp —
normal + 2 friction rows with findex coupling and the ODE tangent basis
:735; dart/constraint/JointLimitConstraint.cpp). Instead of impulse-test
loops building A column-by-column (BoxedLcpConstraintSolver.cpp:190-328),
A = J M^-1 J^T is formed directly as batched dense matmuls — M^-1 is
explicit in this engine, so the O(rows) ABA impulse tests are unnecessary.

Island grouping (union-find ConstrainedGroups) is also unnecessary: the
full-world LCP block-solves all islands at once in fixed shape; decoupled
islands simply produce a block-diagonal A.

Row layout (static): 3 rows per contact slot [normal, tangent1, tangent2],
then 2 rows per position-limited dof [lower, upper]. Invalid rows (no
penetration / limit not hit) are masked to identity rows with b = 0, which
pins z = 0 and kills their gradients.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.collision.collider import Collider, Contacts
from nimblephysics_tpu.constraint.lcp import LcpMeta
from nimblephysics_tpu.math import lie
from nimblephysics_tpu.simulation.world import World


def tangent_basis(n: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ODE-style friction tangent basis for a unit normal.

    Reference parity: ContactConstraint::getTangentBasisMatrixODE
    (ContactConstraint.cpp:735): t1 = normalize(cross(first_dir, n)) with
    first friction direction = +z, falling back to +x when degenerate;
    t2 completes the right-handed frame (t1 rotated 90 deg about n).
    AD-safe at the degeneracy via masked selection.
    """
    dtype = n.dtype
    z = jnp.array([0.0, 0.0, 1.0], dtype=dtype)
    x = jnp.array([1.0, 0.0, 0.0], dtype=dtype)
    t_z = jnp.cross(z, n)
    t_x = jnp.cross(x, n)
    use_x = jnp.sum(t_z * t_z, axis=-1, keepdims=True) < 1e-12
    t_raw = jnp.where(use_x, t_x, t_z)
    norm2 = jnp.sum(t_raw * t_raw, axis=-1, keepdims=True)
    t1 = t_raw / jnp.sqrt(jnp.maximum(norm2, 1e-18))
    t2 = jnp.cross(n, t1)
    return t1, t2


@dataclasses.dataclass(frozen=True, eq=False)
class _LimitRow:
    dof: int  # world dof index
    sign: float  # +1: lower limit, -1: upper limit
    limit: float


class ConstraintAssembler:
    """Static row plan + LCP assembly for one World (jit-static)."""

    def __init__(self, world: World, collider: Collider):
        self.world = world
        self.collider = collider
        self.num_contacts = collider.num_contacts

        # Joint-limit rows (static plan over dofs with finite limits).
        self.limit_rows: List[_LimitRow] = []
        lo = world.position_lower_limits()
        hi = world.position_upper_limits()
        for d in range(world.num_dofs):
            if np.isfinite(lo[d]):
                self.limit_rows.append(_LimitRow(d, +1.0, float(lo[d])))
            if np.isfinite(hi[d]):
                self.limit_rows.append(_LimitRow(d, -1.0, float(hi[d])))

        # Motor rows (reference: ServoMotorConstraint /
        # MimicMotorConstraint / locked joints) — one force-limited
        # equality-seeking row per actuated dof.
        self.motor_rows: List[dict] = []
        for d in range(world.num_dofs):
            act = world.dof_actuator(d)
            if act["kind"] in ("servo", "mimic", "locked"):
                self.motor_rows.append(dict(dof=d, **act))

        # Dynamic joint constraint rows (weld = 6, ball = 3).
        self.dyn_rows = 0
        for con in world.dynamic_constraints:
            self.dyn_rows += 6 if con["kind"] == "weld" else 3

        C = self.num_contacts
        L = len(self.limit_rows)
        Mrows = len(self.motor_rows)
        n = 3 * C + L + Mrows + self.dyn_rows
        findex = np.full(n, -1, dtype=np.int32)
        is_friction = np.zeros(n, dtype=bool)
        for c in range(C):
            findex[3 * c + 1] = 3 * c
            findex[3 * c + 2] = 3 * c
            is_friction[3 * c + 1] = True
            is_friction[3 * c + 2] = True
        # Constant box bounds: contacts/limits [0, inf); motor rows
        # [-tau_max*dt, +tau_max*dt] (impulse bounds); dynamic-joint rows
        # are equalities (-inf, +inf).
        lo_const = np.zeros(n)
        hi_const = np.full(n, np.inf)
        dt = world.time_step
        base = 3 * C + L
        for i, mr in enumerate(self.motor_rows):
            lim = mr["force_limit"] * dt
            lo_const[base + i] = -lim
            hi_const[base + i] = lim
        lo_const[base + Mrows :] = -np.inf
        has_boxes = Mrows > 0 or self.dyn_rows > 0
        self.meta = LcpMeta(
            findex=findex,
            is_friction=is_friction,
            lo_const=lo_const if has_boxes else None,
            hi_const=hi_const if has_boxes else None,
            iterations=world.solver.lcp_iterations,
            solver=world.solver.lcp_solver,
            refine_rounds=world.solver.lcp_refine_rounds,
            seed_pgs_sweeps=world.solver.lcp_seed_pgs_sweeps,
            # Clamping count is bounded by the impulse-space rank (~nv);
            # gather the pinned solve to this static size (TPU speed).
            k_active=min(n, max(16, 2 * world.num_dofs + 8)),
        )

    @property
    def num_rows(self) -> int:
        return (
            3 * self.num_contacts
            + len(self.limit_rows)
            + len(self.motor_rows)
            + self.dyn_rows
        )

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other

    # -----------------------------------------------------------------

    def contact_jacobian(
        self, contacts: Contacts, J_world: jnp.ndarray
    ) -> jnp.ndarray:
        """Stacked constraint Jacobian for the contact rows, (3C, nv).

        Row r of J gives the rate of the constraint gap: for the normal
        row, n . (v_pA - v_pB) (positive = separating). Friction rows use
        the tangent basis. Built from world-frame body Jacobians via point
        Jacobians (reference analog: the mSpatialNormalA/B body-frame
        Jacobian columns in ContactConstraint::update).
        """
        C = self.num_contacts
        if C == 0:
            return jnp.zeros((0, J_world.shape[-1]), dtype=J_world.dtype)
        p = contacts.point  # (C, 3)
        n = contacts.normal
        t1, t2 = tangent_basis(n)
        Ja = J_world[contacts.body_a]  # (C, 6, nv)
        Jb = J_world[contacts.body_b]

        def point_jac(Jw, pt):
            # rows: linear block - [p]x angular block
            return Jw[3:] - lie.skew(pt) @ Jw[:3]

        Jp_a = jax.vmap(point_jac)(Ja, p)  # (C, 3, nv)
        Jp_b = jax.vmap(point_jac)(Jb, p)
        Jrel = Jp_a - Jp_b  # (C, 3, nv)
        dirs = jnp.stack([n, t1, t2], axis=1)  # (C, 3, 3)
        Jc = jnp.einsum("cdk,ckv->cdv", dirs, Jrel)  # (C, 3, nv)
        return Jc.reshape(3 * C, -1)

    def assemble(
        self,
        q: jnp.ndarray,
        v_pre: jnp.ndarray,
        contacts: Contacts,
        J_world: jnp.ndarray,
        T_wb: Optional[jnp.ndarray] = None,
        control: Optional[jnp.ndarray] = None,
    ):
        """Build masked (J_masked, b, mu_rows, valid) for the boxed LCP.

        The Delassus operator A = J M^-1 J^T is NEVER materialized: the
        solver consumes the factored form F = J L^-T built by the engine
        (see constraint/lcp.py — rank(A) <= nv, and the n x n matrix was
        pure HBM waste). Invalid rows are zeroed (degenerate diagonal ->
        NOT_CLAMPING -> pinned to z = 0).

        b follows the reference convention b = -(J v) + bounce
        (ContactConstraint::getInformation/getRelVelocity): restitution
        bounce = e * approach speed when above the bouncing threshold
        (capped), optional penetration-correction velocity otherwise.
        """
        w = self.world
        cfg = w.solver
        dt = w.time_step
        nv = w.num_dofs
        dtype = q.dtype
        C = self.num_contacts
        L = len(self.limit_rows)
        n = 3 * C + L

        rows = []
        valids = []
        b_parts = []
        mu_parts = []

        if C > 0:
            Jc = self.contact_jacobian(contacts, J_world)  # (3C, nv)
            # Contacts beyond the clipping depth are treated as impossible
            # penetrations and skipped (reference: ConstraintSolver.cpp:600,
            # World contact-clipping knob, World.hpp:665-673).
            valid_c = (contacts.depth > 0.0) & (
                contacts.depth <= cfg.contact_clipping_depth
            )
            # per-row validity: repeat per 3 rows
            valid_rows_c = jnp.repeat(valid_c, 3)
            relv = Jc @ v_pre  # (3C,)
            b0 = -relv
            # normal-row bounce
            b_n = b0[0::3]
            rest = contacts.restitution
            rest_vel = jnp.where(
                rest > cfg.restitution_threshold, b_n * rest, 0.0
            )
            bounce_rest = jnp.where(
                rest_vel > cfg.bouncing_velocity_threshold,
                jnp.minimum(rest_vel, cfg.max_bouncing_velocity),
                0.0,
            )
            if cfg.penetration_correction_enabled:
                pen = jnp.clip(
                    (contacts.depth - cfg.error_allowance)
                    * cfg.error_reduction_parameter
                    / dt,
                    0.0,
                    cfg.max_error_reduction_velocity,
                )
                bounce = jnp.where(bounce_rest > 0.0, bounce_rest, pen)
            else:
                bounce = bounce_rest
            b_c = b0.at[0::3].add(bounce)
            mu_c = jnp.zeros(3 * C, dtype=dtype)
            mu_eff = jnp.where(
                contacts.friction > cfg.friction_threshold,
                contacts.friction,
                0.0,
            )
            mu_c = mu_c.at[1::3].set(mu_eff)
            mu_c = mu_c.at[2::3].set(mu_eff)
            rows.append(Jc)
            valids.append(valid_rows_c)
            b_parts.append(b_c)
            mu_parts.append(mu_c)

        if L > 0:
            Jl = np.zeros((L, nv))
            limits = np.zeros(L)
            signs = np.zeros(L)
            for i, r in enumerate(self.limit_rows):
                Jl[i, r.dof] = r.sign
                limits[i] = r.limit
                signs[i] = r.sign
            Jl = jnp.asarray(Jl, dtype=dtype)
            limits_j = jnp.asarray(limits, dtype=dtype)
            signs_j = jnp.asarray(signs, dtype=dtype)
            dofs = np.array([r.dof for r in self.limit_rows])
            # violation depth (>0 when beyond the limit)
            depth_l = signs_j * (limits_j - q[dofs])
            valid_l = depth_l > -cfg.joint_limit_margin
            b_l = -(Jl @ v_pre) + jnp.clip(
                depth_l * cfg.error_reduction_parameter / dt,
                0.0,
                cfg.joint_max_error_reduction_velocity,
            )
            rows.append(Jl)
            valids.append(valid_l)
            b_parts.append(b_l)
            mu_parts.append(jnp.zeros(L, dtype=dtype))

        # Motor rows (servo: drive v toward the commanded velocity within
        # force limits; mimic: track multiplier * v_other; locked: v = 0).
        if self.motor_rows:
            Mr = len(self.motor_rows)
            Jm_ = np.zeros((Mr, nv))
            for i, mr in enumerate(self.motor_rows):
                Jm_[i, mr["dof"]] = 1.0
                if mr["kind"] == "mimic" and mr["mimic_dof"] is not None:
                    Jm_[i, mr["mimic_dof"]] = -mr["mimic_multiplier"]
            Jm_j = jnp.asarray(Jm_, dtype=dtype)
            targets = []
            for mr in self.motor_rows:
                if mr["kind"] == "servo" and control is not None:
                    targets.append(control[mr["dof"]])
                else:
                    targets.append(jnp.asarray(0.0, dtype=dtype))
            b_m = jnp.stack(targets) - Jm_j @ v_pre
            rows.append(Jm_j)
            valids.append(jnp.ones(Mr, dtype=bool))
            b_parts.append(b_m)
            mu_parts.append(jnp.zeros(Mr, dtype=dtype))

        # Dynamic joint constraints (weld = 6 spatial rows, ball = 3 point
        # rows) with ERP position stabilization.
        if self.dyn_rows and T_wb is not None:
            from nimblephysics_tpu.math import lie

            gamma = cfg.error_reduction_parameter / dt
            cap = cfg.joint_max_error_reduction_velocity
            for con in self.world.dynamic_constraints:
                A_, B_ = con["body_a"], con["body_b"]
                if con["kind"] == "ball":
                    pA = lie.transform_point(
                        T_wb[A_], jnp.asarray(con["offset_a"], dtype=dtype)
                    )
                    pB = lie.transform_point(
                        T_wb[B_], jnp.asarray(con["offset_b"], dtype=dtype)
                    )

                    def pjac(Jw, pt):
                        return Jw[3:] - lie.skew(pt) @ Jw[:3]

                    Jrow = pjac(J_world[A_], pA) - pjac(J_world[B_], pB)
                    err = pA - pB
                    b_row = -(Jrow @ v_pre) - jnp.clip(
                        gamma * err, -cap, cap
                    )
                    rows.append(Jrow)
                    valids.append(jnp.ones(3, dtype=bool))
                    b_parts.append(b_row)
                    mu_parts.append(jnp.zeros(3, dtype=dtype))
                else:
                    # weld: 3 orientation rows + 3 anchor-point rows with
                    # ERP pose-error feedback (WeldJointConstraint.cpp —
                    # the violation is the log of the relative-transform
                    # error captured at creation).
                    RA = T_wb[A_][:3, :3]
                    RB = T_wb[B_][:3, :3]
                    rel = jnp.asarray(con["rel_rot"], dtype=dtype)
                    err_rot = lie.log_map_rot(RA @ rel @ RB.T)
                    J_rot = J_world[A_][:3] - J_world[B_][:3]
                    b_rot = -(J_rot @ v_pre) - jnp.clip(
                        gamma * err_rot, -cap, cap
                    )
                    pA = lie.transform_point(
                        T_wb[A_], jnp.asarray(con["offset_a"], dtype=dtype)
                    )
                    pB = lie.transform_point(
                        T_wb[B_], jnp.asarray(con["offset_b"], dtype=dtype)
                    )

                    def pjac_w(Jw, pt):
                        return Jw[3:] - lie.skew(pt) @ Jw[:3]

                    Jp = pjac_w(J_world[A_], pA) - pjac_w(J_world[B_], pB)
                    err_p = pA - pB
                    b_p = -(Jp @ v_pre) - jnp.clip(gamma * err_p, -cap, cap)
                    rows.append(jnp.concatenate([J_rot, Jp], axis=0))
                    valids.append(jnp.ones(6, dtype=bool))
                    b_parts.append(jnp.concatenate([b_rot, b_p]))
                    mu_parts.append(jnp.zeros(6, dtype=dtype))

        J = jnp.concatenate(rows, axis=0)
        valid = jnp.concatenate(valids)
        b = jnp.concatenate(b_parts)
        mu = jnp.concatenate(mu_parts)

        # Mask invalid rows out of J (zero rows -> degenerate diagonal ->
        # NOT_CLAMPING -> z pinned to 0), and zero their b/mu.
        Jm = jnp.where(valid[:, None], J, 0.0)
        vf = valid.astype(dtype)
        b = b * vf
        mu = mu * vf
        return Jm, b, mu, valid
