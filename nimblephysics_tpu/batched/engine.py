"""BatchedEngine: the batch-minor differentiable timestep.

Same step semantics as neural/timestep.Engine (the reference World::step
re-design, World.cpp:221 — smooth dynamics, collision at pre-step q, boxed
LCP on pre-constraint velocities, impulse velocity update, parallel
position integration from the pre-step velocity) but laid out for TPU
throughput: ALL arrays carry the world batch in the trailing lane axis,
every small-matrix op is a (B,)-wide VPU instruction (batched/linalg.py),
and the whole step is one fused XLA computation with no lane-padding waste.

Inputs/outputs: q, v, control are (nv, B); impulses are (n_rows, B).
Differentiable exactly like the reference path (the LCP carries the
active-set implicit derivative — batched/lcp.py).
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.batched import linalg as bl
from nimblephysics_tpu.batched.articulated import (
    FlatWorld,
    bias_forces,
    fk,
    integrate_positions,
    mass_matrix_blocks,
)
from nimblephysics_tpu.batched.collision import BatchedCollider
from nimblephysics_tpu.batched.lcp import boxed_lcp_b
from nimblephysics_tpu.collision.collider import Collider
from nimblephysics_tpu.constraint.assembly import ConstraintAssembler
from nimblephysics_tpu.simulation.world import World


class BatchedStepResult(NamedTuple):
    q: jnp.ndarray  # (nv, B)
    v: jnp.ndarray  # (nv, B)
    v_pre: jnp.ndarray  # (nv, B)
    impulses: jnp.ndarray  # (n_rows, B)
    contact_points: jnp.ndarray  # (C, 3, B)
    contact_normals: jnp.ndarray  # (C, 3, B)
    contact_depths: jnp.ndarray  # (C, B)
    # Per-world LCP primary-solve validity (B,) bool, only populated when
    # step(collect_valid=True) — the deferred-ladder hook (see
    # batched/rollout.py). None otherwise (pytree-empty).
    lcp_valid: Optional[jnp.ndarray] = None


def _tangent_basis_b(n):
    """ODE tangent basis, batched (parity: assembly.tangent_basis).

    n: (3, K) unit normals -> (t1, t2) each (3, K).
    """
    dtype = n.dtype
    z = jnp.asarray([0.0, 0.0, 1.0], dtype=dtype)[:, None]
    x = jnp.asarray([1.0, 0.0, 0.0], dtype=dtype)[:, None]
    t_z = bl.cross(jnp.broadcast_to(z, n.shape), n)
    t_x = bl.cross(jnp.broadcast_to(x, n.shape), n)
    use_x = jnp.sum(t_z * t_z, axis=0, keepdims=True) < 1e-12
    t_raw = jnp.where(use_x, t_x, t_z)
    norm2 = jnp.sum(t_raw * t_raw, axis=0, keepdims=True)
    t1 = t_raw / jnp.sqrt(jnp.maximum(norm2, 1e-18))
    t2 = bl.cross(n, t1)
    return t1, t2


class BatchedEngine:
    """Static batch-minor step plan for one World (jit-static identity)."""

    def __init__(self, world: World):
        self.world = world
        self.fw = FlatWorld(world)
        self.collider = Collider(world)
        self.bcollider = BatchedCollider(self.collider)
        # Reuse the single-world assembler's STATIC row plan (limit rows,
        # motor rows, findex/meta layout) — single source of truth.
        self.assembler = ConstraintAssembler(world, self.collider)
        self.meta = self.assembler.meta
        nv = world.num_dofs
        self.damping = (
            np.concatenate([s.damping_coeffs() for s in world.skeletons])
            if world.skeletons
            else np.zeros(nv)
        )
        self.stiffness = (
            np.concatenate([s.spring_stiffnesses() for s in world.skeletons])
            if world.skeletons
            else np.zeros(nv)
        )
        self.rest_pos = (
            np.concatenate([s.rest_positions() for s in world.skeletons])
            if world.skeletons
            else np.zeros(nv)
        )
        self.force_mask = np.ones(nv)
        for d, act in world.actuator_types.items():
            if act["kind"] != "force":
                self.force_mask[d] = 0.0
        # M is block-diagonal across skeletons: factor/solve per block
        # (20-box stack = twenty 6x6 Choleskys, not one 120x120 dense).
        self.skel_slices = world.dof_slices()
        # Plan-time constraint islands (None = one island / disabled).
        self.islands = (
            self._build_islands() if world.solver.contact_islands else None
        )
        # Fixed-capacity active-contact selection (SolverConfig.contact_cap):
        # per lane, solve the LCP on only the `cap` deepest contact slots.
        # The static-shape analog of runtime broadphase culling — see
        # _build_cap_meta. Applied on the monolithic path only (an
        # island-partitioned world is already small per island).
        cap = world.solver.contact_cap
        self.contact_cap = None
        if (
            cap is not None
            and self.islands is None
            and self.bcollider.num_contacts > cap
        ):
            self.contact_cap = int(cap)
            self.meta_cap = self._build_cap_meta(int(cap))

    def _build_cap_meta(self, cap: int):
        """LcpMeta for the top-`cap`-contacts selected row set.

        Selected rows are [3*cap contact rows][all non-contact rows]: every
        contact slot shares the same per-row plan ([normal, friction,
        friction] with findex -> its normal, bounds [0, inf)), so a
        per-lane gather of WHICH slots occupy the positions leaves the
        row plan static. Non-contact rows (limits/motors/dynamic joints)
        are never culled. Reference analog: the per-step constraint list
        the reference builds from broadphase-surviving pairs
        (ConstraintSolver.cpp:542-640) — here the survivor set is chosen
        by top-k penetration depth at fixed compile-time capacity.
        """
        import dataclasses as _dc

        meta = self.meta
        C3 = 3 * self.bcollider.num_contacts
        n_extra = meta.n - C3
        n_sel = 3 * cap + n_extra
        findex = np.full(n_sel, -1, dtype=np.int32)
        is_friction = np.zeros(n_sel, dtype=bool)
        for c in range(cap):
            findex[3 * c + 1] = 3 * c
            findex[3 * c + 2] = 3 * c
            is_friction[3 * c + 1] = True
            is_friction[3 * c + 2] = True
        if meta.lo_const is None:
            lo = hi = None
        else:
            lo = np.zeros(n_sel)
            hi = np.full(n_sel, np.inf)
            lo[3 * cap :] = meta.lo_const[C3:]
            hi[3 * cap :] = meta.hi_const[C3:]
        return _dc.replace(
            meta,
            findex=findex,
            is_friction=is_friction,
            lo_const=lo,
            hi_const=hi,
            k_active=min(
                n_sel, max(16, 2 * self.world.num_dofs + 8)
            ),
        )

    def _build_islands(self):
        """Partition LCP rows into static constraint islands.

        Connected components over dynamic skeletons, where an edge is any
        POTENTIAL constraint row (collision-pair slot, dynamic joint
        constraint, mimic motor) touching two of them; static (0-dof)
        skeletons never merge components. The TPU-static analog of the
        reference's per-step union-find island grouping
        (ConstraintSolver.cpp:723-793): shapes must be compile-time
        constants, so the partition is over the potential pair graph (a
        superset of any runtime contact set — never wrong, just coarser).
        Returns a list of (rows, dofs, meta) with >= 2 entries, or None
        when the world is a single island (the monolithic path is
        identical then).
        """
        from nimblephysics_tpu.constraint.lcp import subset_meta

        w = self.world
        slices = self.skel_slices
        nv = w.num_dofs
        skel_of_dof = np.full(nv, -1, dtype=np.int64)
        for si, (s, e) in enumerate(slices):
            skel_of_dof[s:e] = si

        anc = self.fw.anc

        def skel_of_body(b):
            nz = np.nonzero(anc[int(b)])[0]
            return int(skel_of_dof[nz[0]]) if nz.size else -1

        # Per-row dynamic-skeleton touch sets, in assembler row order:
        # [3C contact rows][limit rows][motor rows][dynamic-joint rows].
        row_skels: List[set] = []
        C = self.bcollider.num_contacts
        for c in range(C):
            ss = {
                skel_of_body(self.bcollider.body_a[c]),
                skel_of_body(self.bcollider.body_b[c]),
            } - {-1}
            row_skels += [ss, ss, ss]
        for r in self.assembler.limit_rows:
            row_skels.append({int(skel_of_dof[r.dof])} - {-1})
        for mr in self.assembler.motor_rows:
            ss = {int(skel_of_dof[mr["dof"]])}
            if mr.get("mimic_dof") is not None:
                ss.add(int(skel_of_dof[mr["mimic_dof"]]))
            row_skels.append(ss - {-1})
        for con in w.dynamic_constraints:
            ss = {
                skel_of_body(con["body_a"]),
                skel_of_body(con["body_b"]),
            } - {-1}
            row_skels += [ss] * (6 if con["kind"] == "weld" else 3)
        assert len(row_skels) == self.num_rows

        parent = list(range(len(slices)))

        def find(a):
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        for ss in row_skels:
            it = iter(ss)
            first = next(it, None)
            for other in it:
                parent[find(other)] = find(first)

        comp_rows: dict = {}
        for i, ss in enumerate(row_skels):
            key = find(next(iter(ss))) if ss else None
            comp_rows.setdefault(key, []).append(i)
        # Degenerate rows (no dynamic skeleton => identically-zero
        # Jacobian) ride along in the first real island; the LCP marks
        # them degenerate and returns zero impulse.
        dead = comp_rows.pop(None, [])
        if len(comp_rows) < 2:
            return None
        keys = sorted(comp_rows, key=lambda k: comp_rows[k][0])
        comp_rows[keys[0]] += dead
        islands = []
        for k in keys:
            rows = np.asarray(sorted(comp_rows[k]), dtype=np.int64)
            dofs = np.concatenate(
                [
                    np.arange(s, e)
                    for si, (s, e) in enumerate(slices)
                    if find(si) == k and e > s
                ]
            )
            islands.append(
                (rows, dofs, subset_meta(self.meta, rows, len(dofs)))
            )
        return islands

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other

    @property
    def num_rows(self) -> int:
        return self.assembler.num_rows

    def action_to_forces(self, action):
        """(na, B) action -> (nv, B) generalized forces (static scatter)."""
        nv = self.world.num_dofs
        out = jnp.zeros((nv,) + action.shape[1:], dtype=action.dtype)
        return out.at[np.asarray(self.world.action_indices)].set(action)

    # ------------------------------------------------------------------

    def _contact_block(self, v_pre, cpoint, cnormal, cdepth, W):
        """Contact rows: (3C, nv, B), valid/b/mu (3C, B)."""
        w = self.world
        cfg = w.solver
        dt = w.time_step
        dtype = v_pre.dtype
        B = v_pre.shape[-1]
        C = self.bcollider.num_contacts
        anc = self.fw.anc
        nv = w.num_dofs

        # Tangent basis for all contacts in one fused (3, C*B) op.
        n_flat = jnp.moveaxis(cnormal, 0, 1).reshape(3, C * B)
        t1f, t2f = _tangent_basis_b(n_flat)
        t1 = jnp.moveaxis(t1f.reshape(3, C, B), 1, 0)  # (C, 3, B)
        t2 = jnp.moveaxis(t2f.reshape(3, C, B), 1, 0)

        crow: List = []
        for c in range(C):
            ba = int(self.bcollider.body_a[c])
            bb = int(self.bcollider.body_b[c])
            dmask = anc[ba] - anc[bb]
            if not np.any(dmask):
                zero = jnp.zeros((nv, B), dtype=dtype)
                crow += [zero, zero, zero]
                continue
            Wab = W * jnp.asarray(dmask, dtype=dtype)[None, :, None]
            p = cpoint[c]
            for d in (cnormal[c], t1[c], t2[c]):
                # Constraint-row spatial vector about the world origin:
                # row . dq = d . v_point = [p x d; d] . (world twist).
                g = jnp.concatenate([bl.cross(p, d), d])  # (6, B)
                crow.append(jnp.sum(Wab * g[:, None, :], axis=0))
        Jc = jnp.stack(crow)  # (3C, nv, B)

        valid_c = (cdepth > 0.0) & (cdepth <= cfg.contact_clipping_depth)
        relv = jnp.sum(Jc * v_pre[None, :, :], axis=1)  # (3C, B)
        b0 = -relv
        b_n = b0[0::3]
        rest = jnp.asarray(self.bcollider.restitution, dtype=dtype)[:, None]
        rest_vel = jnp.where(rest > cfg.restitution_threshold, b_n * rest, 0.0)
        bounce_rest = jnp.where(
            rest_vel > cfg.bouncing_velocity_threshold,
            jnp.minimum(rest_vel, cfg.max_bouncing_velocity),
            0.0,
        )
        if cfg.penetration_correction_enabled:
            pen = jnp.clip(
                (cdepth - cfg.error_allowance)
                * cfg.error_reduction_parameter
                / dt,
                0.0,
                cfg.max_error_reduction_velocity,
            )
            bounce = jnp.where(bounce_rest > 0.0, bounce_rest, pen)
        else:
            bounce = bounce_rest
        b_c = b0.at[0::3].add(bounce)
        mu_static = jnp.asarray(self.bcollider.mu, dtype=dtype)[:, None]
        mu_eff = jnp.broadcast_to(
            jnp.where(mu_static > cfg.friction_threshold, mu_static, 0.0),
            (C, B),
        )
        mu_c = jnp.stack(
            [jnp.zeros((C, B), dtype=dtype), mu_eff, mu_eff], axis=1
        ).reshape(3 * C, B)
        valid_rows = jnp.repeat(valid_c, 3, axis=0)
        return Jc, valid_rows, b_c, mu_c

    def _assemble(self, q, v_pre, cpoint, cnormal, cdepth, W, R_wb, p_wb,
                  control):
        """Batch-minor port of ConstraintAssembler.assemble: returns
        (J (n, nv, B), b (n, B), mu (n, B), valid (n, B))."""
        w = self.world
        cfg = w.solver
        dt = w.time_step
        nv = w.num_dofs
        dtype = q.dtype
        B = q.shape[-1]
        C = self.bcollider.num_contacts
        anc = self.fw.anc

        blocks: List[Tuple] = []
        if C > 0:
            blocks.append(
                self._contact_block(v_pre, cpoint, cnormal, cdepth, W)
            )

        L = len(self.assembler.limit_rows)
        if L > 0:
            dofs = np.array([r.dof for r in self.assembler.limit_rows])
            signs = np.array([r.sign for r in self.assembler.limit_rows])
            limits = np.array([r.limit for r in self.assembler.limit_rows])
            Jl = np.zeros((L, nv))
            Jl[np.arange(L), dofs] = signs
            Jl_b = jnp.broadcast_to(
                jnp.asarray(Jl, dtype=dtype)[:, :, None], (L, nv, B)
            )
            signs_j = jnp.asarray(signs, dtype=dtype)[:, None]
            limits_j = jnp.asarray(limits, dtype=dtype)[:, None]
            depth_l = signs_j * (limits_j - q[dofs])
            valid_l = depth_l > -cfg.joint_limit_margin
            b_l = -(signs_j * v_pre[dofs]) + jnp.clip(
                depth_l * cfg.error_reduction_parameter / dt,
                0.0,
                cfg.joint_max_error_reduction_velocity,
            )
            blocks.append(
                (Jl_b, valid_l, b_l, jnp.zeros((L, B), dtype=dtype))
            )

        if self.assembler.motor_rows:
            Mr = len(self.assembler.motor_rows)
            Jm = np.zeros((Mr, nv))
            for i, mr in enumerate(self.assembler.motor_rows):
                Jm[i, mr["dof"]] = 1.0
                if mr["kind"] == "mimic" and mr["mimic_dof"] is not None:
                    Jm[i, mr["mimic_dof"]] = -mr["mimic_multiplier"]
            Jm_j = jnp.asarray(Jm, dtype=dtype)
            Jm_b = jnp.broadcast_to(Jm_j[:, :, None], (Mr, nv, B))
            relv_m = jnp.sum(Jm_j[:, :, None] * v_pre[None, :, :], axis=1)
            targets = []
            for mr in self.assembler.motor_rows:
                if mr["kind"] == "servo":
                    targets.append(control[mr["dof"]])
                else:
                    targets.append(jnp.zeros((B,), dtype=dtype))
            b_m = jnp.stack(targets) - relv_m
            blocks.append(
                (
                    Jm_b,
                    jnp.ones((Mr, B), dtype=bool),
                    b_m,
                    jnp.zeros((Mr, B), dtype=dtype),
                )
            )

        if self.assembler.dyn_rows:
            gamma = cfg.error_reduction_parameter / dt
            cap = cfg.joint_max_error_reduction_velocity
            for con in self.world.dynamic_constraints:
                A_, B_b = con["body_a"], con["body_b"]
                if con["kind"] == "ball":
                    pA = bl.mv(
                        R_wb[A_], bl.const(con["offset_a"], dtype)
                    ) + p_wb[A_]
                    pB = bl.mv(
                        R_wb[B_b], bl.const(con["offset_b"], dtype)
                    ) + p_wb[B_b]
                    WA = W * jnp.asarray(anc[A_], dtype=dtype)[None, :, None]
                    WB = W * jnp.asarray(anc[B_b], dtype=dtype)[None, :, None]
                    Jrow = (WA[3:] - bl.cross_cols(pA, WA[:3])) - (
                        WB[3:] - bl.cross_cols(pB, WB[:3])
                    )  # (3, nv, B)
                    err = pA - pB
                    b_row = -jnp.sum(
                        Jrow * v_pre[None, :, :], axis=1
                    ) - jnp.clip(gamma * err, -cap, cap)
                    blocks.append(
                        (
                            Jrow,
                            jnp.ones((3, B), dtype=bool),
                            b_row,
                            jnp.zeros((3, B), dtype=dtype),
                        )
                    )
                else:
                    # weld: 3 orientation + 3 anchor-point rows with ERP
                    # pose-error feedback (WeldJointConstraint.cpp — the
                    # violation is log of the relative-transform error
                    # captured at creation). Parity with the single-world
                    # assembler (constraint/assembly.py weld branch).
                    dmask = jnp.asarray(
                        anc[A_] - anc[B_b], dtype=dtype
                    )[None, :, None]
                    Wab = W * dmask
                    J_rot = Wab[:3]  # (3, nv, B)
                    rel_b = jnp.broadcast_to(
                        bl.const(con["rel_rot"], dtype), (3, 3, B)
                    )
                    R_e = bl.mm(
                        bl.mm(R_wb[A_], rel_b), bl.transpose(R_wb[B_b])
                    )
                    err_rot = bl.log_so3(R_e)  # (3, B)
                    b_rot = -jnp.sum(
                        J_rot * v_pre[None, :, :], axis=1
                    ) - jnp.clip(gamma * err_rot, -cap, cap)
                    pA = bl.mv(
                        R_wb[A_], bl.const(con["offset_a"], dtype)
                    ) + p_wb[A_]
                    pB = bl.mv(
                        R_wb[B_b], bl.const(con["offset_b"], dtype)
                    ) + p_wb[B_b]
                    WA = W * jnp.asarray(anc[A_], dtype=dtype)[None, :, None]
                    WB = W * jnp.asarray(anc[B_b], dtype=dtype)[None, :, None]
                    Jp = (WA[3:] - bl.cross_cols(pA, WA[:3])) - (
                        WB[3:] - bl.cross_cols(pB, WB[:3])
                    )
                    err_p = pA - pB
                    b_p = -jnp.sum(
                        Jp * v_pre[None, :, :], axis=1
                    ) - jnp.clip(gamma * err_p, -cap, cap)
                    blocks.append(
                        (
                            jnp.concatenate([J_rot, Jp], axis=0),
                            jnp.ones((6, B), dtype=bool),
                            jnp.concatenate([b_rot, b_p], axis=0),
                            jnp.zeros((6, B), dtype=dtype),
                        )
                    )

        J = jnp.concatenate([blk[0] for blk in blocks], axis=0)
        valid = jnp.concatenate([blk[1] for blk in blocks], axis=0)
        b = jnp.concatenate([blk[2] for blk in blocks], axis=0)
        mu = jnp.concatenate([blk[3] for blk in blocks], axis=0)
        vf = valid.astype(dtype)
        return J * vf[:, None, :], b * vf, mu * vf, valid

    # ------------------------------------------------------------------

    def _prepare_body_params(self, body_params, dtype, B):
        """Normalize a body-parameter pytree to lane-major form.

        body_params: {"masses" (NB,)/(NB,B), "coms" (NB,3)/(NB,3,B),
        "inertias" (NB,3,3)/(NB,3,3,B), "scales" (NB,3)/(NB,3,B)} — the
        reference's WithRespectToMass / GROUP_COMS / GROUP_INERTIAS /
        GROUP_SCALES variables (WithRespectTo.hpp:62-75), batched per
        world. Returns (scales (NB,3,B)|None, G_list per-body (6,6,B)).
        Semantics mirror dynamics.skeleton._spatial_inertias exactly.
        """
        if body_params is None:
            return None, None

        def norm(x, base_ndim):
            x = jnp.asarray(x, dtype=dtype)
            return x[..., None] if x.ndim == base_ndim else x

        masses = body_params.get("masses")
        coms = body_params.get("coms")
        inertias = body_params.get("inertias")
        scales = body_params.get("scales")
        if masses is not None:
            masses = norm(masses, 1)
        if coms is not None:
            coms = norm(coms, 2)
        if inertias is not None:
            inertias = norm(inertias, 3)
        if scales is not None:
            scales = norm(scales, 2)

        G_list = []
        for i, bspec in enumerate(self.fw.body_specs):
            m = (
                masses[i]
                if masses is not None
                else bl.const(np.asarray(bspec.mass), dtype)[None]
            )  # (B,) or (1,)
            c = (
                coms[i]
                if coms is not None
                else bl.const(np.asarray(bspec.com), dtype)
            )  # (3, B) or (3, 1)
            if inertias is not None:
                I = inertias[i]
            elif masses is not None:
                # Inertia scales linearly in mass for fixed geometry
                # (parity: dynamics.skeleton._spatial_inertias).
                I = bl.const(np.asarray(bspec.inertia), dtype) * (
                    m / float(bspec.mass)
                )[None, None, :]
            else:
                I = bl.const(np.asarray(bspec.inertia), dtype)
            if scales is not None:
                s = scales[i]  # (3, B) or (3, 1)
                c = c * s
                I = I * (s[:, None, :] * s[None, :, :])
            # Broadcast to full lane width, then assemble the spatial
            # inertia [[I + m cx cx^T, m cx], [m cx^T, m I3]].
            m = jnp.broadcast_to(m, (B,))
            c = jnp.broadcast_to(c, (3, B))
            I = jnp.broadcast_to(I, (3, 3, B))
            cx = bl.skew(c)
            mb = m[None, None, :]
            top = jnp.concatenate(
                [I + mb * bl.mm(cx, bl.transpose(cx)), mb * cx], axis=1
            )
            bot = jnp.concatenate(
                [mb * bl.transpose(cx), mb * bl.eye(3, dtype, B=B)],
                axis=1,
            )
            G_list.append(jnp.concatenate([top, bot], axis=0))
        return scales, G_list

    def step(
        self,
        q: jnp.ndarray,
        v: jnp.ndarray,
        control: jnp.ndarray,
        z_warm: Optional[jnp.ndarray] = None,
        body_params: Optional[dict] = None,
        fallback_cfm: Optional[float] = None,
        fallback_gradients=None,
        collect_valid: bool = False,
        ladder_mode: Optional[str] = None,
    ) -> BatchedStepResult:
        """One batch-minor physics step; pure and differentiable in
        (q, v, control) and, when given, in `body_params` (masses / coms /
        inertias / scales — lane-major mass/COM/inertia/scale gradients).

        fallback_cfm / fallback_gradients / ladder_mode override the
        World's SolverConfig for this call (the deferred-ladder scan in
        batched/rollout.py runs the hot scan with the ladder OFF and a
        rare rerun with it armed; ladder_mode="always" runs the rungs
        cond-free with per-world selection — see batched/lcp.boxed_lcp_b);
        collect_valid=True populates result.lcp_valid with the per-world
        primary LCP validity."""
        w = self.world
        dt = w.time_step
        dtype = q.dtype
        B = q.shape[-1]
        nv = w.num_dofs
        nrows = self.num_rows

        scales_b, G_list = self._prepare_body_params(body_params, dtype, B)
        R_wb, p_wb, W, S_list, rels = fk(self.fw, q, scales=scales_b)
        bias = bias_forces(
            self.fw, q, v, rels, S_list, w.gravity, G_list=G_list,
            scales=scales_b,
        )
        Ms = mass_matrix_blocks(self.fw, R_wb, p_wb, W, G_list=G_list)
        Ls = bl.block_cholesky(Ms)
        sl = self.skel_slices

        passive = (
            -jnp.asarray(self.damping, dtype=dtype)[:, None] * v
            - jnp.asarray(self.stiffness, dtype=dtype)[:, None]
            * (q - jnp.asarray(self.rest_pos, dtype=dtype)[:, None])
        )
        tau = (
            control * jnp.asarray(self.force_mask, dtype=dtype)[:, None]
            + passive
        )
        v_pre = v + dt * bl.block_solve_tri_upper_t_vec(
            Ls, sl, bl.block_solve_tri_lower_vec(Ls, sl, tau - bias)
        )

        lcp_valid = None
        if nrows > 0:
            cpoint, cnormal, cdepth = self.bcollider.collide(R_wb, p_wb, B)
            Jrows, b, mu, valid = self._assemble(
                q, v_pre, cpoint, cnormal, cdepth, W, R_wb, p_wb, control
            )
            # F = J L^-T  <=>  F^T = L^-1 J^T: (nv, nrows, B).
            Ft = bl.block_solve_tri_lower(Ls, sl, jnp.swapaxes(Jrows, 0, 1))
            F = jnp.swapaxes(Ft, 0, 1)  # (nrows, nv, B)
            if z_warm is None:
                z_warm = jnp.zeros((nrows, B), dtype=dtype)
            if fallback_cfm is None:
                fallback_cfm = w.solver.fallback_cfm
            if fallback_gradients is None:
                fallback_gradients = getattr(
                    w.solver, "fallback_gradients", False
                )
            if ladder_mode is None:
                ladder_mode = getattr(w.solver, "ladder_mode", "lazy")
            lcp_kwargs = dict(
                cfm=w.solver.cfm,
                fallback_cfm=fallback_cfm,
                fallback_gradients=fallback_gradients,
                return_valid=collect_valid,
                ladder_mode=ladder_mode,
            )
            if self.islands is not None:
                # Independent LCP per plan-time island: rows from
                # different islands have disjoint F column support (their
                # skeletons share no dofs), so A = F F^T is block-diagonal
                # and the solves decouple exactly.
                z = jnp.zeros((nrows, B), dtype=dtype)
                u = jnp.zeros((nv, B), dtype=dtype)
                for rows, dofs, meta_i in self.islands:
                    F_i = F[rows][:, dofs]
                    out = boxed_lcp_b(
                        meta_i, F_i, b[rows], mu[rows], z_warm[rows],
                        **lcp_kwargs,
                    )
                    z_i, val_i = out if collect_valid else (out, None)
                    z = z.at[rows].set(z_i)
                    u = u.at[dofs].add(
                        jnp.sum(F_i * z_i[:, None, :], axis=0)
                    )
                    if collect_valid:
                        lcp_valid = (
                            val_i if lcp_valid is None else lcp_valid & val_i
                        )
            elif self.contact_cap is not None:
                # Per-lane top-k active-contact selection: gather the
                # `cap` deepest contact slots (friction rows ride with
                # their normal), solve the capped LCP, scatter impulses
                # back. Unselected slots get zero impulse this step —
                # exact whenever a lane has <= cap penetrating slots
                # (see _build_cap_meta).
                cap = self.contact_cap
                C3 = 3 * self.bcollider.num_contacts
                sg = jax.lax.stop_gradient
                valid_c = (cdepth > 0.0) & (
                    cdepth <= w.solver.contact_clipping_depth
                )
                score = jnp.where(sg(valid_c), sg(cdepth), -1.0)
                _, slots = jax.lax.top_k(jnp.swapaxes(score, 0, 1), cap)
                slots = jnp.sort(slots, axis=1)  # original row order
                rows_idx = jnp.swapaxes(
                    (
                        3 * slots[:, :, None]
                        + jnp.arange(3)[None, None, :]
                    ).reshape(B, 3 * cap),
                    0,
                    1,
                )  # (3cap, B)

                def take_rows(X):
                    return jnp.concatenate(
                        [jnp.take_along_axis(X[:C3], rows_idx, axis=0),
                         X[C3:]],
                        axis=0,
                    )

                F_sel = jnp.concatenate(
                    [
                        jnp.take_along_axis(
                            F[:C3], rows_idx[:, None, :], axis=0
                        ),
                        F[C3:],
                    ],
                    axis=0,
                )
                out = boxed_lcp_b(
                    self.meta_cap, F_sel, take_rows(b), take_rows(mu),
                    take_rows(z_warm), **lcp_kwargs,
                )
                z_sel, lcp_valid = (
                    out if collect_valid else (out, None)
                )
                u = jnp.sum(F_sel * z_sel[:, None, :], axis=0)
                lanes = jnp.arange(B)[None, :]
                z = (
                    jnp.zeros((nrows, B), dtype=dtype)
                    .at[rows_idx, lanes]
                    .set(z_sel[: 3 * cap])
                )
                if C3 < nrows:
                    z = z.at[C3:].set(z_sel[3 * cap :])
            else:
                lcp_out = boxed_lcp_b(self.meta, F, b, mu, z_warm,
                                      **lcp_kwargs)
                z, lcp_valid = (
                    lcp_out if collect_valid else (lcp_out, None)
                )
                u = jnp.sum(F * z[:, None, :], axis=0)  # (nv, B)
            v_next = v_pre + bl.block_solve_tri_upper_t_vec(Ls, sl, u)
        else:
            v_next = v_pre
            z = jnp.zeros((0, B), dtype=dtype)
            cpoint = jnp.zeros((0, 3, B), dtype=dtype)
            cnormal = jnp.zeros((0, 3, B), dtype=dtype)
            cdepth = jnp.zeros((0, B), dtype=dtype)
            if collect_valid:
                lcp_valid = jnp.ones((B,), dtype=bool)

        v_for_pos = v if w.parallel_velocity_and_position_updates else v_next
        q_next = integrate_positions(self.fw, q, v_for_pos, dt)
        return BatchedStepResult(
            q=q_next,
            v=v_next,
            v_pre=v_pre,
            impulses=z,
            contact_points=cpoint,
            contact_normals=cnormal,
            contact_depths=cdepth,
            lcp_valid=lcp_valid,
        )

    def state_step(self, state, action, masses=None):
        """RL state/action step: state (2nv, B), action (na, B).

        masses: optional (NB,)/(NB, B) per-body masses (timestep parity)."""
        nv = self.world.num_dofs
        q, v = state[:nv], state[nv:]
        bp = None if masses is None else {"masses": masses}
        res = self.step(q, v, self.action_to_forces(action), body_params=bp)
        return jnp.concatenate([res.q, res.v])
