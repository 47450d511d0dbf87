"""World: container of skeletons + solver config + state/action API.

TPU-native re-design of the reference World (dart/simulation/World.hpp:
state vectors :231-468, RL state/action API :471-523, gradient knobs
:636-713, step loop World.cpp:221-254). The World object is a *static*
spec (hashable by identity, usable as a jit static argument); all dynamic
state lives in plain (q, v) arrays so stepping is a pure function.

The timestep itself lives in neural/timestep.py (it owns the custom-VJP
contact gradients); this module provides the structure: concatenated dof
bookkeeping across skeletons, per-skeleton smooth dynamics, position
integration with the reference's "parallel velocity and position updates"
scheme (q_{t+1} integrated with the PRE-step velocity v_t,
World.cpp:307-324), and the RL-style state/action accessors.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.dynamics.skeleton import (
    Skeleton,
    bias_forces,
    forward_dynamics,
    forward_kinematics,
    full_kinematics,
    integrate_positions as skel_integrate_positions,
    mass_matrix,
    passive_forces,
)


@dataclasses.dataclass(frozen=True, eq=False)
class SolverConfig:
    """Contact/LCP solver knobs (defaults mirror the reference).

    Reference parity: ContactConstraint statics (DART_ERP=0.01,
    DART_MAX_ERV=1e-3, DART_CFM=1e-5, bounce threshold 0.1, max bounce 100,
    friction/restitution activation thresholds 1e-3) and World knobs
    (penetration correction off, contact clipping depth 0.03,
    fallback CFM 1e-4 — World.cpp:82-87).
    """

    lcp_solver: str = "apgd"  # iterative seed: "apgd" (TPU) | "pgs"
    lcp_iterations: int = 32
    # Active-set refinement rounds after the iterative seed (masked
    # Dantzig; constraint/lcp.LcpMeta.refine_rounds).
    lcp_refine_rounds: int = 3
    # Projected Gauss-Seidel polish sweeps on the APGD seed (the
    # reference's PGS secondary solver role). Sequential row work — the
    # main forward cost knob of the batched LCP on TPU.
    lcp_seed_pgs_sweeps: int = 16
    cfm: float = 0.0
    fallback_cfm: float = 1e-4
    # Differentiate through the failure-ladder output? The reference DOES
    # build gradients from its fallback impulse: registerLCPResults is
    # called with the ladder-produced mX and constructMatrices classifies
    # it (BoxedLcpConstraintSolver.cpp:716-734; friction rows zeroed on
    # the ignore-friction rung, ConstrainedGroupGradientMatrices.cpp:620).
    # Default False is therefore an APPROXIMATION that diverges from the
    # reference for exactly the worlds the ladder serves: they keep their
    # robust forward impulse but contribute zero contact-impulse gradient.
    # We accept that on the lazy per-step path because the ladder cond's
    # VJP costs ~30% of a 4096-world training step even when NO world
    # ever takes it (measured on v5e; see benchmarks/README.md). For
    # reference-parity gradients at zero happy-path cost, roll out with
    # batched/rollout.deferred_ladder_scan, whose rerun path uses
    # fallback_gradients="reclassify" (classify the ladder impulse, one
    # differentiable softened pinned solve — the reference recipe).
    fallback_gradients: bool = False
    # Ladder scheduling: "lazy" guards the rungs with a lax.cond on "any
    # world failed validity" (pays nothing when every island is healthy,
    # but the cond is a fusion barrier in rollout scans); "always" runs
    # the rungs cond-free with per-world selection — the faster choice
    # when a handful of worlds fail on most steps (batched/lcp.boxed_lcp_b).
    ladder_mode: str = "lazy"
    error_allowance: float = 0.0
    error_reduction_parameter: float = 0.01
    max_error_reduction_velocity: float = 1e-3
    # Joint-family constraints (ball/weld/joint-limit) stabilize much more
    # aggressively than contacts in the reference: DART_MAX_ERV = 1e+1 in
    # JointConstraint.cpp:42 / JointLimitConstraint.cpp:45 vs 1e-3 in
    # ContactConstraint.cpp:47.
    joint_max_error_reduction_velocity: float = 10.0
    bouncing_velocity_threshold: float = 0.1
    max_bouncing_velocity: float = 100.0
    friction_threshold: float = 1e-3
    restitution_threshold: float = 1e-3
    penetration_correction_enabled: bool = False
    contact_clipping_depth: float = 0.03
    # Activation margin for joint-limit constraint rows.
    joint_limit_margin: float = 0.0
    # Plan-time constraint islands: partition the LCP by connected
    # components of the POTENTIAL collision-pair graph over dynamic
    # skeletons (static bodies never merge components — N boxes over a
    # ground plane with inter-box collision filtered are N independent
    # 6-dof LCPs, not one dense 6N-dof one). The TPU-static analog of the
    # reference's per-step union-find islands
    # (ConstraintSolver.cpp:723-793). Worlds whose pair graph is one
    # component (a stack, a single robot) are unaffected.
    contact_islands: bool = True
    # Fixed-capacity ACTIVE contact selection (None = solve every
    # potential contact slot). When the world's potential-contact count C
    # exceeds this cap, each lane solves its LCP on only the `contact_cap`
    # deepest slots (top-k by penetration, friction rows riding with
    # their normal); unselected slots get zero impulse that step. This is
    # the compile-time-static TPU analog of runtime broadphase culling
    # (the reference prunes non-touching pairs per step before building
    # constraints, ConstraintSolver.cpp:542-640): a 20-box world has
    # C(20,2)+20 potential pairs but only ~O(20) touching interfaces, so
    # the LCP shrinks ~8x with no change to the resting physics. Lanes
    # with MORE than contact_cap genuinely-penetrating slots drop the
    # shallowest — pick the cap generously above the expected active set.
    contact_cap: Optional[int] = None

    @classmethod
    def throughput(cls, **overrides) -> "SolverConfig":
        """Preset for large-batch RL/training rollouts on TPU.

        Measured on 4096 half-cheetah worlds, one v5e chip (A/B table in
        benchmarks/README.md): forward 2.89M env-steps/s (vs 2.06M at the
        defaults) and fwd+bwd policy-gradient training 1.06M at horizon
        100 (vs 0.88M), with policy-gradient cosine agreement > 0.999
        against the default config.

        What it changes and why it is safe for rollouts:
          * ladder_mode="always": the failure-ladder rungs run cond-free
            with per-world selection — identical impulses, no fusion
            barrier (the lazy cond fires on essentially every 4096-world
            call anyway, since SOME world fails validity most steps).
          * lcp_seed_pgs_sweeps=0: drops the sequential PGS polish; the
            always-armed ladder's softened pinned rung now catches the
            seed misclassifications the polish existed to prevent.
          * lcp_refine_rounds=2 / lcp_iterations=24: one less active-set
            refinement round and a shorter APGD seed — warm-started
            rollouts re-converge the active set across steps, so the
            extra round mostly re-proves the previous step's answer.

        Single-step / cold-start / contact-heavy debugging should keep
        the defaults (they mirror the reference's solver effort)."""
        cfg = dict(
            ladder_mode="always",
            lcp_seed_pgs_sweeps=0,
            lcp_refine_rounds=2,
            lcp_iterations=24,
        )
        cfg.update(overrides)
        return cls(**cfg)


class World:
    """Static world spec: skeletons, gravity, dt, solver config.

    Reference parity for the accessor surface of simulation::World
    (getState/setState layout = [positions; velocities], action =
    control forces on `action_indices`).
    """

    def __init__(
        self,
        name: str = "world",
        gravity: Sequence[float] = (0.0, 0.0, -9.81),
        time_step: float = 0.001,
        solver: Optional[SolverConfig] = None,
    ):
        self.name = name
        self.gravity = np.asarray(gravity, dtype=np.float64)
        self.time_step = float(time_step)
        self.solver = solver or SolverConfig()
        self.skeletons: List[Skeleton] = []
        self._action_indices: Optional[np.ndarray] = None
        # Dynamic joint constraints (reference: ConstraintBase family —
        # WeldJointConstraint, BallJointConstraint added by users).
        self.dynamic_constraints: List[dict] = []
        # Per-dof actuator types (reference: Joint::ActuatorType — FORCE,
        # SERVO [control = velocity command, force-limited], MIMIC, LOCKED,
        # PASSIVE).
        self.actuator_types: Dict[int, dict] = {}
        # Reference-parity integration-scheme knob (World.cpp:82: true).
        self.parallel_velocity_and_position_updates = True
        # Event signals (reference: common::Signal members on World /
        # name-change signals): raised on skeleton insertion.
        from nimblephysics_tpu.common.infra import NameManager, Signal

        self.on_skeleton_added = Signal()
        self.skeleton_names = NameManager(f"{name}::skeletons", "skeleton")
        # Gradient debug modes (reference: World.hpp:700-713 —
        # setUseFDOverride / setSlowDebugResultsAgainstFD): FD override
        # makes BackpropSnapshot return finite-difference Jacobians;
        # slow-debug computes both and raises with a repro when they
        # diverge.
        self.use_fd_override = False
        self.slow_debug_results_against_fd = False
        self.fd_debug_tolerance = 1e-5
        # Max contact slots override (None = static pair enumeration).
        self.max_contacts: Optional[int] = None
        # Explicit per-pair collision overrides keyed by a global body
        # index pair (reference parity: CollisionFilter explicit
        # ShouldCollide pairs, CollisionFilter.hpp:91-111). True forces
        # the pair to collide even when skeleton flags would skip it;
        # False force-disables it.
        self.collision_overrides: Dict[Tuple[int, int], bool] = {}

    def set_should_collide(
        self, body_a: int, body_b: int, should: bool
    ) -> None:
        """Explicitly enable/disable collision between two bodies
        (global body indices; see body_offsets)."""
        key = (min(body_a, body_b), max(body_a, body_b))
        self.collision_overrides[key] = bool(should)

    # -- construction ------------------------------------------------------

    def add_skeleton(self, skel: Skeleton) -> int:
        # NameManager keeps skeleton names unique; Signal notifies
        # observers (GUI servers re-render on it) — reference parity:
        # World's name manager + change signals.
        # The NameManager may uniquify on collision; the issued name is
        # assigned back so skel.name always matches the registry key
        # (reference NameManager renames the managed object).
        skel.name = self.skeleton_names.add_name(skel.name, skel)
        self.skeletons.append(skel)
        self.on_skeleton_added.raise_signal(skel)
        return len(self.skeletons) - 1

    def add_ball_joint_constraint(
        self, body_a: int, offset_a, body_b: int, offset_b
    ) -> None:
        """Constrain a point of body_a to a point of body_b (reference:
        constraint::BallJointConstraint). Global body indices."""
        self.dynamic_constraints.append(
            dict(
                kind="ball",
                body_a=int(body_a),
                offset_a=np.asarray(offset_a, dtype=np.float64),
                body_b=int(body_b),
                offset_b=np.asarray(offset_b, dtype=np.float64),
            )
        )

    def add_weld_joint_constraint(
        self, body_a: int, body_b: int, at_positions=None
    ) -> None:
        """Weld two bodies in their relative pose at ``at_positions``
        (default: zero pose). Reference: constraint::WeldJointConstraint
        captures the relative transform at creation and feeds pose error
        back into the constraint rhs (WeldJointConstraint.cpp), so welded
        pairs do not drift apart under sustained load."""
        import jax.numpy as jnp

        q0 = (
            np.zeros(self.num_dofs)
            if at_positions is None
            else np.asarray(at_positions, dtype=np.float64)
        )
        T = np.asarray(world_fk(self, jnp.asarray(q0)))
        TA, TB = T[int(body_a)], T[int(body_b)]
        anchor = TB[:3, 3]
        self.dynamic_constraints.append(
            dict(
                kind="weld",
                body_a=int(body_a),
                body_b=int(body_b),
                rel_rot=TA[:3, :3].T @ TB[:3, :3],
                offset_a=TA[:3, :3].T @ (anchor - TA[:3, 3]),
                offset_b=TB[:3, :3].T @ (anchor - TB[:3, 3]),
            )
        )

    def set_actuator_type(
        self,
        dof: int,
        kind: str,
        force_limit: float = np.inf,
        mimic_dof: Optional[int] = None,
        mimic_multiplier: float = 1.0,
        mimic_offset: float = 0.0,
    ) -> None:
        """kind: 'force' (default), 'servo' (control = velocity command,
        enforced by a force-limited LCP row — ServoMotorConstraint),
        'mimic' (track another dof — MimicMotorConstraint), 'locked',
        'passive'."""
        assert kind in ("force", "servo", "mimic", "locked", "passive")
        self.actuator_types[int(dof)] = dict(
            kind=kind,
            force_limit=float(force_limit),
            mimic_dof=mimic_dof,
            mimic_multiplier=float(mimic_multiplier),
            mimic_offset=float(mimic_offset),
        )

    def dof_actuator(self, dof: int) -> dict:
        return self.actuator_types.get(
            dof, dict(kind="force", force_limit=np.inf, mimic_dof=None,
                      mimic_multiplier=1.0, mimic_offset=0.0)
        )

    # -- static bookkeeping --------------------------------------------------

    @property
    def num_dofs(self) -> int:
        return sum(s.num_dofs for s in self.skeletons)

    @property
    def num_bodies(self) -> int:
        return sum(s.num_bodies for s in self.skeletons)

    def dof_offsets(self) -> List[int]:
        offs, c = [], 0
        for s in self.skeletons:
            offs.append(c)
            c += s.num_dofs
        return offs

    def body_offsets(self) -> List[int]:
        offs, c = [], 0
        for s in self.skeletons:
            offs.append(c)
            c += s.num_bodies
        return offs

    def dof_slices(self) -> List[Tuple[int, int]]:
        out, c = [], 0
        for s in self.skeletons:
            out.append((c, c + s.num_dofs))
            c += s.num_dofs
        return out

    # -- action space (reference: World.hpp:471-523) -------------------------

    def set_action_space(self, indices: Sequence[int]) -> None:
        self._action_indices = np.asarray(indices, dtype=np.int32)

    @property
    def action_indices(self) -> np.ndarray:
        if self._action_indices is None:
            return np.arange(self.num_dofs, dtype=np.int32)
        return self._action_indices

    @property
    def action_size(self) -> int:
        return len(self.action_indices)

    @property
    def state_size(self) -> int:
        return 2 * self.num_dofs

    def action_to_forces(self, action: jnp.ndarray) -> jnp.ndarray:
        """Scatter an action vector into a full control-force vector."""
        tau = jnp.zeros(self.num_dofs, dtype=action.dtype)
        return tau.at[jnp.asarray(self.action_indices)].set(action)

    def forces_to_action(self, tau: jnp.ndarray) -> jnp.ndarray:
        return tau[jnp.asarray(self.action_indices)]

    # -- limits (concatenated; reference World.hpp:231-468) ------------------

    def position_lower_limits(self) -> np.ndarray:
        return np.concatenate(
            [s.position_lower_limits() for s in self.skeletons]
        ) if self.skeletons else np.zeros(0)

    def position_upper_limits(self) -> np.ndarray:
        return np.concatenate(
            [s.position_upper_limits() for s in self.skeletons]
        ) if self.skeletons else np.zeros(0)

    def force_limits(self) -> np.ndarray:
        return np.concatenate([s.force_limits() for s in self.skeletons])

    def velocity_limits(self) -> np.ndarray:
        return np.concatenate([s.velocity_limits() for s in self.skeletons])

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other

    def __repr__(self):
        return (
            f"World({self.name!r}, skeletons={len(self.skeletons)}, "
            f"dofs={self.num_dofs})"
        )


# ---------------------------------------------------------------------------
# World-level pure functions (concatenate per-skeleton quantities)
# ---------------------------------------------------------------------------


def split_state(world: World, state: jnp.ndarray):
    nv = world.num_dofs
    return state[:nv], state[nv:]


def merge_state(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([q, v])


def world_fk(world: World, q: jnp.ndarray) -> jnp.ndarray:
    """World transforms of all bodies across skeletons, (NB, 4, 4)."""
    Ts = []
    for skel, (s, e) in zip(world.skeletons, world.dof_slices()):
        Ts.append(forward_kinematics(skel, q[s:e]))
    return jnp.concatenate(Ts, axis=0)


def world_full_kinematics(world: World, q: jnp.ndarray, dq: jnp.ndarray):
    """FK + twists + *world-dof-width* system Jacobians for all bodies."""
    nv = world.num_dofs
    T_list, V_list, J_list = [], [], []
    for skel, (s, e) in zip(world.skeletons, world.dof_slices()):
        kin = full_kinematics(skel, q[s:e], dq[s:e])
        T_list.append(kin["T_wb"])
        V_list.append(kin["V"])
        nb = skel.num_bodies
        Jfull = jnp.zeros((nb, 6, nv), dtype=q.dtype)
        Jfull = Jfull.at[:, :, s:e].set(kin["J_world"])
        J_list.append(Jfull)
    return {
        "T_wb": jnp.concatenate(T_list, axis=0),
        "V": jnp.concatenate(V_list, axis=0),
        "J_world": jnp.concatenate(J_list, axis=0),
    }


def world_mass_matrix(world: World, q: jnp.ndarray) -> jnp.ndarray:
    """Block-diagonal world mass matrix."""
    nv = world.num_dofs
    M = jnp.zeros((nv, nv), dtype=q.dtype)
    for skel, (s, e) in zip(world.skeletons, world.dof_slices()):
        M = M.at[s:e, s:e].set(mass_matrix(skel, q[s:e]))
    return M


def world_forward_dynamics(
    world: World, q: jnp.ndarray, dq: jnp.ndarray, tau: jnp.ndarray
) -> jnp.ndarray:
    """Unconstrained accelerations, per skeleton (block-diagonal solve).

    Reference parity: the per-skeleton computeForwardDynamics +
    integrateVelocities loop at the top of World::step (World.cpp:225-233).
    """
    g = jnp.asarray(world.gravity, dtype=q.dtype)
    outs = []
    for skel, (s, e) in zip(world.skeletons, world.dof_slices()):
        outs.append(
            forward_dynamics(skel, q[s:e], dq[s:e], tau[s:e], gravity=g)
        )
    return jnp.concatenate(outs)


def world_integrate_positions(
    world: World, q: jnp.ndarray, dq: jnp.ndarray, dt
) -> jnp.ndarray:
    outs = []
    for skel, (s, e) in zip(world.skeletons, world.dof_slices()):
        outs.append(skel_integrate_positions(skel, q[s:e], dq[s:e], dt))
    return jnp.concatenate(outs)
