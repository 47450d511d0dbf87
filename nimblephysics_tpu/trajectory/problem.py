"""Trajectory optimization problems: single / multiple shooting.

TPU-native re-design of dart/trajectory (SURVEY.md 2.5): Problem
(Problem.hpp:28-418, flattened variables + constraint dims + rollout
cache), SingleShot (cached snapshot chain), MultiShot (MultiShot.hpp:
282-285 knot-consistency constraints; thread-parallel per-shot
computation on cloned worlds, MultiShot.cpp:189-225).

Here a problem is a pure function of its flat variable vector:
  * SingleShot: x = [start_state?, forces(T * na)], rollout = lax.scan of
    the differentiable timestep; gradients via jax.grad (the reference's
    accumulated KnotJacobian products fall out of reverse-mode AD).
  * MultiShot: x = [shot start states, all forces]; shots roll out
    IN PARALLEL under vmap — the TPU replacement for the reference's
    std::thread pool over cloned worlds — with knot-consistency equality
    constraints h(x) = 0 between consecutive shots.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.neural.timestep import Engine, get_engine
from nimblephysics_tpu.simulation.world import World


class TrajectoryRollout(NamedTuple):
    """Reference parity: trajectory::TrajectoryRollout (poses/vels/forces
    matrices per mapping, TrajectoryRollout.hpp:28-127). `mapped` holds
    per-mapping pos/vel trajectories for every mapping registered on the
    Problem (reference: MappedBackpropSnapshot losses)."""

    poses: jnp.ndarray  # (T, nq)
    vels: jnp.ndarray  # (T, nv)
    forces: jnp.ndarray  # (T, na)
    mapped: dict = {}  # name -> {"pos": (T, d), "vel": (T, d)}

    def to_json(self) -> str:
        import json

        return json.dumps(
            {
                "poses": np.asarray(self.poses).tolist(),
                "vels": np.asarray(self.vels).tolist(),
                "forces": np.asarray(self.forces).tolist(),
            }
        )


# A loss is a callable TrajectoryRollout -> scalar (reference: LossFn
# closures; gradients come from JAX instead of fill_gradients plumbing).
LossFn = Callable[[TrajectoryRollout], jnp.ndarray]


class Problem:
    """Abstract trajectory NLP over a flat variable vector x.

    Interface (reference Problem.hpp): flatten/unflatten, loss(x),
    constraints h(x) (equalities), bounds, rollout extraction.
    """

    def __init__(self, world: World, loss_fn: LossFn, steps: int):
        self.world = world
        self.engine: Engine = get_engine(world)
        self.loss_fn = loss_fn
        self.steps = steps
        self.nv = world.num_dofs
        self.na = world.action_size
        # Pinned forces (reference: Problem::pinForce, Problem.hpp:332-339)
        # — fixed control rows the optimizer must not change.
        self._pinned: dict = {}  # t -> (na,) np array
        # Loss mappings (reference: Problem::addMapping + per-mapping
        # TrajectoryRollout matrices): name -> IKMapping/IdentityMapping.
        self.mappings: dict = {}

    def pin_force(self, t: int, value) -> None:
        """Fix the controls at timestep `t` to `value` (excluded from the
        optimization: the rollout overrides that row, so the loss is
        constant in the corresponding variables)."""
        self._pinned[int(t)] = np.asarray(value, dtype=np.float64)

    def get_pinned_force(self, t: int):
        return self._pinned.get(int(t))

    def add_mapping(self, name: str, mapping) -> None:
        """Register a loss-space mapping; rollouts then carry
        rollout.mapped[name] = {"pos": (T, d), "vel": (T, d)}."""
        self.mappings[name] = mapping

    def _apply_pins(self, forces: jnp.ndarray) -> jnp.ndarray:
        """Override pinned rows of a (T, na) force matrix."""
        for t, v in self._pinned.items():
            forces = forces.at[t].set(jnp.asarray(v, dtype=forces.dtype))
        return forces

    def _mapped(self, poses: jnp.ndarray, vels: jnp.ndarray) -> dict:
        out = {}
        for name, m in self.mappings.items():
            out[name] = {
                "pos": jax.vmap(m.map_pos)(poses),
                "vel": jax.vmap(m.map_vel)(poses, vels),
            }
        return out

    @property
    def num_variables(self) -> int:
        raise NotImplementedError

    @property
    def num_constraints(self) -> int:
        return 0

    def loss(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.loss_fn(self.rollout(x))

    def constraints(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.zeros((0,), dtype=x.dtype)

    def rollout(self, x: jnp.ndarray) -> TrajectoryRollout:
        raise NotImplementedError

    def initial_guess(self, start_state: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    # -- shared rollout machinery -----------------------------------------

    def _scan_rollout(self, state0: jnp.ndarray, forces: jnp.ndarray):
        """(2nv,), (T, na) -> poses (T, nq), vels (T, nv) AFTER each step."""
        nv = self.nv

        def body(s, u):
            s2 = self.engine.state_step(s, u)
            return s2, s2

        _, states = jax.lax.scan(body, state0, forces)
        return states[:, :nv], states[:, nv:]


class SingleShot(Problem):
    """One rollout from a (fixed or tuned) start state.

    Reference parity: trajectory::SingleShot (SingleShot.hpp:115 cached
    snapshot chain; backpropJacobianOfFinalState:92 — here jax.jacrev of
    `final_state`).
    """

    def __init__(
        self,
        world: World,
        loss_fn: LossFn,
        steps: int,
        start_state: Optional[jnp.ndarray] = None,
        tune_starting_state: bool = False,
    ):
        super().__init__(world, loss_fn, steps)
        self.tune_starting_state = tune_starting_state
        self.start_state = (
            jnp.zeros(2 * self.nv) if start_state is None else start_state
        )

    @property
    def num_variables(self) -> int:
        n = self.steps * self.na
        if self.tune_starting_state:
            n += 2 * self.nv
        return n

    def _split(self, x):
        if self.tune_starting_state:
            s0 = x[: 2 * self.nv]
            forces = x[2 * self.nv :].reshape(self.steps, self.na)
        else:
            s0 = self.start_state.astype(x.dtype)
            forces = x.reshape(self.steps, self.na)
        return s0, forces

    def rollout(self, x: jnp.ndarray) -> TrajectoryRollout:
        s0, forces = self._split(x)
        forces = self._apply_pins(forces)
        poses, vels = self._scan_rollout(s0, forces)
        return TrajectoryRollout(
            poses, vels, forces, self._mapped(poses, vels)
        )

    def final_state(self, x: jnp.ndarray) -> jnp.ndarray:
        r = self.rollout(x)
        return jnp.concatenate([r.poses[-1], r.vels[-1]])

    def backprop_jacobian_of_final_state(self, x: jnp.ndarray) -> jnp.ndarray:
        """Reference parity: SingleShot::backpropJacobianOfFinalState."""
        return jax.jacrev(self.final_state)(x)

    def initial_guess(self, start_state: jnp.ndarray) -> jnp.ndarray:
        forces = jnp.zeros((self.steps, self.na))
        if self.tune_starting_state:
            return jnp.concatenate([start_state, forces.reshape(-1)])
        self.start_state = start_state
        return forces.reshape(-1)


class MultiShot(Problem):
    """Multiple shooting: parallel shots + knot-consistency constraints.

    Reference parity: trajectory::MultiShot — knot variables
    (MultiShot.hpp:282-285) and per-shot parallelism (the reference's
    mParallelWorlds thread pool, MultiShot.cpp:66-69, becomes `vmap` over
    the shot axis: every shot integrates simultaneously on-device).
    """

    def __init__(
        self,
        world: World,
        loss_fn: LossFn,
        steps: int,
        shot_length: int,
        start_state: Optional[jnp.ndarray] = None,
    ):
        super().__init__(world, loss_fn, steps)
        assert steps % shot_length == 0, "steps must divide into shots"
        self.shot_length = shot_length
        self.num_shots = steps // shot_length
        self.start_state = (
            jnp.zeros(2 * self.nv) if start_state is None else start_state
        )

    @property
    def num_variables(self) -> int:
        # Knot start states for shots 1..S-1 (shot 0 starts at the fixed
        # start state) + all forces.
        return (self.num_shots - 1) * 2 * self.nv + self.steps * self.na

    @property
    def num_constraints(self) -> int:
        return (self.num_shots - 1) * 2 * self.nv

    def _split(self, x):
        nknot = (self.num_shots - 1) * 2 * self.nv
        knots = x[:nknot].reshape(self.num_shots - 1, 2 * self.nv)
        forces = x[nknot:].reshape(self.num_shots, self.shot_length, self.na)
        starts = jnp.concatenate(
            [self.start_state.astype(x.dtype)[None], knots], axis=0
        )
        return starts, forces

    def _shot_states(self, x):
        """All shots, in parallel: (S, L, 2nv) post-step states."""
        starts, forces = self._split(x)
        if self._pinned:
            flat = self._apply_pins(
                forces.reshape(self.steps, self.na)
            )
            forces = flat.reshape(
                self.num_shots, self.shot_length, self.na
            )

        def one_shot(s0, us):
            def body(s, u):
                s2 = self.engine.state_step(s, u)
                return s2, s2

            _, states = jax.lax.scan(body, s0, us)
            return states

        return jax.vmap(one_shot)(starts, forces), forces

    def rollout(self, x: jnp.ndarray) -> TrajectoryRollout:
        states, forces = self._shot_states(x)
        flat = states.reshape(self.steps, 2 * self.nv)
        poses, vels = flat[:, : self.nv], flat[:, self.nv :]
        return TrajectoryRollout(
            poses,
            vels,
            forces.reshape(self.steps, self.na),
            self._mapped(poses, vels),
        )

    def constraints(self, x: jnp.ndarray) -> jnp.ndarray:
        """Knot mismatches h(x) = end(shot_i) - start(shot_{i+1}) = 0
        (reference: MultiShot::computeConstraints, MultiShot.cpp:183)."""
        states, _ = self._shot_states(x)
        starts, _ = self._split(x)
        ends = states[:-1, -1, :]  # (S-1, 2nv)
        return (ends - starts[1:]).reshape(-1)

    def constraint_jacobian(self, x: jnp.ndarray) -> jnp.ndarray:
        """Reference parity: MultiShot::backpropJacobian (cpp:475)."""
        return jax.jacrev(self.constraints)(x)

    # -- scan-accumulated Jacobians (the reference's KnotJacobian scheme) --

    def _step_jacobians(self, x):
        """Per-step state-transition Jacobians A_t = d s_{t+1} / d s_t and
        B_t = d s_{t+1} / d u_t for every shot, plus the post-step states.

        This is the TPU form of the reference's KnotJacobian accumulation
        (SingleShot::backpropJacobianOfFinalState, MultiShot::
        backpropJacobian, MultiShot.cpp:475-584): ONE compiled single-step
        Jacobian scanned over the horizon, instead of reverse-mode AD over
        the whole unrolled rollout (jax.jacrev of a 33-dof Atlas rollout
        took ~23 min to compile; this compiles in seconds and is
        algebraically identical).

        Returns (A (S, L, 2nv, 2nv), B (S, L, 2nv, na), states
        (S, L, 2nv)).
        """
        starts, forces = self._split(x)
        if self._pinned:
            flat = self._apply_pins(forces.reshape(self.steps, self.na))
            forces = flat.reshape(self.num_shots, self.shot_length, self.na)

        def g(s, u):
            s2 = self.engine.state_step(s, u)
            return s2, s2

        step_jac = jax.jacrev(g, argnums=(0, 1), has_aux=True)

        def one_shot(s0, us):
            def body(s, u):
                (A, B), s2 = step_jac(s, u)
                return s2, (A, B, s2)

            _, (A, B, states) = jax.lax.scan(body, s0, us)
            return A, B, states

        A, B, states = jax.vmap(one_shot)(starts, forces)
        if self._pinned:
            # Pinned force rows are overridden by constants: their columns
            # of the Jacobian wrt the OPTIMIZATION variables are zero.
            mask = np.ones(self.steps)
            for t in self._pinned:
                mask[t] = 0.0
            B = B * jnp.asarray(mask).reshape(
                self.num_shots, self.shot_length, 1, 1
            )
        return A, B, states

    @staticmethod
    def _accumulate_shot(A, B):
        """For one shot: E = d end / d start = A_{L-1} ... A_0 and
        F_t = d end / d u_t = (A_{L-1} ... A_{t+1}) B_t, by one reverse
        scan of matrix products."""

        def rev(H, AB):
            At, Bt = AB
            return H @ At, H @ Bt

        E, F = jax.lax.scan(
            rev, jnp.eye(A.shape[-1], dtype=A.dtype), (A, B), reverse=True
        )
        return E, F

    def shot_sensitivities(self, x):
        """(E (S, 2nv, 2nv), F (S, L, 2nv, na), states): per-shot
        end-state sensitivities wrt the shot start and each force row."""
        A, B, states = self._step_jacobians(x)
        E, F = jax.vmap(self._accumulate_shot)(A, B)
        return E, F, states

    def constraint_jacobian_scan(self, x: jnp.ndarray) -> jnp.ndarray:
        """d h / d x assembled from scan-accumulated per-step Jacobians —
        identical values to `constraint_jacobian` (tested), compile time
        independent of the horizon's unrolled reverse-mode graph."""
        E, F, _ = self.shot_sensitivities(x)
        S, L = self.num_shots, self.shot_length
        ns = 2 * self.nv
        nknot = (S - 1) * ns
        n = self.num_variables
        J = jnp.zeros((self.num_constraints, n), dtype=x.dtype)
        eye = jnp.eye(ns, dtype=x.dtype)
        for i in range(S - 1):
            r = i * ns
            # h_i = end(shot_i) - knot_i; start of shot_i is knot_{i-1}
            # (shot 0 starts at the fixed start state).
            if i > 0:
                J = J.at[r : r + ns, (i - 1) * ns : i * ns].set(E[i])
            J = J.at[r : r + ns, i * ns : (i + 1) * ns].set(-eye)
            fcols = F[i].transpose(1, 0, 2).reshape(ns, L * self.na)
            c0 = nknot + i * L * self.na
            J = J.at[r : r + ns, c0 : c0 + L * self.na].set(fcols)
        return J

    def final_state_jacobian(self, x: jnp.ndarray):
        """d (end state of the LAST shot) / d x, (2nv, n) — the terminal
        sensitivity used by TerminalResiduals (reference:
        backpropJacobianOfFinalState)."""
        E, F, _ = self.shot_sensitivities(x)
        S, L = self.num_shots, self.shot_length
        ns = 2 * self.nv
        nknot = (S - 1) * ns
        J = jnp.zeros((ns, self.num_variables), dtype=x.dtype)
        if S > 1:
            J = J.at[:, (S - 2) * ns : (S - 1) * ns].set(E[-1])
        fcols = F[-1].transpose(1, 0, 2).reshape(ns, L * self.na)
        c0 = nknot + (S - 1) * L * self.na
        J = J.at[:, c0 : c0 + L * self.na].set(fcols)
        return J

    def initial_guess(self, start_state: jnp.ndarray) -> jnp.ndarray:
        self.start_state = start_state
        knots = jnp.tile(start_state[None], (self.num_shots - 1, 1))
        forces = jnp.zeros((self.steps, self.na))
        return jnp.concatenate([knots.reshape(-1), forces.reshape(-1)])


class TerminalResiduals:
    """Residuals that touch the rollout only through the FINAL state and
    the force matrix — the common shooting-objective class (reach target
    + terminal velocity + effort, e.g. test_AtlasTrajectory.cpp's loss).

    Callable as `residuals(x)` for GaussNewtonOptimizer, and provides an
    analytic `jacobian(x)` composed from the problem's scan-accumulated
    terminal sensitivity (MultiShot.final_state_jacobian) and a
    SMALL-function jacrev of `fn` — so the optimizer never reverse-
    differentiates an unrolled rollout (the 23-min-compile path this
    replaces; see _step_jacobians)."""

    def __init__(self, problem: "MultiShot", fn):
        """fn(final_state (2nv,), forces (T, na)) -> residual vector."""
        self.problem = problem
        self.fn = fn

    def _final_and_forces(self, x):
        p = self.problem
        starts, forces = p._split(x)
        if p._pinned:
            flat = p._apply_pins(forces.reshape(p.steps, p.na))
            forces = flat.reshape(p.num_shots, p.shot_length, p.na)

        def one_shot(s0, us):
            def body(s, u):
                s2 = p.engine.state_step(s, u)
                return s2, None

            sL, _ = jax.lax.scan(body, s0, us)
            return sL

        ends = jax.vmap(one_shot)(starts, forces)
        return ends[-1], forces.reshape(p.steps, p.na)

    def __call__(self, x):
        final, forces = self._final_and_forces(x)
        return self.fn(final, forces)

    def jacobian(self, x):
        p = self.problem
        final, forces = self._final_and_forces(x)
        dr_de, dr_df = jax.jacrev(self.fn, argnums=(0, 1))(final, forces)
        J = dr_de @ p.final_state_jacobian(x)
        nknot = (p.num_shots - 1) * 2 * p.nv
        nr = dr_de.shape[0]
        dr_df = dr_df.reshape(nr, p.steps * p.na)
        if p._pinned:
            mask = np.ones(p.steps)
            for t in p._pinned:
                mask[t] = 0.0
            dr_df = dr_df * jnp.repeat(jnp.asarray(mask), p.na)[None, :]
        return J.at[:, nknot:].add(dr_df)
