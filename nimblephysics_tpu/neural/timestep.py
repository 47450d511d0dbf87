"""The differentiable timestep — Nimble's core capability, TPU-native.

Reference call stack being re-designed (SURVEY.md section 3.1/3.2):
  nimble.timestep -> neural::forwardPass -> World::step (forward dynamics,
  LCP constraint solve, position integration) -> BackpropSnapshot with six
  analytical Jacobians (dart/neural/BackpropSnapshot.cpp).

Here the whole step is ONE pure, jit/vmap/grad-composable function. The
smooth parts differentiate by ordinary JAX AD (exactly — RNEA, FK, contact
geometry are all closed-form differentiable), and the only non-smooth
piece, the boxed LCP, carries a custom VJP implementing the active-set
implicit differentiation (constraint/lcp.py — the BackpropSnapshot math).
`jax.grad` through `timestep` therefore IS the analytical backward pass
through hard contact, friction, bouncing and joint limits; the six
timestep Jacobians (pos-pos/pos-vel/vel-pos/vel-vel/force-vel/mass-vel)
are exposed as `jacfwd`/`jacrev` products on the same function.

Step ordering matches the reference exactly (World::step, World.cpp:221):
  1. smooth forward dynamics + velocity integration -> v_pre
  2. collision at the PRE-step positions q_t; LCP on v_pre; impulses
  3. v_{t+1} = v_pre + M^-1 J^T z
  4. q_{t+1} integrated from the PRE-step velocity v_t (the Nimble
     "parallel velocity and position updates" scheme, World.cpp:307-324).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.collision.collider import Collider, Contacts
from nimblephysics_tpu.constraint.assembly import ConstraintAssembler
from nimblephysics_tpu.constraint.lcp import boxed_lcp
from nimblephysics_tpu.dynamics.skeleton import (
    bias_forces,
    mass_and_bias_fused,
    mass_matrix,
    passive_forces,
)
from nimblephysics_tpu.simulation.world import (
    World,
    world_full_kinematics,
    world_integrate_positions,
)


class StepResult(NamedTuple):
    q: jnp.ndarray
    v: jnp.ndarray
    # Auxiliary diagnostics (all fixed-shape; zero-sized when contact-free).
    v_pre: jnp.ndarray  # pre-constraint velocity (reference:
    # mLastPreConstraintVelocity, World.cpp:238)
    impulses: jnp.ndarray  # LCP solution z, (n_rows,)
    contact_points: jnp.ndarray  # (C, 3)
    contact_normals: jnp.ndarray  # (C, 3)
    contact_depths: jnp.ndarray  # (C,)
    contact_forces: jnp.ndarray  # (C, 3) world-frame force on body A


class Engine:
    """Static compiled-step plan for one World: collider + row plan.

    Build once per World (identity-hashed, jit-static); `step` is pure.
    """

    def __init__(self, world: World):
        self.world = world
        self.collider = Collider(world)
        self.assembler = ConstraintAssembler(world, self.collider)

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other

    @property
    def num_constraint_rows(self) -> int:
        return self.assembler.num_rows

    # ------------------------------------------------------------------

    def _split_body_params(self, body_params):
        """World-level (NB,) body-parameter arrays -> per-skeleton dicts."""
        if body_params is None:
            return [None] * len(self.world.skeletons)
        out = []
        offs = self.world.body_offsets()
        for k, skel in enumerate(self.world.skeletons):
            s = offs[k]
            e = s + skel.num_bodies
            out.append(
                {
                    key: val[s:e]
                    for key, val in body_params.items()
                    if val is not None
                }
            )
        return out

    def _chol_and_bias(self, q, v, body_params=None):
        """Per-skeleton Cholesky factors of M, bias C, and the shared
        world kinematics, all from ONE kinematics pass per skeleton
        (dynamics.mass_and_bias_fused). The L factors are reused by the
        smooth solve, the factored Delassus operator F = J L^-T, and the
        impulse back-substitution; the kinematics feed collision and
        constraint assembly — nothing recomputes FK."""
        w = self.world
        dtype = q.dtype
        nv = w.num_dofs
        g = jnp.asarray(w.gravity, dtype=dtype)
        bp = self._split_body_params(body_params)
        Ls = {}
        C = jnp.zeros(nv, dtype=dtype)
        T_list, J_list = [], []
        for k, (skel, (s, e)) in enumerate(zip(w.skeletons, w.dof_slices())):
            if skel.num_dofs == 0:
                from nimblephysics_tpu.dynamics.skeleton import (
                    full_kinematics,
                )

                kin = full_kinematics(skel, q[s:e])
                T_list.append(kin["T_wb"])
                J_list.append(
                    jnp.zeros((skel.num_bodies, 6, nv), dtype=dtype)
                )
                continue
            Mk, Ck, kin = mass_and_bias_fused(
                skel, q[s:e], v[s:e], gravity=g, body_params=bp[k]
            )
            Ls[k] = jnp.linalg.cholesky(Mk)
            C = C.at[s:e].set(Ck)
            T_list.append(kin["T_wb"])
            nb = skel.num_bodies
            Jfull = jnp.zeros((nb, 6, nv), dtype=dtype)
            Jfull = Jfull.at[:, :, s:e].set(kin["J_world"])
            J_list.append(Jfull)
        world_kin = {
            "T_wb": jnp.concatenate(T_list, axis=0),
            "J_world": jnp.concatenate(J_list, axis=0),
        }
        return Ls, C, world_kin

    def _minv_apply(self, Ls, x):
        """M^-1 x via the cached per-skeleton Cholesky factors."""
        w = self.world
        out = jnp.zeros_like(x)
        for k, (skel, (s, e)) in enumerate(zip(w.skeletons, w.dof_slices())):
            if skel.num_dofs == 0:
                continue
            y = jax.scipy.linalg.solve_triangular(Ls[k], x[s:e], lower=True)
            out = out.at[s:e].set(
                jax.scipy.linalg.solve_triangular(
                    Ls[k].T, y, lower=False
                )
            )
        return out

    def _passive(self, q, v):
        w = self.world
        out = jnp.zeros(w.num_dofs, dtype=q.dtype)
        for skel, (s, e) in zip(w.skeletons, w.dof_slices()):
            if skel.num_dofs == 0:
                continue
            out = out.at[s:e].set(passive_forces(skel, q[s:e], v[s:e]))
        return out

    def step(
        self,
        q: jnp.ndarray,
        v: jnp.ndarray,
        control: jnp.ndarray,
        z_warm: Optional[jnp.ndarray] = None,
        body_params: Optional[Dict] = None,
    ) -> StepResult:
        """One physics step. Pure; differentiable in (q, v, control) and,
        when given, in `body_params` ({"masses": (NB,), optional "coms"
        (NB,3), "inertias" (NB,3,3)} — the reference's WithRespectToMass /
        GROUP_COMS / GROUP_INERTIAS differentiation variables).

        `control` is a full generalized-force vector (use
        World.action_to_forces for RL-style action subsets).
        """
        w = self.world
        dt = w.time_step
        dtype = q.dtype
        nrows = self.assembler.num_rows
        C = self.collider.num_contacts

        # 1. Smooth dynamics -> pre-constraint velocity (kinematics shared
        # with collision and constraint assembly below).
        Ls, bias, kin = self._chol_and_bias(q, v, body_params)
        # Non-force actuators (servo/mimic/locked) consume their control
        # entry as a command, not a generalized force.
        if w.actuator_types:
            force_mask = np.ones(w.num_dofs)
            for d, act in w.actuator_types.items():
                if act["kind"] != "force":
                    force_mask[d] = 0.0
            tau = control * jnp.asarray(force_mask, dtype=dtype) + \
                self._passive(q, v)
        else:
            tau = control + self._passive(q, v)
        v_pre = v + dt * self._minv_apply(Ls, tau - bias)

        if nrows > 0:
            # 2. Collision at pre-step q; LCP on pre-constraint velocities.
            contacts = self.collider.collide(q, T_wb=kin["T_wb"])
            Jm, b, mu, valid = self.assembler.assemble(
                q, v_pre, contacts, kin["J_world"], T_wb=kin["T_wb"],
                control=control,
            )
            # Factored Delassus operator: F = J L^-T per skeleton block,
            # A = F F^T (+ cfm I). Never materialize the n x n matrix.
            F = jnp.zeros((nrows, w.num_dofs), dtype=dtype)
            for k, (skel, (s, e)) in enumerate(
                zip(w.skeletons, w.dof_slices())
            ):
                if skel.num_dofs == 0:
                    continue
                Fk = jax.scipy.linalg.solve_triangular(
                    Ls[k], Jm[:, s:e].T, lower=True
                ).T
                F = F.at[:, s:e].set(Fk)
            if z_warm is None:
                z_warm = jnp.zeros(nrows, dtype=dtype)
            z = boxed_lcp(
                self.assembler.meta, F, b, mu, z_warm, cfm=w.solver.cfm,
                fallback_cfm=w.solver.fallback_cfm,
            )
            # 3. Velocity update from constraint impulses:
            # M^-1 J^T z = L^-T (F^T z) per skeleton block.
            u = F.T @ z
            dv = jnp.zeros_like(v_pre)
            for k, (skel, (s, e)) in enumerate(
                zip(w.skeletons, w.dof_slices())
            ):
                if skel.num_dofs == 0:
                    continue
                dv = dv.at[s:e].set(
                    jax.scipy.linalg.solve_triangular(
                        Ls[k].T, u[s:e], lower=False
                    )
                )
            v_next = v_pre + dv
            # World-frame contact force on body A per contact (diagnostic;
            # reference: Contact.force filled in applyImpulse).
            if C > 0:
                from nimblephysics_tpu.constraint.assembly import tangent_basis

                t1, t2 = tangent_basis(contacts.normal)
                zc = z[: 3 * C].reshape(C, 3)
                f_world = (
                    contacts.normal * zc[:, 0:1]
                    + t1 * zc[:, 1:2]
                    + t2 * zc[:, 2:3]
                ) / dt
            else:
                f_world = jnp.zeros((0, 3), dtype=dtype)
            cp, cn, cd = contacts.point, contacts.normal, contacts.depth
        else:
            v_next = v_pre
            z = jnp.zeros((0,), dtype=dtype)
            cp = jnp.zeros((0, 3), dtype=dtype)
            cn = jnp.zeros((0, 3), dtype=dtype)
            cd = jnp.zeros((0,), dtype=dtype)
            f_world = jnp.zeros((0, 3), dtype=dtype)

        # 4. Position integration (parallel scheme: pre-step velocity v_t).
        v_for_pos = v if w.parallel_velocity_and_position_updates else v_next
        q_next = world_integrate_positions(w, q, v_for_pos, dt)

        return StepResult(
            q=q_next,
            v=v_next,
            v_pre=v_pre,
            impulses=z,
            contact_points=cp,
            contact_normals=cn,
            contact_depths=cd,
            contact_forces=f_world,
        )

    # -- RL-style state/action step (reference: World.hpp:471-523) --------

    def state_step(
        self,
        state: jnp.ndarray,
        action: jnp.ndarray,
        masses: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        nv = self.world.num_dofs
        if state.shape[-1] != 2 * nv:
            raise ValueError(
                f"state has {state.shape[-1]} entries; world "
                f"{self.world.name!r} expects 2*num_dofs = {2 * nv} "
                "([positions; velocities])"
            )
        if action.shape[-1] != self.world.action_size:
            raise ValueError(
                f"action has {action.shape[-1]} entries; world "
                f"{self.world.name!r} expects action_size = "
                f"{self.world.action_size} (see World.set_action_space)"
            )
        q, v = state[:nv], state[nv:]
        control = self.world.action_to_forces(action)
        bp = None if masses is None else {"masses": masses}
        res = self.step(q, v, control, body_params=bp)
        return jnp.concatenate([res.q, res.v])


def get_engine(world: World) -> Engine:
    """One static step plan per World, cached ON the world instance.

    (A module-level dict keyed by id() would leak every World forever and
    could alias a recycled address; world <-> engine is a plain reference
    cycle the garbage collector handles.)
    """
    eng = getattr(world, "_engine_cache", None)
    if eng is None:
        eng = Engine(world)
        world._engine_cache = eng
    return eng


def timestep(
    world: World,
    state: jnp.ndarray,
    action: jnp.ndarray,
    masses: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """`nimble.timestep(world, state, action, mass)` parity entry point.

    Reference: python/nimblephysics/timestep.py:63-69 — one differentiable
    physics step as a pure function of [positions; velocities], action and
    (optionally) per-body masses. Compose freely with jit/vmap/grad/scan.
    """
    return get_engine(world).state_step(state, action, masses)
