"""BackpropSnapshot: the six timestep Jacobians + reverse-mode backprop.

Reference parity: dart/neural/BackpropSnapshot.hpp/.cpp — the object
returned by neural::forwardPass(world) carrying pos-pos, pos-vel, vel-pos,
vel-vel, force-vel and mass-vel Jacobians plus `backprop`/`backpropState`.

TPU-native design: the snapshot wraps the pure step function. Jacobians
are jacfwd/jacrev products of the SAME function the forward pass ran (the
analytical LCP gradients live inside boxed_lcp), computed lazily and
cached. `backprop` is a vjp — one reverse pass, no dense Jacobians, which
is what the reference's backprop() does with hand-written Jt products
(BackpropSnapshot.cpp:121-180).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.neural.timestep import Engine, get_engine
from nimblephysics_tpu.simulation.world import World


class LossGradient(NamedTuple):
    """Reference parity: neural::LossGradient (lossWrtPosition/Velocity/
    Torque) and LossGradientHighLevelAPI (lossWrtState/Action/Mass)."""

    loss_wrt_position: jnp.ndarray
    loss_wrt_velocity: jnp.ndarray
    loss_wrt_torque: jnp.ndarray
    loss_wrt_mass: Optional[jnp.ndarray] = None


class BackpropSnapshot:
    """Snapshot of one differentiable step at (q, v, control[, masses]).

    All Jacobians are evaluated at the snapshot point and cached
    (reference: the mCached* members of BackpropSnapshot).
    """

    def __init__(
        self,
        world: World,
        q: jnp.ndarray,
        v: jnp.ndarray,
        control: jnp.ndarray,
        masses: Optional[jnp.ndarray] = None,
        scales: Optional[jnp.ndarray] = None,
        clip_loss_gradients_to_bounds: bool = False,
    ):
        self.world = world
        self.engine = get_engine(world)
        self.q, self.v, self.control = q, v, control
        self.masses = masses
        self.scales = scales
        self.clip = clip_loss_gradients_to_bounds
        self._cache: Dict[str, jnp.ndarray] = {}

        res = self.engine.step(
            q, v, control, body_params=self._bp(masses, scales)
        )
        self.result = res
        self.q_next, self.v_next = res.q, res.v
        # Reference parity: pre-constraint velocity snapshot
        # (mPreConstraintVelocities).
        self.pre_constraint_velocity = res.v_pre

    # -- internal pure functions -------------------------------------------

    @staticmethod
    def _bp(masses, scales):
        bp = {}
        if masses is not None:
            bp["masses"] = masses
        if scales is not None:
            bp["scales"] = scales
        return bp or None

    def _step_qv(self, q, v, control, masses, scales=None):
        r = self.engine.step(
            q, v, control, body_params=self._bp(masses, scales)
        )
        return r.q, r.v

    def _jac(self, key: str, argnum: int, out_index: int) -> jnp.ndarray:
        if key not in self._cache:
            f = lambda q, v, u, m, s: self._step_qv(q, v, u, m, s)[out_index]
            args = (self.q, self.v, self.control, self.masses, self.scales)
            if argnum == 3 and self.masses is None:
                raise ValueError(
                    "mass Jacobians require timestep masses "
                    "(pass masses= to forward_pass)"
                )
            if argnum == 4 and self.scales is None:
                raise ValueError(
                    "scale Jacobians require body scales "
                    "(pass scales= to forward_pass)"
                )
            self._cache[key] = jax.jacrev(f, argnums=argnum)(*args)
        return self._cache[key]

    # -- the six Jacobians (reference: BackpropSnapshot.hpp:215-255) --------

    def get_pos_pos_jacobian(self) -> jnp.ndarray:
        return self._jac("pospos", 0, 0)

    def get_pos_vel_jacobian(self) -> jnp.ndarray:
        return self._jac("posvel", 0, 1)

    def get_vel_pos_jacobian(self) -> jnp.ndarray:
        return self._jac("velpos", 1, 0)

    def get_vel_vel_jacobian(self) -> jnp.ndarray:
        return self._jac("velvel", 1, 1)

    def get_force_vel_jacobian(self) -> jnp.ndarray:
        return self._jac("forcevel", 2, 1)

    def get_force_pos_jacobian(self) -> jnp.ndarray:
        return self._jac("forcepos", 2, 0)

    def get_mass_vel_jacobian(self) -> jnp.ndarray:
        return self._jac("massvel", 3, 1)

    # GROUP_SCALES differentiation (reference: WithRespectTo.hpp:62-75,
    # Skeleton body-scaling groups, Skeleton.hpp:993-1031). Output shape
    # (nv, nb, 3): sensitivity to each body's per-axis dimension scale.
    def get_scale_vel_jacobian(self) -> jnp.ndarray:
        return self._jac("scalevel", 4, 1)

    def get_scale_pos_jacobian(self) -> jnp.ndarray:
        return self._jac("scalepos", 4, 0)

    # -- RL-space Jacobians (reference: BackpropSnapshot.hpp:110-114) -------

    def get_state_jacobian(self) -> jnp.ndarray:
        """d(next_state)/d(state), (2nv, 2nv).

        Honors the world's gradient debug modes (reference:
        World::setUseFDOverride / setSlowDebugResultsAgainstFD,
        World.hpp:700-713): FD override returns the finite-difference
        Jacobian; slow-debug computes both and raises with a repro when
        they diverge beyond world.fd_debug_tolerance."""
        nv = self.world.num_dofs

        def f(state):
            q2, v2 = self._step_qv(
                state[:nv], state[nv:], self.control, self.masses,
                self.scales,
            )
            return jnp.concatenate([q2, v2])

        if self.world.use_fd_override:
            return jnp.asarray(self.finite_difference_state_jacobian())
        key = "state"
        if key not in self._cache:
            self._cache[key] = jax.jacrev(f)(jnp.concatenate([self.q, self.v]))
        J = self._cache[key]
        if self.world.slow_debug_results_against_fd:
            fd = self.finite_difference_state_jacobian()
            err = float(jnp.max(jnp.abs(J - fd)))
            if err > self.world.fd_debug_tolerance:
                raise AssertionError(
                    "[slowDebugResultsAgainstFD] analytical state Jacobian "
                    f"diverges from finite differences by {err:.3e} "
                    f"(tolerance {self.world.fd_debug_tolerance:.1e}).\n"
                    "Repro:\n"
                    f"  q = {np.asarray(self.q).tolist()}\n"
                    f"  v = {np.asarray(self.v).tolist()}\n"
                    f"  control = {np.asarray(self.control).tolist()}\n"
                    f"  world = {self.world!r}"
                )
        return J

    def get_action_jacobian(self) -> jnp.ndarray:
        """d(next_state)/d(action), (2nv, na)."""

        def f(action):
            control = self.world.action_to_forces(action)
            q2, v2 = self._step_qv(self.q, self.v, control, self.masses, self.scales)
            return jnp.concatenate([q2, v2])

        key = "action"
        if key not in self._cache:
            a0 = self.world.forces_to_action(self.control)
            self._cache[key] = jax.jacrev(f)(a0)
        return self._cache[key]

    # -- reverse-mode backprop (reference: backprop(), cpp:121) -------------

    def backprop(
        self,
        loss_wrt_next_position: jnp.ndarray,
        loss_wrt_next_velocity: jnp.ndarray,
    ) -> LossGradient:
        """One reverse pass: J^T products via vjp (no dense Jacobians)."""
        args = (self.q, self.v, self.control)
        if self.masses is not None:
            f = lambda q, v, u, m: self._step_qv(q, v, u, m, self.scales)
            _, vjp_fn = jax.vjp(f, *args, self.masses)
            gq, gv, gu, gm = vjp_fn(
                (loss_wrt_next_position, loss_wrt_next_velocity)
            )
        else:
            f = lambda q, v, u: self._step_qv(q, v, u, None, self.scales)
            _, vjp_fn = jax.vjp(f, *args)
            gq, gv, gu = vjp_fn(
                (loss_wrt_next_position, loss_wrt_next_velocity)
            )
            gm = None
        if self.clip:
            gq, gv = self._clip_to_bounds(gq, gv)
        return LossGradient(gq, gv, gu, gm)

    def backprop_state(self, loss_wrt_next_state: jnp.ndarray):
        """Reference parity: backpropState (BackpropSnapshot.hpp:53) —
        returns (lossWrtState, lossWrtAction[, lossWrtMass])."""
        nv = self.world.num_dofs
        g = self.backprop(
            loss_wrt_next_state[:nv], loss_wrt_next_state[nv:]
        )
        loss_wrt_state = jnp.concatenate(
            [g.loss_wrt_position, g.loss_wrt_velocity]
        )
        loss_wrt_action = self.world.forces_to_action(g.loss_wrt_torque)
        return loss_wrt_state, loss_wrt_action, g.loss_wrt_mass

    def _clip_to_bounds(self, gq, gv):
        """Reference parity: clipLossGradientsToBounds
        (BackpropSnapshot.hpp:61) — zero the gradient where the state sits
        at a position/velocity bound and the gradient pushes outward."""
        lo = jnp.asarray(self.world.position_lower_limits(), dtype=gq.dtype)
        hi = jnp.asarray(self.world.position_upper_limits(), dtype=gq.dtype)
        at_lo = (self.q <= lo) & (gq > 0)
        at_hi = (self.q >= hi) & (gq < 0)
        gq = jnp.where(at_lo | at_hi, 0.0, gq)
        vlim = jnp.asarray(self.world.velocity_limits(), dtype=gv.dtype)
        at_vlo = (self.v <= -vlim) & (gv > 0)
        at_vhi = (self.v >= vlim) & (gv < 0)
        gv = jnp.where(at_vlo | at_vhi, 0.0, gv)
        return gq, gv

    # -- finite-difference counterparts (reference: hpp:215-255) ------------

    def finite_difference_state_jacobian(self) -> np.ndarray:
        from nimblephysics_tpu.math import finite_difference_jacobian

        nv = self.world.num_dofs

        @jax.jit
        def f(state):
            q2, v2 = self._step_qv(
                state[:nv], state[nv:], self.control, self.masses,
                self.scales,
            )
            return jnp.concatenate([q2, v2])

        x0 = np.asarray(jnp.concatenate([self.q, self.v]))
        return finite_difference_jacobian(
            lambda x: np.asarray(f(jnp.asarray(x))), x0
        )

    def benchmark_jacobians(self, samples: int = 10):
        """Reference parity: BackpropSnapshot::benchmarkJacobians
        (cpp:2027) — time each analytical Jacobian vs its FD counterpart."""
        import time

        out = {}
        for name, fn in [
            ("pos-pos", self.get_pos_pos_jacobian),
            ("pos-vel", self.get_pos_vel_jacobian),
            ("vel-pos", self.get_vel_pos_jacobian),
            ("vel-vel", self.get_vel_vel_jacobian),
            ("force-vel", self.get_force_vel_jacobian),
        ]:
            self._cache.clear()
            jax.block_until_ready(fn())  # compile
            t0 = time.perf_counter()
            for _ in range(samples):
                self._cache.clear()
                jax.block_until_ready(fn())
            out[name] = (time.perf_counter() - t0) / samples
        return out


def forward_pass(
    world: World,
    state: Optional[jnp.ndarray] = None,
    action: Optional[jnp.ndarray] = None,
    masses: Optional[jnp.ndarray] = None,
    scales: Optional[jnp.ndarray] = None,
    clip_loss_gradients_to_bounds: bool = False,
) -> BackpropSnapshot:
    """Reference parity: neural::forwardPass(world) (NeuralUtils.cpp:26) —
    run one step and return a BackpropSnapshot. In this engine the world
    is static, so the state/action are explicit arguments."""
    nv = world.num_dofs
    if state is None:
        state = jnp.zeros(2 * nv)
    if action is None:
        action = jnp.zeros(world.action_size)
    control = world.action_to_forces(action)
    return BackpropSnapshot(
        world,
        state[:nv],
        state[nv:],
        control,
        masses=masses,
        scales=scales,
        clip_loss_gradients_to_bounds=clip_loss_gradients_to_bounds,
    )


class MappedBackpropSnapshot(BackpropSnapshot):
    """BackpropSnapshot with losses expressed in mapped spaces.

    Reference parity: neural::MappedBackpropSnapshot
    (MappedBackpropSnapshot.hpp:78) — gradients arrive in one or more
    Mapping spaces (e.g. body-space positions from an IKMapping) and are
    pulled back through the mapping Jacobians at the post-step state
    before the regular world-space backprop.
    """

    def __init__(self, world, q, v, control, mappings, **kw):
        super().__init__(world, q, v, control, **kw)
        self.mappings = dict(mappings)  # name -> Mapping

    def map_post_step(self, name: str):
        """Mapped positions/velocities of the post-step state."""
        m = self.mappings[name]
        return m.map_pos(self.q_next), m.map_vel(self.q_next, self.v_next)

    def backprop_mapped(self, name: str, loss_wrt_mapped_pos,
                        loss_wrt_mapped_vel=None) -> LossGradient:
        """Pull mapped-space gradients back to world space, then backprop."""
        m = self.mappings[name]
        _, vjp_pos = jax.vjp(m.map_pos, self.q_next)
        gq_next = vjp_pos(loss_wrt_mapped_pos)[0]
        gv_next = jnp.zeros_like(self.v_next)
        if loss_wrt_mapped_vel is not None:
            _, vjp_vel = jax.vjp(m.map_vel, self.q_next, self.v_next)
            gq2, gv2 = vjp_vel(loss_wrt_mapped_vel)
            gq_next = gq_next + gq2
            gv_next = gv_next + gv2
        return self.backprop(gq_next, gv_next)


def mapped_forward_pass(world, state, action, mappings, **kw
                        ) -> MappedBackpropSnapshot:
    """Reference parity: neural::mappedForwardPass (NeuralUtils.cpp:70)."""
    nv = world.num_dofs
    control = world.action_to_forces(action)
    return MappedBackpropSnapshot(
        world, state[:nv], state[nv:], control, mappings, **kw
    )
