"""Mappings: alternate loss spaces over world state.

Reference parity: dart/neural/Mapping.hpp:80-127 (map world state to
body-space positions/velocities with Jacobians both ways), IKMapping
(IKMapping.hpp:53 — addSpatialBodyNode/addLinearBodyNode/addAngularBodyNode),
IdentityMapping, and the python-side map_to_pos / map_to_vel autograd
functions (python/nimblephysics/mapping.py:8-94).

In this engine a mapping is a pure function of (q, v); the inverse mapping
(used by setState in mapped space) is damped-least-squares via the mapping
Jacobian, and everything differentiates with JAX AD.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from nimblephysics_tpu.math import lie
from nimblephysics_tpu.simulation.world import World, world_fk, world_full_kinematics


class IdentityMapping:
    """Reference parity: neural::IdentityMapping — mapped space == world
    joint space."""

    def __init__(self, world: World):
        self.world = world

    @property
    def pos_dim(self):
        return self.world.num_dofs

    def map_pos(self, q):
        return q

    def map_vel(self, q, v):
        return v

    def map_pos_jacobian(self, q):
        return jnp.eye(self.world.num_dofs, dtype=q.dtype)


class IKMapping:
    """Body-space mapping: stack spatial/linear/angular coordinates of
    chosen bodies (reference: neural::IKMapping, IKMapping.hpp:53)."""

    SPATIAL = "spatial"
    LINEAR = "linear"
    ANGULAR = "angular"
    COM = "com"

    def __init__(self, world: World):
        self.world = world
        self.entries: List[Tuple[str, int]] = []

    def add_spatial_body_node(self, body_index: int):
        self.entries.append((self.SPATIAL, body_index))
        return self

    def add_linear_body_node(self, body_index: int):
        self.entries.append((self.LINEAR, body_index))
        return self

    def add_angular_body_node(self, body_index: int):
        self.entries.append((self.ANGULAR, body_index))
        return self

    @property
    def pos_dim(self) -> int:
        return sum(
            6 if k == self.SPATIAL else 3 for k, _ in self.entries
        )

    # -- forward maps --------------------------------------------------------

    def map_pos(self, q: jnp.ndarray) -> jnp.ndarray:
        """World positions -> mapped positions (body poses)."""
        T = world_fk(self.world, q)
        parts = []
        for kind, b in self.entries:
            if kind == self.SPATIAL:
                w = lie.log_map_rot(T[b, :3, :3])
                parts.append(jnp.concatenate([w, T[b, :3, 3]]))
            elif kind == self.LINEAR:
                parts.append(T[b, :3, 3])
            elif kind == self.ANGULAR:
                parts.append(lie.log_map_rot(T[b, :3, :3]))
        return jnp.concatenate(parts)

    def map_vel(self, q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
        """World velocities -> mapped velocities (exact: jvp of map_pos)."""
        return jax.jvp(self.map_pos, (q,), (v,))[1]

    # -- Jacobians (reference: Mapping::getRealPosToMappedPosJac etc.) ------

    def map_pos_jacobian(self, q: jnp.ndarray) -> jnp.ndarray:
        return jax.jacfwd(self.map_pos)(q)

    def inverse_map_pos(
        self, target: jnp.ndarray, q_init: jnp.ndarray,
        iterations: int = 20, damping: float = 1e-6
    ) -> jnp.ndarray:
        """Mapped positions -> world positions: damped Gauss-Newton IK
        (reference analog: the setPositions path of IKMapping, which runs
        an IK solve). Fixed iterations -> jit/vmap friendly."""

        def body(q, _):
            r = self.map_pos(q) - target
            J = self.map_pos_jacobian(q)
            JtJ = J.T @ J + damping * jnp.eye(J.shape[1], dtype=q.dtype)
            dq = jnp.linalg.solve(JtJ, J.T @ r)
            return q - dq, None

        q, _ = jax.lax.scan(body, q_init, None, length=iterations)
        return q


def map_to_pos(world: World, mapping, state: jnp.ndarray) -> jnp.ndarray:
    """Reference parity: nimble.map_to_pos (python/nimblephysics/
    mapping.py:8) — mapped positions of a world state; differentiable."""
    nv = world.num_dofs
    return mapping.map_pos(state[:nv])


def map_to_vel(world: World, mapping, state: jnp.ndarray) -> jnp.ndarray:
    """Reference parity: nimble.map_to_vel (mapping.py:50)."""
    nv = world.num_dofs
    return mapping.map_vel(state[:nv], state[nv:])


def convert_joint_space_to_world_space(
    world: World, q_trajectory: jnp.ndarray, body_indices=None, what="pos"
) -> jnp.ndarray:
    """Batch conversion of joint trajectories to world-space body poses.

    Reference parity: neural::convertJointSpaceToWorldSpace
    (NeuralUtils.hpp:88-140). q_trajectory: (T, nq) -> (T, 3*nb or 6*nb).
    Differentiable; backprop comes free with jax.grad.
    """
    if body_indices is None:
        body_indices = list(range(world.num_bodies))

    def one(q):
        T = world_fk(world, q)
        parts = []
        for b in body_indices:
            if what == "pos":
                parts.append(T[b, :3, 3])
            elif what == "spatial":
                parts.append(
                    jnp.concatenate(
                        [lie.log_map_rot(T[b, :3, :3]), T[b, :3, 3]]
                    )
                )
        return jnp.concatenate(parts)

    return jax.vmap(one)(q_trajectory)


class RestorableSnapshot:
    """Reference parity: neural::RestorableSnapshot
    (RestorableSnapshot.hpp:19) — in a functional engine state never
    mutates, so this is a plain value capture kept for API familiarity."""

    def __init__(self, world: World, state: jnp.ndarray):
        self.world = world
        self.state = state

    def restore(self) -> jnp.ndarray:
        return self.state
