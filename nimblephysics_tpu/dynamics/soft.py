"""Soft bodies: particle clouds spring-anchored to rigid bodies.

TPU-native re-design of the reference soft-body tier
(dart/dynamics/SoftBodyNode.cpp + PointMass + SoftMeshShape,
dart/constraint/SoftContactConstraint.hpp:57): a SoftBody is a set of
point masses attached to one rigid body by anchor springs (the reference
attaches PointMasses to the parent BodyNode structure) and to each other
by an edge spring network; contacts are per-particle.

Key structural difference exploited for TPU: point masses are DIAGONAL in
the contact Delassus operator (each particle is an independent mass), so
their contact complementarity has an exact CLOSED-FORM per-particle
solution (normal impulse + Coulomb cone projection) — no rows in the
global LCP, no iteration, fully vectorized and differentiable. The
reference solves the same rows inside its big LCP; the per-particle solve
is exact for the same physics. Unlike the reference (which does NOT
differentiate soft bodies), this tier is differentiable end to end.

Two-way coupling: anchor-spring reactions on the rigid body enter the
rigid step as generalized forces through the body Jacobian.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.dynamics import shapes as SH
from nimblephysics_tpu.simulation.world import World, world_full_kinematics


@dataclasses.dataclass(frozen=True, eq=False)
class SoftBodySpec:
    """Static soft-body description (identity hash, jit-static).

    Reference parity: SoftBodyNode::UniqueProperties (point masses, rest
    positions, stiffnesses, damping; SoftBodyNodeHelper builders).
    """

    body: int  # global rigid body index the cloud is anchored to
    rest_positions: np.ndarray  # (P, 3) in the body frame
    edges: np.ndarray  # (E, 2) int — spring network
    vertex_mass: float = 0.01
    edge_stiffness: float = 200.0
    edge_damping: float = 0.5
    # Anchor springs tie each particle to its body-frame rest pose
    # (reference: point masses structurally attached to the BodyNode).
    anchor_stiffness: float = 50.0
    anchor_damping: float = 0.5
    friction: float = 0.8
    restitution: float = 0.0

    @property
    def num_points(self) -> int:
        return len(self.rest_positions)


def make_soft_box(
    body: int,
    size=(0.2, 0.2, 0.2),
    grid=(3, 3, 3),
    total_mass: float = 0.3,
    **kw,
) -> SoftBodySpec:
    """Grid-of-particles box (reference: SoftBodyNodeHelper::setBox)."""
    nx, ny, nz = grid
    xs = [np.linspace(-s / 2, s / 2, n) for s, n in zip(size, grid)]
    pts = np.stack(
        np.meshgrid(*xs, indexing="ij"), axis=-1
    ).reshape(-1, 3)
    idx = np.arange(nx * ny * nz).reshape(nx, ny, nz)
    edges = []
    for i in range(nx):
        for j in range(ny):
            for k in range(nz):
                for di, dj, dk in (
                    (1, 0, 0), (0, 1, 0), (0, 0, 1),
                    (1, 1, 0), (1, 0, 1), (0, 1, 1), (1, 1, 1),
                ):
                    i2, j2, k2 = i + di, j + dj, k + dk
                    if i2 < nx and j2 < ny and k2 < nz:
                        edges.append((idx[i, j, k], idx[i2, j2, k2]))
    return SoftBodySpec(
        body=body,
        rest_positions=pts,
        edges=np.asarray(edges, dtype=np.int64),
        vertex_mass=total_mass / len(pts),
        **kw,
    )


def grid_skin_faces(grid) -> np.ndarray:
    """Triangulated SURFACE of a grid-of-particles box: the SoftMeshShape
    skin (reference: SoftBodyNodeHelper::setBox builds the box's surface
    mesh over the same particle grid). Returns (F, 3) int indices into
    the flattened (nx*ny*nz) particle array; vertex positions come from
    the live SoftState, so the skin deforms with the cloud."""
    nx, ny, nz = grid
    idx = np.arange(nx * ny * nz).reshape(nx, ny, nz)
    faces = []

    def quad(a, b, c, d):
        faces.append((a, b, c))
        faces.append((a, c, d))

    for j in range(ny - 1):
        for k in range(nz - 1):
            quad(idx[0, j, k], idx[0, j, k + 1],
                 idx[0, j + 1, k + 1], idx[0, j + 1, k])
            quad(idx[-1, j, k], idx[-1, j + 1, k],
                 idx[-1, j + 1, k + 1], idx[-1, j, k + 1])
    for i in range(nx - 1):
        for k in range(nz - 1):
            quad(idx[i, 0, k], idx[i + 1, 0, k],
                 idx[i + 1, 0, k + 1], idx[i, 0, k + 1])
            quad(idx[i, -1, k], idx[i, -1, k + 1],
                 idx[i + 1, -1, k + 1], idx[i + 1, -1, k])
    for i in range(nx - 1):
        for j in range(ny - 1):
            quad(idx[i, j, 0], idx[i, j + 1, 0],
                 idx[i + 1, j + 1, 0], idx[i + 1, j, 0])
            quad(idx[i, j, -1], idx[i + 1, j, -1],
                 idx[i + 1, j + 1, -1], idx[i, j + 1, -1])
    return np.asarray(faces, dtype=np.int64)


class SoftState(NamedTuple):
    """Per-cloud particle state pytree (world frame)."""

    pos: jnp.ndarray  # (P, 3)
    vel: jnp.ndarray  # (P, 3)


class SoftWorld:
    """Rigid engine + soft particle clouds, stepped together.

    step(q, v, softs, control) advances BOTH: soft reactions enter the
    rigid solve as generalized forces; particles then integrate with
    spring/anchor/gravity forces and exact per-particle contact.
    """

    def __init__(self, world: World, specs: Sequence[SoftBodySpec]):
        from nimblephysics_tpu.neural.timestep import get_engine

        self.world = world
        self.engine = get_engine(world)
        self.specs = list(specs)
        # Static collision plan for particles: every collidable
        # plane/sphere/box shape of the rigid world.
        self.contact_shapes = []
        off = world.body_offsets()
        for si, skel in enumerate(world.skeletons):
            for bi, body in enumerate(skel.bodies):
                for shape in body.shapes:
                    if shape.collidable and shape.shape_type in (
                        SH.PLANE, SH.SPHERE, SH.BOX,
                    ):
                        self.contact_shapes.append((off[si] + bi, shape))

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other

    def init_state(self, q: jnp.ndarray) -> List[SoftState]:
        kin = world_full_kinematics(self.world, q, jnp.zeros_like(q))
        out = []
        for spec in self.specs:
            T = kin["T_wb"][spec.body]
            rest = jnp.asarray(spec.rest_positions, dtype=q.dtype)
            pos = rest @ T[:3, :3].T + T[:3, 3]
            out.append(SoftState(pos=pos, vel=jnp.zeros_like(pos)))
        return out

    # ------------------------------------------------------------------

    def _anchor_forces(self, spec, T_wb, V_body, state, dtype):
        """Anchor spring/damper forces on particles + the reaction wrench
        (world, about origin) on the rigid body."""
        T = T_wb[spec.body]
        R, p = T[:3, :3], T[:3, 3]
        rest_w = (
            jnp.asarray(spec.rest_positions, dtype=dtype) @ R.T + p
        )  # (P, 3)
        # Anchor-point world velocity from the body twist.
        V = V_body[spec.body]  # world-frame twist about origin [w; v]
        w_, v_ = V[:3], V[3:]
        anchor_vel = v_ + jnp.cross(
            jnp.broadcast_to(w_, rest_w.shape), rest_w
        )
        f = spec.anchor_stiffness * (rest_w - state.pos) + (
            spec.anchor_damping * (anchor_vel - state.vel)
        )
        # Reaction on the body: -f at each anchor point.
        torque = jnp.sum(jnp.cross(rest_w, -f), axis=0)
        force = jnp.sum(-f, axis=0)
        wrench = jnp.concatenate([torque, force])
        return f, wrench

    def _edge_forces(self, spec, state, dtype):
        e = spec.edges
        d = state.pos[e[:, 1]] - state.pos[e[:, 0]]
        rest = jnp.asarray(
            np.linalg.norm(
                spec.rest_positions[e[:, 1]] - spec.rest_positions[e[:, 0]],
                axis=1,
            ),
            dtype=dtype,
        )
        # Max-guarded norm: guard the NORM, not the components (adding eps
        # per component biases degenerate edges toward (1,1,1)).
        ln = jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=1), 1e-24))
        dirn = d / ln[:, None]
        rel_v = state.vel[e[:, 1]] - state.vel[e[:, 0]]
        fmag = spec.edge_stiffness * (ln - rest) + (
            spec.edge_damping * jnp.sum(rel_v * dirn, axis=1)
        )
        fe = fmag[:, None] * dirn  # force on endpoint 0 (toward 1)
        F = jnp.zeros_like(state.pos)
        F = F.at[e[:, 0]].add(fe)
        F = F.at[e[:, 1]].add(-fe)
        return F

    def _particle_contacts(self, spec, pos, vel, T_wb, dtype):
        """Exact per-particle contact resolve against plane/sphere/box
        shapes (the SoftContactConstraint analog: the per-particle
        Delassus is diagonal, so normal impulse + Coulomb projection is
        the EXACT LCP solution)."""
        from nimblephysics_tpu.math import lie

        for body, shape in self.contact_shapes:
            T = T_wb[body] @ jnp.asarray(shape.T_offset, dtype=dtype)
            if shape.shape_type == SH.PLANE:
                prm = np.asarray(shape.size, dtype=np.float64).reshape(-1)
                n_l = prm[:3] / np.linalg.norm(prm[:3])
                d_l = float(prm[3]) if prm.size > 3 else 0.0
                n = lie.transform_vector(T, jnp.asarray(n_l, dtype=dtype))
                d = d_l + jnp.dot(n, T[:3, 3])
                depth = d - pos @ n  # > 0 means below the plane
            elif shape.shape_type == SH.SPHERE:
                r = float(np.asarray(shape.size).reshape(-1)[0])
                delta = pos - T[:3, 3]
                dist = jnp.sqrt(
                    jnp.maximum(jnp.sum(delta * delta, axis=1), 1e-24)
                )
                n = delta / dist[:, None]
                depth = r - dist
            else:  # BOX
                half = jnp.asarray(shape.size, dtype=dtype) / 2.0
                local = (pos - T[:3, 3]) @ T[:3, :3]
                qd = jnp.abs(local) - half
                inside = jnp.all(qd < 0, axis=1)
                ax = jnp.argmax(qd, axis=1)
                sgn = jnp.sign(
                    jnp.take_along_axis(local, ax[:, None], 1)[:, 0]
                )
                n_loc = jax.nn.one_hot(ax, 3, dtype=dtype) * sgn[:, None]
                n = n_loc @ T[:3, :3].T
                depth = jnp.where(inside, -jnp.max(qd, axis=1), -1.0)

            if shape.shape_type == SH.PLANE:
                n_b = jnp.broadcast_to(n, pos.shape)
            else:
                n_b = n
            touching = depth > 0.0
            v_n = jnp.sum(vel * n_b, axis=1)
            # Normal impulse (exact diagonal LCP): cancel approach speed
            # (+ restitution bounce).
            bounce = spec.restitution * jnp.maximum(-v_n, 0.0)
            dv_n = jnp.where(touching, jnp.maximum(-(v_n - bounce), 0.0), 0.0)
            v_t = vel - v_n[:, None] * n_b
            vt_norm = jnp.linalg.norm(v_t + 1e-12, axis=1)
            # Coulomb cone: |j_t| <= mu j_n (impulse per unit mass).
            scale = jnp.clip(
                spec.friction * dv_n / jnp.maximum(vt_norm, 1e-9), 0.0, 1.0
            )
            vel = vel + dv_n[:, None] * n_b - (
                jnp.where(touching, scale, 0.0)[:, None] * v_t
            )
            # Positional projection out of penetration (Baumgarte-free).
            pos = pos + jnp.where(touching, depth, 0.0)[:, None] * n_b
        return pos, vel

    # ------------------------------------------------------------------

    def step(
        self,
        q: jnp.ndarray,
        v: jnp.ndarray,
        softs: Sequence[SoftState],
        control: jnp.ndarray,
        z_warm: Optional[jnp.ndarray] = None,
    ):
        """One coupled step: returns (StepResult, [SoftState])."""
        w = self.world
        dt = w.time_step
        dtype = q.dtype
        kin = world_full_kinematics(w, q, v)
        T_wb = kin["T_wb"]
        J_world = kin["J_world"]
        # World-frame body twists about the origin: J_world @ v.
        V_body = jnp.einsum("bin,n->bi", J_world, v)

        # 1. Soft reactions -> generalized forces on the rigid step.
        tau_react = jnp.zeros_like(control)
        anchor_fs = []
        for spec, state in zip(self.specs, softs):
            f, wrench = self._anchor_forces(spec, T_wb, V_body, state, dtype)
            anchor_fs.append(f)
            tau_react = tau_react + J_world[spec.body].T @ wrench

        r = self.engine.step(q, v, control + tau_react, z_warm=z_warm)

        # 2. Particle integration (semi-implicit Euler + exact contact).
        g = jnp.asarray(w.gravity, dtype=dtype)
        new_softs = []
        for spec, state, f_anchor in zip(self.specs, softs, anchor_fs):
            F = f_anchor + self._edge_forces(spec, state, dtype)
            acc = F / spec.vertex_mass + g
            vel = state.vel + dt * acc
            pos = state.pos + dt * vel
            pos, vel = self._particle_contacts(spec, pos, vel, T_wb, dtype)
            new_softs.append(SoftState(pos=pos, vel=vel))
        return r, new_softs
