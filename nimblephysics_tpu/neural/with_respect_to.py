"""WithRespectTo: first-class differentiation variables.

Reference parity: dart/neural/WithRespectTo.hpp:62-75 — POSITION, VELOCITY,
FORCE, ACCELERATION, GROUP_MASSES, GROUP_COMS, GROUP_INERTIAS (+
GROUP_SCALES / LINEARIZED_MASSES with the biomechanics tier). In this
engine these are selectors that extract/insert the corresponding leaf of
the pure step function's inputs, so `jacobian_wrt(world, f, wrt)` is a
thin jacrev dispatch.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from nimblephysics_tpu.simulation.world import World


@dataclasses.dataclass(frozen=True)
class WithRespectTo:
    name: str

    def __repr__(self):
        return f"WithRespectTo.{self.name}"


POSITION = WithRespectTo("POSITION")
VELOCITY = WithRespectTo("VELOCITY")
FORCE = WithRespectTo("FORCE")
ACCELERATION = WithRespectTo("ACCELERATION")
GROUP_MASSES = WithRespectTo("GROUP_MASSES")
GROUP_COMS = WithRespectTo("GROUP_COMS")
GROUP_INERTIAS = WithRespectTo("GROUP_INERTIAS")
GROUP_SCALES = WithRespectTo("GROUP_SCALES")  # biomechanics tier
LINEARIZED_MASSES = WithRespectTo("LINEARIZED_MASSES")  # biomechanics tier


def dims(world: World, wrt: WithRespectTo) -> int:
    """Reference parity: WithRespectTo::dim(world)."""
    nv = world.num_dofs
    nb = world.num_bodies
    return {
        "POSITION": nv,
        "VELOCITY": nv,
        "FORCE": nv,
        "ACCELERATION": nv,
        "GROUP_MASSES": nb,
        "GROUP_COMS": 3 * nb,
        "GROUP_INERTIAS": 9 * nb,
        "GROUP_SCALES": 3 * nb,
        "LINEARIZED_MASSES": 4 * nb,
    }[wrt.name]


def jacobian_wrt(
    world: World,
    f: Callable,
    wrt: WithRespectTo,
    q: jnp.ndarray,
    v: jnp.ndarray,
    control: jnp.ndarray,
    body_params: Optional[dict] = None,
):
    """d f / d wrt at (q, v, control, body_params), where f has signature
    f(q, v, control, body_params) -> array. The universal entry point the
    reference threads through every Jacobian routine
    (Skeleton::getJacobianOfC(wrt)-style APIs)."""
    from nimblephysics_tpu.dynamics.skeleton import default_body_params

    if body_params is None and wrt.name.startswith("GROUP"):
        bp_parts = []
        for skel in world.skeletons:
            bp_parts.append(default_body_params(skel, dtype=q.dtype))
        body_params = {
            "masses": jnp.concatenate([p["masses"] for p in bp_parts]),
            "coms": jnp.concatenate([p["coms"] for p in bp_parts]),
            "inertias": jnp.concatenate([p["inertias"] for p in bp_parts]),
        }

    if wrt is POSITION:
        return jax.jacrev(lambda x: f(x, v, control, body_params))(q)
    if wrt is VELOCITY:
        return jax.jacrev(lambda x: f(q, x, control, body_params))(v)
    if wrt is FORCE:
        return jax.jacrev(lambda x: f(q, v, x, body_params))(control)
    if wrt is GROUP_MASSES:
        return jax.jacrev(
            lambda m: f(q, v, control, {**body_params, "masses": m})
        )(body_params["masses"])
    if wrt is GROUP_COMS:
        J = jax.jacrev(
            lambda c: f(q, v, control, {**body_params, "coms": c})
        )(body_params["coms"])
        return J.reshape(J.shape[0], -1)
    if wrt is GROUP_INERTIAS:
        J = jax.jacrev(
            lambda I: f(q, v, control, {**body_params, "inertias": I})
        )(body_params["inertias"])
        return J.reshape(J.shape[0], -1)
    if wrt is GROUP_SCALES:
        nb = world.num_bodies
        s0 = body_params.get("scales")
        if s0 is None:
            s0 = jnp.ones((nb, 3), dtype=q.dtype)
        J = jax.jacrev(
            lambda sc: f(q, v, control, {**body_params, "scales": sc})
        )(s0)
        return J.reshape(J.shape[0], -1)
    if wrt is LINEARIZED_MASSES:
        # Reference parity: WithRespectToLinearizedMasses
        # (dart/neural/WithRespectToMass.hpp) — theta = [m_b; m_b * com_b]
        # per body (mass + first mass moment), the parameterization in
        # which inverse dynamics is LINEAR (convex mass fitting).
        m0 = body_params["masses"]
        c0 = body_params["coms"]
        theta0 = jnp.concatenate(
            [m0[:, None], m0[:, None] * c0], axis=1
        )  # (nb, 4)

        def g(theta):
            m = theta[:, 0]
            coms = theta[:, 1:] / jnp.maximum(m[:, None], 1e-12)
            return f(
                q, v, control, {**body_params, "masses": m, "coms": coms}
            )

        J = jax.jacrev(g)(theta0)
        return J.reshape(J.shape[0], -1)
    raise NotImplementedError(wrt)
