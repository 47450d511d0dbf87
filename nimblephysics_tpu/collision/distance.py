"""Signed distance queries between world shapes.

Reference parity: the collision framework's distance options/results
(dart/collision DistanceOption/DistanceResult). Built on the same
narrowphase math as contacts: distance = -penetration depth, so each
supported pair returns (signed_distance, nearest point, direction).
Differentiable — usable inside losses (e.g. obstacle-avoidance costs).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.collision.collider import Collider
from nimblephysics_tpu.simulation.world import World, world_fk


class DistanceResult(NamedTuple):
    """Reference parity: collision::DistanceResult (minDistance + the
    shape pair and nearest points)."""

    min_distance: jnp.ndarray  # signed: negative = penetrating
    point: jnp.ndarray  # (3,) representative nearest/contact point
    normal: jnp.ndarray  # (3,) direction from B to A
    pair_index: jnp.ndarray  # int32 index into the collider's pair list


def distance(world: World, q: jnp.ndarray, collider: Collider = None
             ) -> DistanceResult:
    """Minimum signed distance over all collidable pairs.

    Uses the collider's static pair plan; distances come from the same
    analytic primitives as contacts (depth > 0 means penetration, so the
    signed distance is -depth evaluated without the validity gate).
    """
    if collider is None:
        collider = Collider(world)
    contacts = collider.collide(q)
    # depth is defined for every candidate slot (negative when separated):
    sd = -contacts.depth
    k = jnp.argmin(sd)
    return DistanceResult(
        min_distance=sd[k],
        point=contacts.point[k],
        normal=contacts.normal[k],
        pair_index=k.astype(jnp.int32),
    )


def pairwise_distances(world: World, q: jnp.ndarray, collider: Collider = None
                       ) -> jnp.ndarray:
    """Signed distance for every candidate contact slot, (C,)."""
    if collider is None:
        collider = Collider(world)
    return -collider.collide(q).depth
