"""Collision-filter parity (reference: BodyNodeCollisionFilter,
dart/collision/CollisionFilter.hpp:91-111 + DART skeleton self-collision
flags, both disabled by default)."""

import numpy as np

from nimblephysics_tpu.collision.collider import Collider
from nimblephysics_tpu.models import half_cheetah


def test_self_collision_disabled_by_default():
    world, _, _ = half_cheetah()
    c = Collider(world)
    kinds = [s.kind for s in c.slots]
    # Only capsule-plane pairs remain: no intra-skeleton capsule pairs.
    assert all(k == "capsule_plane" for k in kinds)
    assert c.num_contacts == 16


def test_self_collision_opt_in_restores_pairs():
    world, _, _ = half_cheetah()
    for sk in world.skeletons:
        sk.set_self_collision_check(True)
    c = Collider(world)
    kinds = [s.kind for s in c.slots]
    assert any(k == "capsule_capsule" for k in kinds)
    # Adjacent bodies still skipped until the adjacent check is enabled.
    n_without_adjacent = len(c.slots)
    for sk in world.skeletons:
        sk.set_adjacent_body_check(True)
    c2 = Collider(world)
    assert len(c2.slots) > n_without_adjacent


def test_explicit_should_collide_override():
    world, _, _ = half_cheetah()
    # Disable one default pair explicitly.
    c0 = Collider(world)
    slot = c0.slots[0]
    world.set_should_collide(slot.body_a, slot.body_b, False)
    c1 = Collider(world)
    assert len(c1.slots) == len(c0.slots) - 1
    # Force-enable an intra-skeleton pair despite self-collision off.
    cheetah_bodies = world.skeletons[-1].num_bodies
    off = world.body_offsets()[-1]
    world.set_should_collide(off + 3, off + 6, True)
    c2 = Collider(world)
    assert len(c2.slots) == len(c1.slots) + 1
