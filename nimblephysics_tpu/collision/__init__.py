"""Collision layer (reference: dart/collision, SURVEY.md 2.2).

Static pair enumeration + vectorized analytic narrowphase with fixed
contact counts and validity masks.
"""

from nimblephysics_tpu.collision.collider import Collider, Contacts
from nimblephysics_tpu.collision import narrowphase
from nimblephysics_tpu.collision.raycast import RayHit, raycast
from nimblephysics_tpu.collision.distance import DistanceResult, distance, pairwise_distances
