"""ExoSolverPinnedContact: exoskeleton assistance torque solver.

Reference parity: dart/biomechanics/ExoSolverPinnedContact.hpp:14-22 —
given a "real" skeleton (human + exo, pinned at contact points) and a
"virtual" skeleton (human alone), solve for exo motor torques that make
the real system reproduce the virtual system's accelerations, least-squares
when the exo's actuation subspace can't reach exactly.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.dynamics.skeleton import (
    Skeleton,
    bias_forces,
    mass_matrix,
)


class ExoSolverPinnedContact:
    def __init__(
        self,
        real_skel: Skeleton,
        virtual_skel: Skeleton,
        exo_dof_indices: Sequence[int],
        gravity=(0.0, -9.81, 0.0),
    ):
        assert real_skel.num_dofs == virtual_skel.num_dofs
        self.real = real_skel
        self.virtual = virtual_skel
        self.exo_dofs = np.asarray(exo_dof_indices, dtype=np.int32)
        self.g = np.asarray(gravity, dtype=np.float64)

    def virtual_acceleration(self, q, dq, tau_human):
        """What the human-alone (virtual) system would do."""
        g = jnp.asarray(self.g)
        M = mass_matrix(self.virtual, q)
        C = bias_forces(self.virtual, q, dq, gravity=g)
        return jnp.linalg.solve(M, tau_human - C)

    def solve_exo_torques(self, q, dq, tau_human):
        """Least-squares exo torques so the real system matches the
        virtual accelerations (reference: the pinned-contact solve)."""
        g = jnp.asarray(self.g)
        ddq_target = self.virtual_acceleration(q, dq, tau_human)
        M_r = mass_matrix(self.real, q)
        C_r = bias_forces(self.real, q, dq, gravity=g)
        # Required generalized force, restricted to the exo's actuation
        # columns: B tau_exo = M_r ddq* + C_r - tau_human.
        needed = M_r @ ddq_target + C_r - tau_human
        nv = self.real.num_dofs
        B = jnp.zeros((nv, len(self.exo_dofs)))
        B = B.at[jnp.asarray(self.exo_dofs), jnp.arange(len(self.exo_dofs))].set(1.0)
        BtB = B.T @ B + 1e-9 * jnp.eye(len(self.exo_dofs))
        tau_exo = jnp.linalg.solve(BtB, B.T @ needed)
        achieved = jnp.linalg.solve(M_r, tau_human + B @ tau_exo - C_r)
        return tau_exo, achieved
