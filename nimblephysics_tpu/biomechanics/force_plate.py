"""Force plates + raw GRF -> generalized-force mapping.

Reference parity: dart/biomechanics/ForcePlate.hpp (corners, per-frame
center of pressure / force / moment, trimming and CoP-to-wrench math) and
the DynamicsFitter's GRF ingestion (dart/biomechanics/DynamicsFitter.hpp:
1250 — measured plate wrenches mapped through contact-body Jacobians into
generalized forces so the root residual can be driven to zero).

The hard 90% the round-1 fitter skipped is the mapping: raw plate data
(CoP + force + free moment in world coordinates) must become a
generalized-force vector via the Jacobian of the ASSIGNED contact body at
the CoP. `grf_generalized_forces` does that, differentiably in q.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.dynamics.skeleton import Skeleton, full_kinematics


@dataclasses.dataclass
class ForcePlate:
    """One force plate's world-frame recording.

    Reference parity: biomechanics::ForcePlate — corners (4, 3) world,
    per-frame centersOfPressure (T, 3), forces (T, 3), moments (T, 3)
    (the free moment about the CoP).
    """

    corners: np.ndarray  # (4, 3)
    centers_of_pressure: np.ndarray  # (T, 3)
    forces: np.ndarray  # (T, 3)
    moments: np.ndarray  # (T, 3)

    @property
    def num_frames(self) -> int:
        return len(self.forces)

    def world_wrenches(self) -> np.ndarray:
        """(T, 6) spatial wrench about the WORLD ORIGIN: [cop x f + m; f].

        (The world-frame system Jacobian J_world is taken about the world
        origin, so tau = J_world^T wrench directly.)
        """
        cop = np.nan_to_num(self.centers_of_pressure)
        f = np.nan_to_num(self.forces)
        m = np.nan_to_num(self.moments)
        return np.concatenate([np.cross(cop, f) + m, f], axis=1)

    def trim(self, start: int, end: int) -> "ForcePlate":
        """Reference parity: ForcePlate::trim."""
        return ForcePlate(
            corners=self.corners,
            centers_of_pressure=self.centers_of_pressure[start:end],
            forces=self.forces[start:end],
            moments=self.moments[start:end],
        )

    def detect_zero_force_frames(self, threshold: float = 3.0) -> np.ndarray:
        """(T,) bool: frames where the plate reads (near) zero force."""
        return np.linalg.norm(np.nan_to_num(self.forces), axis=1) < threshold

    @staticmethod
    def from_b3d(reader, trial: int, frames=None) -> List["ForcePlate"]:
        """Build plates from a SubjectOnDiskReader's raw plate channels."""
        fr = frames or reader.read_frames(trial)
        plates = []
        n_plates = fr.raw_force_plate_force.shape[1]
        for p in range(n_plates):
            plates.append(
                ForcePlate(
                    corners=np.zeros((4, 3)),
                    centers_of_pressure=fr.raw_force_plate_cop[:, p],
                    forces=fr.raw_force_plate_force[:, p],
                    moments=fr.raw_force_plate_torque[:, p],
                )
            )
        return plates


def assign_plates_to_bodies(
    skel: Skeleton,
    poses: np.ndarray,  # (T, nq)
    plates: Sequence[ForcePlate],
    contact_body_names: Sequence[str],
    force_threshold: float = 3.0,
) -> np.ndarray:
    """Per-frame plate->contact-body assignment by CoP proximity.

    Returns (T, n_plates) int indices into contact_body_names (-1 when the
    plate reads no force). Reference analog: DynamicsFitter's foot-contact
    assignment of measured plate wrenches.
    """
    import jax

    bodies = [skel.body_index(n) for n in contact_body_names]
    T = poses.shape[0]

    @jax.jit
    def body_positions(q):
        kin = full_kinematics(skel, q)
        return kin["T_wb"][jnp.asarray(bodies)][:, :3, 3]

    out = np.full((T, len(plates)), -1, dtype=np.int64)
    pos = np.asarray(jax.vmap(body_positions)(jnp.asarray(poses)))  # (T,C,3)
    for p, plate in enumerate(plates):
        active = ~plate.detect_zero_force_frames(force_threshold)
        cop = np.nan_to_num(plate.centers_of_pressure)
        d = np.linalg.norm(pos - cop[:, None, :], axis=2)  # (T, C)
        out[active, p] = np.argmin(d, axis=1)[active]
    return out


def grf_generalized_forces(
    skel: Skeleton,
    q: jnp.ndarray,
    wrenches: jnp.ndarray,  # (P, 6) world wrenches about the origin
    body_onehot: jnp.ndarray,  # (P, C) soft/hard assignment to contact bodies
    contact_bodies: np.ndarray,  # (C,) static body indices
    scales: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """tau_ext (nq,): measured plate wrenches through body Jacobians.

    tau = sum_p J_world[body(p)]^T w_p — differentiable in q (and scales),
    the quantity the residual-free condition equates to the root rows of
    inverse dynamics.
    """
    kin = full_kinematics(skel, q, scales=scales)
    Jw = kin["J_world"][jnp.asarray(contact_bodies)]  # (C, 6, nq)
    # Soft assignment: J_eff[p] = sum_c onehot[p, c] J_c.
    J_eff = jnp.einsum("pc,cin->pin", body_onehot, Jw)  # (P, 6, nq)
    return jnp.einsum("pin,pi->n", J_eff, wrenches)
