"""Real AddBiomechanics data end to end: read a reference-format .b3d
subject, parse its embedded OpenSim model, check our FK against the
observed markers, and map its force plates to generalized forces.
"""

import sys; sys.path.insert(0, ".")  # run from the repo root
import numpy as np
import jax.numpy as jnp

from nimblephysics_tpu.biomechanics import (
    ForcePlate,
    read_b3d,
    parse_osim,
)
from nimblephysics_tpu.biomechanics.scaled_fk import (
    marker_table,
    marker_world_positions,
)

B3D = "/root/reference/data/b3d/results.b3d"
subject = read_b3d(B3D)
print(f"subject: {subject.biological_sex}, {subject.height_m} m, "
      f"{subject.mass_kg} kg; trials: "
      f"{[(t.name, t.length) for t in subject.trials]}")

# The .b3d carries its own scaled .osim model text.
open("/tmp/subject_model.osim", "w").write(subject.pass_osim_texts[0])
osim = parse_osim("/tmp/subject_model.osim")
print(f"model: {osim.skeleton.num_bodies} bodies, "
      f"{len(osim.independent_coordinate_names)} independent dofs "
      f"(couplers: {len(osim.couplers)})")

frames = subject.read_frames(0, 30, 10)
q_full = osim.expand_poses(jnp.asarray(frames.pos[0]))
names, bodies, offsets, _ = marker_table(osim.skeleton)
col = {n: i for i, n in enumerate(subject.marker_names)}
errs = []
for t in range(10):
    pred = np.asarray(
        marker_world_positions(
            osim.skeleton, q_full[t], bodies, jnp.asarray(offsets)
        )
    )
    for i, n in enumerate(names):
        if n in col and np.isfinite(frames.marker_obs[t, col[n], 0]):
            errs.append(
                np.linalg.norm(pred[i] - frames.marker_obs[t, col[n]])
            )
print(f"our FK vs observed markers on their IK poses: "
      f"{np.sqrt(np.mean(np.square(errs))) * 100:.1f} cm RMS")

plates = ForcePlate.from_b3d(subject, 0, frames)
print(f"force plates: {len(plates)}; peak vertical force "
      f"{np.nanmax(np.abs(plates[0].forces)):.0f} N")
