"""Biomechanics: fit a human model to mocap markers (synthetic demo).

Reference parity: the AddBiomechanics pipeline — load an .osim model,
fit body scales + marker offsets + per-frame poses to a marker cloud,
save the result as a .b3d subject.
"""
import os, sys; sys.path.insert(0, ".")
import numpy as np
import jax.numpy as jnp
import nimblephysics_tpu as nt
from nimblephysics_tpu.biomechanics import MarkerFitter, parse_osim, write_b3d
from nimblephysics_tpu.biomechanics.scaled_fk import marker_table, marker_world_positions

OSIM = "/root/reference/data/osim/LaiArnoldSubject6/LaiArnold2017_refined.osim"
f = parse_osim(OSIM)
sk = f.skeleton
print(f"model: {sk.num_bodies} bodies, {sk.num_dofs} dofs")

# Synthetic mocap: perturb poses, use a handful of leg markers.
for name, (b, off, fixed) in list(f.markers.items())[:0]:
    pass
# add synthetic markers on each body
for i, b in enumerate(sk.bodies[:8]):
    sk.add_marker(f"M{i}", i, np.array([0.03, 0.02, 0.0]))
names, bodies, offsets, fixed = marker_table(sk)
SMOKE = bool(os.environ.get("NT_SMOKE"))  # CI smoke mode: tiny fit
rng = np.random.RandomState(0)
T = 4 if SMOKE else 10
true_poses = jnp.asarray(0.1 * rng.randn(T, sk.num_dofs))
obs = np.stack([np.asarray(marker_world_positions(
    sk, true_poses[t], bodies, jnp.asarray(offsets))) for t in range(T)])

fitter = MarkerFitter(sk)
res = fitter.fit(obs, outer_iterations=4 if SMOKE else 25)
print(f"avg marker error: {res.avg_marker_error*1000:.2f} mm")
write_b3d("/tmp/subject.b3d", sk.num_dofs, res.marker_names, [dict(
    name="fit", dt=0.01, poses=res.poses,
    vels=np.zeros_like(res.poses), accs=np.zeros_like(res.poses),
    taus=np.zeros_like(res.poses), markers=obs)])
print("wrote /tmp/subject.b3d")
