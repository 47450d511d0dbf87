"""Biomechanics pipeline hardening (VERDICT round-1 item #6):

  * reference-compatible .b3d reading on the REAL AddBiomechanics file
    (/root/reference/data/b3d/results.b3d — SubjectOnDisk.proto wire
    format),
  * C3D loading on the REAL reference mocap file (JA1Gait35.c3d),
  * ForcePlate + raw-GRF -> generalized-force mapping through contact
    Jacobians + mass recovery with plate data,
  * closed-form IKInitializer (Kabsch segment poses + SCoRE joint
    centers),
  * marker trace cleaning (despike + gap fill),
  * an end-to-end slice: real .b3d markers + embedded .osim model ->
    IK initializer -> marker fitting.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nimblephysics_tpu.biomechanics.b3d_reader import read_b3d
from nimblephysics_tpu.biomechanics.force_plate import (
    ForcePlate,
    assign_plates_to_bodies,
    grf_generalized_forces,
)
from nimblephysics_tpu.biomechanics.ik_initializer import IKInitializer
from nimblephysics_tpu.biomechanics.marker_fixer import clean_marker_traces
from nimblephysics_tpu.dynamics import BALL, FREE, REVOLUTE, Skeleton
from nimblephysics_tpu.dynamics.skeleton import (
    full_kinematics,
    inverse_dynamics,
)

B3D = "/root/reference/data/b3d/results.b3d"
C3D_FILE = "/root/reference/data/c3d/JA1Gait35.c3d"


# ---------------------------------------------------------------------------
# Interop readers on real reference data
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not os.path.exists(B3D), reason="reference data absent")
def test_read_reference_b3d():
    r = read_b3d(B3D)
    assert r.num_dofs == 33
    assert r.num_trials >= 2
    assert r.mass_kg > 30 and r.height_m > 1.0
    assert r.ground_contact_bodies == ["calcn_r", "calcn_l"]
    assert len(r.marker_names) > 20
    assert len(r.pass_osim_texts) >= 1
    assert "<OpenSimDocument" in r.pass_osim_texts[0]
    t0 = r.trials[0]
    assert t0.length > 50 and 0.001 < t0.timestep < 0.1
    fr = r.read_frames(0, 0, 20)
    assert fr.pos[0].shape == (20, 33)
    assert np.isfinite(fr.pos[0]).all()
    # Kinematics should be physically plausible (|q| bounded).
    assert np.abs(fr.pos[0]).max() < 10.0
    # Markers observed.
    assert (~np.isnan(fr.marker_obs[..., 0])).sum() > 500
    # Walking trial: some vertical GRF present.
    assert np.nanmax(np.abs(fr.raw_force_plate_force)) > 50.0
    # Second trial reads from the correct offset.
    fr1 = r.read_frames(1, 5, 5)
    assert fr1.pos[0].shape == (5, 33)
    assert np.isfinite(fr1.pos[0]).all()


@pytest.mark.skipif(
    not os.path.exists(C3D_FILE), reason="reference data absent"
)
def test_load_reference_c3d():
    from nimblephysics_tpu.biomechanics.c3d import load_c3d

    c3d = load_c3d(C3D_FILE)
    assert c3d.num_frames > 100
    assert len(c3d.marker_names) >= 10
    assert 50 <= c3d.frames_per_second <= 500
    pts = c3d.marker_timesteps
    seen = ~np.isnan(pts[..., 0])
    assert seen.mean() > 0.5, "most markers should be observed"
    # Meters: human-scale coordinates.
    assert np.nanmax(np.abs(pts)) < 10.0


# ---------------------------------------------------------------------------
# ForcePlate + GRF pipeline
# ---------------------------------------------------------------------------


def _free_foot():
    sk = Skeleton("foot")
    sk.add_joint_and_body(
        FREE, parent=-1, name="foot", mass=2.0,
        inertia=np.eye(3) * 0.01,
    )
    return sk


def test_force_plate_wrench_and_assignment():
    T = 5
    plate = ForcePlate(
        corners=np.zeros((4, 3)),
        centers_of_pressure=np.tile(np.array([0.3, 0.0, 0.0]), (T, 1)),
        forces=np.tile(np.array([0.0, 0.0, 100.0]), (T, 1)),
        moments=np.zeros((T, 3)),
    )
    w = plate.world_wrenches()
    # torque about origin = cop x f = (0.3, 0, 0) x (0, 0, 100) = (0, -30, 0)
    np.testing.assert_allclose(w[0], [0.0, -30.0, 0.0, 0.0, 0.0, 100.0])
    sk = _free_foot()
    poses = np.zeros((T, 6))
    poses[:, 3] = 0.25  # foot near the plate CoP
    assign = assign_plates_to_bodies(sk, poses, [plate], ["foot"])
    assert (assign == 0).all()
    # Zero-force plate stays unassigned.
    plate0 = ForcePlate(
        corners=np.zeros((4, 3)),
        centers_of_pressure=plate.centers_of_pressure,
        forces=np.zeros((T, 3)),
        moments=np.zeros((T, 3)),
    )
    assert (assign_plates_to_bodies(sk, poses, [plate0], ["foot"]) == -1).all()


def test_grf_generalized_forces_equals_direct_wrench():
    """For a free-root body, tau_ext[0:6] must equal the world wrench
    mapped through the root joint's Jacobian — cross-checked against
    inverse dynamics with an equivalent body-frame external force."""
    sk = _free_foot()
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.uniform(-0.5, 0.5, 6))
    w_world = jnp.asarray(rng.randn(1, 6))
    tau = grf_generalized_forces(
        sk, q, w_world, jnp.ones((1, 1)), np.array([0])
    )
    # Independent check: J_world^T w computed directly.
    kin = full_kinematics(sk, q)
    expect = np.asarray(kin["J_world"][0]).T @ np.asarray(w_world[0])
    np.testing.assert_allclose(np.asarray(tau), expect, atol=1e-12)


def test_dynamics_fitter_with_plates_recovers_mass():
    """Synthetic plate data consistent with a heavier body: the plate-fed
    fitter recovers the true mass and drives the root residual to ~0."""
    from nimblephysics_tpu.biomechanics.dynamics_fitter import (
        DynamicsFitterWithPlates,
    )

    sk = _free_foot()  # spec mass 2.0
    true_mass = 3.1
    dt = 0.01
    T = 40
    rng = np.random.RandomState(1)
    # Smooth random trajectory.
    t = np.linspace(0, 1, T)
    poses = np.stack(
        [0.2 * np.sin(2 * np.pi * t * f + p) for f, p in
         zip([1, 2, 1, 1, 2, 1], rng.uniform(0, 6, 6))], axis=1
    )
    # EXACTLY the finite-difference stencil the fitter applies internally
    # (central first/second differences on interior frames) so the
    # synthetic plate data is consistent to machine precision.
    vels = np.zeros_like(poses)
    accs = np.zeros_like(poses)
    vels[1:-1] = (poses[2:] - poses[:-2]) / (2 * dt)
    accs[1:-1] = (poses[2:] - 2 * poses[1:-1] + poses[:-2]) / (dt * dt)
    g = (0.0, -9.81, 0.0)

    # Ground-truth external wrench from ID with the TRUE mass: the root
    # rows of tau must be exactly provided by the "plate".
    bp_true = {"masses": jnp.asarray([true_mass])}

    def tau_of(q, v, a):
        return inverse_dynamics(
            sk, jnp.asarray(q), jnp.asarray(v), jnp.asarray(a),
            gravity=jnp.asarray(g), body_params=bp_true,
        )

    tau_root = np.stack(
        [np.asarray(tau_of(poses[i], vels[i], accs[i])) for i in range(T)]
    )  # (T, 6) generalized root force required

    # Convert to world wrenches: tau_root = J_root^T w  =>  solve 6x6.
    wrenches = np.zeros((T, 3))
    cops = np.zeros((T, 3))
    forces = np.zeros((T, 3))
    moments = np.zeros((T, 3))
    for i in range(T):
        kin = full_kinematics(sk, jnp.asarray(poses[i]))
        J = np.asarray(kin["J_world"][0])  # (6, 6)
        w = np.linalg.solve(J.T, tau_root[i])  # world wrench about origin
        m_o, f = w[:3], w[3:]
        # Decompose as CoP at the body origin + free moment.
        p = np.asarray(kin["T_wb"][0][:3, 3])
        cops[i] = p
        forces[i] = f
        moments[i] = m_o - np.cross(p, f)
    plate = ForcePlate(
        corners=np.zeros((4, 3)), centers_of_pressure=cops,
        forces=forces, moments=moments,
    )

    fitter = DynamicsFitterWithPlates(
        sk, root_dofs=6, gravity=g, regularize_masses=1e-4,
        regularize_coms=1e-2,
    )
    res = fitter.fit_with_plates(
        poses, dt, [plate], ["foot"], iterations=300, learning_rate=0.05,
        fit_inertia=False, force_threshold=0.0,
    )
    assert abs(res.masses[0] - true_mass) < 0.1, res.masses
    assert res.avg_residual_force < 1.0, res.avg_residual_force


# ---------------------------------------------------------------------------
# Closed-form IK initializer
# ---------------------------------------------------------------------------


def _marker_chain():
    """Two-link ball chain with 4 markers per body."""
    sk = Skeleton("chain")
    a = sk.add_joint_and_body(
        BALL, parent=-1, name="upper",
        T_cj=np.array(
            [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0.25], [0, 0, 0, 1.0]]
        ),
    )
    sk.add_joint_and_body(
        BALL, parent=a, name="lower",
        T_pj=np.array(
            [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, -0.25], [0, 0, 0, 1.0]]
        ),
        T_cj=np.array(
            [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0.25], [0, 0, 0, 1.0]]
        ),
    )
    offs = [
        [0.05, 0.0, 0.1], [-0.05, 0.0, 0.0], [0.0, 0.05, -0.1],
        [0.03, -0.05, 0.05],
    ]
    for b in range(2):
        for k, o in enumerate(offs):
            sk.add_marker(f"b{b}m{k}", b, np.asarray(o))
    return sk


def test_ik_initializer_closed_form():
    from nimblephysics_tpu.biomechanics.scaled_fk import (
        marker_table,
        marker_world_positions,
    )

    sk = _marker_chain()
    names, bodies, offsets, _ = marker_table(sk)
    rng = np.random.RandomState(3)
    T = 30
    qs = 0.6 * rng.uniform(-1, 1, (T, sk.num_dofs))
    obs = np.stack(
        [
            np.asarray(
                marker_world_positions(
                    sk, jnp.asarray(qs[t]), bodies, jnp.asarray(offsets)
                )
            )
            for t in range(T)
        ]
    )
    init = IKInitializer(sk)
    seg = init.estimate_segment_poses(obs)
    assert 0 in seg and 1 in seg and seg[0][2].all() and seg[1][2].all()

    centers = init.estimate_joint_centers(obs, seg)
    assert 1 in centers, "joint between the two marker-rich bodies"
    assert centers[1]["rms"] < 1e-8
    # The true joint-1 center: world position of the joint frame = child
    # body origin shifted by T_cj translation (0, 0, 0.25).
    for t in range(0, T, 7):
        kin = full_kinematics(sk, jnp.asarray(qs[t]))
        Tw = np.asarray(kin["T_wb"][1])
        true_center = Tw[:3, :3] @ np.array([0.0, 0.0, 0.25]) + Tw[:3, 3]
        np.testing.assert_allclose(
            centers[1]["world"][t], true_center, atol=1e-8
        )

    # Pose recovery: exact for noiseless ball-joint chains.
    poses = init.initialize(obs)
    np.testing.assert_allclose(poses, qs, atol=1e-6)


def test_marker_trace_cleaning():
    T = 60
    t = np.linspace(0, 1, T)
    clean = np.stack(
        [np.sin(2 * np.pi * t), np.cos(2 * np.pi * t), t], axis=1
    )[:, None, :]
    dirty = clean.copy()
    dirty[20, 0, :] += 5.0  # spike
    dirty[35:40, 0, :] = np.nan  # short gap
    fixed, report = clean_marker_traces(dirty, dt=1.0 / 60)
    assert report["spikes_removed"] >= 1
    assert report["gap_frames_filled"] >= 5
    # Spike removed (then refilled by interpolation) and gap filled.
    assert np.isfinite(fixed[35:40, 0, :]).all()
    assert np.abs(fixed[20, 0] - clean[20, 0]).max() < 0.2


# ---------------------------------------------------------------------------
# End-to-end slice on the real subject
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not os.path.exists(B3D), reason="reference data absent")
def test_b3d_end_to_end_marker_fit(tmp_path):
    """Real .b3d markers + its embedded .osim model -> IK init -> a short
    marker fit. Checks the full interop chain produces sane errors."""
    from nimblephysics_tpu.biomechanics.marker_fitter import MarkerFitter
    from nimblephysics_tpu.biomechanics.opensim_parser import parse_osim

    r = read_b3d(B3D)
    osim_path = tmp_path / "model.osim"
    osim_path.write_text(r.pass_osim_texts[0])
    osim = parse_osim(str(osim_path))
    skel = osim.skeleton
    # The model has 35 coordinates; the b3d stores 33 independent dofs
    # (the two knee_angle_*_beta patella couplers are
    # CoordinateCouplerConstraint-driven, not independent). Marker-based
    # fitting below does not require the dof orders to match.
    assert skel.num_dofs >= r.num_dofs

    fr = r.read_frames(0, 30, 6)
    # Marker table order: intersect b3d marker names with model markers.
    from nimblephysics_tpu.biomechanics.scaled_fk import marker_table

    names, bodies, offsets, _ = marker_table(skel)
    name_to_col = {n: i for i, n in enumerate(r.marker_names)}
    obs = np.full((6, len(names), 3), np.nan)
    matched = 0
    for i, n in enumerate(names):
        if n in name_to_col:
            obs[:, i, :] = fr.marker_obs[:, name_to_col[n], :]
            matched += 1
    assert matched >= 10, f"only {matched} markers matched the model"

    init = IKInitializer(skel)
    q0 = init.initialize(obs)
    assert np.isfinite(q0).all()

    fitter = MarkerFitter(skel)
    res = fitter.fit(
        obs, q_init=q0, outer_iterations=4, ik_iterations=4
    )
    assert np.isfinite(res.avg_marker_error)
    # Real mocap + matched model: should land under ~15 cm RMS even with
    # this abbreviated fit (the reference converges to ~1-2 cm).
    assert res.avg_marker_error < 0.15, res.avg_marker_error


def test_b3d_reference_format_write_read_roundtrip(tmp_path):
    """Writer emits the reference binary layout; the schema reader (which
    also reads the real AddBiomechanics file) round-trips it exactly."""
    from nimblephysics_tpu.biomechanics.b3d_writer import (
        write_b3d_reference_format,
    )

    rng = np.random.RandomState(0)
    T, nq, M, P = 25, 7, 4, 2
    poses = rng.randn(T, nq)
    mk = rng.randn(T, M, 3)
    pf = np.abs(rng.randn(T, P, 3)) * 100
    path = str(tmp_path / "rt.b3d")
    write_b3d_reference_format(
        path, num_dofs=nq,
        trials=[
            dict(name="walk", timestep=0.01, poses=poses, marker_obs=mk,
                 plate_force=pf, plate_cop=np.zeros((T, P, 3)),
                 plate_torque=np.zeros((T, P, 3))),
            dict(name="run", timestep=0.005, poses=poses[:10],
                 marker_obs=mk[:10], plate_force=pf[:10] * 2,
                 plate_cop=np.zeros((10, P, 3)),
                 plate_torque=np.zeros((10, P, 3))),
        ],
        ground_contact_bodies=["foot_l", "foot_r"],
        marker_names=[f"M{i}" for i in range(M)],
        pass_types=[0], pass_osim_texts=["<OpenSimDocument/>"],
        biological_sex="female", height_m=1.68, mass_kg=61.5, age_years=28,
    )
    r = read_b3d(path)
    assert r.num_dofs == nq and r.num_trials == 2
    assert r.marker_names == [f"M{i}" for i in range(M)]
    assert (r.biological_sex, r.height_m, r.mass_kg, r.age_years) == (
        "female", 1.68, 61.5, 28,
    )
    assert r.trials[0].num_force_plates == P
    fr = r.read_frames(0)
    np.testing.assert_allclose(fr.pos[0], poses)
    np.testing.assert_allclose(fr.marker_obs, mk)
    np.testing.assert_allclose(fr.raw_force_plate_force, pf)
    fr1 = r.read_frames(1, 2, 5)
    np.testing.assert_allclose(fr1.pos[0], poses[2:7])


def test_b3d_full_schema_roundtrip(tmp_path):
    """Field-coverage round-trip over SubjectOnDisk.proto's message set
    (VERDICT #8): multi-pass processing frames with com_vel/com_acc/
    root_frame_residual, sensor frames with acc/gyro/EMG/custom channels,
    and per-trial SubjectOnDiskTrialProcessingPassHeader summaries
    (proto:58-94) with residual/marker-RMS series, dof flags, and lowpass
    metadata — everything a reference-produced subject carries."""
    from nimblephysics_tpu.biomechanics.b3d_writer import (
        write_b3d_reference_format,
    )

    rng = np.random.RandomState(1)
    T, nq, M, P, nA, nE = 12, 5, 3, 1, 2, 8
    poses = rng.randn(T, nq)
    com_vel = rng.randn(T, 3)
    com_acc = rng.randn(T, 3)
    root_res = rng.randn(T, 6)
    acc_obs = rng.randn(T, nA, 3)
    gyro_obs = rng.randn(T, nA, 3)
    emg = rng.randn(T, nE)
    custom = rng.randn(T, 4)
    ph0 = dict(
        type=1,  # KINEMATICS
        dof_positions_observed=[True] * nq,
        dof_velocities_finite_differenced=[True] * nq,
        dof_acceleration_finite_differenced=[False] * nq,
        marker_rms=np.full(T, 0.011, np.float32),
        marker_max=np.full(T, 0.04, np.float32),
    )
    ph1 = dict(
        type=2,  # DYNAMICS
        linear_residual=np.linspace(5, 0, T).astype(np.float32),
        angular_residual=np.linspace(2, 0.1, T).astype(np.float32),
        joints_max_velocity=np.full(T, 12.0, np.float32),
        lowpass_cutoff_frequency=30.0,
        lowpass_filter_order=4,
        force_plate_cutoff=[10.0],
    )
    path = str(tmp_path / "full.b3d")
    write_b3d_reference_format(
        path, num_dofs=nq,
        trials=[dict(
            name="walk", timestep=0.01, poses=poses,
            marker_obs=rng.randn(T, M, 3),
            plate_force=np.abs(rng.randn(T, P, 3)),
            plate_cop=np.zeros((T, P, 3)),
            plate_torque=np.zeros((T, P, 3)),
            com_vel=com_vel, com_acc=com_acc, root_residual=root_res,
            acc_obs=acc_obs, gyro_obs=gyro_obs, emg_obs=emg,
            custom_values=custom,
            pass_headers=[ph0, ph1],
            missing_grf_reason=[0] * T,
            tags=["overground", "treadmill_speed_1.2"],
        )],
        ground_contact_bodies=["calcn_l", "calcn_r"],
        marker_names=[f"M{i}" for i in range(M)],
        pass_types=[1, 2],
    )
    r = read_b3d(path)
    th = r.trials[0]
    assert th.num_passes == 2
    assert th.tags == ["overground", "treadmill_speed_1.2"]
    assert th.missing_grf_reason == [0] * T
    h0, h1 = th.pass_headers
    assert h0["type"] == 1 and h1["type"] == 2
    assert h0["dof_positions_observed"] == [True] * nq
    assert h0["dof_acceleration_finite_differenced"] == [False] * nq
    np.testing.assert_allclose(h0["marker_rms"], ph0["marker_rms"])
    np.testing.assert_allclose(
        h1["linear_residual"], ph1["linear_residual"]
    )
    np.testing.assert_allclose(
        h1["angular_residual"], ph1["angular_residual"]
    )
    assert h1["lowpass_cutoff_frequency"] == pytest.approx(30.0)
    assert h1["lowpass_filter_order"] == 4
    np.testing.assert_allclose(h1["force_plate_cutoff"], [10.0])
    fr = r.read_frames(0)
    for p in range(2):
        np.testing.assert_allclose(fr.pos[p], poses)
        np.testing.assert_allclose(fr.com_vel[p], com_vel)
        np.testing.assert_allclose(fr.com_acc[p], com_acc)
        np.testing.assert_allclose(fr.root_frame_residual[p], root_res)
    np.testing.assert_allclose(fr.acc_obs, acc_obs.reshape(T, -1))
    np.testing.assert_allclose(fr.gyro_obs, gyro_obs.reshape(T, -1))
    np.testing.assert_allclose(fr.emg_obs, emg)
    np.testing.assert_allclose(fr.custom_values, custom)


@pytest.mark.skipif(not os.path.exists(B3D), reason="reference data absent")
def test_b3d_reference_subject_survives_rewrite(tmp_path):
    """A reference-produced subject survives read -> write -> read
    (VERDICT #8): carry the real results.b3d's kinematics pass, pass
    headers, sensors, and metadata through OUR writer and verify the
    re-read matches the original."""
    from nimblephysics_tpu.biomechanics.b3d_writer import (
        write_b3d_reference_format,
    )

    src = read_b3d(B3D)
    t0 = src.trials[0]
    n = min(t0.length, 40)
    fr = src.read_frames(0, 0, n)
    path = str(tmp_path / "rewrite.b3d")
    write_b3d_reference_format(
        path, num_dofs=src.num_dofs,
        trials=[dict(
            name=t0.name, timestep=t0.timestep,
            poses=fr.pos[0], vels=fr.vel[0], accs=fr.acc[0],
            taus=fr.tau[0],
            wrenches=fr.ground_contact_wrench[0],
            com=fr.com_pos[0],
            marker_obs=fr.marker_obs,
            plate_cop=fr.raw_force_plate_cop,
            plate_torque=fr.raw_force_plate_torque,
            plate_force=fr.raw_force_plate_force,
            pass_headers=[
                {**t0.pass_headers[0], "marker_rms":
                 t0.pass_headers[0]["marker_rms"][:n],
                 "marker_max": t0.pass_headers[0]["marker_max"][:n],
                 "linear_residual":
                 t0.pass_headers[0]["linear_residual"][:n],
                 "angular_residual":
                 t0.pass_headers[0]["angular_residual"][:n]}
            ] if t0.pass_headers else None,
            missing_grf_reason=t0.missing_grf_reason[:n],
            tags=t0.tags,
        )],
        ground_contact_bodies=src.ground_contact_bodies,
        marker_names=src.marker_names,
        pass_types=[src.pass_types[0]] if src.pass_types else [0],
        biological_sex=src.biological_sex,
        height_m=src.height_m, mass_kg=src.mass_kg,
        age_years=src.age_years,
    )
    rt = read_b3d(path)
    assert rt.num_dofs == src.num_dofs
    assert rt.ground_contact_bodies == src.ground_contact_bodies
    assert rt.marker_names == src.marker_names
    assert rt.trials[0].tags == t0.tags
    if t0.pass_headers:
        np.testing.assert_allclose(
            rt.trials[0].pass_headers[0]["linear_residual"],
            t0.pass_headers[0]["linear_residual"][:n],
        )
    fr2 = rt.read_frames(0)
    np.testing.assert_allclose(fr2.pos[0], fr.pos[0])
    np.testing.assert_allclose(
        fr2.ground_contact_wrench[0], fr.ground_contact_wrench[0]
    )
    # NaN-safe marker comparison (unobserved markers are NaN).
    np.testing.assert_array_equal(
        np.isnan(fr2.marker_obs), np.isnan(fr.marker_obs)
    )
    m = ~np.isnan(fr.marker_obs)
    np.testing.assert_allclose(fr2.marker_obs[m], fr.marker_obs[m])


@pytest.mark.skipif(not os.path.exists(B3D), reason="reference data absent")
def test_b3d_poses_fk_matches_observed_markers():
    """CROSS-ENGINE ORACLE: run OUR forward kinematics on the .b3d's own
    IK poses (computed by the reference/AddBiomechanics pipeline) and
    compare predicted marker positions against the RAW observed markers.
    Agreement to a few cm validates the whole osim-parse + CustomJoint +
    coupler + FK chain against the reference's solution — the stand-in
    for the unavailable pip-installed CPU-Nimble gradient oracle.
    """
    from nimblephysics_tpu.biomechanics.opensim_parser import parse_osim
    from nimblephysics_tpu.biomechanics.scaled_fk import (
        marker_table,
        marker_world_positions,
    )
    import tempfile

    r = read_b3d(B3D)
    with tempfile.NamedTemporaryFile(
        "w", suffix=".osim", delete=False
    ) as f:
        f.write(r.pass_osim_texts[0])
        osim_path = f.name
    osim = parse_osim(osim_path)

    # Coupler parity: the two patella couplers reduce 35 -> 33 dofs,
    # matching the b3d's independent-dof count exactly.
    assert len(osim.couplers) == 2
    dep_names = {osim.coordinate_names[d] for d, _, _ in osim.couplers}
    assert dep_names == {"knee_angle_r_beta", "knee_angle_l_beta"}
    assert len(osim.independent_coordinate_names) == r.num_dofs

    fr = r.read_frames(0, 30, 8)
    q_full = osim.expand_poses(jnp.asarray(fr.pos[0]))
    names, bodies, offsets, _ = marker_table(osim.skeleton)
    name_to_col = {n: i for i, n in enumerate(r.marker_names)}
    errs = []
    for t in range(8):
        pred = np.asarray(
            marker_world_positions(
                osim.skeleton, q_full[t], bodies, jnp.asarray(offsets)
            )
        )
        for i, n in enumerate(names):
            if n in name_to_col:
                obs = fr.marker_obs[t, name_to_col[n]]
                if np.isfinite(obs[0]):
                    errs.append(np.linalg.norm(pred[i] - obs))
    rms = float(np.sqrt((np.asarray(errs) ** 2).mean()))
    assert len(errs) > 200
    # The reference pipeline's own marker RMS on this data is ~1-2 cm;
    # our FK on their poses must land in the same regime.
    assert rms < 0.05, f"FK disagrees with the reference solution: {rms} m"


def test_marker_labeller_recovers_identities():
    """Unlabeled shuffled point clouds -> trace building -> beam-search
    labelling (MarkerLabeller/MarkerBeamSearch parity): identities
    recovered on a synthetic swinging chain with per-frame shuffling and
    a ghost marker."""
    from nimblephysics_tpu.biomechanics.marker_labeller import (
        MarkerLabeller,
        build_traces,
    )
    from nimblephysics_tpu.biomechanics.scaled_fk import (
        marker_table,
        marker_world_positions,
    )

    sk = Skeleton("chain")
    a = sk.add_joint_and_body(
        REVOLUTE, parent=-1, name="upper", axis=[0, 1, 0],
        T_cj=np.array(
            [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0.25], [0, 0, 0, 1.0]]
        ),
    )
    sk.add_joint_and_body(
        REVOLUTE, parent=a, name="lower", axis=[0, 1, 0],
        T_pj=np.array(
            [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, -0.25], [0, 0, 0, 1.0]]
        ),
        T_cj=np.array(
            [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0.25], [0, 0, 0, 1.0]]
        ),
    )
    sk.add_marker("u1", 0, [0.06, 0.0, 0.1])
    sk.add_marker("u2", 0, [-0.06, 0.0, -0.05])
    sk.add_marker("l1", 1, [0.06, 0.0, 0.1])
    sk.add_marker("l2", 1, [0.0, 0.06, -0.1])
    names, bodies, offsets, _ = marker_table(sk)

    T = 40
    dt = 0.01
    ts = np.arange(T) * dt
    poses = np.stack(
        [0.8 * np.sin(2 * np.pi * ts), 0.6 * np.cos(3 * ts)], axis=1
    )
    rng = np.random.RandomState(0)
    clouds = []
    truth = np.zeros((T, len(names), 3))
    for t in range(T):
        pts = np.asarray(
            marker_world_positions(
                sk, jnp.asarray(poses[t]), bodies, jnp.asarray(offsets)
            )
        )
        truth[t] = pts
        cloud = list(pts + 0.002 * rng.randn(*pts.shape))
        cloud.append(np.array([1.5, 1.5, 1.5]) + 0.01 * rng.randn(3))  # ghost
        rng.shuffle(cloud)  # drop identities
        clouds.append(np.asarray(cloud))

    traces = build_traces(clouds, dt)
    long_traces = [tr for tr in traces if len(tr.frames) > 30]
    # 4 markers + 1 ghost; close crossings may fragment one trace (the
    # beam labeller re-joins fragments by assigning both to the marker).
    assert len(long_traces) >= 4, f"{len(long_traces)} long traces"

    labeller = MarkerLabeller(sk)
    labeled, assigned = labeller.label(clouds, poses, dt=dt)
    # Every true marker recovered at (nearly) every frame, ghosts dropped.
    for m, n in enumerate(names):
        seen = np.isfinite(labeled[:, m, 0])
        assert seen.mean() > 0.9, f"marker {n} only {seen.mean():.0%}"
        err = np.linalg.norm(labeled[seen, m] - truth[seen, m], axis=1)
        assert err.max() < 0.02, f"marker {n} mislabeled: {err.max()}"


def test_streaming_ik_tracks_motion():
    """StreamingIK (StreamingIK.hpp parity): warm-started incremental GN
    tracks a moving chain from labeled AND unlabeled marker frames."""
    from nimblephysics_tpu.biomechanics.streaming import StreamingIK
    from nimblephysics_tpu.biomechanics.scaled_fk import (
        marker_table,
        marker_world_positions,
    )

    sk = _marker_chain()
    names, bodies, offsets, _ = marker_table(sk)
    ik = StreamingIK(sk, gn_steps=4)
    rng = np.random.RandomState(0)
    T = 30
    qs = np.cumsum(0.04 * rng.randn(T, sk.num_dofs), axis=0)
    errs = []
    for t in range(T):
        mk = np.asarray(
            marker_world_positions(
                sk, jnp.asarray(qs[t]), bodies, jnp.asarray(offsets)
            )
        )
        # Alternate labeled and unlabeled (shuffled) frames.
        if t % 2 == 0:
            pose = ik.solve_blocking(t * 0.01, mk, labeled=True)
        else:
            cloud = mk.copy()
            rng.shuffle(cloud)
            pose = ik.solve_blocking(t * 0.01, cloud, labeled=False)
        errs.append(np.abs(pose - qs[t]).max())
    assert np.asarray(errs[3:]).max() < 0.05, max(errs[3:])


def test_streaming_mocap_lab_over_socket():
    """StreamingMocapLab: line-JSON frames over TCP drive the background
    IK solver (the CortexStreaming transport role, open protocol)."""
    import json
    import socket
    import time as _time

    from nimblephysics_tpu.biomechanics.streaming import StreamingMocapLab
    from nimblephysics_tpu.biomechanics.scaled_fk import (
        marker_table,
        marker_world_positions,
    )

    sk = _marker_chain()
    names, bodies, offsets, _ = marker_table(sk)
    lab = StreamingMocapLab(sk, gn_steps=3)
    port = lab.serve()
    poses = []
    lab.ik.register_pose_listener(lambda t, q: poses.append((t, q.copy())))
    try:
        with socket.create_connection(("127.0.0.1", port), timeout=5) as c:
            q_true = np.asarray([0.2, 0.1, -0.1, 0.15, 0.05, 0.1])
            mk = np.asarray(
                marker_world_positions(
                    sk, jnp.asarray(q_true), bodies, jnp.asarray(offsets)
                )
            )
            for t in range(8):
                c.sendall(
                    (json.dumps(
                        {"t": t * 0.01, "points": mk.tolist(),
                         "labeled": True}
                    ) + "\n").encode()
                )
            deadline = _time.time() + 20
            while lab.ik.frames_solved < 8 and _time.time() < deadline:
                _time.sleep(0.05)
    finally:
        lab.stop()
    assert lab.ik.frames_solved >= 8
    assert len(poses) >= 8
    assert np.abs(poses[-1][1] - np.asarray(q_true)).max() < 0.05


@pytest.mark.skipif(not os.path.exists(B3D), reason="reference data absent")
def test_residual_elimination_on_real_b3d():
    """Residual-FREE trajectory pass on the real AddBiomechanics subject
    (round-2 verdict next-round #6): the closed-form linear-residual
    eliminator must collapse the root linear residual on real walking
    data, reporting before/after norms."""
    import jax.numpy as jnp

    from nimblephysics_tpu.biomechanics.dynamics_fitter import (
        ResidualEliminator,
    )
    from nimblephysics_tpu.biomechanics.opensim_parser import parse_osim

    r = read_b3d(B3D)
    import tempfile

    with tempfile.NamedTemporaryFile(
        "w", suffix=".osim", delete=False
    ) as f:
        f.write(r.pass_osim_texts[0])
        osim_path = f.name
    osim = parse_osim(osim_path)
    skel = osim.skeleton

    T = 60
    fr = r.read_frames(0, 10, T)
    dt = r.trials[0].timestep
    q_full = np.asarray(osim.expand_poses(jnp.asarray(fr.pos[0])))

    # Total measured force: sum over plates (NaN -> 0 when unloaded).
    F = np.nan_to_num(fr.raw_force_plate_force, nan=0.0).sum(axis=1)
    assert np.abs(F).max() > 100.0  # real GRF present

    # Root translation dofs of this model: pelvis_tx/ty/tz.
    rt = [osim.coordinate_names.index(n)
          for n in ("pelvis_tx", "pelvis_ty", "pelvis_tz")]
    elim = ResidualEliminator(skel, root_trans_dofs=rt)
    # Use the subject's reported mass scaled onto the generic bodies.
    bp_masses = np.asarray(
        [b.mass for b in skel.bodies], dtype=np.float64
    )
    bp_masses *= r.mass_kg / bp_masses.sum()
    res = elim.zero_linear_residuals(q_full, dt, F, masses=bp_masses)

    print(
        f"lin residual: {res.lin_residual_before:.1f} N -> "
        f"{res.lin_residual_after:.3f} N "
        f"(com correction {res.com_correction_rms * 100:.1f} cm)"
    )
    assert res.lin_residual_before > 1.0  # raw IK data has real residuals
    # The eliminator is closed-form: residual collapses by construction.
    assert res.lin_residual_after < 0.05 * res.lin_residual_before
    assert res.lin_residual_after < 5.0  # near machine/integration noise
    # The correction must stay anatomically small (it's a shift of the
    # pelvis path, not a re-animation).
    assert res.com_correction_rms < 0.25
