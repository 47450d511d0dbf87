"""Biomechanics tests: osim parsing, splines, marker fitting, b3d, C3D.

Mirrors the reference's test_OpenSimParser / test_MarkerFitter /
test_SubjectOnDisk strategy (SURVEY.md section 4) at CI scale: synthetic
mocap from a known skeleton -> the fitter must recover scales and poses
(the Arnold2013-synthetic regression pattern).
"""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nimblephysics_tpu.biomechanics import (
    Anthropometrics,
    IKInitializer,
    MarkerFitter,
    MultivariateGaussian,
    SubjectOnDisk,
    marker_world_positions,
    scaled_forward_kinematics,
    write_b3d,
)
from nimblephysics_tpu.biomechanics.scaled_fk import marker_table
from nimblephysics_tpu.math import splines

from worlds import ball_chain

OSIM = "/root/reference/data/osim/LaiArnoldSubject6/LaiArnold2017_refined.osim"


class TestSplines:
    def test_linear(self):
        f = splines.linear(2.0, 1.0)
        assert float(f(jnp.asarray(3.0))) == 7.0

    def test_simm_spline_interpolates(self):
        xs = np.array([0.0, 1.0, 2.0, 3.0])
        ys = np.array([0.0, 1.0, 0.0, 2.0])
        f = splines.simm_spline(xs, ys)
        for x, y in zip(xs, ys):
            np.testing.assert_allclose(float(f(jnp.asarray(x))), y, atol=1e-10)
        # smooth + differentiable
        g = jax.grad(lambda x: f(x))(jnp.asarray(1.5))
        assert np.isfinite(float(g))

    def test_spline_extrapolates_linearly(self):
        xs = np.linspace(0, 1, 5)
        ys = xs**2
        f = splines.simm_spline(xs, ys)
        d1 = float(f(jnp.asarray(2.0))) - float(f(jnp.asarray(1.5)))
        d2 = float(f(jnp.asarray(2.5))) - float(f(jnp.asarray(2.0)))
        np.testing.assert_allclose(d1, d2, atol=1e-9)


@pytest.mark.skipif(not os.path.exists(OSIM), reason="no reference osim data")
class TestOpenSimParser:
    def test_parse_lai_arnold(self):
        from nimblephysics_tpu.biomechanics import parse_osim
        from nimblephysics_tpu.dynamics import forward_kinematics

        f = parse_osim(OSIM)
        sk = f.skeleton
        assert sk.num_bodies == 13
        assert sk.num_dofs == 22
        assert "pelvis_tilt" in f.coordinate_names
        T = forward_kinematics(sk, jnp.zeros(22))
        assert bool(jnp.all(jnp.isfinite(T)))
        # Knee CustomJoint: femur/tibia spline-coupled translations move
        # smoothly with knee angle.
        knee_dof = f.coordinate_names.index("knee_angle_r")
        q = jnp.zeros(22).at[knee_dof].set(0.8)
        T2 = forward_kinematics(sk, q)
        assert bool(jnp.all(jnp.isfinite(T2)))
        # The tibia origin sits at the knee, so only the spline-coupled
        # translations move it (mm scale); the foot swings macroscopically.
        tibia = sk.body_index("tibia_r")
        assert float(jnp.abs(T2[tibia, :3, 3] - T[tibia, :3, 3]).max()) > 1e-3
        foot = sk.body_index("calcn_r")
        assert float(jnp.abs(T2[foot, :3, 3] - T[foot, :3, 3]).max()) > 0.1


class TestScaledFK:
    def test_scales_move_markers(self):
        sk = ball_chain(2, length=0.5)
        sk.add_marker("tip", 1, [0.0, 0.0, -0.25])
        names, bodies, offsets, fixed = marker_table(sk)
        q = jnp.zeros(sk.num_dofs)
        p1 = marker_world_positions(sk, q, bodies, jnp.asarray(offsets))
        scales = jnp.ones((2, 3)).at[0, 2].set(1.2)  # longer first link
        p2 = marker_world_positions(
            sk, q, bodies, jnp.asarray(offsets), scales
        )
        # Joint anchor of link1 sits lower when link0 stretches in z.
        assert float(p2[0, 2]) < float(p1[0, 2]) - 0.05

    def test_gradients_flow(self):
        sk = ball_chain(2)
        sk.add_marker("tip", 1, [0.0, 0.0, -0.25])
        names, bodies, offsets, fixed = marker_table(sk)

        def f(scales):
            p = marker_world_positions(
                sk, jnp.zeros(6), bodies, jnp.asarray(offsets), scales
            )
            return jnp.sum(p**2)

        g = jax.grad(f)(jnp.ones((2, 3)))
        assert bool(jnp.any(jnp.abs(g) > 0))


class TestMarkerFitter:
    def test_recovers_scales_and_poses(self):
        """Synthetic mocap: generate marker clouds from known scales/poses,
        check the fitter recovers them (reference: the Arnold2013-synthetic
        MarkerFitter regression)."""
        sk = ball_chain(3, length=0.4)
        # Anatomical (fixed=True) markers: strongly offset-regularized so
        # the scale signal is not absorbed by marker offsets (tracking
        # markers are nearly free to move, reference reg 0.05).
        sk.add_marker("m0", 0, [0.05, 0.0, -0.1], fixed=True)
        sk.add_marker("m1", 1, [0.0, 0.05, -0.15], fixed=True)
        sk.add_marker("m2", 2, [0.0, 0.0, -0.2], fixed=True)
        sk.add_marker("m3", 2, [0.05, 0.0, 0.0], fixed=True)
        sk.add_marker("m4", 1, [-0.05, 0.0, 0.0], fixed=True)
        sk.add_marker("m5", 0, [0.0, -0.05, 0.0], fixed=True)
        names, bodies, offsets, fixed = marker_table(sk)

        rng = np.random.RandomState(3)
        true_scales = jnp.asarray(1.0 + 0.12 * rng.randn(3, 3).clip(-1, 1) * 0)
        true_scales = jnp.ones((3, 3)).at[1, 2].set(1.15).at[0, 2].set(0.9)
        T = 12
        true_poses = jnp.asarray(0.25 * rng.randn(T, sk.num_dofs))
        observed = np.stack(
            [
                np.asarray(
                    marker_world_positions(
                        sk, true_poses[t], bodies, jnp.asarray(offsets),
                        true_scales,
                    )
                )
                for t in range(T)
            ]
        )
        # occlude a few observations
        observed[3, 1] = np.nan
        observed[7, 4] = np.nan

        fitter = MarkerFitter(sk, regularize_scales=0.01,
                              regularize_offsets=100.0)
        res = fitter.fit(observed, outer_iterations=40, ik_iterations=6,
                         lr_scales=0.03)
        assert res.avg_marker_error < 5e-3, res.avg_marker_error  # < 5 mm
        np.testing.assert_allclose(
            res.body_scales[1, 2], 1.15, atol=0.06
        )
        np.testing.assert_allclose(
            res.body_scales[0, 2], 0.9, atol=0.06
        )

    def test_ik_initializer(self):
        sk = ball_chain(2)
        sk.add_marker("m0", 0, [0.0, 0.0, -0.1])
        sk.add_marker("m1", 1, [0.0, 0.0, -0.2])
        init = IKInitializer(sk)
        obs = np.zeros((2, 2, 3))
        poses = init.initialize(obs)
        assert poses.shape == (2, sk.num_dofs)


class TestSubjectOnDisk:
    def test_roundtrip(self):
        rng = np.random.RandomState(0)
        nq, M, G = 5, 3, 1
        trials = []
        for T in (10, 7):
            trials.append(
                dict(
                    name=f"walk{T}",
                    dt=0.01,
                    poses=rng.randn(T, nq),
                    vels=rng.randn(T, nq),
                    accs=rng.randn(T, nq),
                    taus=rng.randn(T, nq),
                    markers=rng.randn(T, M, 3),
                    grf=rng.randn(T, G, 9),
                )
            )
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "subject.b3d")
            write_b3d(path, nq, ["a", "b", "c"], trials, num_force_plates=G)
            sub = SubjectOnDisk(path)
            assert sub.num_trials == 2
            assert sub.num_dofs == nq
            assert sub.trial_length(0) == 10
            assert sub.trial_name(1) == "walk7"
            fr = sub.read_frames(0, 2, 4)
            np.testing.assert_allclose(
                fr["poses"], trials[0]["poses"][2:6], atol=1e-6
            )
            np.testing.assert_allclose(
                fr["markers"], trials[0]["markers"][2:6], atol=1e-6
            )
            # seek into trial 2
            fr2 = sub.read_frames(1, 5, 99)
            assert fr2["poses"].shape == (2, nq)
            np.testing.assert_allclose(
                fr2["grf"], trials[1]["grf"][5:], atol=1e-6
            )
            sub.close()


class TestAnthropometrics:
    def test_log_pdf_peaks_at_mean(self):
        g = MultivariateGaussian(
            ["height", "femur"], np.array([1.75, 0.45]),
            np.array([[0.01, 0.002], [0.002, 0.004]]),
        )
        anth = Anthropometrics()
        anth.add_metric("height", body=0, axis=2, base_value=1.75)
        anth.add_metric("femur", body=1, axis=2, base_value=0.45)
        anth.set_distribution(g)
        lp_mean = float(anth.log_pdf(jnp.ones((2, 3))))
        lp_off = float(anth.log_pdf(jnp.ones((2, 3)) * 1.2))
        assert lp_mean > lp_off

    def test_conditioning(self):
        g = MultivariateGaussian(
            ["a", "b"], np.array([0.0, 0.0]),
            np.array([[1.0, 0.9], [0.9, 1.0]]),
        )
        g2 = g.condition({"a": 1.0})
        np.testing.assert_allclose(g2.mu, [0.9], atol=1e-12)


OSIM_V4 = "/root/reference/data/osim/CompleteHumanModel/CompleteHumanModel.osim"


@pytest.mark.skipif(not os.path.exists(OSIM_V4), reason="no reference osim data")
class TestOpenSimV4:
    def test_parse_complete_human_model(self):
        """OpenSim 4.x format: separate JointSet with PhysicalOffsetFrames."""
        from nimblephysics_tpu.biomechanics import parse_osim
        from nimblephysics_tpu.dynamics import forward_kinematics

        f = parse_osim(OSIM_V4)
        sk = f.skeleton
        assert sk.num_bodies == 26
        assert sk.num_dofs == 36
        assert len(f.markers) == 114
        assert "pelvis_tilt" in f.coordinate_names
        T = forward_kinematics(sk, jnp.zeros(sk.num_dofs))
        assert bool(jnp.all(jnp.isfinite(T)))
        # Marker world positions must evaluate on the 4.x model too.
        from nimblephysics_tpu.biomechanics.scaled_fk import (
            marker_table,
            marker_world_positions,
        )

        names, bodies, offsets, fixed = marker_table(sk)
        p = marker_world_positions(
            sk, jnp.zeros(sk.num_dofs), bodies, jnp.asarray(offsets)
        )
        assert p.shape == (114, 3)
        assert bool(jnp.all(jnp.isfinite(p)))


def test_ik_error_report():
    """IKErrorReport parity (IKErrorReport.hpp): per-frame RMSE/max,
    per-marker ranking, CSV export — on a known synthetic error field."""
    import tempfile

    import jax.numpy as jnp

    from nimblephysics_tpu.biomechanics import IKErrorReport
    from nimblephysics_tpu.biomechanics.scaled_fk import (
        marker_table,
        marker_world_positions,
    )
    from nimblephysics_tpu.dynamics.skeleton import Skeleton

    sk = Skeleton("rep")
    b = sk.add_joint_and_body("free", name="seg", mass=1.0)
    sk.add_marker("A", b, (0.1, 0.0, 0.0))
    sk.add_marker("B", b, (0.0, 0.1, 0.0))
    sk.add_marker("C", b, (0.0, 0.0, 0.1))
    names, bodies, offsets, _f = marker_table(sk)

    T = 4
    poses = np.zeros((T, 6))
    truth = np.stack(
        [
            np.asarray(
                marker_world_positions(
                    sk, jnp.asarray(poses[t]), jnp.asarray(bodies),
                    jnp.asarray(offsets),
                )
            )
            for t in range(T)
        ]
    )
    obs = truth.copy()
    obs[:, 0, 0] += 0.01  # marker A off by exactly 1 cm
    obs[:, 2, :] = np.nan  # marker C occluded everywhere

    rep = IKErrorReport.compute(sk, poses, obs)
    # 2 observed markers; only A has 1 cm error:
    # rmse = sqrt(0.01^2 / 2), max = 0.01.
    np.testing.assert_allclose(
        rep.average_root_mean_squared_error,
        np.sqrt(0.01**2 / 2.0),
        rtol=1e-9,
    )
    np.testing.assert_allclose(rep.average_max_error, 0.01, rtol=1e-9)
    assert rep.worst_markers == ["A"] * T
    ranked = rep.sorted_marker_rmse()
    assert ranked[0][0] == "A" and abs(ranked[0][1] - 0.01) < 1e-12
    assert "C" not in dict(ranked)  # fully occluded: no RMSE entry
    with tempfile.NamedTemporaryFile("r", suffix=".csv") as f:
        rep.save_csv_marker_error_report(f.name)
        lines = open(f.name).read().splitlines()
        assert len(lines) == 1 + T and lines[0].startswith("timestep")
    rep.print_report(limit_timesteps=2)
