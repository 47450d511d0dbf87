"""utils + common layer tests: exporters, mocap formats, smoothers, infra.

Mirrors the reference's parser unit tests (test_MJCFExporter, test_VskParser,
test_AMCParser, test_SdfParser — SURVEY.md section 4).
"""

import os
import tempfile

import numpy as np

from nimblephysics_tpu.common import (
    Composite,
    NameManager,
    Signal,
    Timer,
    Uri,
)
from nimblephysics_tpu.common.resources import (
    CompositeResourceRetriever,
    LocalResourceRetriever,
    PackageResourceRetriever,
)
from nimblephysics_tpu.models import cartpole
from nimblephysics_tpu.utils import (
    AccelerationMinimizer,
    MarkerTrajectories,
    Motion,
    VelocityMinimizingSmoother,
    load_mot,
    load_trc,
    skeleton_to_mjcf,
    write_mot,
    write_trc,
)


class TestMJCF:
    def test_export_cartpole(self):
        world, q0, v0 = cartpole()
        xml = skeleton_to_mjcf(world.skeletons[0])
        assert "<mujoco" in xml
        assert 'type="slide"' in xml
        assert 'type="hinge"' in xml
        assert 'type="capsule"' in xml
        assert "inertial" in xml


class TestMocapFormats:
    def test_trc_roundtrip(self):
        rng = np.random.RandomState(0)
        traj = MarkerTrajectories(
            ["A", "B"],
            np.arange(5) * 0.01,
            rng.randn(5, 2, 3),
            100.0,
        )
        traj.markers[2, 1] = np.nan  # occlusion
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "t.trc")
            write_trc(p, traj, units="mm")
            back = load_trc(p)
            assert back.marker_names == ["A", "B"]
            np.testing.assert_allclose(
                back.markers[~np.isnan(traj.markers)],
                traj.markers[~np.isnan(traj.markers)],
                atol=1e-5,
            )
            assert np.isnan(back.markers[2, 1]).all()

    def test_mot_roundtrip(self):
        m = Motion(
            ["knee_r", "hip_r"],
            np.arange(4) * 0.02,
            np.arange(8).reshape(4, 2).astype(float),
        )
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "m.mot")
            write_mot(p, m)
            back = load_mot(p)
            assert back.column_names == m.column_names
            np.testing.assert_allclose(back.values, m.values, atol=1e-7)


class TestSmoothers:
    def test_acceleration_minimizer_smooths_noise(self):
        rng = np.random.RandomState(1)
        t = np.linspace(0, 1, 50)
        clean = np.sin(2 * np.pi * t)
        noisy = clean + 0.05 * rng.randn(50)
        sm = AccelerationMinimizer(50, smoothing_weight=1e-4, dt=t[1] - t[0])
        out = sm.minimize(noisy)
        acc = np.diff(out, 2)
        acc_noisy = np.diff(noisy, 2)
        assert np.abs(acc).mean() < 0.3 * np.abs(acc_noisy).mean()

    def test_velocity_smoother(self):
        sm = VelocityMinimizingSmoother(20, smoothing_weight=10.0)
        x = np.r_[np.zeros(10), np.ones(10)]
        out = sm.smooth(x)
        assert np.all(np.diff(out) >= -1e-9)
        assert np.abs(np.diff(out)).max() < 0.5  # step flattened


class TestCommon:
    def test_signal(self):
        s = Signal()
        got = []
        s.connect(lambda x: got.append(x))
        s.raise_signal(42)
        assert got == [42]

    def test_name_manager(self):
        nm = NameManager()
        assert nm.add_name("body", 1) == "body"
        assert nm.add_name("body", 2) == "body(1)"
        assert nm.get("body(1)") == 2

    def test_uri(self):
        u = Uri.from_path("/tmp/x.urdf")
        assert u.scheme == "file"
        assert u.get_filesystem_path() == "/tmp/x.urdf"

    def test_retrievers(self):
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "data.txt")
            open(p, "w").write("hello")
            local = LocalResourceRetriever()
            assert local.retrieve("file://" + p) == b"hello"
            pkg = PackageResourceRetriever()
            pkg.add_package_directory("mypkg", d)
            assert pkg.retrieve("package://mypkg/data.txt") == b"hello"
            comp = CompositeResourceRetriever()
            comp.add_default_retriever(pkg)
            comp.add_default_retriever(local)
            assert comp.exists("package://mypkg/data.txt")
            assert comp.get_file_path(p) == p

    def test_composite_aspect(self):
        from nimblephysics_tpu.common import Aspect

        class MyAspect(Aspect):
            def __init__(self, v):
                self.v = v

        c = Composite()
        c.create_aspect(MyAspect, 7)
        assert c.has_aspect(MyAspect)
        assert c.get_aspect(MyAspect).v == 7
