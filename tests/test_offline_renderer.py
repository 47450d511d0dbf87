"""OfflineRenderer: local headless rendering of world states.

Reference-parity surface: python/nimblephysics/bullet_renderer.py
(BulletRenderer.renderStates(states, saveDir, frameSkip)), generalized
to any articulated World via the engine's own FK.
"""

import numpy as np

from nimblephysics_tpu.models import half_cheetah
from nimblephysics_tpu.server.offline_renderer import (
    OfflineRenderer,
    shape_mesh,
)


def test_render_halfcheetah_states(tmp_path):
    world, q0, v0 = half_cheetah()
    r = OfflineRenderer(world, width=160, height=120)
    # half_cheetah is y-up: camera slightly above the ground plane y=0.
    r.camera.look_at([1.2, 0.8, -2.2], [0.0, 0.1, 0.0], up=(0, 1, 0))

    s0 = np.concatenate([q0, v0])
    s1 = s0.copy()
    s1[0] += 0.6  # move the root forward
    s1[2] += 0.5  # pitch the torso

    images = r.render_states([s0, s1], save_dir=str(tmp_path), frame_skip=1)
    assert len(images) == 2
    im0, im1 = images
    assert im0.shape == (120, 160, 3) and im0.dtype == np.uint8
    # Foreground coverage: the cheetah + ground must fill a real fraction
    # of the frame (background is the dark constant color).
    bg = np.all(im0 == im0[0, 0], axis=-1)
    assert (~bg).mean() > 0.10, "scene rendered (almost) nothing"
    # Moving the root must change the image.
    assert (im0 != im1).any(axis=-1).mean() > 0.01
    # PNGs written.
    assert len(list(tmp_path.glob("frame_*.png"))) == 2


def test_render_frame_skip():
    world, q0, v0 = half_cheetah()
    r = OfflineRenderer(world, width=64, height=48)
    states = [np.concatenate([q0, v0])] * 10
    assert len(r.render_states(states, frame_skip=5)) == 2


def test_shape_meshes_cover_all_primitives():
    from nimblephysics_tpu.dynamics import shapes as SH

    specs = [
        (SH.BOX, [0.2, 0.3, 0.4]),
        (SH.SPHERE, [0.3]),
        (SH.ELLIPSOID, [0.2, 0.3, 0.4]),
        (SH.CAPSULE, [0.1, 0.5]),
        (SH.CYLINDER, [0.1, 0.5]),
        (SH.CONE, [0.1, 0.5]),
        (SH.PLANE, [0.0, 0.0, 1.0, 0.0]),
    ]

    class _S:
        def __init__(self, t, size):
            self.shape_type = t
            self.size = np.asarray(size, dtype=np.float64)
            self.mesh_vertices = None

    for t, size in specs:
        v, f = shape_mesh(_S(t, size))
        assert len(v) >= 3 and len(f) >= 2, t
        assert f.max() < len(v) and f.min() >= 0, t
        assert np.isfinite(v).all(), t

