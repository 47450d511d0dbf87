"""OfflineRenderer: local headless world rendering to image arrays.

The TPU-native analog of the reference's local renderer
(python/nimblephysics/bullet_renderer.py BulletRenderer/BulletCamera:
renderStates(states, saveDir, frameSkip) -> images) — but with no
external engine: shapes come from the SAME World spec the physics steps
(any articulation, all shape types, via our FK), and rasterization is a
small numpy z-buffer pipeline (perspective camera, flat Lambert
shading). Intended for debugging/CI artifact rendering; the interactive
path is the websocket GUI (server/gui_server.py).

Usage:
    r = OfflineRenderer(world, width=320, height=240)
    r.camera.look_at(eye=[2, -3, 1.5], target=[0, 0, 0.3])
    images = r.render_states(states, save_dir="frames/", frame_skip=5)
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from nimblephysics_tpu.dynamics import shapes as SH
from nimblephysics_tpu.simulation.world import World, world_fk

Mesh = Tuple[np.ndarray, np.ndarray]  # (V, 3) float, (F, 3) int


# ---------------------------------------------------------------------------
# Shape -> triangle mesh (shape frame)
# ---------------------------------------------------------------------------

def _box_mesh(size) -> Mesh:
    hx, hy, hz = np.asarray(size, dtype=np.float64) / 2.0
    v = np.array(
        [[sx * hx, sy * hy, sz * hz]
         for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]
    )
    f = np.array(
        [[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],  # x faces
         [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],  # y faces
         [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]]  # z faces
    )
    return v, f


def _uv_sphere(radii, n_lat=8, n_lon=12) -> Mesh:
    rx, ry, rz = np.broadcast_to(np.asarray(radii, dtype=np.float64), (3,))
    lat = np.linspace(0, np.pi, n_lat + 1)
    lon = np.linspace(0, 2 * np.pi, n_lon, endpoint=False)
    LA, LO = np.meshgrid(lat, lon, indexing="ij")
    v = np.stack(
        [rx * np.sin(LA) * np.cos(LO),
         ry * np.sin(LA) * np.sin(LO),
         rz * np.cos(LA)], axis=-1
    ).reshape(-1, 3)
    f = []
    for i in range(n_lat):
        for j in range(n_lon):
            a = i * n_lon + j
            b = i * n_lon + (j + 1) % n_lon
            c = (i + 1) * n_lon + j
            d = (i + 1) * n_lon + (j + 1) % n_lon
            f += [[a, b, d], [a, d, c]]
    return v, np.asarray(f)


def _capsule_mesh(radius, length, cone=False, flat_ends=False) -> Mesh:
    """Capsule / cylinder / cone along local +z (our GUI convention)."""
    n = 12
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    ring = np.stack([np.cos(ang), np.sin(ang)], axis=-1)
    h = length / 2.0
    top_r = 0.0 if cone else radius
    v = [np.concatenate([radius * ring, np.full((n, 1), -h)], axis=1),
         np.concatenate([top_r * ring, np.full((n, 1), h)], axis=1)]
    f = []
    for j in range(n):
        a, b = j, (j + 1) % n
        f += [[a, b, n + b], [a, n + b, n + a]]
    v = np.concatenate(v, axis=0)
    caps = []
    lo, hi = len(v), len(v) + 1
    caps.append([[0.0, 0.0, -h - (0 if flat_ends or cone else radius)]])
    caps.append([[0.0, 0.0, h + (0 if flat_ends or cone else radius)]])
    v = np.concatenate([v] + [np.asarray(c) for c in caps], axis=0)
    for j in range(n):
        a, b = j, (j + 1) % n
        f.append([b, a, lo])                    # bottom fan
        f.append([n + a, n + b, hi])            # top fan
    return v, np.asarray(f)


def shape_mesh(shape) -> Optional[Mesh]:
    """Triangle mesh for one dynamics shape, in the shape frame."""
    t = shape.shape_type
    s = np.asarray(shape.size, dtype=np.float64)
    if t == SH.BOX:
        return _box_mesh(s)
    if t == SH.SPHERE:
        return _uv_sphere(s[0])
    if t == SH.ELLIPSOID:
        return _uv_sphere(s[:3] / 2.0)
    if t == SH.CAPSULE:
        return _capsule_mesh(s[0], s[1])
    if t == SH.CYLINDER:
        return _capsule_mesh(s[0], s[1], flat_ends=True)
    if t == SH.CONE:
        return _capsule_mesh(s[0], s[1], cone=True)
    if t == SH.PLANE:
        # Large ground quad spanning the plane normal^perp directions.
        normal = s[:3] / max(np.linalg.norm(s[:3]), 1e-12)
        off = float(s[3]) if s.size > 3 else 0.0
        a = np.array([1.0, 0.0, 0.0])
        if abs(normal @ a) > 0.9:
            a = np.array([0.0, 1.0, 0.0])
        u = np.cross(normal, a)
        u /= np.linalg.norm(u)
        w = np.cross(normal, u)
        c = normal * off
        # Grid-subdivided ground: the rasterizer culls any triangle with
        # a vertex behind the near plane, so one huge quad would vanish
        # whenever the camera is over it — small cells degrade gracefully.
        ext, n_cells = 6.0, 12
        g = np.linspace(-ext, ext, n_cells + 1)
        GU, GW = np.meshgrid(g, g, indexing="ij")
        v = (c[None, :] + GU.reshape(-1, 1) * u[None, :]
             + GW.reshape(-1, 1) * w[None, :])
        f = []
        for i in range(n_cells):
            for j in range(n_cells):
                a = i * (n_cells + 1) + j
                b = a + 1
                cc = a + n_cells + 1
                d = cc + 1
                f += [[a, b, d], [a, d, cc]]
        return v, np.asarray(f)
    if t in (SH.MESH, SH.MULTI_SPHERE) and shape.mesh_vertices is not None:
        from nimblephysics_tpu.collision.convex import (
            decimate_support,
            hull_triangles,
        )

        v = decimate_support(np.asarray(shape.mesh_vertices), max_verts=40)
        return v, np.asarray(hull_triangles(v))
    return None


# ---------------------------------------------------------------------------
# Camera + rasterizer
# ---------------------------------------------------------------------------

class Camera:
    """Perspective look-at camera (BulletCamera role)."""

    def __init__(self, width=320, height=240, fov_deg=50.0):
        self.width, self.height = int(width), int(height)
        self.fov = np.deg2rad(fov_deg)
        self.near = 0.05
        self.look_at([2.5, -3.0, 1.5], [0.0, 0.0, 0.3])

    def look_at(self, eye, target, up=(0.0, 0.0, 1.0)) -> None:
        eye = np.asarray(eye, dtype=np.float64)
        fwd = np.asarray(target, dtype=np.float64) - eye
        fwd /= max(np.linalg.norm(fwd), 1e-12)
        right = np.cross(fwd, np.asarray(up, dtype=np.float64))
        right /= max(np.linalg.norm(right), 1e-12)
        dn = np.cross(fwd, right)
        self.R = np.stack([right, dn, fwd])  # world -> camera rows
        self.eye = eye

    def project(self, pts: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """(N, 3) world -> (N, 2) pixel coords + (N,) camera depth."""
        pc = (pts - self.eye) @ self.R.T
        z = np.maximum(pc[:, 2], self.near)
        focal = 0.5 * self.height / np.tan(self.fov / 2.0)
        x = self.width / 2.0 + focal * pc[:, 0] / z
        y = self.height / 2.0 + focal * pc[:, 1] / z
        return np.stack([x, y], axis=-1), pc[:, 2]


_LIGHT = np.array([0.35, -0.5, 0.8])
_LIGHT_DIR = _LIGHT / np.linalg.norm(_LIGHT)
_BG = np.array([24, 26, 32], dtype=np.uint8)


def _raster(tris_px, tris_z, normals, colors, width, height) -> np.ndarray:
    """Z-buffer rasterize triangles: (T,3,2) px, (T,3) z, (T,3) n, (T,3) rgb."""
    img = np.broadcast_to(_BG, (height, width, 3)).copy()
    zbuf = np.full((height, width), np.inf)
    shade = 0.25 + 0.75 * np.clip(normals @ _LIGHT_DIR, 0.0, None)
    for t in range(len(tris_px)):
        if np.any(tris_z[t] <= 0.0):
            continue
        p = tris_px[t]
        x0, y0 = np.floor(p.min(axis=0)).astype(int)
        x1, y1 = np.ceil(p.max(axis=0)).astype(int)
        x0, y0 = max(x0, 0), max(y0, 0)
        x1, y1 = min(x1 + 1, width), min(y1 + 1, height)
        if x0 >= x1 or y0 >= y1:
            continue
        xs, ys = np.meshgrid(np.arange(x0, x1) + 0.5,
                             np.arange(y0, y1) + 0.5)
        d = (p[1, 0] - p[0, 0]) * (p[2, 1] - p[0, 1]) - \
            (p[2, 0] - p[0, 0]) * (p[1, 1] - p[0, 1])
        if abs(d) < 1e-12:
            continue
        w0 = ((p[1, 0] - xs) * (p[2, 1] - ys) -
              (p[2, 0] - xs) * (p[1, 1] - ys)) / d
        w1 = ((p[2, 0] - xs) * (p[0, 1] - ys) -
              (p[0, 0] - xs) * (p[2, 1] - ys)) / d
        w2 = 1.0 - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        if not inside.any():
            continue
        z = w0 * tris_z[t, 0] + w1 * tris_z[t, 1] + w2 * tris_z[t, 2]
        tile = zbuf[y0:y1, x0:x1]
        hit = inside & (z < tile)
        tile[hit] = z[hit]
        rgb = np.clip(colors[t] * shade[t] * 255.0, 0, 255).astype(np.uint8)
        img[y0:y1, x0:x1][hit] = rgb
    return img


class OfflineRenderer:
    """Render World states locally to (H, W, 3) uint8 images.

    Reference-parity surface (bullet_renderer.py BulletRenderer):
    render_states(states, save_dir, frame_skip) -> list of images; plus
    render_state(state) for a single frame. Unlike the reference (which
    supported only 0/6-dof rigid URDF bodies via pybullet), this renders
    ANY articulated World through the engine's own FK and shape set.
    """

    def __init__(self, world: World, width: int = 320, height: int = 240):
        self.world = world
        self.camera = Camera(width, height)
        # Per-shape static data: (verts, faces, T_offset, color, body idx)
        self._shapes = []
        body_off = world.body_offsets()
        for si, skel in enumerate(world.skeletons):
            for bi, body in enumerate(skel.bodies):
                for shape in body.shapes:
                    m = shape_mesh(shape)
                    if m is None:
                        continue
                    color = (np.asarray(shape.color[:3], dtype=np.float64)
                             if shape.color is not None
                             else np.array([0.55, 0.55, 0.9]))
                    self._shapes.append(
                        (m[0], m[1], np.asarray(shape.T_offset),
                         color, body_off[si] + bi)
                    )

    def render_state(self, state) -> np.ndarray:
        import jax.numpy as jnp

        q = np.asarray(state)[: self.world.num_dofs]
        T_wb = np.asarray(world_fk(self.world, jnp.asarray(q)))
        tris_px, tris_z, normals, colors = [], [], [], []
        for verts, faces, T_off, color, gb in self._shapes:
            T = T_wb[gb] @ T_off
            vw = verts @ T[:3, :3].T + T[:3, 3]
            px, z = self.camera.project(vw)
            tp, tz = px[faces], z[faces]
            e1 = vw[faces[:, 1]] - vw[faces[:, 0]]
            e2 = vw[faces[:, 2]] - vw[faces[:, 0]]
            n = np.cross(e1, e2)
            n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
            # Two-sided shading: flip normals toward the light.
            n = np.where((n @ _LIGHT_DIR)[:, None] < 0, -n, n)
            tris_px.append(tp)
            tris_z.append(tz)
            normals.append(n)
            colors.append(np.broadcast_to(color, (len(faces), 3)))
        if not tris_px:
            return np.broadcast_to(
                _BG, (self.camera.height, self.camera.width, 3)
            ).copy()
        return _raster(
            np.concatenate(tris_px), np.concatenate(tris_z),
            np.concatenate(normals), np.concatenate(colors),
            self.camera.width, self.camera.height,
        )

    def render_states(
        self,
        states: Sequence,
        save_dir: Optional[str] = None,
        frame_skip: int = 5,
    ) -> List[np.ndarray]:
        """Reference parity: BulletRenderer.renderStates(states, saveDir,
        frameSkip) — render every frame_skip-th state; optionally save
        PNGs frame_0000.png ... into save_dir."""
        images = [self.render_state(s) for s in states[::frame_skip]]
        if save_dir is not None:
            os.makedirs(save_dir, exist_ok=True)
            from matplotlib.image import imsave

            for i, im in enumerate(images):
                imsave(os.path.join(save_dir, f"frame_{i:04d}.png"), im)
        return images
