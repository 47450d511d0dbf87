"""Soft-body tier (dynamics/soft.py): particle clouds anchored to rigid
bodies with exact per-particle contact (the SoftContactConstraint
analog), two-way coupled to the rigid engine, differentiable (which the
reference's soft tier is NOT — SoftBodyNode.cpp is simulation-only).
"""

import jax
import jax.numpy as jnp
import numpy as np

from worlds import free_box, ground_plane

from nimblephysics_tpu.dynamics import FREE, WELD, Skeleton
from nimblephysics_tpu.dynamics.soft import (
    SoftState,
    SoftWorld,
    make_soft_box,
)
from nimblephysics_tpu.simulation.world import World


def _world_with_soft(anchor_free=True):
    w = World(gravity=(0.0, 0.0, -9.81), time_step=0.002)
    w.add_skeleton(ground_plane())
    carrier = Skeleton("carrier")
    carrier.add_joint_and_body(
        FREE if anchor_free else WELD, parent=-1, name="carrier",
        mass=1.0, inertia=np.eye(3) * 0.01,
    )
    w.add_skeleton(carrier)
    spec = make_soft_box(body=1, size=(0.15, 0.15, 0.15), grid=(3, 3, 3),
                         total_mass=0.3)
    return w, SoftWorld(w, [spec]), spec


def _roll(sw, q, v, softs, u, steps):
    @jax.jit
    def run(q, v, softs):
        def body(c, _):
            q, v, softs = c
            r, softs = sw.step(q, v, softs, u)
            return (r.q, r.v, softs), None

        (q, v, softs), _ = jax.lax.scan(
            body, (q, v, softs), None, length=steps
        )
        return q, v, softs

    return run(q, v, softs)


def test_soft_cube_drops_and_rests_on_plane():
    w, sw, spec = _world_with_soft()
    nv = w.num_dofs
    q = jnp.zeros(nv).at[5].set(0.4)  # carrier 0.4 m up
    v = jnp.zeros(nv)
    softs = sw.init_state(q)
    u = jnp.zeros(nv)
    q, v, softs = _roll(sw, q, v, softs, u, 1200)
    pos = np.asarray(softs[0].pos)
    vel = np.asarray(softs[0].vel)
    # Particles rest ON the plane (none below, lowest layer touching).
    assert pos[:, 2].min() > -1e-6, pos[:, 2].min()
    assert pos[:, 2].min() < 0.02
    assert np.abs(vel).max() < 0.3, np.abs(vel).max()
    # The carrier body hangs from / rests via its anchor springs: finite.
    assert np.isfinite(np.asarray(q)).all()


def test_soft_reaction_supports_rigid_body():
    """Two-way coupling: the particle cloud resting on the plane holds
    the rigid carrier up through the anchor springs (the carrier does NOT
    free-fall)."""
    w, sw, spec = _world_with_soft()
    nv = w.num_dofs
    q = jnp.zeros(nv).at[5].set(0.1)
    v = jnp.zeros(nv)
    softs = sw.init_state(q)
    u = jnp.zeros(nv)
    q1, v1, softs1 = _roll(sw, q, v, softs, u, 800)
    # Free fall for 1.6 s would put the carrier at -12.5 m; springs +
    # resting particles keep it near the cloud.
    assert float(q1[5]) > -0.3, float(q1[5])
    assert abs(float(v1[5])) < 1.0


def test_soft_step_is_differentiable():
    w, sw, spec = _world_with_soft()
    nv = w.num_dofs
    q0 = jnp.zeros(nv).at[5].set(0.08)  # particles touching the ground
    v0 = jnp.zeros(nv)
    u = jnp.zeros(nv)

    @jax.jit
    def loss(z0):
        q = q0.at[5].set(z0)
        softs = sw.init_state(q)
        v = v0
        for _ in range(5):
            r, softs = sw.step(q, v, softs, u)
            q, v = r.q, r.v
        return jnp.sum(softs[0].pos[:, 2]) + jnp.sum(r.q ** 2)

    g = jax.grad(loss)(jnp.asarray(0.08))
    assert np.isfinite(float(g)) and abs(float(g)) > 0
    # FD cross-check.
    h = 1e-5
    fd = (float(loss(jnp.asarray(0.08 + h))) -
          float(loss(jnp.asarray(0.08 - h)))) / (2 * h)
    np.testing.assert_allclose(float(g), fd, rtol=1e-4, atol=1e-6)


def test_soft_energy_dissipates():
    """Damped springs + inelastic contact: kinetic energy decays."""
    w, sw, spec = _world_with_soft()
    nv = w.num_dofs
    q = jnp.zeros(nv).at[5].set(0.3)
    v = jnp.zeros(nv)
    softs = sw.init_state(q)
    u = jnp.zeros(nv)
    q, v, softs = _roll(sw, q, v, softs, u, 400)
    ke_mid = float(jnp.sum(softs[0].vel ** 2))
    q, v, softs = _roll(sw, q, v, softs, u, 800)
    ke_end = float(jnp.sum(softs[0].vel ** 2))
    assert ke_end < max(ke_mid, 1e-3) + 1e-6


def test_soft_state_renders_in_gui():
    from nimblephysics_tpu.server.gui_server import NimbleGUI

    w, sw, spec = _world_with_soft()
    q = jnp.zeros(w.num_dofs).at[5].set(0.2)
    softs = sw.init_state(q)
    gui = NimbleGUI(w)
    gui.display_state(np.concatenate([np.asarray(q), np.zeros(w.num_dofs)]))
    gui.display_soft_state(softs)
    import json

    msg = json.loads(gui.state.flush_json())
    spheres = [c for c in msg["commands"] if c["type"] == "create_sphere"
               and c["key"].startswith("soft")]
    assert len(spheres) == spec.num_points
    # Second call updates positions instead of recreating.
    gui.display_soft_state(softs)
    msg2 = json.loads(gui.state.flush_json())
    assert all(c["type"] == "set_pos" for c in msg2["commands"]
               if c["key"].startswith("soft"))


def test_soft_mesh_skin_rendering():
    """SoftMeshShape skin parity: a deforming triangle mesh over the live
    particle grid (closes the last shape-table display gap)."""
    import numpy as np

    from nimblephysics_tpu.dynamics.soft import SoftState, grid_skin_faces
    from nimblephysics_tpu.server.gui_server import NimbleGUI
    from nimblephysics_tpu.simulation import World

    grid = (3, 3, 3)
    faces = grid_skin_faces(grid)
    # Surface of a 3x3x3 grid: 6 faces x 4 quads x 2 triangles = 48.
    assert faces.shape == (48, 3)
    assert faces.min() >= 0 and faces.max() < 27
    # Every surface particle appears; interior particle (center) does not.
    used = set(faces.reshape(-1).tolist())
    assert 13 not in used  # center of the 3x3x3 grid
    assert len(used) == 26

    import jax.numpy as jnp

    gui = NimbleGUI(World())
    pos = np.random.RandomState(0).randn(27, 3) * 0.01
    st = SoftState(pos=jnp.asarray(pos), vel=jnp.zeros((27, 3)))
    gui.display_soft_state([st], skin_faces=[faces])
    cmds = gui.state.flush_commands()
    mesh_cmds = [c for c in cmds if c["type"] == "create_mesh"]
    assert len(mesh_cmds) == 1
    assert len(mesh_cmds[0]["verts"]) == 27
    assert len(mesh_cmds[0]["faces"]) == 48
