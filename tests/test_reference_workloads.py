"""The reference's Python benchmark workloads as bundled models.

python/nimblephysics_benchmarks ships four workloads (atlas, catapult,
half_cheetah, jump_worm) driven through timestep + backprop loops
(each calls neural.forwardPass + BackpropSnapshot::benchmarkJacobians).
half_cheetah and atlas are covered elsewhere (bench.py,
test_atlas_trajectory.py); this file covers the two worm/catapult
worlds: topology, resting behavior on the box floor, and gradient
flow through the box-box contact manifold.
"""

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.batched import BatchedEngine
from nimblephysics_tpu.models import catapult, jump_worm


def _scan_rollout(eng, q0, v0, B, steps, u_fn=None):
    q = jnp.tile(jnp.asarray(q0)[:, None], (1, B))
    v = jnp.tile(jnp.asarray(v0)[:, None], (1, B))
    z = jnp.zeros((eng.num_rows, B), q.dtype)
    u = jnp.zeros_like(q) if u_fn is None else u_fn(q)

    def body(c, _):
        q, v, z = c
        r = eng.step(q, v, u, z_warm=z)
        return (r.q, r.v, r.impulses), None

    (qf, vf, zf), _ = jax.lax.scan(body, (q, v, z), None, length=steps)
    return qf, vf, zf


class TestJumpWorm:
    def test_topology_and_action_space(self):
        world, q0, v0 = jump_worm()
        assert world.num_dofs == 5
        assert list(world.action_indices) == [2, 3, 4]

    def test_settles_on_floor(self):
        """Drops ~0.4 m onto the floor (top at y = -0.575) and rests there
        without tunneling or blowup."""
        world, q0, v0 = jump_worm()
        eng = BatchedEngine(world)
        qf, vf, zf = _scan_rollout(eng, q0, v0, B=2, steps=600)
        assert bool(jnp.isfinite(qf).all() & jnp.isfinite(vf).all())
        root_y = np.asarray(qf[1])
        # Root box (half-height 0.05) resting on the floor top (y=-0.575):
        # center around -0.525; tail configurations can prop it higher.
        assert (root_y > -0.56).all(), root_y
        assert (root_y < 0.1).all(), root_y
        assert float(jnp.abs(vf).max()) < 1.0

    def test_gradient_through_contact(self):
        """Policy-gradient shape: d(root height after K steps)/d(action)
        is finite and nonzero once the worm is in floor contact."""
        world, q0, v0 = jump_worm()
        eng = BatchedEngine(world)
        B = 2
        # Start in contact: root at resting height.
        q0 = np.array(q0)
        q0[1] = -0.52
        q = jnp.tile(jnp.asarray(q0)[:, None], (1, B))
        v = jnp.tile(jnp.asarray(v0)[:, None], (1, B))
        z = jnp.zeros((eng.num_rows, B), q.dtype)

        def height_after(a):
            u = eng.action_to_forces(jnp.tile(a[:, None], (1, B)))

            def body(c, _):
                q, v, z = c
                r = eng.step(q, v, u, z_warm=z)
                return (r.q, r.v, r.impulses), None

            (qf, vf, _), _ = jax.lax.scan(body, (q, v, z), None, length=5)
            return jnp.mean(qf[1])

        g = jax.grad(height_after)(jnp.zeros(3))
        assert bool(jnp.isfinite(g).all()), g
        assert float(jnp.abs(g).max()) > 0.0, g


class TestCatapult:
    def test_topology_and_action_space(self):
        world, q0, v0 = catapult()
        assert world.num_dofs == 5
        assert list(world.action_indices) == [2, 3, 4]
        names = [s.name for s in world.skeletons]
        assert names == ["projectile", "catapult", "floor"]

    def test_arm_torque_moves_projectile(self):
        """Driving the arm joints flings/clears the projectile: after 300
        steps with arm torque the projectile state differs measurably from
        the passive rollout (contact torque transfer works)."""
        world, q0, v0 = catapult()
        eng = BatchedEngine(world)
        qf_p, vf_p, _ = _scan_rollout(eng, q0, v0, B=2, steps=300)
        act = np.zeros(5)
        act[2:] = [-60.0, -60.0, -60.0]
        qf_a, vf_a, _ = _scan_rollout(
            eng, q0, v0, B=2, steps=300,
            u_fn=lambda q: jnp.tile(jnp.asarray(act)[:, None], (1, 2)),
        )
        assert bool(jnp.isfinite(qf_p).all() & jnp.isfinite(qf_a).all())
        # The arm positions respond to torque.
        assert float(jnp.abs(qf_a[2:5] - qf_p[2:5]).max()) > 0.05
