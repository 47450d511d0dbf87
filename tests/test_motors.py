"""Servo/mimic/locked actuators + weld/ball dynamic constraints.

Mirrors the reference's constraint-family unit tests (ServoMotorConstraint,
MimicMotorConstraint, WeldJointConstraint, BallJointConstraint —
SURVEY.md 2.3).
"""

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.neural.timestep import Engine
from nimblephysics_tpu.simulation import World

from worlds import double_pendulum, free_box, pendulum


class TestServoMotor:
    def test_servo_tracks_velocity_command(self):
        w = World(gravity=(0, 0, -9.81))
        w.add_skeleton(pendulum())
        w.set_actuator_type(0, "servo", force_limit=1000.0)
        eng = Engine(w)
        r = eng.step(jnp.zeros(1), jnp.zeros(1), jnp.array([0.7]))
        np.testing.assert_allclose(float(r.v[0]), 0.7, atol=1e-8)

    def test_servo_respects_force_limit(self):
        """Weak servo cannot reach the commanded velocity in one step."""
        w = World(gravity=(0, 0, 0))
        w.add_skeleton(pendulum())
        w.set_actuator_type(0, "servo", force_limit=0.01)
        eng = Engine(w)
        r = eng.step(jnp.zeros(1), jnp.zeros(1), jnp.array([10.0]))
        v = float(r.v[0])
        assert 0 < v < 1.0, v  # moved, but far from 10 rad/s

    def test_locked_joint(self):
        w = World(gravity=(0, 0, -9.81))
        w.add_skeleton(pendulum())
        w.set_actuator_type(0, "locked")
        eng = Engine(w)
        q = jnp.array([0.8])
        r = eng.step(q, jnp.array([0.5]), jnp.zeros(1))
        np.testing.assert_allclose(float(r.v[0]), 0.0, atol=1e-8)

    def test_mimic_motor(self):
        w = World(gravity=(0, 0, 0))
        w.add_skeleton(double_pendulum())
        w.set_actuator_type(1, "mimic", force_limit=1e4,
                            mimic_dof=0, mimic_multiplier=0.5)
        eng = Engine(w)
        # Drive dof 0; dof 1 must track half its velocity.
        r = eng.step(jnp.zeros(2), jnp.array([1.0, 0.0]), jnp.array([2.0, 0.0]))
        np.testing.assert_allclose(
            float(r.v[1]), 0.5 * float(r.v[0]), atol=1e-6
        )


class TestDynamicJointConstraints:
    def test_ball_constraint_pins_point(self):
        """Free box pinned by a ball constraint to the world (static ground
        body): the anchor point must not move while the box swings."""
        from worlds import ground_plane

        w = World(time_step=1e-3)
        w.add_skeleton(free_box(size=(0.2, 0.2, 0.2)))
        w.add_skeleton(ground_plane())
        # Pin box corner (0.1, 0, 0.1) to world point (0.1, 0, 1.0):
        # move box so its corner starts at the anchor.
        w.add_ball_joint_constraint(0, [0.1, 0.0, 0.1], 1, [0.1, 0.0, 1.0])
        eng = Engine(w)
        q = jnp.zeros(6).at[5].set(0.9)  # corner at (0.1, 0, 1.0)
        v = jnp.zeros(6)

        def body(c, _):
            q, v = c
            r = eng.step(q, v, jnp.zeros(6))
            return (r.q, r.v), None

        (qf, vf), _ = jax.lax.scan(body, (q, v), None, length=200)
        # Recompute anchor position after 0.2 s of swinging.
        from nimblephysics_tpu.simulation.world import world_fk
        from nimblephysics_tpu.math import lie

        T = world_fk(w, qf)
        anchor = lie.transform_point(T[0], jnp.array([0.1, 0.0, 0.1]))
        np.testing.assert_allclose(
            np.asarray(anchor), [0.1, 0.0, 1.0], atol=5e-3
        )
        # ...and the box must actually have rotated (it swings).
        assert float(jnp.abs(qf[:3]).max()) > 0.05

    def test_weld_constraint_locks_relative_motion(self):
        w = World(time_step=1e-3, gravity=(0, 0, -9.81))
        w.add_skeleton(free_box())
        w.add_skeleton(free_box())
        q = jnp.zeros(12).at[9].set(0.5)  # second box offset in x
        # Weld at the offset pose (reference parity: the relative pose at
        # creation is the one the constraint maintains).
        w.add_weld_joint_constraint(0, 1, at_positions=np.asarray(q))
        eng = Engine(w)
        v = jnp.zeros(12).at[0].set(1.0)  # spin the first box

        def body(c, _):
            q, v = c
            r = eng.step(q, v, jnp.zeros(12))
            return (r.q, r.v), None

        (qf, vf), _ = jax.lax.scan(body, (q, v), None, length=100)
        # Relative spatial velocity (world frame) must be ~0 (small ERP
        # correction velocity allowed), and the welded relative pose held.
        from nimblephysics_tpu.simulation.world import (
            world_fk,
            world_full_kinematics,
        )

        kin = world_full_kinematics(w, qf, vf)
        Vrel = kin["J_world"][0] @ vf - kin["J_world"][1] @ vf
        np.testing.assert_allclose(np.asarray(Vrel), 0.0, atol=5e-3)
        T = np.asarray(world_fk(w, qf))
        rel_pos = T[0][:3, :3].T @ (T[1][:3, 3] - T[0][:3, 3])
        rel_rot = T[0][:3, :3].T @ T[1][:3, :3]
        np.testing.assert_allclose(rel_pos, [0.5, 0.0, 0.0], atol=2e-3)
        np.testing.assert_allclose(rel_rot, np.eye(3), atol=2e-3)


class TestConstraintDrift:
    """Long-horizon stabilization: welded/pinned pairs must NOT drift
    under sustained gravity load (round-2 verdict weak #3; reference
    WeldJointConstraint feeds pose error into the rhs)."""

    def _run(self, w, q, v, steps):
        eng = Engine(w)

        def body(c, _):
            q, v = c
            r = eng.step(q, v, jnp.zeros(q.shape[0]))
            return (r.q, r.v), None

        (qf, vf), _ = jax.lax.scan(body, (q, v), None, length=steps)
        return qf, vf

    def test_weld_no_drift_1000_steps(self):
        """A free box welded (at an offset) to a static ground body hangs
        under gravity for 1 s; the captured relative pose must hold."""
        from worlds import ground_plane

        w = World(time_step=1e-3, gravity=(0, 0, -9.81))
        w.add_skeleton(free_box())
        w.add_skeleton(ground_plane())
        q = jnp.zeros(6).at[3].set(0.3).at[5].set(1.0)  # offset in x, up z
        w.add_weld_joint_constraint(0, 1, at_positions=np.asarray(q))
        qf, vf = self._run(w, q, v=jnp.zeros(6), steps=1000)
        # Pose must be exactly where it was welded (no drift).
        np.testing.assert_allclose(np.asarray(qf), np.asarray(q), atol=2e-3)
        np.testing.assert_allclose(np.asarray(vf), 0.0, atol=1e-3)

    def test_weld_recovers_from_perturbation(self):
        """Pose error injected at t=0 decays (ERP feedback drives the
        welded pair back to the captured relative transform)."""
        from nimblephysics_tpu.math import lie
        from nimblephysics_tpu.simulation.world import world_fk

        w = World(time_step=1e-3, gravity=(0, 0, 0))
        w.add_skeleton(free_box())
        w.add_skeleton(free_box())
        q0 = jnp.zeros(12).at[9].set(0.5)
        w.add_weld_joint_constraint(0, 1, at_positions=np.asarray(q0))
        # Perturb: shift + twist box 2 away from the welded pose.
        q = q0.at[9].add(0.05).at[6].add(0.04)
        qf, vf = self._run(w, q, v=jnp.zeros(12), steps=500)
        T = np.asarray(world_fk(w, qf))
        rel_pos = T[0][:3, :3].T @ (T[1][:3, 3] - T[0][:3, 3])
        rel_rot = T[0][:3, :3].T @ T[1][:3, :3]
        np.testing.assert_allclose(rel_pos, [0.5, 0.0, 0.0], atol=5e-3)
        np.testing.assert_allclose(rel_rot, np.eye(3), atol=5e-3)

    def test_ball_no_drift_1000_steps(self):
        """Pinned swinging box: anchor point must stay put for 1 s."""
        from worlds import ground_plane
        from nimblephysics_tpu.math import lie
        from nimblephysics_tpu.simulation.world import world_fk

        w = World(time_step=1e-3)
        w.add_skeleton(free_box(size=(0.2, 0.2, 0.2)))
        w.add_skeleton(ground_plane())
        w.add_ball_joint_constraint(0, [0.1, 0.0, 0.1], 1, [0.1, 0.0, 1.0])
        q = jnp.zeros(6).at[5].set(0.9)
        qf, vf = self._run(w, q, v=jnp.zeros(6), steps=1000)
        T = world_fk(w, qf)
        anchor = lie.transform_point(T[0], jnp.array([0.1, 0.0, 0.1]))
        np.testing.assert_allclose(
            np.asarray(anchor), [0.1, 0.0, 1.0], atol=5e-3
        )

    def test_weld_batched_matches_single(self):
        """Batched engine weld rows (orientation+anchor with ERP) match
        the reference-parity engine step exactly."""
        from nimblephysics_tpu.batched import BatchedEngine

        w = World(time_step=1e-3, gravity=(0, 0, -9.81))
        w.add_skeleton(free_box())
        w.add_skeleton(free_box())
        q0 = jnp.zeros(12).at[9].set(0.4).at[11].set(0.1)
        w.add_weld_joint_constraint(0, 1, at_positions=np.asarray(q0))
        eng = Engine(w)
        beng = BatchedEngine(w)
        q = q0.at[6].add(0.03)  # small pose error to engage ERP
        v = jnp.zeros(12).at[0].set(0.5)
        r1 = eng.step(q, v, jnp.zeros(12))
        rb = beng.step(q[:, None], v[:, None], jnp.zeros((12, 1)))
        np.testing.assert_allclose(
            np.asarray(rb.q[:, 0]), np.asarray(r1.q), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(rb.v[:, 0]), np.asarray(r1.v), atol=1e-6
        )


class TestServoGradients:
    def test_grad_through_servo(self):
        """Gradients flow through the servo constraint (command -> state)."""
        from nimblephysics_tpu.math import finite_difference_jacobian

        w = World(gravity=(0, 0, -9.81))
        w.add_skeleton(pendulum())
        w.set_actuator_type(0, "servo", force_limit=1000.0)
        eng = Engine(w)

        @jax.jit
        def f(cmd):
            r = eng.step(jnp.array([0.3]), jnp.array([0.1]), cmd)
            return jnp.concatenate([r.q, r.v])

        J = jax.jit(jax.jacrev(f))(jnp.array([0.4]))
        fd = finite_difference_jacobian(
            lambda c: np.asarray(f(jnp.asarray(c))), np.array([0.4])
        )
        np.testing.assert_allclose(np.asarray(J), fd, atol=1e-8)
