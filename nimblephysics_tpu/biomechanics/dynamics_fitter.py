"""DynamicsFitter: fit inertial properties + residual-free trajectories.

Reference parity: dart/biomechanics/DynamicsFitter.hpp:1250 (18.9k LoC
around IPOPT): given kinematic trajectories and measured ground-reaction
forces, fit per-body masses/COMs (and optionally refine the motion) so the
root-residual wrench vanishes ("residual-free" dynamics).

TPU-native: the residual at every frame is the root entry of RNEA inverse
dynamics minus the measured external wrenches; frames batch under vmap and
the whole objective is one jit-compiled Adam loop over
(log-masses, COM offsets[, pose corrections]).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.dynamics.skeleton import (
    Skeleton,
    default_body_params,
    inverse_dynamics,
)


@dataclasses.dataclass
class DynamicsFitResult:
    masses: np.ndarray  # (nb,)
    coms: np.ndarray  # (nb, 3)
    avg_residual_force: float  # N, root linear residual after fitting
    avg_residual_torque: float  # Nm
    loss_history: list


class DynamicsFitter:
    def __init__(
        self,
        skel: Skeleton,
        root_dofs: int = 6,
        gravity=(0.0, -9.81, 0.0),
        regularize_masses: float = 1.0,
        regularize_coms: float = 10.0,
    ):
        self.skel = skel
        self.root_dofs = root_dofs
        self.gravity = np.asarray(gravity, dtype=np.float64)
        self.reg_m = regularize_masses
        self.reg_c = regularize_coms

    def fit(
        self,
        poses: np.ndarray,  # (T, nq)
        vels: np.ndarray,
        accs: np.ndarray,
        ext_root_wrench: Optional[np.ndarray] = None,  # (T, root_dofs):
        # measured external generalized force on the root (from force
        # plates mapped through the contact Jacobian), 0 if airborne.
        iterations: int = 120,
        learning_rate: float = 0.03,
    ) -> DynamicsFitResult:
        skel = self.skel
        g = jnp.asarray(self.gravity)
        rd = self.root_dofs
        bp0 = default_body_params(skel)
        T = poses.shape[0]
        if ext_root_wrench is None:
            ext_root_wrench = np.zeros((T, rd))

        q_t = jnp.asarray(poses)
        v_t = jnp.asarray(vels)
        a_t = jnp.asarray(accs)
        w_t = jnp.asarray(ext_root_wrench)

        def residual(log_m, d_com, q, v, a, wext):
            bp = {
                "masses": jnp.exp(log_m),
                "coms": bp0["coms"] + d_com,
            }
            tau = inverse_dynamics(skel, q, v, a, gravity=g, body_params=bp)
            # Root dofs are unactuated: tau_root must equal the measured
            # external wrench (residual-free condition).
            return tau[:rd] - wext

        def loss(log_m, d_com):
            res = jax.vmap(
                lambda q, v, a, w: residual(log_m, d_com, q, v, a, w)
            )(q_t, v_t, a_t, w_t)
            data = jnp.mean(res**2)
            reg = self.reg_m * jnp.mean(
                (log_m - jnp.log(bp0["masses"])) ** 2
            ) + self.reg_c * jnp.mean(d_com**2)
            return data + reg

        grad_fn = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))

        log_m = jnp.log(bp0["masses"])
        d_com = jnp.zeros_like(bp0["coms"])
        m1 = jnp.zeros_like(log_m)
        v1 = jnp.zeros_like(log_m)
        m2 = jnp.zeros_like(d_com)
        v2 = jnp.zeros_like(d_com)
        hist = []
        for it in range(1, iterations + 1):
            f, (g1, g2) = grad_fn(log_m, d_com)
            hist.append(float(f))
            m1 = 0.9 * m1 + 0.1 * g1
            v1 = 0.999 * v1 + 0.001 * g1 * g1
            log_m = log_m - learning_rate * (m1 / (1 - 0.9**it)) / (
                jnp.sqrt(v1 / (1 - 0.999**it)) + 1e-8
            )
            m2 = 0.9 * m2 + 0.1 * g2
            v2 = 0.999 * v2 + 0.001 * g2 * g2
            d_com = d_com - learning_rate * 0.1 * (m2 / (1 - 0.9**it)) / (
                jnp.sqrt(v2 / (1 - 0.999**it)) + 1e-8
            )

        res = jax.vmap(
            lambda q, v, a, w: residual(log_m, d_com, q, v, a, w)
        )(q_t, v_t, a_t, w_t)
        res = np.asarray(res)
        lin = res[:, 3:rd] if rd >= 6 else res
        ang = res[:, : min(3, rd)]
        return DynamicsFitResult(
            masses=np.asarray(jnp.exp(log_m)),
            coms=np.asarray(bp0["coms"] + d_com),
            avg_residual_force=float(np.sqrt((lin**2).mean()))
            if lin.size
            else 0.0,
            avg_residual_torque=float(np.sqrt((ang**2).mean()))
            if ang.size
            else 0.0,
            loss_history=hist,
        )


@dataclasses.dataclass
class ResidualFreeResult:
    """Reference parity: the DynamicsFitter residual-elimination pass
    (zeroLinearResidualsAndOptimizeInitialConditions semantics,
    DynamicsFitter.hpp:1250 family)."""

    poses: np.ndarray  # (T, nq) corrected trajectory
    masses: np.ndarray
    coms: np.ndarray
    lin_residual_before: float  # N (RMS over frames)
    lin_residual_after: float
    ang_residual_before: float  # Nm
    ang_residual_after: float
    com_correction_rms: float  # m — size of the trajectory correction


def _com_world(skel, q, masses, coms):
    """World COM of the whole skeleton (traced)."""
    from nimblephysics_tpu.dynamics.skeleton import forward_kinematics
    from nimblephysics_tpu.math import lie

    T_wb = forward_kinematics(skel, q)
    pts = jax.vmap(lie.transform_point)(T_wb, coms)  # (nb, 3)
    m = masses[:, None]
    return jnp.sum(m * pts, axis=0) / jnp.sum(masses)


@dataclasses.dataclass
class PlateFitResult:
    masses: np.ndarray  # (nb,)
    coms: np.ndarray  # (nb, 3)
    inertia_scales: np.ndarray  # (nb, 3) diagonal dimension scales
    poses: np.ndarray  # (T, nq) (refined when refine_trajectory)
    avg_residual_force: float
    avg_residual_torque: float
    loss_history: list


class ResidualEliminator:
    """Analytic residual-free trajectory pass (the flagship
    AddBiomechanics capability — reference DynamicsFitter.hpp:1250
    `zeroLinearResiduals...` semantics, re-designed closed-form):

    Newton's law pins the COM path: m (a_com - g) = F_measured. The only
    physically consistent COM acceleration is a* = F/m + g; double-
    integrating a* (with the free initial position/velocity chosen by
    per-axis linear least squares to stay closest to the kinematic COM
    path) gives the corrected COM trajectory, and shifting the root
    translation dofs by the COM correction makes the LINEAR root
    residual vanish identically — no iterative optimization needed.
    The reference reaches the same fixed point through IPOPT.
    """

    def __init__(self, skel: Skeleton, root_trans_dofs=(3, 4, 5),
                 gravity=(0.0, -9.81, 0.0)):
        self.skel = skel
        self.rt = np.asarray(root_trans_dofs, dtype=np.int64)
        self.gravity = np.asarray(gravity, dtype=np.float64)

    def zero_linear_residuals(
        self,
        poses: np.ndarray,  # (T, nq)
        dt: float,
        total_force: np.ndarray,  # (T, 3) world-frame measured force sum
        masses: Optional[np.ndarray] = None,
        coms: Optional[np.ndarray] = None,
    ) -> ResidualFreeResult:
        skel = self.skel
        bp0 = default_body_params(skel)
        m_b = jnp.asarray(masses) if masses is not None else bp0["masses"]
        c_b = jnp.asarray(coms) if coms is not None else bp0["coms"]
        m_tot = float(jnp.sum(m_b))
        g = self.gravity
        T = poses.shape[0]
        q_t = jnp.asarray(poses)

        com_fn = jax.jit(
            jax.vmap(lambda q: _com_world(skel, q, m_b, c_b))
        )
        com_path = np.asarray(com_fn(q_t))  # (T, 3)

        # Physics-consistent COM acceleration from the measured force.
        a_star = total_force / m_tot + g[None, :]  # (T, 3)
        # Kinematic COM acceleration (central differences).
        a_kin = np.zeros_like(com_path)
        a_kin[1:-1] = (
            com_path[2:] - 2 * com_path[1:-1] + com_path[:-2]
        ) / (dt * dt)
        a_kin[0], a_kin[-1] = a_kin[1], a_kin[-2]
        res_before = m_tot * (a_kin[1:-1] - a_star[1:-1])  # (T-2, 3) N

        # Discrete double integration of the acceleration DEFICIT: build D
        # whose central second difference equals the defect EXACTLY
        # (D[t+1] = 2 D[t] - D[t-1] + dt^2 defect[t]) so the corrected
        # path's finite-difference acceleration is a* by construction —
        # the same estimator the residual is measured with.
        defect = a_star - a_kin
        D = np.zeros((T, 3))
        for t in range(1, T - 1):
            D[t + 1] = 2 * D[t] - D[t - 1] + dt * dt * defect[t]
        # Choose (d0, v0) minimizing sum ||d(t)||^2 per axis (reference:
        # "optimize initial conditions").
        tgrid = np.arange(T) * dt
        A = np.stack([np.ones(T), tgrid], axis=1)  # (T, 2)
        coef, *_ = np.linalg.lstsq(A, -D, rcond=None)  # (2, 3)
        d = D + A @ coef  # (T, 3) COM correction

        # Map the COM correction onto the root translation dofs:
        # J = d com / d q_root_trans (constant 3x3 for translations).
        def com_of_rt(x):
            q = q_t[0].at[self.rt].add(x)
            return _com_world(skel, q, m_b, c_b)

        J = np.asarray(jax.jacfwd(com_of_rt)(jnp.zeros(3)))  # (3, 3)
        dq_rt = np.linalg.solve(J, d.T).T  # (T, 3)
        poses_new = np.asarray(poses).copy()
        poses_new[:, self.rt] += dq_rt

        # After-correction linear residual (same estimator).
        com2 = np.asarray(com_fn(jnp.asarray(poses_new)))
        a2 = np.zeros_like(com2)
        a2[1:-1] = (com2[2:] - 2 * com2[1:-1] + com2[:-2]) / (dt * dt)
        res_after = m_tot * (a2[1:-1] - a_star[1:-1])

        def rms(x):
            return float(np.sqrt(np.mean(np.sum(x**2, axis=-1))))

        return ResidualFreeResult(
            poses=poses_new,
            masses=np.asarray(m_b),
            coms=np.asarray(c_b),
            lin_residual_before=rms(res_before),
            lin_residual_after=rms(res_after),
            ang_residual_before=0.0,
            ang_residual_after=0.0,
            com_correction_rms=rms(d),
        )


    def reduce_spatial_residuals(
        self,
        poses: np.ndarray,  # (T, nq) — typically zero_linear_residuals output
        dt: float,
        ext_root_wrench: Optional[np.ndarray] = None,  # (T, 6) generalized
        # measured wrench on the root dofs; OR give plate data below so the
        # wrench is re-mapped through the contact Jacobians as poses move.
        masses: Optional[np.ndarray] = None,
        coms: Optional[np.ndarray] = None,
        root_dofs=(0, 1, 2, 3, 4, 5),
        plate_wrenches: Optional[np.ndarray] = None,  # (T, P, 6) world
        plate_onehot: Optional[np.ndarray] = None,  # (T, P, C)
        contact_bodies: Optional[np.ndarray] = None,  # (C,)
        iterations: int = 250,
        learning_rate: float = 2e-3,
        w_angular: float = 1.0,
        w_linear: float = 1.0,
        smoothness: float = 1e-2,
        anchor: float = 1e-4,
        gravity=None,
    ) -> ResidualFreeResult:
        """Stage-2 spatial (angular + linear) residual reduction.

        The closed-form linear pass (zero_linear_residuals) pins the COM
        path but leaves the ANGULAR root residual untouched — the rate of
        whole-body angular momentum must also match the measured moments.
        There is no closed form for that (angular momentum is nonlinear in
        the root orientation), so this pass does what the reference's
        DynamicsFitter does inside IPOPT (DynamicsFitter.hpp:1250, the
        spatial-residual objective over the root trajectory): minimize the
        RNEA root-residual wrench over per-frame ROOT pose corrections,
        with an acceleration-smoothness prior and an anchor to the input
        trajectory, by jit-compiled Adam. The residual estimator is
        identical to DynamicsFitter.fit (central-difference v/a + RNEA),
        so before/after numbers are directly comparable.
        """
        skel = self.skel
        g = jnp.asarray(
            self.gravity if gravity is None else np.asarray(gravity)
        )
        bp0 = default_body_params(skel)
        bp = {
            "masses": jnp.asarray(masses)
            if masses is not None
            else bp0["masses"],
            "coms": jnp.asarray(coms) if coms is not None else bp0["coms"],
        }
        T, nq = poses.shape
        rdofs = np.asarray(root_dofs, dtype=np.int64)
        q_t = jnp.asarray(poses)
        use_plates = plate_wrenches is not None
        if use_plates:
            w_t = jnp.asarray(plate_wrenches)
            oh_t = jnp.asarray(plate_onehot)
            cb = np.asarray(contact_bodies)
        else:
            assert ext_root_wrench is not None
            wext_t = jnp.asarray(ext_root_wrench)

        def residual_frames(dq_root):
            dq = jnp.zeros((T, nq)).at[:, rdofs].set(dq_root)
            qs = q_t + dq
            qm = qs[1:-1]
            vm = (qs[2:] - qs[:-2]) / (2 * dt)
            am = (qs[2:] - 2 * qs[1:-1] + qs[:-2]) / (dt * dt)

            if use_plates:
                from nimblephysics_tpu.biomechanics.force_plate import (
                    grf_generalized_forces,
                )

                def one(q, v, a, w, oh):
                    tau = inverse_dynamics(
                        skel, q, v, a, gravity=g, body_params=bp
                    )
                    tau_ext = grf_generalized_forces(skel, q, w, oh, cb)
                    return tau[:6] - tau_ext[:6]

                return jax.vmap(one)(qm, vm, am, w_t[1:-1], oh_t[1:-1])

            def one(q, v, a, wx):
                tau = inverse_dynamics(
                    skel, q, v, a, gravity=g, body_params=bp
                )
                return tau[:6] - wx

            return jax.vmap(one)(qm, vm, am, wext_t[1:-1])

        # Which residual components are angular vs linear: the root
        # rotation dofs' generalized forces are torques. For the standard
        # free/euler-free root the first three of the six root dofs are
        # rotations; callers with translation-first roots pass root_dofs
        # reordered (rotation dofs first).
        def split(res):
            return res[:, :3], res[:, 3:6]

        def loss(dq_root):
            ang, lin = split(residual_frames(dq_root))
            dd = dq_root[2:] - 2 * dq_root[1:-1] + dq_root[:-2]
            return (
                w_angular * jnp.mean(ang**2)
                + w_linear * jnp.mean(lin**2)
                + smoothness * jnp.mean((dd / (dt * dt)) ** 2) * dt**2
                + anchor * jnp.mean(dq_root**2)
            )

        import optax

        opt = optax.adam(learning_rate)
        dq_root = jnp.zeros((T, len(rdofs)))
        opt_state = opt.init(dq_root)

        @jax.jit
        def step(dq_root, opt_state):
            l, grads = jax.value_and_grad(loss)(dq_root)
            upd, opt_state = opt.update(grads, opt_state)
            return optax.apply_updates(dq_root, upd), opt_state, l

        ang0, lin0 = split(np.asarray(residual_frames(dq_root)))
        for _ in range(iterations):
            dq_root, opt_state, _l = step(dq_root, opt_state)
        ang1, lin1 = split(np.asarray(residual_frames(dq_root)))

        def rms(x):
            return float(np.sqrt(np.mean(np.sum(np.asarray(x) ** 2,
                                                axis=-1))))

        poses_new = np.asarray(poses).copy()
        poses_new[:, rdofs] += np.asarray(dq_root)
        return ResidualFreeResult(
            poses=poses_new,
            masses=np.asarray(bp["masses"]),
            coms=np.asarray(bp["coms"]),
            lin_residual_before=rms(lin0),
            lin_residual_after=rms(lin1),
            ang_residual_before=rms(ang0),
            ang_residual_after=rms(ang1),
            com_correction_rms=rms(np.asarray(dq_root)),
        )


class DynamicsFitterWithPlates(DynamicsFitter):
    """The full GRF pipeline (reference: DynamicsFitter.hpp:1250):

      raw force plates (CoP + force + free moment)
        -> per-frame plate-to-foot assignment (CoP proximity)
        -> generalized external forces through contact-body Jacobians
        -> residual-free fit of masses / COMs / diagonal inertia scales
           (+ optional trajectory refinement so accelerations stay
            consistent with the refined poses).

    All per-frame quantities vmap over time; the whole objective is one
    jit-compiled Adam loop.
    """

    def fit_with_plates(
        self,
        poses: np.ndarray,  # (T, nq)
        dt: float,
        plates,  # Sequence[ForcePlate]
        contact_body_names,
        iterations: int = 200,
        learning_rate: float = 0.02,
        fit_inertia: bool = True,
        refine_trajectory: bool = False,
        regularize_inertia: float = 10.0,
        regularize_poses: float = 1e3,
        force_threshold: float = 3.0,
    ) -> PlateFitResult:
        from nimblephysics_tpu.biomechanics.force_plate import (
            assign_plates_to_bodies,
            grf_generalized_forces,
        )

        skel = self.skel
        g = jnp.asarray(self.gravity)
        rd = self.root_dofs
        bp0 = default_body_params(skel)
        T, nq = poses.shape
        contact_bodies = np.asarray(
            [skel.body_index(n) for n in contact_body_names]
        )
        C = len(contact_bodies)
        P = len(plates)

        # Static per-frame wrenches + hard assignments (preprocessing).
        wrench_t = np.stack(
            [p.world_wrenches() for p in plates], axis=1
        )  # (T, P, 6)
        assign = assign_plates_to_bodies(
            skel, poses, plates, contact_body_names,
            force_threshold=force_threshold,
        )  # (T, P) in [-1, C)
        onehot_t = np.zeros((T, P, C))
        for t in range(T):
            for p in range(P):
                if assign[t, p] >= 0:
                    onehot_t[t, p, assign[t, p]] = 1.0

        q_t = jnp.asarray(poses)
        w_t = jnp.asarray(wrench_t)
        oh_t = jnp.asarray(onehot_t)
        cb = contact_bodies

        def fd_vel_acc(qs):
            # Central differences (reference: the fitters' finite
            # differencing of IK poses for ID).
            v = (qs[2:] - qs[:-2]) / (2 * dt)
            a = (qs[2:] - 2 * qs[1:-1] + qs[:-2]) / (dt * dt)
            return qs[1:-1], v, a

        def residual_frames(log_m, d_com, log_is, dq):
            bp = {"masses": jnp.exp(log_m), "coms": bp0["coms"] + d_com}
            if fit_inertia:
                bp["inertias"] = bp0["inertias"] * jnp.exp(log_is)[
                    :, :, None
                ] * jnp.exp(log_is)[:, None, :]
            qs = q_t + dq
            qm, vm, am = fd_vel_acc(qs)
            wm, ohm = w_t[1:-1], oh_t[1:-1]

            def one(q, v, a, w, oh):
                tau = inverse_dynamics(
                    skel, q, v, a, gravity=g, body_params=bp
                )
                tau_ext = grf_generalized_forces(skel, q, w, oh, cb)
                return tau[:rd] - tau_ext[:rd]

            return jax.vmap(one)(qm, vm, am, wm, ohm)

        def loss(log_m, d_com, log_is, dq):
            res = residual_frames(log_m, d_com, log_is, dq)
            data = jnp.mean(res**2)
            reg = (
                self.reg_m * jnp.mean((log_m - jnp.log(bp0["masses"])) ** 2)
                + self.reg_c * jnp.mean(d_com**2)
                + regularize_inertia * jnp.mean(log_is**2)
            )
            if refine_trajectory:
                reg = reg + regularize_poses * jnp.mean(dq**2)
            return data + reg

        import optax

        opt = optax.adam(learning_rate)
        params = {
            "log_m": jnp.log(bp0["masses"]),
            "d_com": jnp.zeros_like(bp0["coms"]),
            "log_is": jnp.zeros((skel.num_bodies, 3)),
            "dq": jnp.zeros((T, nq)),
        }
        trainable = ["log_m", "d_com"]
        if fit_inertia:
            trainable.append("log_is")
        if refine_trajectory:
            trainable.append("dq")

        @jax.jit
        def step(params, opt_state):
            def f(params):
                return loss(
                    params["log_m"], params["d_com"], params["log_is"],
                    params["dq"],
                )

            l, grads = jax.value_and_grad(f)(params)
            grads = {
                k: (g if k in trainable else jnp.zeros_like(g))
                for k, g in grads.items()
            }
            upd, opt_state = opt.update(grads, opt_state)
            import optax as _ox

            return _ox.apply_updates(params, upd), opt_state, l

        opt_state = opt.init(params)
        hist = []
        for _ in range(iterations):
            params, opt_state, l = step(params, opt_state)
            hist.append(float(l))

        res = np.asarray(
            residual_frames(
                params["log_m"], params["d_com"], params["log_is"],
                params["dq"],
            )
        )
        lin = res[:, 3:rd] if rd >= 6 else res
        ang = res[:, : min(3, rd)]
        return PlateFitResult(
            masses=np.asarray(jnp.exp(params["log_m"])),
            coms=np.asarray(bp0["coms"] + params["d_com"]),
            inertia_scales=np.asarray(jnp.exp(params["log_is"])),
            poses=np.asarray(q_t + params["dq"]),
            avg_residual_force=float(np.sqrt((lin**2).mean()))
            if lin.size
            else 0.0,
            avg_residual_torque=float(np.sqrt((ang**2).mean()))
            if ang.size
            else 0.0,
            loss_history=hist,
        )
