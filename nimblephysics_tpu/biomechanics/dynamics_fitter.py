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
