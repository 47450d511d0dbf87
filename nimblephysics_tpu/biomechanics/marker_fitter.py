"""MarkerFitter: bilevel mocap fitting — scales + offsets + per-frame IK.

TPU-native re-design of the reference MarkerFitter
(dart/biomechanics/MarkerFitter.hpp:596-605, 11.6k LoC around IPOPT): fit
body scales, marker offsets and per-frame poses to observed marker clouds.
The reference runs a bilevel IPOPT problem with threaded per-frame IK;
here the WHOLE problem is one differentiable objective batched over
frames — per-frame IK is `vmap`ped Gauss-Newton and the outer
scale/offset fit is Adam on the same jit-compiled loss, which is exactly
the shape of computation TPUs are built for (thousands of tiny IK
problems in parallel).

Occlusions: observed markers may contain NaN — masked out of the loss.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.biomechanics.scaled_fk import (
    marker_table,
    marker_world_positions,
)
from nimblephysics_tpu.dynamics.skeleton import Skeleton


@dataclasses.dataclass
class MarkerFitResult:
    """Reference parity: MarkerInitialization / MarkerFitResult."""

    body_scales: np.ndarray  # (nb, 3)
    marker_offsets: np.ndarray  # (M, 3)
    poses: np.ndarray  # (T, nq)
    avg_marker_error: float  # meters (RMS over observed markers)
    per_frame_error: np.ndarray  # (T,)
    marker_names: List[str]


class MarkerFitter:
    def __init__(
        self,
        skel: Skeleton,
        markers: Optional[Dict[str, Tuple[int, np.ndarray, bool]]] = None,
        regularize_scales: float = 1.0,
        regularize_offsets: float = 10.0,
        regularize_tracking_offsets: float = 0.05,
        scale_bounds: Tuple[float, float] = (0.7, 1.4),
        anthropometrics=None,
        anthropometric_weight: float = 1e-3,
        scale_groups=None,
    ):
        """anthropometrics: optional biomechanics.Anthropometrics prior —
        its log-pdf over body scales joins the outer objective (reference:
        MarkerFitter anthropometric prior term, MarkerFitter.hpp:599
        pipeline). scale_groups: optional biomechanics.ScaleGroups sharing
        one scale per symmetric group (GROUP_SCALES)."""
        self.skel = skel
        self.anthro = anthropometrics
        self.anthro_w = anthropometric_weight
        self.groups = scale_groups
        if markers is not None:
            for name, (b, off, fixed) in markers.items():
                skel.add_marker(name, b, off, fixed)
        (
            self.marker_names,
            self._bodies,
            self._offsets0,
            self._fixed,
        ) = marker_table(skel)
        self.reg_scales = regularize_scales
        self.reg_offsets = regularize_offsets
        self.reg_tracking = regularize_tracking_offsets
        self.scale_bounds = scale_bounds

    # ------------------------------------------------------------------

    def _markers_at(self, q, scales, offsets):
        return marker_world_positions(
            self.skel, q, self._bodies, offsets, scales
        )

    def _frame_loss(self, q, scales, offsets, observed, mask):
        pred = self._markers_at(q, scales, offsets)
        err = jnp.where(mask[:, None], pred - observed, 0.0)
        return jnp.sum(err * err), jnp.sum(mask)

    def fit(
        self,
        observed: np.ndarray,  # (T, M, 3), NaN = occluded
        q_init: Optional[np.ndarray] = None,
        outer_iterations: int = 60,
        ik_iterations: int = 8,
        lr_scales: float = 0.02,
        lr_offsets: float = 0.005,
        clean_traces: bool = False,
        dt: Optional[float] = None,
        joint_limits: bool = True,
        pose_regularization: float = 1e-4,
        outer_solver: str = "adam",
    ) -> MarkerFitResult:
        """Bilevel fit (reference: MarkerFitter::runKinematicsPipeline).

        Alternating scheme, all jit-compiled:
          inner: vmapped damped Gauss-Newton IK on every frame's pose
          outer: Adam on (log body scales, free marker offsets) — or,
          with outer_solver="gn", one Levenberg-damped Gauss-Newton step
          per alternation on the same variables. GN is the second-order
          analog of the reference's IPOPT outer problem
          (MarkerFitter.hpp:596-605) and reaches the reference's golden
          bounds in ~10 alternations where Adam needs hundreds (the
          Arnold2013 regression runs it in default CI). Requires no
          anthropometric prior (falls back to Adam when one is set).
        """
        skel = self.skel
        nq = skel.num_dofs
        nb = skel.num_bodies
        if clean_traces:
            from nimblephysics_tpu.biomechanics.marker_fixer import (
                clean_marker_traces,
            )

            observed, _report = clean_marker_traces(
                observed, dt=dt if dt is not None else 0.01
            )
        T, M, _ = observed.shape
        assert M == len(self.marker_names)

        obs = jnp.asarray(np.nan_to_num(observed, nan=0.0))
        mask = jnp.asarray(~np.isnan(observed[..., 0]))
        fixed = jnp.asarray(self._fixed)
        offsets0 = jnp.asarray(self._offsets0)
        lo, hi = self.scale_bounds

        poses = (
            jnp.zeros((T, nq))
            if q_init is None
            else jnp.asarray(q_init) + jnp.zeros((T, nq))
        )
        n_scale_params = self.groups.n_groups if self.groups else nb
        log_scales = jnp.zeros((n_scale_params, 3))
        d_offsets = jnp.zeros((M, 3))

        def scales_of(log_s):
            s = jnp.clip(jnp.exp(log_s), lo, hi)
            return self.groups.expand(s) if self.groups else s

        def offsets_of(d_off):
            # Reference parity (MarkerFitter::setRegularize*MarkerOffsets):
            # anatomical ("fixed") markers are strongly regularized but
            # MOVABLE — subject-specific placement differs from the
            # generic model; hard-freezing them floors the fit error.
            return offsets0 + d_off

        # -- inner: per-frame Gauss-Newton IK (vmapped over frames) --------
        # Joint-limit-aware (reference: the fitters' limit-respecting IK,
        # MarkerFitter.hpp pipeline): each GN step is clipped to the
        # position limits; a small Tikhonov pull toward the neutral pose
        # pins dofs the marker set barely observes (toes, pronation)
        # instead of letting them wander.
        q_lo = jnp.asarray(
            np.nan_to_num(skel.position_lower_limits(), neginf=-1e9)
        )
        q_hi = jnp.asarray(
            np.nan_to_num(skel.position_upper_limits(), posinf=1e9)
        )
        q_neutral = jnp.clip(jnp.zeros(nq), q_lo, q_hi)
        lam = pose_regularization

        def ik_refine(q, scales, offsets, ob, mk):
            def gn(qq, _):
                def resid(qqq):
                    pred = self._markers_at(qqq, scales, offsets)
                    return (
                        jnp.where(mk[:, None], pred - ob, 0.0)
                    ).reshape(-1)

                r = resid(qq)
                J = jax.jacfwd(resid)(qq)
                JtJ = J.T @ J + (1e-6 + lam) * jnp.eye(nq)
                rhs = J.T @ r + lam * (qq - q_neutral)
                dq = jnp.linalg.solve(JtJ, rhs)
                q_new = qq - dq
                if joint_limits:
                    q_new = jnp.clip(q_new, q_lo, q_hi)
                return q_new, None

            q2, _ = jax.lax.scan(gn, q, None, length=ik_iterations)
            return q2

        ik_all = jax.jit(
            jax.vmap(ik_refine, in_axes=(0, None, None, 0, 0))
        )

        # -- outer: scale/offset Adam on the total masked error ------------
        def outer_loss(log_s, d_off, poses):
            scales = scales_of(log_s)
            offsets = offsets_of(d_off)
            losses, counts = jax.vmap(
                lambda q, ob, mk: self._frame_loss(q, scales, offsets, ob, mk)
            )(poses, obs, mask)
            data = jnp.sum(losses) / jnp.maximum(jnp.sum(counts), 1.0)
            w_off = jnp.where(fixed[:, None], self.reg_offsets,
                              self.reg_tracking)
            reg = self.reg_scales * jnp.mean(log_s**2) + jnp.mean(
                w_off * d_off**2
            )
            if self.anthro is not None:
                reg = reg - self.anthro_w * self.anthro.log_pdf(scales)
            return data + reg

        outer_grad = jax.jit(jax.value_and_grad(outer_loss, argnums=(0, 1)))

        if outer_solver == "gn" and self.anthro is None:
            # Levenberg-damped Gauss-Newton on theta = [log_s; d_off]:
            # residuals are the per-marker errors (count-normalized to
            # match outer_loss's data term) plus the regularizer rows.
            n_s = n_scale_params * 3
            n_theta = n_s + M * 3
            w_off_row = jnp.where(
                fixed, self.reg_offsets, self.reg_tracking
            )

            def theta_residuals(theta, poses):
                log_s = theta[:n_s].reshape(n_scale_params, 3)
                d_off = theta[n_s:].reshape(M, 3)
                scales = scales_of(log_s)
                offsets = offsets_of(d_off)

                def frame_res(q, ob, mk):
                    pred = self._markers_at(q, scales, offsets)
                    return jnp.where(mk[:, None], pred - ob, 0.0)

                data = jax.vmap(frame_res)(poses, obs, mask).reshape(-1)
                data = data / jnp.sqrt(
                    jnp.maximum(jnp.sum(mask), 1.0)
                )
                r_s = jnp.sqrt(self.reg_scales / n_s) * log_s.reshape(-1)
                r_o = (
                    jnp.sqrt(w_off_row[:, None] / (M * 3)) * d_off
                ).reshape(-1)
                return jnp.concatenate([data, r_s, r_o])

            @jax.jit
            def gn_outer_step(theta, poses, mu):
                r = theta_residuals(theta, poses)
                J = jax.jacfwd(theta_residuals)(theta, poses)
                g = J.T @ r
                H = J.T @ J
                D = jnp.diag(jnp.maximum(jnp.diagonal(H), 1e-10))
                dt_ = jnp.linalg.solve(H + mu * D, -g)
                f0 = jnp.sum(r * r)
                r1 = theta_residuals(theta + dt_, poses)
                f1 = jnp.sum(r1 * r1)
                accept = f1 < f0
                theta = jnp.where(accept, theta + dt_, theta)
                mu = jnp.where(accept, jnp.maximum(mu / 3.0, 1e-10),
                               mu * 4.0)
                return theta, mu

            theta = jnp.concatenate(
                [log_scales.reshape(-1), d_offsets.reshape(-1)]
            )
            mu = jnp.asarray(1e-3)
            for it in range(outer_iterations):
                log_scales = theta[:n_s].reshape(n_scale_params, 3)
                d_offsets = theta[n_s:].reshape(M, 3)
                scales = scales_of(log_scales)
                offsets = offsets_of(d_offsets)
                poses = ik_all(poses, scales, offsets, obs, mask)
                theta, mu = gn_outer_step(theta, poses, mu)
            log_scales = theta[:n_s].reshape(n_scale_params, 3)
            d_offsets = theta[n_s:].reshape(M, 3)
        else:
            m_s = jnp.zeros_like(log_scales)
            v_s = jnp.zeros_like(log_scales)
            m_o = jnp.zeros_like(d_offsets)
            v_o = jnp.zeros_like(d_offsets)

            for it in range(outer_iterations):
                scales = scales_of(log_scales)
                offsets = offsets_of(d_offsets)
                poses = ik_all(poses, scales, offsets, obs, mask)
                _, (gs, go) = outer_grad(log_scales, d_offsets, poses)
                t = it + 1.0
                m_s = 0.9 * m_s + 0.1 * gs
                v_s = 0.999 * v_s + 0.001 * gs * gs
                log_scales = log_scales - lr_scales * (
                    m_s / (1 - 0.9**t)
                ) / (jnp.sqrt(v_s / (1 - 0.999**t)) + 1e-8)
                m_o = 0.9 * m_o + 0.1 * go
                v_o = 0.999 * v_o + 0.001 * go * go
                d_offsets = d_offsets - lr_offsets * (
                    m_o / (1 - 0.9**t)
                ) / (jnp.sqrt(v_o / (1 - 0.999**t)) + 1e-8)

        scales = scales_of(log_scales)
        offsets = offsets_of(d_offsets)
        poses = ik_all(poses, scales, offsets, obs, mask)

        # Final per-frame RMS (meters).
        def frame_rms(q, ob, mk):
            pred = self._markers_at(q, scales, offsets)
            err2 = jnp.sum(
                jnp.where(mk[:, None], (pred - ob) ** 2, 0.0), axis=-1
            )
            return jnp.sqrt(
                jnp.sum(err2) / jnp.maximum(jnp.sum(mk), 1.0)
            )

        per_frame = jax.jit(jax.vmap(frame_rms))(poses, obs, mask)
        return MarkerFitResult(
            body_scales=np.asarray(scales),
            marker_offsets=np.asarray(offsets),
            poses=np.asarray(poses),
            avg_marker_error=float(jnp.mean(per_frame)),
            per_frame_error=np.asarray(per_frame),
            marker_names=self.marker_names,
        )
