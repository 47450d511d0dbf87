"""Trajectory smoothers: acceleration/velocity-minimizing filters.

Reference parity: dart/utils AccelerationMinimizer / AccelerationSmoother
/ VelocityMinimizingSmoother / AccelerationTrackAndMinimize (QP-based
mocap trajectory filters, SURVEY.md 2.9). Each is a banded least-squares
problem; solved here as one dense (or batched) solve — small T fits dense,
and jit/vmap batches across dof channels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _second_difference_matrix(T: int, dt: float) -> np.ndarray:
    D = np.zeros((T - 2, T))
    for i in range(T - 2):
        D[i, i] = 1.0
        D[i, i + 1] = -2.0
        D[i, i + 2] = 1.0
    return D / (dt * dt)


def _first_difference_matrix(T: int, dt: float) -> np.ndarray:
    D = np.zeros((T - 1, T))
    for i in range(T - 1):
        D[i, i] = -1.0
        D[i, i + 1] = 1.0
    return D / dt


class AccelerationMinimizer:
    """min ||x - obs||^2 + w ||acc(x)||^2 (reference:
    AccelerationMinimizer.hpp). Solves the normal equations once; `smooth`
    maps over dof columns."""

    def __init__(self, timesteps: int, smoothing_weight: float = 1.0,
                 regularization_weight: float = 0.01, dt: float = 1.0):
        D = _second_difference_matrix(timesteps, dt)
        A = (
            np.eye(timesteps) * (1.0 + regularization_weight)
            + smoothing_weight * D.T @ D
        )
        self._solve = jax.jit(
            lambda obs: jnp.linalg.solve(jnp.asarray(A), obs)
        )

    def minimize(self, series: np.ndarray) -> np.ndarray:
        """series: (T,) or (T, C)."""
        x = jnp.asarray(series, dtype=jnp.float64)
        if x.ndim == 1:
            return np.asarray(self._solve(x))
        return np.asarray(self._solve(x))


class VelocityMinimizingSmoother:
    """min ||x - obs||^2 + w ||vel(x)||^2 (reference:
    VelocityMinimizingSmoother)."""

    def __init__(self, timesteps: int, smoothing_weight: float = 1.0,
                 dt: float = 1.0):
        D = _first_difference_matrix(timesteps, dt)
        A = np.eye(timesteps) + smoothing_weight * D.T @ D
        self._solve = jax.jit(
            lambda obs: jnp.linalg.solve(jnp.asarray(A), obs)
        )

    def smooth(self, series: np.ndarray) -> np.ndarray:
        return np.asarray(self._solve(jnp.asarray(series, jnp.float64)))


class AccelerationTrackAndMinimize:
    """Track observed accelerations where flagged, minimize elsewhere
    (reference: AccelerationTrackAndMinimize.hpp)."""

    def __init__(self, timesteps: int, track_mask, smoothing_weight=1.0,
                 tracking_weight=1.0, dt: float = 1.0):
        self.T = timesteps
        self.dt = dt
        self.D = _second_difference_matrix(timesteps, dt)
        self.mask = np.asarray(track_mask, dtype=np.float64)[: timesteps - 2]
        self.sw = smoothing_weight
        self.tw = tracking_weight

    def minimize(self, series: np.ndarray, target_accs: np.ndarray):
        D = jnp.asarray(self.D)
        m = jnp.asarray(self.mask)
        A = (
            jnp.eye(self.T)
            + self.sw * D.T @ ((1 - m)[:, None] * D)
            + self.tw * D.T @ (m[:, None] * D)
        )
        b = jnp.asarray(series) + self.tw * D.T @ (
            m * jnp.asarray(target_accs)[: self.T - 2]
        )
        return np.asarray(jnp.linalg.solve(A, b))
