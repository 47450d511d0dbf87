"""IKErrorReport: per-frame marker-fit quality reporting.

Reference parity: biomechanics::IKErrorReport
(dart/biomechanics/IKErrorReport.hpp:23-60) — the quality summary the
reference's regression tests assert on (averageRootMeanSquaredError,
averageMaxError), plus per-marker RMSE ranking, worst-marker tracking,
printReport and a CSV export. Used after MarkerFitter / IK to audit fits.
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
class IKErrorReport:
    """Build with `IKErrorReport.compute(...)`."""

    marker_names: List[str]
    # Per-frame stats (meters).
    root_mean_squared_error: np.ndarray  # (T,)
    max_error: np.ndarray  # (T,)
    sum_squared_error: np.ndarray  # (T,)
    # Per-marker across frames.
    marker_rmse: Dict[str, float]
    worst_markers: List[str]  # per frame: which marker was worst
    # Headline scalars (the reference regression bounds).
    average_root_mean_squared_error: float = 0.0
    average_max_error: float = 0.0
    average_sum_squared_error: float = 0.0

    @staticmethod
    def compute(
        skel: Skeleton,
        poses: np.ndarray,  # (T, nq)
        observations: np.ndarray,  # (T, M, 3), NaN = occluded
        body_scales: Optional[np.ndarray] = None,
        marker_offsets: Optional[np.ndarray] = None,
        marker_names: Optional[Sequence[str]] = None,
    ) -> "IKErrorReport":
        names, bodies, offsets0, _fixed = marker_table(skel, marker_names)
        offsets = (
            np.asarray(marker_offsets)
            if marker_offsets is not None
            else offsets0
        )
        scales = (
            jnp.asarray(body_scales) if body_scales is not None else None
        )

        def predict(q):
            return marker_world_positions(
                skel, q, jnp.asarray(bodies), jnp.asarray(offsets), scales
            )

        pred = np.asarray(jax.vmap(predict)(jnp.asarray(poses)))  # (T,M,3)
        obs = np.asarray(observations)
        mask = np.isfinite(obs[..., 0])
        diff = np.where(mask[..., None], pred - np.nan_to_num(obs), 0.0)
        dist = np.linalg.norm(diff, axis=-1)  # (T, M)

        T = dist.shape[0]
        counts = np.maximum(mask.sum(axis=1), 1)
        sse = (dist**2).sum(axis=1)
        rmse = np.sqrt(sse / counts)
        dist_masked = np.where(mask, dist, -np.inf)
        max_err = np.where(
            mask.any(axis=1), dist_masked.max(axis=1), 0.0
        )
        worst_idx = dist_masked.argmax(axis=1)
        worst = [names[i] for i in worst_idx]

        per_marker = {}
        for m, n in enumerate(names):
            seen = mask[:, m]
            if seen.any():
                per_marker[n] = float(
                    np.sqrt((dist[seen, m] ** 2).mean())
                )

        return IKErrorReport(
            marker_names=list(names),
            root_mean_squared_error=rmse,
            max_error=max_err,
            sum_squared_error=sse,
            marker_rmse=per_marker,
            worst_markers=worst,
            average_root_mean_squared_error=float(rmse.mean()),
            average_max_error=float(max_err.mean()),
            average_sum_squared_error=float(sse.mean()),
        )

    def sorted_marker_rmse(self) -> List[Tuple[str, float]]:
        """Reference: getSortedMarkerRMSE (worst first)."""
        return sorted(
            self.marker_rmse.items(), key=lambda kv: -kv[1]
        )

    def print_report(self, limit_timesteps: int = -1) -> str:
        """Reference: printReport — returns (and prints) the summary."""
        lines = [
            "IKErrorReport:",
            f"  avg RMSE: {self.average_root_mean_squared_error * 100:.2f} cm",
            f"  avg max:  {self.average_max_error * 100:.2f} cm",
            "  worst markers:",
        ]
        for name, rmse in self.sorted_marker_rmse()[:5]:
            lines.append(f"    {name}: {rmse * 100:.2f} cm")
        n = len(self.root_mean_squared_error)
        lim = n if limit_timesteps < 0 else min(limit_timesteps, n)
        for t in range(lim):
            lines.append(
                f"  t={t}: rmse {self.root_mean_squared_error[t] * 100:.2f}"
                f" cm, max {self.max_error[t] * 100:.2f} cm"
                f" ({self.worst_markers[t]})"
            )
        out = "\n".join(lines)
        print(out)
        return out

    def save_csv_marker_error_report(self, path: str) -> None:
        """Reference: saveCSVMarkerErrorReport."""
        with open(path, "w") as f:
            f.write("timestep,rmse_m,max_m,worst_marker\n")
            for t in range(len(self.root_mean_squared_error)):
                f.write(
                    f"{t},{self.root_mean_squared_error[t]:.6f},"
                    f"{self.max_error[t]:.6f},{self.worst_markers[t]}\n"
                )
