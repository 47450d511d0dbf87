"""MarkerLabeller: assign identities to unlabeled mocap point clouds.

Reference parity: dart/biomechanics/MarkerLabeller.hpp +
MarkerBeamSearch (trace building + beam search over label assignments).
Mocap systems drop marker identities (ghost markers, swaps); the labeller
(1) links raw per-frame point clouds into TRACES by frame-to-frame
proximity, then (2) runs a beam search over trace->marker-name
assignments scored by distance to the model's predicted marker positions,
with one-to-one consistency inside overlapping time windows.

Host-side preprocessing (numpy); the labeled output feeds the vmapped
fitters.
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from nimblephysics_tpu.biomechanics.scaled_fk import (
    marker_table,
    marker_world_positions,
)
from nimblephysics_tpu.dynamics.skeleton import Skeleton


@dataclasses.dataclass
class Trace:
    """One connected point trace: frames[i] observed at points[i]."""

    frames: List[int]
    points: List[np.ndarray]

    @property
    def start(self) -> int:
        return self.frames[0]

    @property
    def end(self) -> int:
        return self.frames[-1]


def build_traces(
    point_clouds: Sequence[np.ndarray],
    dt: float,
    max_speed: float = 6.0,
    max_gap: int = 4,
) -> List[Trace]:
    """Greedy nearest-neighbour trace linking (reference:
    MarkerLabeller trace construction): a point continues the trace whose
    predicted position (last point + inertia) is nearest, within a
    max-speed gate; unmatched points start new traces."""
    open_traces: List[Trace] = []
    done: List[Trace] = []
    for t, cloud in enumerate(point_clouds):
        cloud = np.asarray(cloud, dtype=np.float64).reshape(-1, 3)
        cloud = cloud[np.isfinite(cloud[:, 0])]
        # Retire traces with too-old last frames.
        still = []
        for tr in open_traces:
            (done if t - tr.end > max_gap else still).append(tr)
        open_traces = still
        if len(cloud) == 0:
            continue
        # Predicted continuation per open trace.
        preds = []
        for tr in open_traces:
            p = tr.points[-1]
            if len(tr.points) >= 2 and tr.frames[-1] - tr.frames[-2] >= 1:
                vel = (tr.points[-1] - tr.points[-2]) / (
                    (tr.frames[-1] - tr.frames[-2]) * dt
                )
                p = p + vel * (t - tr.end) * dt
            preds.append(p)
        used_pts = set()
        used_tr = set()
        if preds:
            d = np.linalg.norm(
                np.asarray(preds)[:, None, :] - cloud[None, :, :], axis=2
            )  # (n_traces, n_points)
            gate = max_speed * dt * np.asarray(
                [max(1, t - tr.end) for tr in open_traces]
            )
            # Greedy global matching by ascending distance.
            order = np.dstack(
                np.unravel_index(np.argsort(d, axis=None), d.shape)
            )[0]
            for i, j in order:
                if i in used_tr or j in used_pts:
                    continue
                if d[i, j] > gate[i]:
                    continue
                open_traces[i].frames.append(t)
                open_traces[i].points.append(cloud[j])
                used_tr.add(i)
                used_pts.add(j)
        for j in range(len(cloud)):
            if j not in used_pts:
                open_traces.append(Trace([t], [cloud[j]]))
    return done + open_traces


class MarkerLabeller:
    """Beam search over trace -> model-marker assignments."""

    def __init__(self, skel: Skeleton, beam_width: int = 8):
        self.skel = skel
        self.names, self.bodies, self.offsets, _ = marker_table(skel)
        self.beam = beam_width

    def _predicted(self, poses: np.ndarray) -> np.ndarray:
        """(T, nq) -> (T, M, 3) model marker predictions."""
        import jax
        import jax.numpy as jnp

        fn = jax.jit(
            lambda q: marker_world_positions(
                self.skel, q, self.bodies, jnp.asarray(self.offsets)
            )
        )
        return np.stack([np.asarray(fn(jnp.asarray(q))) for q in poses])

    def label(
        self,
        point_clouds: Sequence[np.ndarray],
        poses: np.ndarray,  # (T, nq) approximate pose sequence
        dt: float = 0.01,
        max_dist: float = 0.25,
    ) -> Tuple[np.ndarray, List[Optional[str]]]:
        """Returns ((T, M, 3) labeled marker array NaN-masked, and the
        per-trace assigned names (None = ghost/unassigned)).

        Beam search (reference: MarkerBeamSearch): traces sorted by
        length (long traces are the most informative), each step extends
        every beam hypothesis with the best non-conflicting label options
        for the next trace; hypotheses are scored by summed mean distance
        to the predicted markers.
        """
        T = len(point_clouds)
        M = len(self.names)
        pred = self._predicted(poses)  # (T, M, 3)
        traces = build_traces(point_clouds, dt)
        traces.sort(key=lambda tr: -len(tr.frames))

        # Mean distance of each trace to each model marker.
        cost = np.full((len(traces), M), np.inf)
        for i, tr in enumerate(traces):
            pts = np.asarray(tr.points)
            pr = pred[np.asarray(tr.frames)]  # (len, M, 3)
            cost[i] = np.linalg.norm(pr - pts[:, None, :], axis=2).mean(0)

        # Beam over partial assignments. A hypothesis: (score, {trace:
        # name}, conflict map name -> set of frames used).
        beams = [(0.0, {}, {})]
        for i, tr in enumerate(traces):
            frames_i = set(tr.frames)
            options = np.argsort(cost[i])[: self.beam]
            new_beams = []
            for score, assign, used in beams:
                # Option: leave unassigned (ghost) with a fixed penalty.
                new_beams.append(
                    (score + min(max_dist, 0.1), assign, used)
                )
                for m in options:
                    c = cost[i, m]
                    if not np.isfinite(c) or c > max_dist:
                        continue
                    if used.get(m) and (used[m] & frames_i):
                        continue  # marker already observed in these frames
                    used2 = dict(used)
                    used2[m] = used.get(m, set()) | frames_i
                    new_beams.append(
                        (score + c, {**assign, i: int(m)}, used2)
                    )
            new_beams.sort(key=lambda b: b[0])
            beams = new_beams[: self.beam]

        best_assign = beams[0][1]
        out = np.full((T, M, 3), np.nan)
        names_out: List[Optional[str]] = [None] * len(traces)
        for i, m in best_assign.items():
            names_out[i] = self.names[m]
            tr = traces[i]
            for f, p in zip(tr.frames, tr.points):
                out[f, m] = p
        return out, names_out
