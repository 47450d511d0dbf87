"""Streaming mocap: realtime IK over live marker frames.

Reference parity: dart/biomechanics/StreamingIK.hpp + StreamingMocapLab
(background realtime IK consuming a live marker stream) and the transport
role of CortexStreaming.hpp (Motion Analysis Cortex SDK). The proprietary
Cortex UDP protocol needs vendor hardware; here the transport is a plain
socket/queue feed of (timestamp, point cloud) frames — the
`StreamingMocapLab` analog — while the IK core matches the reference:
each incoming frame is solved by a few damped Gauss-Newton steps
warm-started from the previous solution (jit-compiled once, ~ms per
frame), with identity assignment for unlabeled clouds via
nearest-predicted-marker matching.
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from nimblephysics_tpu.biomechanics.scaled_fk import (
    marker_table,
    marker_world_positions,
)
from nimblephysics_tpu.dynamics.skeleton import Skeleton


class StreamingIK:
    """Realtime IK: feed marker frames, read poses.

    Reference parity: StreamingIK (background solver thread, warm-started
    incremental solves, listeners for each solved pose).
    """

    def __init__(
        self,
        skel: Skeleton,
        gn_steps: int = 3,
        damping: float = 1e-5,
        assign_radius: float = 0.2,
    ):
        import jax
        import jax.numpy as jnp

        self.skel = skel
        self.names, self.bodies, self.offsets, _ = marker_table(skel)
        self.assign_radius = assign_radius
        self._queue: "queue.Queue" = queue.Queue(maxsize=256)
        self._listeners: List[Callable[[float, np.ndarray], None]] = []
        self._thread: Optional[threading.Thread] = None
        self._running = False
        self.last_pose = np.zeros(skel.num_dofs)
        self.frames_solved = 0
        nq = skel.num_dofs
        offs = jnp.asarray(self.offsets)

        def predict(q):
            return marker_world_positions(skel, q, self.bodies, offs)

        def solve(q0, observed, mask):
            def gn(q, _):
                def resid(qq):
                    pred = predict(qq)
                    return (
                        jnp.where(mask[:, None], pred - observed, 0.0)
                    ).reshape(-1)

                r = resid(q)
                J = jax.jacfwd(resid)(q)
                JtJ = J.T @ J + damping * jnp.eye(nq)
                return q - jnp.linalg.solve(JtJ, J.T @ r), None

            q, _ = jax.lax.scan(gn, q0, None, length=gn_steps)
            return q, predict(q)

        self._solve = jax.jit(solve)
        self._predict = jax.jit(predict)

    # -- the reference's listener API --------------------------------------

    def register_pose_listener(
        self, cb: Callable[[float, np.ndarray], None]
    ) -> None:
        self._listeners.append(cb)

    # -- frame ingestion ----------------------------------------------------

    def observe_frame(
        self, timestamp: float, markers: np.ndarray, labeled: bool = True
    ) -> None:
        """Push one frame. labeled=True: markers is (M, 3) in model-marker
        order (NaN = missing). labeled=False: an unlabeled (K, 3) cloud —
        identities assigned by nearest predicted marker."""
        try:
            self._queue.put_nowait((timestamp, np.asarray(markers), labeled))
        except queue.Full:
            pass  # drop frames under backpressure (realtime semantics)

    def _assign(self, cloud: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        pred = np.asarray(self._predict(jnp.asarray(self.last_pose)))
        M = len(self.names)
        out = np.full((M, 3), np.nan)
        if len(cloud) == 0:
            return out
        d = np.linalg.norm(
            pred[:, None, :] - cloud[None, :, :], axis=2
        )  # (M, K)
        order = np.dstack(np.unravel_index(np.argsort(d, axis=None), d.shape))[0]
        used_m, used_k = set(), set()
        for m, k in order:
            if m in used_m or k in used_k or d[m, k] > self.assign_radius:
                continue
            out[m] = cloud[k]
            used_m.add(m)
            used_k.add(k)
        return out

    def _solve_one(self, timestamp, markers, labeled) -> np.ndarray:
        import jax.numpy as jnp

        if not labeled:
            markers = self._assign(markers)
        mask = np.isfinite(markers[:, 0])
        q, _ = self._solve(
            jnp.asarray(self.last_pose),
            jnp.asarray(np.nan_to_num(markers)),
            jnp.asarray(mask),
        )
        self.last_pose = np.asarray(q)
        self.frames_solved += 1
        for cb in self._listeners:
            cb(timestamp, self.last_pose)
        return self.last_pose

    # -- background solver thread (reference: StreamingIK::startSolverThread)

    def start_solver_thread(self) -> None:
        self._running = True

        def loop():
            while self._running:
                try:
                    ts, mk, lb = self._queue.get(timeout=0.1)
                except queue.Empty:
                    continue
                self._solve_one(ts, mk, lb)

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._running = False
        if self._thread is not None:
            self._thread.join(timeout=2.0)

    def solve_blocking(self, timestamp, markers, labeled=True) -> np.ndarray:
        """Synchronous solve (for tests / offline replay)."""
        return self._solve_one(timestamp, markers, labeled)


class StreamingMocapLab:
    """Transport + IK bundle (reference: StreamingMocapLab/CortexStreaming
    without the proprietary Cortex UDP codec): a TCP line-JSON feed of
    {"t": float, "points": [[x,y,z],...]} frames drives StreamingIK."""

    def __init__(self, skel: Skeleton, **ik_kw):
        self.ik = StreamingIK(skel, **ik_kw)
        self._server = None
        self._thread = None
        self._running = False
        self.port: Optional[int] = None

    def serve(self, port: int = 0, host: str = "127.0.0.1") -> int:
        import json
        import socket

        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind((host, port))
        srv.listen(1)
        self.port = srv.getsockname()[1]
        self._server = srv
        self._running = True
        self.ik.start_solver_thread()

        def loop():
            while self._running:
                try:
                    srv.settimeout(0.2)
                    conn, _ = srv.accept()
                except OSError:
                    continue
                buf = b""
                with conn:
                    conn.settimeout(0.2)
                    while self._running:
                        try:
                            data = conn.recv(65536)
                        except OSError:
                            continue
                        if not data:
                            break
                        buf += data
                        while b"\n" in buf:
                            line, buf = buf.split(b"\n", 1)
                            try:
                                msg = json.loads(line)
                            except Exception:
                                continue
                            self.ik.observe_frame(
                                float(msg.get("t", 0.0)),
                                np.asarray(
                                    msg.get("points", []), dtype=np.float64
                                ).reshape(-1, 3),
                                labeled=bool(msg.get("labeled", False)),
                            )

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()
        return self.port

    def stop(self) -> None:
        self._running = False
        self.ik.stop()
        if self._server is not None:
            self._server.close()
        if self._thread is not None:
            self._thread.join(timeout=2.0)
        if getattr(self, "_cortex", None) is not None:
            self._cortex.disconnect()
            self._cortex = None

    def listen_to_cortex(
        self, host: str = "127.0.0.1", data_port: int = 1001,
        labeled: bool = True,
    ):
        """Consume a live Motion Analysis Cortex data stream (reference:
        StreamingMocapLab::listenToCortex wiring CortexStreaming's frame
        handler into StreamingIK). Returns the CortexClient; frames
        arriving on its data socket drive the IK solver thread.

        For offline replay of recorded Cortex packets, feed raw datagram
        bytes to `client.handle_datagram(...)` instead of connect()."""
        from nimblephysics_tpu.biomechanics.cortex import CortexClient

        client = CortexClient(host=host, data_port=data_port)
        t0 = time.time()

        def on_frame(marker_names, markers, cop_torque_forces):
            self.ik.observe_frame(
                time.time() - t0,
                np.asarray(markers, dtype=np.float64).reshape(-1, 3),
                labeled=labeled,
            )

        client.set_frame_handler(on_frame)
        if data_port is not None:
            client.connect()
        self.ik.start_solver_thread()
        self._cortex = client
        return client
