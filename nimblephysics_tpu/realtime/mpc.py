"""Receding-horizon MPC with a background replanning thread.

Reference parity: dart/realtime/MPCLocal (optimizationThreadLoop
MPCLocal.cpp:494-504, optimizePlan:179-260 — warm-started re-optimization
of a MultiShot on a background thread, plans written into a
RealTimeControlBuffer) and the MPC interface (MPC.hpp:13). The gRPC
remoting surface (MPCRemote) is provided over a plain TCP/JSON transport
— the cross-process parity feature without a protobuf toolchain
dependency; XLA collectives remain the only on-device communication.

The optimizer runs a jit-compiled Adam scan per replan (nothing re-traces
between replans: the horizon problem is compiled once and re-invoked with
new start states — the reference's "re-optimization without rebuilding
the problem").
"""

from __future__ import annotations

import threading
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.neural.timestep import get_engine
from nimblephysics_tpu.realtime.buffers import (
    ObservationLog,
    RealTimeControlBuffer,
)
from nimblephysics_tpu.simulation.world import World


class MPC:
    """Abstract MPC interface (reference: MPC.hpp:13)."""

    def get_force(self, t: float) -> np.ndarray:
        raise NotImplementedError

    def record_ground_truth_state(self, t: float, state: np.ndarray) -> None:
        raise NotImplementedError


class MPCLocal(MPC):
    def __init__(
        self,
        world: World,
        loss_fn: Callable,  # (poses (T,nq), vels, forces) -> scalar
        horizon_steps: int = 20,
        replan_iterations: int = 30,
        learning_rate: float = 0.1,
    ):
        self.world = world
        self.engine = get_engine(world)
        self.horizon = horizon_steps
        self.dt = world.time_step
        self.na = world.action_size
        self.nv = world.num_dofs
        self.buffer = RealTimeControlBuffer(self.na, horizon_steps, self.dt)
        self.observation_log = ObservationLog(2 * self.nv)
        self._loss_fn = loss_fn
        self._iters = replan_iterations
        self._lr = learning_rate
        self._thread: Optional[threading.Thread] = None
        self._running = False
        self._plan = jnp.zeros((horizon_steps, self.na))
        self._replan_count = 0

        engine = self.engine
        nv = self.nv

        def horizon_loss(forces, start_state):
            def body(s, u):
                s2 = engine.state_step(s, u)
                return s2, s2

            _, states = jax.lax.scan(body, start_state, forces)
            return loss_fn(states[:, :nv], states[:, nv:], forces)

        grad_fn = jax.value_and_grad(horizon_loss)

        @jax.jit
        def replan(forces, start_state):
            """Warm-started Adam re-optimization, compiled once."""

            def body(carry, t):
                f, m, v = carry
                _, g = grad_fn(f, start_state)
                m = 0.9 * m + 0.1 * g
                vv = 0.999 * v + 0.001 * g * g
                mh = m / (1 - 0.9 ** (t + 1.0))
                vh = vv / (1 - 0.999 ** (t + 1.0))
                f = f - learning_rate * mh / (jnp.sqrt(vh) + 1e-8)
                return (f, m, vv), None

            (f, _, _), _ = jax.lax.scan(
                body,
                (forces, jnp.zeros_like(forces), jnp.zeros_like(forces)),
                jnp.arange(replan_iterations, dtype=forces.dtype),
            )
            return f

        self._replan = replan

    # -- MPC interface -------------------------------------------------------

    def get_force(self, t: float) -> np.ndarray:
        return self.buffer.control_at(t)

    def record_ground_truth_state(self, t: float, state: np.ndarray) -> None:
        self.observation_log.record(t, state)

    def optimize_plan(self, now: float) -> None:
        """One replan cycle (reference: MPCLocal::optimizePlan:179)."""
        obs_t, obs = self.observation_log.latest()
        if obs is None:
            return
        start = self.buffer.estimate_world_state_at(
            self.engine, obs_t, obs, now
        )
        # Warm start: shift the previous plan by the elapsed steps.
        shift = max(0, int(round((now - self.buffer.get_plan_copy()[0]) / self.dt)))
        plan = np.asarray(self._plan)
        if 0 < shift < self.horizon:
            plan = np.concatenate(
                [plan[shift:], np.tile(plan[-1:], (shift, 1))]
            )
        new_plan = self._replan(jnp.asarray(plan), jnp.asarray(start))
        self._plan = new_plan
        self.buffer.set_control_force_plan(now, np.asarray(new_plan))
        self._replan_count += 1

    # -- background thread (reference: optimizationThreadLoop:494) -----------

    def start(self) -> None:
        if self._running:
            return
        self._running = True
        t0 = time.monotonic()

        def loop():
            while self._running:
                self.optimize_plan(time.monotonic() - t0)

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._running = False
        if self._thread is not None:
            self._thread.join(timeout=2.0)
            self._thread = None

    # -- remoting (reference: gRPC service, MPCLocal.hpp:195-222) ------------

    def serve(self, port: int) -> "threading.Thread":
        """Serve this MPC over a TCP/JSON protocol for MPCRemote clients."""
        import json
        import socketserver

        mpc = self

        class Handler(socketserver.StreamRequestHandler):
            def handle(self):
                for line in self.rfile:
                    msg = json.loads(line)
                    if msg["op"] == "get_force":
                        out = mpc.get_force(msg["t"]).tolist()
                    elif msg["op"] == "observe":
                        mpc.record_ground_truth_state(
                            msg["t"], np.asarray(msg["state"])
                        )
                        out = True
                    else:
                        out = None
                    self.wfile.write(
                        (json.dumps({"result": out}) + "\n").encode()
                    )
                    self.wfile.flush()

        server = socketserver.ThreadingTCPServer(("127.0.0.1", port), Handler)
        server.daemon_threads = True
        th = threading.Thread(target=server.serve_forever, daemon=True)
        th.start()
        th.server = server  # type: ignore
        return th


class MPCRemote(MPC):
    """Client proxy to a served MPCLocal (reference: MPCRemote.hpp:8-66)."""

    def __init__(self, host: str, port: int):
        import socket

        self._sock = socket.create_connection((host, port))
        self._file = self._sock.makefile("rw")

    def _call(self, op: str, **kw):
        import json

        self._file.write(json.dumps({"op": op, **kw}) + "\n")
        self._file.flush()
        return json.loads(self._file.readline())["result"]

    def get_force(self, t: float) -> np.ndarray:
        return np.asarray(self._call("get_force", t=t))

    def record_ground_truth_state(self, t: float, state: np.ndarray) -> None:
        self._call("observe", t=t, state=np.asarray(state).tolist())
