"""SSID: online system identification over a sliding window.

Reference parity: dart/realtime/SSID (SSID.hpp:30-106 — logs
sensors/controls, background thread fitting masses/params to the observed
window using trajectory problems, SSID.cpp:110-140).

TPU-native: the window fit is one jit-compiled Adam scan minimizing the
simulation-vs-observation error as a function of body parameters (masses
by default), using the differentiable timestep's mass gradients.
"""

from __future__ import annotations

import threading
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.neural.timestep import get_engine
from nimblephysics_tpu.realtime.buffers import ControlLog, ObservationLog
from nimblephysics_tpu.simulation.world import World


class SSID:
    def __init__(
        self,
        world: World,
        window_steps: int = 20,
        fit_iterations: int = 50,
        learning_rate: float = 0.05,
    ):
        self.world = world
        self.engine = get_engine(world)
        self.window = window_steps
        self.nv = world.num_dofs
        self.na = world.action_size
        self.dt = world.time_step
        self.observation_log = ObservationLog(2 * self.nv)
        self.control_log = ControlLog(self.na)
        self.masses = jnp.asarray(
            np.concatenate(
                [[b.mass for b in s.bodies] for s in world.skeletons]
            )
        )
        self._listeners: List[Callable] = []
        self._thread: Optional[threading.Thread] = None
        self._running = False

        engine = self.engine

        def window_loss(log_masses, start_state, controls, observed):
            masses = jnp.exp(log_masses)  # positivity

            def body(s, u):
                s2 = engine.state_step(s, u, masses)
                return s2, s2

            _, states = jax.lax.scan(body, start_state, controls)
            return jnp.mean((states - observed) ** 2)

        grad_fn = jax.value_and_grad(window_loss)

        @jax.jit
        def fit(log_m, start_state, controls, observed):
            def body(carry, t):
                x, m, v = carry
                loss, g = grad_fn(x, start_state, controls, observed)
                m = 0.9 * m + 0.1 * g
                vv = 0.999 * v + 0.001 * g * g
                mh = m / (1 - 0.9 ** (t + 1.0))
                vh = vv / (1 - 0.999 ** (t + 1.0))
                x = x - learning_rate * mh / (jnp.sqrt(vh) + 1e-8)
                return (x, m, vv), loss

            (x, _, _), losses = jax.lax.scan(
                body,
                (log_m, jnp.zeros_like(log_m), jnp.zeros_like(log_m)),
                jnp.arange(fit_iterations, dtype=log_m.dtype),
            )
            return x, losses[-1]

        self._fit = fit

    # -- logging (reference: registerSensorsNow/registerControlsNow) --------

    def register_sensors(self, t: float, state: np.ndarray) -> None:
        self.observation_log.record(t, state)

    def register_controls(self, t: float, action: np.ndarray) -> None:
        self.control_log.record(t, action)

    def register_inferred_mass_listener(self, cb: Callable) -> None:
        self._listeners.append(cb)

    # -- fitting --------------------------------------------------------------

    def run_inference(self) -> Optional[np.ndarray]:
        """Fit masses to the most recent window; returns updated masses."""
        if len(self.observation_log) < self.window + 1:
            return None
        with self.observation_log._lock:
            obs = np.stack(self.observation_log._values[-(self.window + 1):])
        with self.control_log._lock:
            if len(self.control_log._values) < self.window:
                return None
            ctl = np.stack(self.control_log._values[-self.window :])
        start = jnp.asarray(obs[0])
        observed = jnp.asarray(obs[1:])
        controls = jnp.asarray(ctl)
        log_m, loss = self._fit(
            jnp.log(self.masses), start, controls, observed
        )
        self.masses = jnp.exp(log_m)
        for cb in self._listeners:
            cb(np.asarray(self.masses), float(loss))
        return np.asarray(self.masses)

    # -- background loop (reference: SSID.cpp:135-140) ------------------------

    def start(self) -> None:
        if self._running:
            return
        self._running = True

        def loop():
            while self._running:
                self.run_inference()

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._running = False
        if self._thread is not None:
            self._thread.join(timeout=2.0)
            self._thread = None
