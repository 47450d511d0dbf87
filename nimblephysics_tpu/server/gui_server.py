"""NimbleGUI: the user-facing GUI wrapper + frame recording.

Reference parity: python/nimblephysics/gui_server.py:42-100 (`NimbleGUI`:
serve(port), loopStates/displayState, nativeAPI access) and
dart/server/GUIRecording.hpp (save frame command-lists for offline
playback).
"""

from __future__ import annotations

import json
import threading
import time
from typing import List, Optional, Sequence

import numpy as np

from nimblephysics_tpu.server.state_machine import GUIStateMachine
from nimblephysics_tpu.server.websocket_server import GUIWebsocketServer
from nimblephysics_tpu.simulation.world import World


class NimbleGUI:
    def __init__(self, world: World):
        self.world = world
        self.server = GUIWebsocketServer()
        self.state = self.server.state
        self._loop_thread: Optional[threading.Thread] = None
        self._looping = False

    def serve(self, port: int = 8070) -> None:
        self.server.serve(port)
        print(
            f"[NimbleGUI] viewer at http://localhost:{port} "
            f"(websocket :{self.server.ws_port})"
        )

    def stop_serving(self) -> None:
        self._looping = False
        self.server.stop()

    def native_api(self) -> GUIStateMachine:
        """Reference parity: NimbleGUI.nativeAPI()."""
        return self.state

    # -- world display --------------------------------------------------------

    def display_state(self, state: np.ndarray) -> None:
        nv = self.world.num_dofs
        self.state.render_world(self.world, np.asarray(state)[:nv])

    def display_soft_state(
        self, softs, prefix: str = "soft", radius: float = 0.01,
        color=(0.9, 0.6, 0.4, 1.0), skin_faces=None,
    ) -> None:
        """Render soft-body particle clouds (dynamics/soft.SoftState
        list). Default: one small sphere per particle. With `skin_faces`
        (a list of (F, 3) index arrays per cloud, e.g. from
        dynamics.soft.grid_skin_faces), render a deforming SoftMeshShape
        SKIN instead — a triangle mesh over the live particle positions
        (reference: SoftMeshShape rendering)."""
        for si, st in enumerate(softs):
            pos = np.asarray(st.pos)
            if skin_faces is not None:
                self.state.create_mesh(
                    f"{prefix}{si}_skin", pos, np.asarray(skin_faces[si]),
                    color=color,
                )
                continue
            for pi in range(len(pos)):
                key = f"{prefix}{si}_{pi}"
                if key in self.state._objects:
                    self.state.set_object_position(key, pos[pi])
                else:
                    self.state.create_sphere(
                        key, radius, pos[pi], color=color
                    )

    def loop_states(self, states: Sequence[np.ndarray], fps: float = 50.0) -> None:
        """Loop a trajectory of world states (reference: loopStates)."""
        self._looping = True
        states = [np.asarray(s) for s in states]

        def loop():
            i = 0
            while self._looping:
                self.display_state(states[i % len(states)])
                i += 1
                time.sleep(1.0 / fps)

        self._loop_thread = threading.Thread(target=loop, daemon=True)
        self._loop_thread.start()

    def block_while_serving(self) -> None:
        try:
            while True:
                time.sleep(1.0)
        except KeyboardInterrupt:
            self.stop_serving()


class GUIRecording:
    """Frame-by-frame command recording (reference: GUIRecording.hpp)."""

    def __init__(self, world: World):
        self.world = world
        self.state = GUIStateMachine()
        self.frames: List[str] = []

    def save_frame(self, state: np.ndarray) -> None:
        nv = self.world.num_dofs
        self.state.render_world(self.world, np.asarray(state)[:nv])
        msg = self.state.flush_json()
        self.frames.append(msg or json.dumps({"commands": []}))

    def write_frames_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump({"frames": [json.loads(fr) for fr in self.frames]}, f)

    @property
    def num_frames(self) -> int:
        return len(self.frames)
