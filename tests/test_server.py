"""GUI server + performance log tests (reference: test_Server,
test_GUIWebsocketServer, test_GUIRecording — SURVEY.md section 4)."""

import asyncio
import json
import time

import numpy as np
import pytest

from nimblephysics_tpu.models import cartpole
from nimblephysics_tpu.performance import PerformanceLog, trace
from nimblephysics_tpu.server import (
    GUIRecording,
    GUIStateMachine,
    GUIWebsocketServer,
    NimbleGUI,
)


class TestStateMachine:
    def test_commands_accumulate_and_flush(self):
        sm = GUIStateMachine()
        sm.create_box("b1", [1, 1, 1], pos=[0, 0, 1])
        sm.set_object_position("b1", [0, 0, 2])
        msg = json.loads(sm.flush_json())
        assert [c["type"] for c in msg["commands"]] == [
            "create_box",
            "set_pos",
        ]
        assert sm.flush_json() is None  # drained
        # retained state still knows the object
        full = json.loads(sm.full_state_json())
        assert full["commands"][0]["key"] == "b1"

    def test_render_world(self):
        world, q0, v0 = cartpole()
        sm = GUIStateMachine()
        sm.render_world(world, q0)
        msg = json.loads(sm.flush_json())
        kinds = {c["type"] for c in msg["commands"]}
        assert "create_capsule" in kinds
        # Updating positions produces set_pos, not re-creates.
        sm.render_world(world, q0 + 0.1)
        msg2 = json.loads(sm.flush_json())
        assert all(c["type"] in ("set_pos", "set_euler") for c in msg2["commands"])


class TestRecording:
    def test_record_frames(self):
        world, q0, v0 = cartpole()
        rec = GUIRecording(world)
        for k in range(3):
            rec.save_frame(np.concatenate([q0 + 0.1 * k, v0]))
        assert rec.num_frames == 3
        import tempfile, os

        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "frames.json")
            rec.write_frames_json(p)
            data = json.load(open(p))
            assert len(data["frames"]) == 3


class TestWebsocketServer:
    def test_serve_and_stream(self):
        import websockets.sync.client as ws_client
        import urllib.request

        world, q0, v0 = cartpole()
        gui = NimbleGUI(world)
        gui.serve(18070)
        try:
            time.sleep(0.3)
            # HTTP viewer page served:
            html = urllib.request.urlopen(
                "http://127.0.0.1:18070", timeout=5
            ).read()
            assert b"<canvas" in html and b"unpkg" not in html
            # Websocket: receive full state after displaying a world.
            gui.display_state(np.concatenate([q0, v0]))
            with ws_client.connect("ws://127.0.0.1:18071", open_timeout=5) as ws:
                msg = json.loads(ws.recv(timeout=5))
                assert "commands" in msg
        finally:
            gui.stop_serving()


class TestPerformanceLog:
    def test_nested_timers(self):
        log = PerformanceLog.start_root("step")
        inner = log.start_run("collision")
        time.sleep(0.01)
        inner.end()
        inner2 = log.start_run("collision")
        time.sleep(0.01)
        inner2.end()
        log.finalize()
        report = log.pretty_print()
        assert "collision" in report
        assert log.children["collision"].runs == 2

    def test_trace_context(self):
        log = PerformanceLog.start_root("root")
        with trace(log, "block"):
            time.sleep(0.005)
        log.finalize()
        assert log.children["block"].total >= 0.004
