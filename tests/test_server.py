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
            # JSON mirror lives on /json; the default path speaks the
            # reference's binary protobuf CommandList wire.
            with ws_client.connect(
                "ws://127.0.0.1:18071/json", open_timeout=5
            ) as ws:
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


def test_render_pointcloud_and_linesegment_shapes():
    """PointCloud + LineSegment display shapes (SURVEY 2.1 shape table)
    render and track body motion."""
    import numpy as np
    from nimblephysics_tpu.dynamics import shapes as SH
    from nimblephysics_tpu.dynamics.shapes import ShapeSpec
    from nimblephysics_tpu.dynamics.skeleton import Skeleton
    from nimblephysics_tpu.server.state_machine import GUIStateMachine
    from nimblephysics_tpu.simulation import World

    sk = Skeleton("cloudy")
    sk.add_joint_and_body(
        "translational", parent=-1, name="b",
        shapes=(
            ShapeSpec(
                SH.POINT_CLOUD, np.array([0.02]), collidable=False,
                mesh_vertices=np.array([[0, 0, 0], [0.1, 0, 0]]),
            ),
            ShapeSpec(
                SH.LINE_SEGMENT, np.zeros(0), collidable=False,
                mesh_vertices=np.array([[0, 0, 0], [0, 0, 0.5]]),
            ),
        ),
    )
    w = World()
    w.add_skeleton(sk)
    sm = GUIStateMachine()
    import jax.numpy as jnp

    sm.render_world(w, jnp.zeros(3))
    cmds = sm.flush_commands()
    kinds = [c["type"] for c in cmds]
    assert kinds.count("create_sphere") == 2  # cloud points
    assert "create_line" in kinds
    # Move the body: spheres track.
    sm.render_world(w, jnp.asarray([1.0, 0.0, 0.0]))
    cmds2 = sm.flush_commands()
    moves = [c for c in cmds2 if c["type"] == "set_pos"]
    assert len(moves) >= 2
    assert abs(moves[0]["pos"][0] - 1.0) < 1e-9
