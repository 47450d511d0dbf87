"""Offline GUI viewer + input events (VERDICT round-1 weak #8 / item #9).

The served page must be fully self-contained (no CDN imports — the old
three.js page could never render on this offline host), and the event
channel must carry the reference's drag + screenshot events
(GUIWebsocketServer.hpp:51-99) in addition to keydown/keyup.
"""

import asyncio
import base64
import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from nimblephysics_tpu.server.websocket_server import (
    _VIEWER_HTML,
    GUIWebsocketServer,
)


def test_viewer_page_is_self_contained():
    html = _VIEWER_HTML
    assert "unpkg" not in html
    assert "https://" not in html and "http://" not in html
    assert "<canvas" in html
    # The software renderer + event senders are present.
    for token in ("project(", "create_mesh", "drag", "screenshot",
                  "keydown"):
        assert token in html, f"viewer missing {token}"


_PORT = [8192]


def _next_port():
    _PORT[0] += 1
    return _PORT[0]


@pytest.fixture
def server():
    srv = GUIWebsocketServer()
    srv.serve(_next_port(), ws_port=_next_port())
    time.sleep(0.3)
    yield srv
    srv.stop()
    time.sleep(0.2)


def test_http_serves_offline_page(server):
    page = urllib.request.urlopen(
        f"http://127.0.0.1:{server.http_port}", timeout=5
    ).read().decode()
    assert "unpkg" not in page and "<canvas" in page


def test_ws_events_roundtrip(server):
    """Client -> server: keydown, drag, screenshot; server -> client:
    retained command stream + screenshot request."""
    import websockets.sync.client as wsc

    from nimblephysics_tpu.models import cartpole
    from nimblephysics_tpu.server.state_machine import GUIStateMachine

    # Render something so the initial full-state is non-empty.
    world, q0, v0 = cartpole()
    server.state.render_world(world, np.asarray(q0))

    drags = []
    server.register_drag_listener(lambda key, pos: drags.append((key, pos)))
    keys = []
    server.register_keydown_listener(lambda k: keys.append(k))

    # The viewer speaks JSON on the /json mirror (the default path carries
    # the reference-protobuf CommandList wire).
    with wsc.connect(f"ws://127.0.0.1:{server.ws_port}/json") as ws:
        first = json.loads(ws.recv(timeout=5))
        cmds = first["commands"]
        assert any(c["type"].startswith("create_") for c in cmds)

        ws.send(json.dumps({"type": "keydown", "key": "w"}))
        ws.send(json.dumps(
            {"type": "drag", "key": "obj1", "pos": [0.1, 0.2, 0.3]}
        ))
        # Screenshot: server requests, we answer like the viewer would.
        png = base64.b64encode(b"\x89PNG_fake").decode()

        def answer():
            # Wait for the request_screenshot broadcast, then reply.
            deadline = time.time() + 5
            while time.time() < deadline:
                try:
                    msg = json.loads(ws.recv(timeout=1))
                except TimeoutError:
                    continue
                for c in msg.get("commands", []):
                    if c.get("type") == "request_screenshot":
                        ws.send(json.dumps({
                            "type": "screenshot",
                            "id": c.get("id"),
                            "data": "data:image/png;base64," + png,
                        }))
                        return

        t = threading.Thread(target=answer)
        t.start()
        shot = server.request_screenshot(timeout=5)
        t.join()

    time.sleep(0.2)
    assert keys == ["w"]
    assert drags == [("obj1", [0.1, 0.2, 0.3])]
    assert shot == b"\x89PNG_fake"


def test_mesh_command_in_stream():
    from nimblephysics_tpu.server.state_machine import GUIStateMachine

    sm = GUIStateMachine()
    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1.0]]
    )
    faces = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]])
    sm.create_mesh("m", verts, faces)
    msg = json.loads(sm.flush_json())
    cmd = msg["commands"][0]
    assert cmd["type"] == "create_mesh"
    assert len(cmd["verts"]) == 4 and len(cmd["faces"]) == 4
