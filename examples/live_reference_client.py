"""Serve a live scene to the REFERENCE's published JS client.

The reference ships a prebuilt 21k-LoC TypeScript viewer
(python/nimblephysics/web_gui/bundle.js, built from
javascript/src/NimbleRemote.ts) whose entrypoint hardcodes
`ws://localhost:8070` and decodes binary proto3 CommandList frames
(dart/proto/GUI.proto). This script is the live-render proof that our
GUIWebsocketServer speaks that exact wire:

  1. our websocket server binds :8070 speaking binary CommandList;
  2. the reference's web_gui/ directory (index.html + bundle.js) is
     served verbatim over HTTP on :8068 — read from /root/reference at
     runtime, never vendored;
  3. a box-stack drop simulated by BatchedEngine streams states.

Open http://localhost:8068/ in a browser: the published client renders
our simulation. Screenshot evidence from this script lives at
benchmarks/js_client_render.png; the CI gate extracting the client's
decode/dispatch tables from the same bundle is tests/test_js_client.py.
"""

import functools
import http.server
import os
import sys
import threading
import time

import numpy as np

REF_WEB_GUI = "/root/reference/python/nimblephysics/web_gui"


def main(duration: float | None = None) -> None:
    if not os.path.isdir(REF_WEB_GUI):
        sys.exit("reference web_gui bundle not available on this machine")

    import jax.numpy as jnp

    from nimblephysics_tpu.batched import BatchedEngine
    from nimblephysics_tpu.models import box_stack
    from nimblephysics_tpu.server.gui_server import NimbleGUI

    world, q0, v0 = box_stack(n_boxes=4)
    gui = NimbleGUI(world)
    # The prebuilt bundle connects to ws://localhost:8070 (hardcoded in
    # its entrypoint); our own fallback viewer page lands on :8069.
    gui.server.serve(port=8069, ws_port=8070)

    # Serve the REFERENCE's static viewer verbatim on :8068.
    handler = functools.partial(
        http.server.SimpleHTTPRequestHandler, directory=REF_WEB_GUI
    )
    handler.log_message = lambda *a, **k: None
    http.server.ThreadingHTTPServer.allow_reuse_address = True
    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 8068), handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    print("reference client at http://localhost:8068/  (ws :8070)")

    # Precompute a drop trajectory with the batched engine (B=1 lane).
    engine = BatchedEngine(world)
    nv = world.num_dofs
    q = jnp.asarray(np.asarray(q0, dtype=np.float64)[:, None])
    v = jnp.asarray(np.asarray(v0, dtype=np.float64)[:, None])
    u = jnp.zeros((nv, 1))
    states = []
    for _ in range(300):
        r = engine.step(q, v, u)
        q, v = r.q, r.v
        states.append(np.asarray(q[:, 0]))
    gui.loop_states(states, fps=50.0)

    t0 = time.time()
    try:
        while duration is None or time.time() - t0 < duration:
            time.sleep(0.5)
    except KeyboardInterrupt:
        pass
    finally:
        gui.stop_serving()
        httpd.shutdown()
        httpd.server_close()


if __name__ == "__main__":
    dur = float(sys.argv[1]) if len(sys.argv) > 1 else None
    main(dur)
