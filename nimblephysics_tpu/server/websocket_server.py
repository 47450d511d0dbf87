"""GUIWebsocketServer: broadcast the command stream; serve the web viewer.

Reference parity: dart/server/GUIWebsocketServer.hpp:42-99 (async server
broadcasting the command stream, receiving keydown/drag events) plus the
python NimbleGUI's static HTTP server for the bundled web GUI
(python/nimblephysics/gui_server.py:42-100). The viewer is a single
embedded HTML page (three.js) decoding the JSON command stream — the
functional equivalent of the reference's TypeScript NimbleView client.
"""

from __future__ import annotations

import asyncio
import http.server
import json
import threading
from typing import Callable, List, Optional, Set

from nimblephysics_tpu.server.state_machine import GUIStateMachine

_VIEWER_HTML = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>nimblephysics_tpu GUI</title>
<style>body{margin:0;overflow:hidden;background:#202225;color:#eee;font-family:sans-serif}
#hud{position:absolute;top:8px;left:8px;z-index:2;font-size:13px}</style>
</head><body><div id="hud">nimblephysics_tpu viewer — connecting...</div>
<script type="module">
import * as THREE from 'https://unpkg.com/three@0.160.0/build/three.module.js';
import {OrbitControls} from 'https://unpkg.com/three@0.160.0/examples/jsm/controls/OrbitControls.js';
const scene = new THREE.Scene();
const cam = new THREE.PerspectiveCamera(60, innerWidth/innerHeight, 0.01, 500);
cam.position.set(2.5, 2.0, 2.5); cam.up.set(0,0,1);
const ren = new THREE.WebGLRenderer({antialias:true});
ren.setSize(innerWidth, innerHeight); document.body.appendChild(ren.domElement);
const ctrl = new OrbitControls(cam, ren.domElement);
scene.add(new THREE.AmbientLight(0xffffff, 0.6));
const sun = new THREE.DirectionalLight(0xffffff, 1.2); sun.position.set(3,4,5);
scene.add(sun); scene.add(new THREE.AxesHelper(0.5));
const objs = {};
function mat(c){return new THREE.MeshStandardMaterial({color:new THREE.Color(c[0],c[1],c[2]),transparent:c[3]<1,opacity:c[3]});}
function setPose(o, cmd){ if(cmd.pos) o.position.set(...cmd.pos);
  if(cmd.euler) o.rotation.set(cmd.euler[0],cmd.euler[1],cmd.euler[2],'XYZ'); }
function handle(cmd){
  const t = cmd.type;
  if(t==='create_box'){const o=new THREE.Mesh(new THREE.BoxGeometry(...cmd.size),mat(cmd.color));setPose(o,cmd);scene.add(o);objs[cmd.key]=o;}
  else if(t==='create_sphere'){const o=new THREE.Mesh(new THREE.SphereGeometry(cmd.radius,24,16),mat(cmd.color));setPose(o,cmd);scene.add(o);objs[cmd.key]=o;}
  else if(t==='create_capsule'){const o=new THREE.Mesh(new THREE.CapsuleGeometry(cmd.radius,cmd.length,8,16),mat(cmd.color));
    o.geometry.rotateX(Math.PI/2); setPose(o,cmd);scene.add(o);objs[cmd.key]=o;}
  else if(t==='create_plane'){const o=new THREE.Mesh(new THREE.PlaneGeometry(40,40),mat(cmd.color));
    const n=new THREE.Vector3(...cmd.normal).normalize();
    o.quaternion.setFromUnitVectors(new THREE.Vector3(0,0,1),n);
    o.position.copy(n.multiplyScalar(cmd.offset)); scene.add(o);objs[cmd.key]=o;}
  else if(t==='create_line'){const g=new THREE.BufferGeometry().setFromPoints(cmd.points.map(p=>new THREE.Vector3(...p)));
    const o=new THREE.Line(g,new THREE.LineBasicMaterial({color:new THREE.Color(cmd.color[0],cmd.color[1],cmd.color[2])}));scene.add(o);objs[cmd.key]=o;}
  else if(t==='set_pos'){const o=objs[cmd.key]; if(o) o.position.set(...cmd.pos);}
  else if(t==='set_euler'){const o=objs[cmd.key]; if(o) o.rotation.set(cmd.euler[0],cmd.euler[1],cmd.euler[2],'XYZ');}
  else if(t==='set_color'){const o=objs[cmd.key]; if(o&&o.material) o.material.color.setRGB(cmd.color[0],cmd.color[1],cmd.color[2]);}
  else if(t==='delete'){const o=objs[cmd.key]; if(o){scene.remove(o); delete objs[cmd.key];}}
  else if(t==='create_text'||t==='set_text'){document.getElementById('hud').textContent=cmd.contents||'';}
}
const ws = new WebSocket(`ws://${location.hostname}:WS_PORT`);
ws.onopen = ()=>{document.getElementById('hud').textContent='connected';};
ws.onmessage = (ev)=>{const msg=JSON.parse(ev.data); (msg.commands||[]).forEach(handle);};
document.addEventListener('keydown',(e)=>{if(ws.readyState===1)ws.send(JSON.stringify({type:'keydown',key:e.key}));});
document.addEventListener('keyup',(e)=>{if(ws.readyState===1)ws.send(JSON.stringify({type:'keyup',key:e.key}));});
function anim(){requestAnimationFrame(anim);ctrl.update();ren.render(scene,cam);}
anim();
addEventListener('resize',()=>{cam.aspect=innerWidth/innerHeight;cam.updateProjectionMatrix();ren.setSize(innerWidth,innerHeight);});
</script></body></html>"""


class GUIWebsocketServer:
    """Async websocket broadcaster + static HTTP viewer host."""

    def __init__(self, state: Optional[GUIStateMachine] = None):
        self.state = state or GUIStateMachine()
        self._clients: Set = set()
        self._loop: Optional[asyncio.AbstractEventLoop] = None
        self._thread: Optional[threading.Thread] = None
        self._http_thread: Optional[threading.Thread] = None
        self._key_listeners: List[Callable[[str, bool], None]] = []
        self._keys_down: Set[str] = set()
        self.ws_port: Optional[int] = None
        self.http_port: Optional[int] = None

    # -- events (reference: registerKeydownListener etc.) --------------------

    def register_keydown_listener(self, cb: Callable[[str], None]) -> None:
        self._key_listeners.append(lambda k, down: down and cb(k))

    def get_keys_down(self) -> Set[str]:
        return set(self._keys_down)

    # -- serving --------------------------------------------------------------

    def serve(self, port: int = 8070, ws_port: Optional[int] = None) -> None:
        """HTTP viewer on `port`, websocket stream on `ws_port` (port+1)."""
        import websockets.asyncio.server as ws_server

        self.http_port = port
        self.ws_port = ws_port or (port + 1)
        html = _VIEWER_HTML.replace("WS_PORT", str(self.ws_port))

        class Page(http.server.BaseHTTPRequestHandler):
            def do_GET(self_inner):
                self_inner.send_response(200)
                self_inner.send_header("Content-Type", "text/html")
                self_inner.end_headers()
                self_inner.wfile.write(html.encode())

            def log_message(self_inner, *a):
                pass

        httpd = http.server.ThreadingHTTPServer(("0.0.0.0", port), Page)
        self._http_thread = threading.Thread(
            target=httpd.serve_forever, daemon=True
        )
        self._http_thread.server = httpd  # type: ignore
        self._http_thread.start()

        async def handler(ws):
            self._clients.add(ws)
            try:
                await ws.send(self.state.full_state_json())
                async for raw in ws:
                    try:
                        ev = json.loads(raw)
                    except json.JSONDecodeError:
                        continue
                    if ev.get("type") == "keydown":
                        self._keys_down.add(ev["key"])
                        for cb in self._key_listeners:
                            cb(ev["key"], True)
                    elif ev.get("type") == "keyup":
                        self._keys_down.discard(ev["key"])
            finally:
                self._clients.discard(ws)

        async def main():
            async with ws_server.serve(handler, "0.0.0.0", self.ws_port):
                while True:
                    await asyncio.sleep(0.02)
                    msg = self.state.flush_json()
                    if msg and self._clients:
                        await asyncio.gather(
                            *[c.send(msg) for c in list(self._clients)],
                            return_exceptions=True,
                        )

        self._loop = asyncio.new_event_loop()

        def run():
            asyncio.set_event_loop(self._loop)
            try:
                self._loop.run_until_complete(main())
            except RuntimeError:
                pass  # loop stopped by stop() — expected shutdown path

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        if self._loop is not None:
            self._loop.call_soon_threadsafe(self._loop.stop)
        if self._http_thread is not None:
            self._http_thread.server.shutdown()  # type: ignore

    def flush(self) -> None:
        """No-op (broadcast loop drains automatically); parity hook."""
