"""Drop a box on the ground and watch it in the browser GUI.

Mirrors the reference's introductory tutorial (nimblephysics.org "worlds"):
build a world, simulate, serve the viewer at http://localhost:8070.
"""
import os, sys; sys.path.insert(0, ".")
import jax.numpy as jnp
import numpy as np
import nimblephysics_tpu as nt

SMOKE = bool(os.environ.get("NT_SMOKE"))  # CI smoke mode: tiny + headless

world, q0, v0 = nt.models.box_drop(height=0.6, restitution=0.4)
engine = nt.neural.get_engine(world)

states = []
q, v = jnp.asarray(q0), jnp.asarray(v0)
for _ in range(60 if SMOKE else 1200):
    r = engine.step(q, v, jnp.zeros(6))
    q, v = r.q, r.v
    states.append(np.concatenate([q, v]))

if not SMOKE:
    gui = nt.NimbleGUI(world)
    gui.serve(8070)
    gui.loop_states(states, fps=500)
    print("open http://localhost:8070 — Ctrl-C to stop")
    gui.block_while_serving()
else:
    print(f"smoke: simulated {len(states)} steps, final height "
          f"{float(states[-1][5]):.3f}")
