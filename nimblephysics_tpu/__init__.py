"""nimblephysics_tpu — a TPU-native differentiable rigid-body physics engine.

A from-scratch JAX/XLA re-design with the capabilities of the reference
Nimble engine (differentiable articulated dynamics with hard contact,
friction, bouncing and joint limits; trajectory optimization; MPC; GUI;
biomechanics toolkit). `timestep` is a pure function that composes with
`jit` / `vmap` / `grad` / `shard_map`, so thousands of worlds batch onto
the MXU and shard across chips over ICI.

Public surface mirrors the reference's Python package
(python/nimblephysics/__init__.py): `timestep`, `loadWorld`, `NimbleGUI`,
mappings, trajectory/realtime/biomechanics submodules.
"""

__version__ = "0.1.0"

from nimblephysics_tpu import math  # noqa: F401

# Subpackage re-exports are added as layers land; import lazily to keep
# `import nimblephysics_tpu` cheap.


def __getattr__(name):
    import importlib

    _lazy = {
        "dynamics": "nimblephysics_tpu.dynamics",
        "collision": "nimblephysics_tpu.collision",
        "constraint": "nimblephysics_tpu.constraint",
        "simulation": "nimblephysics_tpu.simulation",
        "neural": "nimblephysics_tpu.neural",
        "trajectory": "nimblephysics_tpu.trajectory",
        "realtime": "nimblephysics_tpu.realtime",
        "server": "nimblephysics_tpu.server",
        "biomechanics": "nimblephysics_tpu.biomechanics",
        "utils": "nimblephysics_tpu.utils",
        "models": "nimblephysics_tpu.models",
        "parallel": "nimblephysics_tpu.parallel",
        "performance": "nimblephysics_tpu.performance",
        "torch_api": "nimblephysics_tpu.torch_api",
    }
    if name in _lazy:
        return importlib.import_module(_lazy[name])
    if name == "timestep":
        from nimblephysics_tpu.neural.timestep import timestep

        return timestep
    if name == "loadWorld":
        from nimblephysics_tpu.utils.universal_loader import load_world

        return load_world
    if name == "absPath":
        from nimblephysics_tpu.utils.universal_loader import abs_path

        return abs_path
    if name == "NimbleGUI":
        from nimblephysics_tpu.server.gui_server import NimbleGUI

        return NimbleGUI
    if name == "forward_pass" or name == "forwardPass":
        from nimblephysics_tpu.neural.backprop_snapshot import forward_pass

        return forward_pass
    if name == "map_to_pos":
        from nimblephysics_tpu.neural.mappings import map_to_pos

        return map_to_pos
    if name == "map_to_vel":
        from nimblephysics_tpu.neural.mappings import map_to_vel

        return map_to_vel
    if name == "BatchedEnv":
        from nimblephysics_tpu.simulation.env import BatchedEnv

        return BatchedEnv
    raise AttributeError(f"module 'nimblephysics_tpu' has no attribute {name!r}")
