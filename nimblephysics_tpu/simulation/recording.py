"""Recording: bake and replay world state trajectories.

Reference parity: dart/simulation/Recording.hpp:57 + World::bake
(World.hpp:608-612). In a functional engine a recording is just a stacked
state array; this class keeps the familiar API (+ orbax checkpointing for
training-state parity, SURVEY.md section 5 checkpoint/resume).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from nimblephysics_tpu.simulation.world import World


class Recording:
    def __init__(self, world: World):
        self.world = world
        self._frames: List[np.ndarray] = []

    def bake(self, state: np.ndarray) -> None:
        """Append one world state (reference: World::bake)."""
        self._frames.append(np.asarray(state).copy())

    @property
    def num_frames(self) -> int:
        return len(self._frames)

    def get_state(self, frame: int) -> np.ndarray:
        return self._frames[frame]

    def as_array(self) -> np.ndarray:
        return (
            np.stack(self._frames)
            if self._frames
            else np.zeros((0, self.world.state_size))
        )

    def clear(self) -> None:
        self._frames.clear()

    # -- persistence ---------------------------------------------------------

    def save(self, path: str) -> None:
        np.save(path, self.as_array())

    @staticmethod
    def load(world: World, path: str) -> "Recording":
        rec = Recording(world)
        arr = np.load(path)
        rec._frames = [a for a in arr]
        return rec


def save_checkpoint(path: str, pytree) -> None:
    """Checkpoint any pytree (training state, plans, recordings) via orbax
    (SURVEY.md section 5: the rebuild gets checkpoint/resume free on pytrees)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, pytree, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, template):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, template)
