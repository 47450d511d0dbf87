"""Body-scale groups: shared dimension-scaling across symmetric bodies.

Reference parity: the reference Skeleton's scale groups
(dart/dynamics/Skeleton.hpp:993-1031 — mergeScaleGroups /
getGroupScaleDim / setGroupScales), which the biomechanics fitters
optimize as the GROUP_SCALES differentiation variable
(dart/neural/WithRespectTo.hpp:62-75). A group shares one (3,) scale
vector across its member bodies (e.g. left/right symmetry), reducing the
fitting dimension and enforcing symmetry exactly.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Union

import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.dynamics.skeleton import Skeleton


class ScaleGroups:
    """Static mapping group -> member bodies (identity-hash, jit-static)."""

    def __init__(
        self,
        skel: Skeleton,
        groups: Optional[Sequence[Sequence[Union[int, str]]]] = None,
    ):
        self.skel = skel
        nb = skel.num_bodies
        member_of = np.full(nb, -1, dtype=np.int64)
        gid = 0
        for grp in groups or []:
            idxs = [
                b if isinstance(b, int) else skel.body_index(b) for b in grp
            ]
            for b in idxs:
                assert member_of[b] == -1, f"body {b} in two scale groups"
                member_of[b] = gid
            gid += 1
        for b in range(nb):
            if member_of[b] == -1:
                member_of[b] = gid
                gid += 1
        self.member_of = member_of  # (nb,) group index per body
        self.n_groups = gid

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other

    def expand(self, group_scales: jnp.ndarray) -> jnp.ndarray:
        """(n_groups, 3) group scales -> (nb, 3) per-body scales.

        Differentiable: jax.grad through expand accumulates member-body
        gradients onto their group (the reference's group-scale Jacobian
        aggregation)."""
        return group_scales[self.member_of]

    def identity(self, dtype=jnp.float64) -> jnp.ndarray:
        return jnp.ones((self.n_groups, 3), dtype=dtype)

    @staticmethod
    def from_symmetry(skel: Skeleton) -> "ScaleGroups":
        """Pair left/right bodies by name (OpenSim `_l`/`_r` suffixes and
        `l_`/`r_` or `Left`/`Right` prefixes) into shared groups."""
        names = [b.name for b in skel.bodies]
        idx = {n: i for i, n in enumerate(names)}
        pairs: List[List[int]] = []
        used = set()
        subs = [
            (re.compile(r"_l$"), "_r"),
            (re.compile(r"^l_"), "r_"),
            (re.compile(r"_left$"), "_right"),
            (re.compile(r"^left_"), "right_"),
        ]
        for n in names:
            if idx[n] in used:
                continue
            for pat, rep in subs:
                if pat.search(n):
                    other = pat.sub(rep, n)
                    if other in idx and idx[other] not in used:
                        pairs.append([idx[n], idx[other]])
                        used.add(idx[n])
                        used.add(idx[other])
                    break
        return ScaleGroups(skel, pairs)
