"""Body-scaled forward kinematics + marker world positions.

Reference parity: the reference's body-scaling machinery (Skeleton scale
groups, Skeleton.hpp:993-1031, driving GROUP_SCALES differentiation and
the MarkerFitter bilevel problem). A per-body scale vector (3,) scales:
joint anchor translations (T_pj translation in the PARENT body's scale,
T_cj translation in the CHILD's) and marker local offsets — exactly the
quantities marker fitting needs gradients through.

Everything is pure JAX, differentiable in (q, scales, offsets), and vmaps
over mocap frames (the TPU axis for batched IK).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.dynamics import joints as JT
from nimblephysics_tpu.dynamics.skeleton import Skeleton
from nimblephysics_tpu.math import lie


def scaled_forward_kinematics(
    skel: Skeleton, q: jnp.ndarray, body_scales: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """World transforms with per-body scales applied to joint anchors.

    body_scales: (nb, 3) in each body's local frame; None = all ones.
    """
    dtype = q.dtype
    nb = skel.num_bodies
    if body_scales is None:
        body_scales = jnp.ones((nb, 3), dtype=dtype)
    Ts: List[jnp.ndarray] = []
    for i, spec in enumerate(skel.joints):
        q_j = q[spec.q_index : spec.q_index + spec.num_dofs]
        Q = JT.joint_transform(spec, q_j)
        s_child = body_scales[i]
        s_parent = (
            body_scales[spec.parent]
            if spec.parent >= 0
            else jnp.ones(3, dtype=dtype)
        )
        T_pj = jnp.asarray(spec.T_pj, dtype=dtype)
        T_pj = T_pj.at[:3, 3].set(T_pj[:3, 3] * s_parent)
        T_cj = jnp.asarray(spec.T_cj, dtype=dtype)
        T_cj = T_cj.at[:3, 3].set(T_cj[:3, 3] * s_child)
        T_rel = T_pj @ Q @ lie.transform_inv(T_cj)
        T = T_rel if spec.parent < 0 else Ts[spec.parent] @ T_rel
        Ts.append(T)
    return jnp.stack(Ts)


def marker_world_positions(
    skel: Skeleton,
    q: jnp.ndarray,
    marker_bodies: np.ndarray,  # (M,) int — static
    marker_offsets: jnp.ndarray,  # (M, 3) local offsets (differentiable)
    body_scales: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """World positions of M markers; offsets scale with their body.

    Differentiable in (q, marker_offsets, body_scales) — the reference's
    MarkerFitter gradient surface.
    """
    T = scaled_forward_kinematics(skel, q, body_scales)
    dtype = q.dtype
    nb = skel.num_bodies
    if body_scales is None:
        body_scales = jnp.ones((nb, 3), dtype=dtype)
    Tm = T[marker_bodies]  # (M, 4, 4)
    scales = body_scales[marker_bodies]  # (M, 3)
    local = marker_offsets * scales
    return (
        jnp.einsum("mij,mj->mi", Tm[:, :3, :3], local) + Tm[:, :3, 3]
    )


def marker_table(skel: Skeleton, names: Optional[Sequence[str]] = None):
    """Static (bodies, offsets, fixed_mask) arrays for the skeleton's
    registered markers."""
    if names is None:
        names = list(skel.markers.keys())
    bodies = np.array([skel.markers[n][0] for n in names], dtype=np.int32)
    offsets = np.stack([skel.markers[n][1] for n in names])
    fixed = np.array([skel.markers[n][2] for n in names], dtype=bool)
    return names, bodies, offsets, fixed
