"""IKSolver: damped-least-squares inverse kinematics.

Reference parity: dart/math IKSolver surface. Fixed-iteration Gauss-Newton
with Tikhonov damping and optional joint-limit clamping; jit/vmap-friendly
(batched IK over frames is the biomechanics workhorse).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def solve_ik(
    f: Callable[[jnp.ndarray], jnp.ndarray],
    target: jnp.ndarray,
    q_init: jnp.ndarray,
    iterations: int = 20,
    damping: float = 1e-6,
    step_clamp: float = 1.0,
    lower: Optional[jnp.ndarray] = None,
    upper: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Minimize ||f(q) - target||^2 by damped Gauss-Newton.

    `f` is any differentiable task map (marker positions, end-effector
    pose coordinates, COM...). Fixed iterations -> compiles once, vmaps
    over batched problems.
    """
    nq = q_init.shape[-1]

    def body(q, _):
        r = f(q) - target
        J = jax.jacfwd(f)(q)
        JtJ = J.T @ J + damping * jnp.eye(nq, dtype=q.dtype)
        dq = jnp.linalg.solve(JtJ, J.T @ r)
        norm = jnp.linalg.norm(dq)
        dq = dq * jnp.minimum(1.0, step_clamp / jnp.maximum(norm, 1e-12))
        q2 = q - dq
        if lower is not None:
            q2 = jnp.maximum(q2, lower)
        if upper is not None:
            q2 = jnp.minimum(q2, upper)
        return q2, None

    q, _ = jax.lax.scan(body, q_init, None, length=iterations)
    return q
