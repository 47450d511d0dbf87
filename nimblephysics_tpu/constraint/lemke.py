"""Lemke pivoting LCP solver — the host-side reference oracle.

Reference parity: dart/lcpsolver/Lemke.hpp:44 (Lemke's complementary
pivoting for w = M z + q, z >= 0, w >= 0, z'w = 0). Branch-heavy pivoting
doesn't belong on the TPU; this numpy implementation exists as a test
oracle for the on-device boxed-LCP solver (LCPUtils-style validation).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def lemke(M: np.ndarray, q: np.ndarray, max_pivots: int = 200
          ) -> Tuple[Optional[np.ndarray], int]:
    """Solve the standard LCP. Returns (z, status): status 0 = solved,
    1 = ray termination (no solution found), 2 = pivot limit."""
    n = len(q)
    if np.all(q >= 0):
        return np.zeros(n), 0

    # Tableau: [I  -M  -1 | q], basis = w variables.
    T = np.hstack([np.eye(n), -M, -np.ones((n, 1)), q.reshape(-1, 1)])
    basis = list(range(n))  # w_i

    # Entering: artificial variable z0 (column 2n); leaving: most negative q.
    t = int(np.argmin(q))
    entering = 2 * n
    _pivot(T, t, entering)
    basis[t] = entering
    # Complement of the leaving w_t is z_t (column n + t).
    entering = n + t

    for _ in range(max_pivots):
        col = T[:, entering]
        rhs = T[:, -1]
        ratios = np.where(col > 1e-12, rhs / np.where(col > 1e-12, col, 1.0),
                          np.inf)
        if not np.any(np.isfinite(ratios)):
            return None, 1  # ray termination
        t = int(np.argmin(ratios))
        leaving = basis[t]
        _pivot(T, t, entering)
        basis[t] = entering
        if leaving == 2 * n:  # z0 left the basis: solved
            z = np.zeros(n)
            for row, var in enumerate(basis):
                if n <= var < 2 * n:
                    z[var - n] = T[row, -1]
            return z, 0
        # Next entering variable: complement of the leaving one.
        entering = leaving + n if leaving < n else leaving - n
    return None, 2


def _pivot(T: np.ndarray, row: int, col: int) -> None:
    T[row] /= T[row, col]
    for r in range(len(T)):
        if r != row and abs(T[r, col]) > 0:
            T[r] -= T[r, col] * T[row]


def validate_lcp_solution(
    M: np.ndarray, q: np.ndarray, z: np.ndarray, tol: float = 1e-8
) -> bool:
    """Reference parity: LCPUtils::isLCPSolutionValid."""
    w = M @ z + q
    return bool(
        np.all(z >= -tol)
        and np.all(w >= -tol)
        and abs(float(z @ w)) <= tol * (1 + np.abs(q).max())
    )
