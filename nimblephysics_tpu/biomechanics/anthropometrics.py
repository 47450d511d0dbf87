"""Anthropometrics: Gaussian priors over body dimensions.

Reference parity: dart/biomechanics/Anthropometrics (Gaussian priors from
the ANSUR-style datasets used to regularize MarkerFitter scales) and
math::MultivariateGaussian. Pure JAX log-pdf so the prior composes into
fitting losses with gradients.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np


class MultivariateGaussian:
    """Reference parity: math::MultivariateGaussian (log-pdf + conditioning)."""

    def __init__(self, names: Sequence[str], mu: np.ndarray, cov: np.ndarray):
        self.names = list(names)
        self.mu = np.asarray(mu, dtype=np.float64)
        self.cov = np.asarray(cov, dtype=np.float64)
        self._prec = np.linalg.inv(self.cov)
        sign, logdet = np.linalg.slogdet(self.cov)
        self._log_norm = -0.5 * (
            len(self.mu) * np.log(2 * np.pi) + logdet
        )

    def log_pdf(self, x) -> jnp.ndarray:
        d = jnp.asarray(x) - jnp.asarray(self.mu)
        return self._log_norm - 0.5 * d @ jnp.asarray(self._prec) @ d

    def condition(self, observed: Dict[str, float]) -> "MultivariateGaussian":
        """Condition the Gaussian on a subset of named values."""
        obs_idx = [self.names.index(k) for k in observed]
        free_idx = [i for i in range(len(self.names)) if i not in obs_idx]
        mu_o = self.mu[obs_idx]
        mu_f = self.mu[free_idx]
        S_ff = self.cov[np.ix_(free_idx, free_idx)]
        S_fo = self.cov[np.ix_(free_idx, obs_idx)]
        S_oo = self.cov[np.ix_(obs_idx, obs_idx)]
        x_o = np.array([observed[self.names[i]] for i in obs_idx])
        K = S_fo @ np.linalg.inv(S_oo)
        mu_new = mu_f + K @ (x_o - mu_o)
        cov_new = S_ff - K @ S_fo.T
        return MultivariateGaussian(
            [self.names[i] for i in free_idx], mu_new, cov_new
        )


class Anthropometrics:
    """Prior over named body dimensions mapped to skeleton body scales.

    Reference parity: biomechanics::Anthropometrics (get_anthropometric_
    log_pdf in the python surface). Dimensions are linear functions of
    per-body scales: dim = base_value * scale_axis(body).
    """

    def __init__(self):
        self._metrics: List[dict] = []
        self._gauss: Optional[MultivariateGaussian] = None

    def add_metric(
        self, name: str, body: int, axis: int, base_value: float
    ) -> None:
        """Register `name` as base_value * body_scales[body, axis]."""
        self._metrics.append(
            dict(name=name, body=body, axis=axis, base=base_value)
        )

    def set_distribution(self, gauss: MultivariateGaussian) -> None:
        assert set(gauss.names) == {m["name"] for m in self._metrics}
        order = {m["name"]: m for m in self._metrics}
        self._metrics = [order[n] for n in gauss.names]
        self._gauss = gauss

    def log_pdf(self, body_scales: jnp.ndarray) -> jnp.ndarray:
        assert self._gauss is not None, "set_distribution first"
        dims = jnp.stack(
            [
                m["base"] * body_scales[m["body"], m["axis"]]
                for m in self._metrics
            ]
        )
        return self._gauss.log_pdf(dims)
