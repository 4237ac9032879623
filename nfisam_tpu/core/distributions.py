"""JAX-native probability distributions used by the factor layer.

Parity with reference ``src/stats/Distributions.py`` (GaussianDistribution:55,
GaussianRangeDistribution:113, GaussianMixtureDistribution:153) — re-designed
as thin host objects over pure vectorized JAX kernels: ``log_pdf`` /
``grad_x_log_pdf`` / ``rvs`` operate on ``(n, dim)`` batches in a single fused
call, and sampling takes explicit ``jax.random`` keys (the reference uses the
global NumPy RNG).
"""
from __future__ import annotations

from functools import partial
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .geometry import wrap_angle

_LOG_TWO_PI = float(np.log(2.0 * np.pi))


# --------------------------------------------------------------------------
# Pure kernels
# --------------------------------------------------------------------------
@jax.jit
def gaussian_log_pdf(x: jax.Array, mu: jax.Array, prec_chol: jax.Array,
                     log_norm: jax.Array) -> jax.Array:
    """log N(x; mu, Sigma) with L = chol(Sigma^{-1}); x: (n, d)."""
    delta = (x - mu) @ prec_chol  # whitened residuals
    return log_norm - 0.5 * jnp.sum(delta * delta, axis=-1)


@jax.jit
def gaussian_grad_log_pdf(x: jax.Array, mu: jax.Array, precision: jax.Array
                          ) -> jax.Array:
    return -(x - mu) @ precision.T


@partial(jax.jit, static_argnums=3)
def gaussian_rvs(key: jax.Array, mu: jax.Array, cov_sqrt: jax.Array,
                 n: int) -> jax.Array:
    z = jax.random.normal(key, (n, mu.shape[-1]))
    return z @ cov_sqrt.T + mu


@jax.jit
def gaussian_unif_to_sample(u: jax.Array, mu: jax.Array,
                            cov_sqrt: jax.Array) -> jax.Array:
    """Map uniform-cube samples through the Gaussian inverse CDF."""
    z = jax.scipy.stats.norm.ppf(u)
    return z @ cov_sqrt.T + mu


def _spd_sqrt(mat: np.ndarray) -> np.ndarray:
    """Symmetric matrix square root of an SPD matrix (host-side, tiny)."""
    w, v = np.linalg.eigh(mat)
    w = np.clip(w, 0.0, None)
    return (v * np.sqrt(w)) @ v.T


class GaussianDistribution:
    """Multivariate normal with batched device kernels.

    Reference: ``stats/Distributions.py:55``. ``cov_sqrt`` is the symmetric
    SPD square root (the reference uses ``scipy.linalg.sqrtm``), which keeps
    ``unif_to_sample`` bit-compatible in distribution.
    """

    def __init__(self, mu: np.ndarray, sigma: np.ndarray | None = None,
                 precision: np.ndarray | None = None):
        mu = np.asarray(mu, dtype=np.float64).reshape(-1)
        if sigma is not None:
            sigma = np.asarray(sigma, dtype=np.float64)
            precision = np.linalg.inv(sigma)
        elif precision is not None:
            precision = np.asarray(precision, dtype=np.float64)
            sigma = np.linalg.inv(precision)
        else:
            raise ValueError("Need sigma or precision")
        self.mu = mu
        self.sigma = sigma
        self.precision = precision
        self.cov_sqrt = _spd_sqrt(sigma)
        self.prec_chol = np.linalg.cholesky(precision)
        d = mu.shape[0]
        self.log_norm = -0.5 * (d * _LOG_TWO_PI + np.log(np.linalg.det(sigma)))

    @property
    def dim(self) -> int:
        return self.mu.shape[0]

    @property
    def mean(self) -> np.ndarray:
        return self.mu

    @property
    def covariance(self) -> np.ndarray:
        return self.sigma

    def rvs(self, key: jax.Array, num_samples: int) -> jax.Array:
        return gaussian_rvs(key, self.mu, self.cov_sqrt, num_samples)

    def log_pdf(self, x) -> jax.Array:
        return gaussian_log_pdf(jnp.asarray(x), self.mu, self.prec_chol,
                                self.log_norm)

    def pdf(self, x) -> jax.Array:
        return jnp.exp(self.log_pdf(x))

    def grad_x_log_pdf(self, x) -> jax.Array:
        return gaussian_grad_log_pdf(jnp.asarray(x), self.mu, self.precision)

    def unif_to_sample(self, u) -> jax.Array:
        return gaussian_unif_to_sample(jnp.asarray(u), self.mu, self.cov_sqrt)


# --------------------------------------------------------------------------
@partial(jax.jit, static_argnums=4)
def _ring_rvs(key, center, mu, sigma, n):
    kr, ka = jax.random.split(key)
    r = mu + sigma * jax.random.normal(kr, (n, 1))
    ang = jax.random.uniform(ka, (n, 1), minval=-jnp.pi, maxval=jnp.pi)
    return center + jnp.concatenate([r * jnp.cos(ang), r * jnp.sin(ang)], -1)


class GaussianRangeDistribution:
    """Ring-shaped density: Gaussian radius around a center, uniform angle.

    Reference: ``stats/Distributions.py:113`` (note the reference stores the
    *variance* in its ``_sigma`` field via ``sigma ** 2`` at the factor call
    site; here ``variance`` is explicit).
    """

    def __init__(self, center: np.ndarray, mu: float, variance: float):
        self.center = np.asarray(center, dtype=np.float64).reshape(-1)
        self.mu = float(mu)
        self.variance = float(variance)
        self.sigma_sqrt = float(np.sqrt(variance))

    @property
    def dim(self) -> int:
        return self.center.shape[0]

    @property
    def mean(self) -> float:
        return self.mu

    @property
    def covariance(self) -> float:
        return self.variance

    def rvs(self, key: jax.Array, num_samples: int) -> jax.Array:
        return _ring_rvs(key, self.center, self.mu, self.sigma_sqrt,
                         num_samples)

    def log_pdf(self, x) -> jax.Array:
        """Unnormalized in angle (matches factor usage in the reference)."""
        r = jnp.linalg.norm(jnp.asarray(x) - self.center, axis=-1)
        return (-0.5 * (r - self.mu) ** 2 / self.variance
                - 0.5 * (_LOG_TWO_PI + jnp.log(self.variance)))

    def unif_to_sample(self, u) -> jax.Array:
        u = jnp.asarray(u)
        r = self.sigma_sqrt * jax.scipy.stats.norm.ppf(u[..., 0]) + self.mu
        ang = (u[..., 1] - 0.5) * 2.0 * jnp.pi
        return self.center + jnp.stack([r * jnp.cos(ang), r * jnp.sin(ang)], -1)


# --------------------------------------------------------------------------
class GaussianMixtureDistribution:
    """Finite Gaussian mixture with vectorized component evaluation.

    Reference: ``stats/Distributions.py:153``. All components are stacked so
    pdf / log_pdf / grad run as one ``(n, k)`` batched computation instead of
    a Python loop per component.
    """

    def __init__(self, weights: Sequence[float], means: Sequence[np.ndarray],
                 sigmas: Sequence[np.ndarray] | None = None,
                 precisions: Sequence[np.ndarray] | None = None):
        w = np.asarray(weights, dtype=np.float64)
        if not np.isclose(w.sum(), 1.0):
            raise ValueError("weights must sum to 1")
        means = np.stack([np.asarray(m, dtype=np.float64).reshape(-1)
                          for m in means])
        if sigmas is not None:
            covs = np.stack([np.asarray(s, dtype=np.float64) for s in sigmas])
        else:
            covs = np.stack([np.linalg.inv(np.asarray(p)) for p in precisions])
        self.weights = w
        self.means = means
        self.covs = covs
        self.precisions = np.stack([np.linalg.inv(c) for c in covs])
        self.prec_chols = np.stack([np.linalg.cholesky(p)
                                    for p in self.precisions])
        self.cov_sqrts = np.stack([_spd_sqrt(c) for c in covs])
        d = means.shape[1]
        self.log_norms = -0.5 * (d * _LOG_TWO_PI +
                                 np.log(np.linalg.det(covs)))

    @property
    def dim(self) -> int:
        return self.means.shape[1]

    @property
    def num_components(self) -> int:
        return self.weights.shape[0]

    def component_log_pdfs(self, x) -> jax.Array:
        """(n, k) per-component log densities."""
        x = jnp.asarray(x)
        delta = x[:, None, :] - self.means[None, :, :]
        white = jnp.einsum("nkd,kde->nke", delta, self.prec_chols)
        return self.log_norms - 0.5 * jnp.sum(white * white, axis=-1)

    def log_pdf(self, x) -> jax.Array:
        comp = self.component_log_pdfs(x) + jnp.log(self.weights)
        return jax.scipy.special.logsumexp(comp, axis=-1)

    def pdf(self, x) -> jax.Array:
        return jnp.exp(self.log_pdf(x))

    def grad_x_log_pdf(self, x) -> jax.Array:
        x = jnp.asarray(x)
        comp = self.component_log_pdfs(x) + jnp.log(self.weights)
        resp = jax.nn.softmax(comp, axis=-1)                      # (n, k)
        delta = x[:, None, :] - self.means[None, :, :]
        comp_grad = -jnp.einsum("nkd,kde->nke", delta, self.precisions)
        return jnp.sum(resp[..., None] * comp_grad, axis=1)

    def rvs(self, key: jax.Array, num_samples: int) -> jax.Array:
        kc, kn = jax.random.split(key)
        comps = jax.random.choice(kc, self.num_components, (num_samples,),
                                  p=jnp.asarray(self.weights))
        z = jax.random.normal(kn, (num_samples, self.dim))
        noise = jnp.einsum("nd,nde->ne", z, self.cov_sqrts[comps])
        return self.means[comps] + noise
