"""Standalone log-likelihood objects.

Parity with reference ``src/stats/Likelihoods.py`` (``LogLikelihood:8``,
``GaussianMixtureLogLikelihood:66``, ``GaussianRangeLogLikelihood:203``)
and ``src/stats/Distributions.py:413`` (``GaussianDisplacementDistribution``).
In this framework the factor layer embeds its likelihood math directly in
jitted kernels; these thin classes expose the same evaluate/grad_x protocol
for code that wants likelihoods as first-class objects (e.g. custom
samplers), all vectorized.
"""
from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .distributions import GaussianDistribution, _spd_sqrt

_LOG_TWO_PI = float(np.log(2.0 * np.pi))


class LogLikelihood:
    """y | x likelihood protocol (reference ``Likelihoods.py:8``)."""

    def __init__(self, y) -> None:
        self._y = np.asarray(y, dtype=np.float64).reshape(-1)

    @property
    def y(self) -> np.ndarray:
        return self._y

    def evaluate(self, x) -> jax.Array:
        raise NotImplementedError

    def grad_x(self, x) -> jax.Array:
        return jax.vmap(jax.grad(
            lambda row: self.evaluate(row[None])[0]))(jnp.asarray(x))


class GaussianRangeLogLikelihood(LogLikelihood):
    """log N(|x_a - x_b| ; distance, variance) over stacked (x_a, x_b)
    (reference ``Likelihoods.py:203`` / ``Distributions.py:343``)."""

    def __init__(self, distance: float, dim: int, variance: float) -> None:
        if distance < 0 or dim <= 0 or variance <= 0:
            raise ValueError("distance/dim/variance must be positive")
        super().__init__(np.array([distance]))
        self.dim = dim
        self.variance = float(variance)

    def evaluate(self, x) -> jax.Array:
        x = jnp.asarray(x)
        half = self.dim // 2
        d = jnp.linalg.norm(x[:, :half] - x[:, half:], axis=1)
        delta = d - self._y[0]
        return (-0.5 * delta ** 2 / self.variance
                - 0.5 * (_LOG_TWO_PI + np.log(self.variance)))


class GaussianMixtureLogLikelihood(LogLikelihood):
    """Mixture of additive-Gaussian likelihoods y = T_k x + noise_k
    (reference ``Likelihoods.py:66``)."""

    def __init__(self, y, weights: Sequence[float],
                 transforms: Sequence[np.ndarray],
                 covariances: Sequence[np.ndarray]) -> None:
        super().__init__(y)
        w = np.asarray(weights, dtype=np.float64)
        self.weights = w / w.sum()
        self.transforms = [np.asarray(t, dtype=np.float64)
                           for t in transforms]
        self.noises = [GaussianDistribution(np.zeros(t.shape[0]), c)
                       for t, c in zip(self.transforms, covariances)]

    def evaluate(self, x) -> jax.Array:
        x = jnp.asarray(x)
        comps = []
        for w, T, noise in zip(self.weights, self.transforms, self.noises):
            resid = self._y - x @ T.T
            comps.append(noise.log_pdf(resid) + jnp.log(w))
        return jax.scipy.special.logsumexp(jnp.stack(comps, -1), axis=-1)


class GaussianDisplacementDistribution:
    """Density of x_b = x_a + mu + noise over stacked (x_a, x_b)
    (reference ``Distributions.py:413``)."""

    def __init__(self, mu, sigma) -> None:
        self.mu = np.asarray(mu, dtype=np.float64).reshape(-1)
        self.noise = GaussianDistribution(np.zeros(self.mu.shape[0]),
                                          np.asarray(sigma))

    @property
    def dim(self) -> int:
        return 2 * self.mu.shape[0]

    def log_pdf(self, x) -> jax.Array:
        x = jnp.asarray(x)
        half = self.mu.shape[0]
        return self.noise.log_pdf(x[:, half:] - x[:, :half] - self.mu)

    def pdf(self, x) -> jax.Array:
        return jnp.exp(self.log_pdf(x))

    def grad_x_log_pdf(self, x) -> jax.Array:
        x = jnp.asarray(x)
        half = self.mu.shape[0]
        g = self.noise.grad_x_log_pdf(x[:, half:] - x[:, :half] - self.mu)
        return jnp.concatenate([-g, g], axis=-1)

    def rvs(self, key, num_samples: int, x_a=None) -> jax.Array:
        if x_a is None:
            raise ValueError("conditional distribution: need x_a")
        noise = self.noise.rvs(key, num_samples)
        return jnp.asarray(x_a) + self.mu + noise
