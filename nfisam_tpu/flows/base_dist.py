"""Base (latent) distributions for the flows.

Parity with reference ``src/flows/prior_dist.py`` (CustomMultivariateNormal:5,
MultivariateNormalVonmises:29) — pure-function JAX design: a base
distribution is (log_prob, sample) over ``(n, d)`` arrays, parameterized by a
static per-dim circular mask.  Also fixes the reference defect where
``MultivariateNormalVonmises.to()`` returned the wrong class
(``prior_dist.py:69-70``).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_LOG_TWO_PI = float(np.log(2.0 * np.pi))
# log I_0(1): modified Bessel of the first kind at the fixed concentration 1.0
_LOG_I0_1 = float(np.log(np.i0(1.0)))
_VM_KAPPA = 1.0


def normal_log_prob(z: jax.Array) -> jax.Array:
    """Standard-normal log density summed over the last axis."""
    return -0.5 * jnp.sum(z * z + _LOG_TWO_PI, axis=-1)


def normal_sample(key: jax.Array, shape) -> jax.Array:
    return jax.random.normal(key, shape)


def von_mises_log_prob(theta: jax.Array) -> jax.Array:
    """von Mises(0, kappa=1) log density, elementwise."""
    return _VM_KAPPA * jnp.cos(theta) - _LOG_TWO_PI - _LOG_I0_1


def von_mises_sample(key: jax.Array, shape, rounds: int = 16) -> jax.Array:
    """Best-Fisher rejection sampling with a fixed number of masked rounds
    (jit-friendly; acceptance ~66%/round at kappa=1 so residual failure
    probability after 16 rounds is ~1e-8; failures fall back to a wrapped
    uniform draw)."""
    kappa = _VM_KAPPA
    tau = 1.0 + np.sqrt(1.0 + 4.0 * kappa * kappa)
    rho = (tau - np.sqrt(2.0 * tau)) / (2.0 * kappa)
    r = (1.0 + rho * rho) / (2.0 * rho)

    def body(carry, k):
        accepted, vals = carry
        k1, k2, k3 = jax.random.split(k, 3)
        u1 = jax.random.uniform(k1, shape)
        u2 = jax.random.uniform(k2, shape)
        u3 = jax.random.uniform(k3, shape)
        z = jnp.cos(jnp.pi * u1)
        f = (1.0 + r * z) / (r + z)
        c = kappa * (r - f)
        accept = (c * (2.0 - c) - u2 > 0) | (jnp.log(c / u2) + 1.0 - c >= 0)
        theta = jnp.sign(u3 - 0.5) * jnp.arccos(jnp.clip(f, -1.0, 1.0))
        take = accept & ~accepted
        vals = jnp.where(take, theta, vals)
        accepted = accepted | accept
        return (accepted, vals), None

    k0, kf = jax.random.split(key)
    fallback = jax.random.uniform(kf, shape, minval=-jnp.pi, maxval=jnp.pi)
    init = (jnp.zeros(shape, dtype=bool), fallback)
    (accepted, vals), _ = jax.lax.scan(body, init,
                                       jax.random.split(k0, rounds))
    return vals


class BaseDistribution:
    """Product of standard normals (Euclidean dims) and von Mises (circular
    dims). With an all-False mask this is exactly the reference's
    ``CustomMultivariateNormal``; with circular dims it is the (fixed)
    ``MultivariateNormalVonmises``."""

    def __init__(self, circular_mask):
        self.circular_mask = np.asarray(circular_mask, dtype=bool)
        self.dim = int(self.circular_mask.shape[0])
        self._any_circular = bool(self.circular_mask.any())

    def log_prob(self, z: jax.Array) -> jax.Array:
        if not self._any_circular:
            return normal_log_prob(z)
        mask = jnp.asarray(self.circular_mask)
        normal_term = -0.5 * (z * z + _LOG_TWO_PI)
        vm_term = von_mises_log_prob(z)
        return jnp.sum(jnp.where(mask, vm_term, normal_term), axis=-1)

    def sample(self, key: jax.Array, n: int) -> jax.Array:
        if not self._any_circular:
            return jax.random.normal(key, (n, self.dim))
        kn, kv = jax.random.split(key)
        normal = jax.random.normal(kn, (n, self.dim))
        vm = von_mises_sample(kv, (n, self.dim))
        return jnp.where(jnp.asarray(self.circular_mask), vm, normal)

    def slice(self, start: int, stop: int) -> "BaseDistribution":
        return BaseDistribution(self.circular_mask[start:stop])
