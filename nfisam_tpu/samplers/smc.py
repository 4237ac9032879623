"""Sequential Monte Carlo comparison sampler.

Role parity with reference ``src/sampler/SMCSampler.py``
(``GlobalSMCSampler:17``, which wraps pymc3's SMC).  TPU-first re-design:
adaptive-tempering SMC — likelihood raised from prior to posterior with
the temperature chosen each round so the effective sample size stays at a
target fraction, systematic resampling, and vectorized random-walk
Metropolis move kernels scaled by the particle covariance.  Every round is
a fused batch over all particles in one compiled program.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.variables import Variable
from ..factors.factors import Factor
from ..utils.keys import split_host
from .joint import StructuredJointFactor


@dataclass(frozen=True)
class SMCConfig:
    n_particles: int = 2000
    ess_target: float = 0.5       # fraction of N
    mh_steps: int = 10
    max_stages: int = 50
    step_scale: float = 0.5


def _systematic_resample(key, weights, n):
    u = (jax.random.uniform(key) + jnp.arange(n)) / n
    cum = jnp.cumsum(weights)
    return jnp.searchsorted(cum, u)


def _find_next_beta(loglike, beta, ess_target_n):
    """Bisect the temperature increment so ESS ~= target."""

    def ess(db):
        w = db * loglike
        w = w - jax.scipy.special.logsumexp(w)
        return jnp.exp(-jax.scipy.special.logsumexp(2 * w))

    def body(carry):
        lo, hi, _ = carry
        mid = 0.5 * (lo + hi)
        too_cold = ess(mid) < ess_target_n
        return (jnp.where(too_cold, lo, mid),
                jnp.where(too_cold, mid, hi), mid)

    def cond(carry):
        lo, hi, _ = carry
        return (hi - lo) > 1e-4

    lo, hi, mid = jax.lax.while_loop(cond, body,
                                     (jnp.float32(0.0),
                                      jnp.float32(1.0 - beta),
                                      jnp.float32(1.0 - beta)))
    full = ess(1.0 - beta) >= ess_target_n
    return jnp.where(full, 1.0 - beta, mid)


def smc_sample(key, prior_sample_fn: Callable, loglike_fn: Callable,
               dim: int, cfg: SMCConfig = SMCConfig(),
               summary: Optional[dict] = None,
               logprior_fn: Optional[Callable] = None) -> np.ndarray:
    """Adaptive-tempering SMC from the ancestral prior to the posterior.

    The stage-``beta`` target is ``prior(x) * like(x)^beta``; the MH move
    kernel's acceptance therefore includes the PRIOR density ratio —
    without it the kernel targets ``like^beta`` alone, which measurably
    inflated the posterior (+30% variance on the closed-form Gaussian
    oracle before the round-4 test tightening caught it)."""
    N = cfg.n_particles
    keys = split_host(key, cfg.max_stages + 1)
    X = jnp.asarray(prior_sample_fn(keys[0], N), dtype=jnp.float32)
    if logprior_fn is None:
        logprior_fn = lambda x: jnp.zeros(x.shape[0])   # noqa: E731

    @jax.jit
    def stage(key, X, beta):
        L = loglike_fn(X)
        d_beta = _find_next_beta(L, beta, cfg.ess_target * N)
        logw = d_beta * L
        w = jax.nn.softmax(logw)
        k_rs, k_mh = jax.random.split(jnp.asarray(key))
        idx = _systematic_resample(k_rs, w, N)
        X = X[idx]
        new_beta = beta + d_beta
        # move kernel: random-walk MH targeting prior * like^new_beta
        cov_diag = jnp.clip(jnp.var(X, axis=0), 1e-8, None)
        step = cfg.step_scale * jnp.sqrt(cov_diag) / jnp.sqrt(
            jnp.asarray(float(dim)))
        L_cur = loglike_fn(X)
        P_cur = logprior_fn(X)

        def mh_body(i, carry):
            X, L_cur, P_cur, n_acc, k = carry
            k, k1, k2 = jax.random.split(k, 3)
            prop = X + step * jax.random.normal(k1, X.shape)
            L_prop = loglike_fn(prop)
            P_prop = logprior_fn(prop)
            log_alpha = new_beta * (L_prop - L_cur) + (P_prop - P_cur)
            accept = jnp.log(jax.random.uniform(k2, (N,))) < log_alpha
            X = jnp.where(accept[:, None], prop, X)
            L_cur = jnp.where(accept, L_prop, L_cur)
            P_cur = jnp.where(accept, P_prop, P_cur)
            return X, L_cur, P_cur, n_acc + jnp.mean(accept), k

        X, L_cur, P_cur, acc, _ = jax.lax.fori_loop(
            0, cfg.mh_steps, mh_body,
            (X, L_cur, P_cur, jnp.float32(0.0), k_mh))
        return X, new_beta, acc / cfg.mh_steps

    beta = 0.0
    stages = 0
    acc = 0.0
    for s in range(cfg.max_stages):
        X, beta_new, acc = stage(keys[s + 1], X, beta)
        beta = float(beta_new)
        stages += 1
        if beta >= 1.0 - 1e-6:
            break
    if summary is not None:
        summary.update({"stages": stages, "final_beta": beta,
                        "mh_accept": float(acc)})
    return np.asarray(X)


class GlobalSMCSampler:
    """Reference-parity facade (``GlobalSMCSampler`` SMCSampler.py:17):
    the prior measure is the graph's ancestral (tree) distribution and the
    tempered likelihood is the remaining factors — the same split the
    nested sampler uses."""

    def __init__(self, nodes: Sequence[Variable],
                 factors: Sequence[Factor], **kwargs) -> None:
        self._nodes = list(nodes)
        self._dim = sum(v.dim for v in nodes)
        self.joint = StructuredJointFactor(factors, nodes)

    def sample(self, key=None, num_samples: int = 2000,
               mh_steps: int = 10, summary: Optional[dict] = None,
               **kwargs) -> np.ndarray:
        if key is None:
            key = np.array([0, 13], dtype=np.uint32)
        if self.joint.if_direct_sampling:
            return np.asarray(self.joint.sample(key, num_samples))
        cfg = SMCConfig(n_particles=num_samples, mh_steps=mh_steps)
        return smc_sample(key, self.joint.sample, self.joint.loglike,
                          self._dim, cfg, summary=summary,
                          logprior_fn=self.joint.log_prior_tree)
