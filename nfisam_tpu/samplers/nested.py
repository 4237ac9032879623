"""Vectorized nested sampling, JAX-native.

Role parity with reference ``src/sampler/NestedSampling.py``
(``GlobalNestedSampler:20``): the ground-truth posterior reference path.
The reference wraps dynesty, whose per-point Python likelihood is the
scalability killer (5.18M interpreter calls on case1 step 5 — SURVEY §3.5).

TPU-first re-design: batched-replacement nested sampling with constrained
random-walk proposals —

* each iteration retires the K worst live points at once and regenerates
  them with T vectorized random-walk steps; every likelihood evaluation is
  a fused ``(K, dim)`` batch in one compiled program;
* the whole iteration (threshold, bookkeeping, walk loop, scale
  adaptation) is a single jitted function; the host loop only checks the
  dlogz termination scalar;
* evidence (logz) accrues with the standard shrinkage ``exp(-K/N)`` per
  batch; remaining live points are folded in at termination.

Matches dynesty's posterior within MC error on the case1 graphs while
running orders of magnitude fewer host round trips.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.variables import Variable
from ..factors.factors import Factor
from ..utils.keys import split_host
from .joint import StructuredJointFactor


@dataclass(frozen=True)
class NestedConfig:
    n_live: int = 1000
    replace_batch: int = 25        # K dead points per iteration
    walk_steps: int = 30           # T constrained random-walk steps
    max_iters: int = 4000
    dlogz: float = 0.05


def _reflect_unit(u: jax.Array) -> jax.Array:
    """Reflect proposals back into [0, 1]^d."""
    u = jnp.mod(u, 2.0)
    return jnp.where(u > 1.0, 2.0 - u, u)


def build_ns_iteration(ptform: Callable, loglike: Callable, dim: int,
                       cfg: NestedConfig):
    K, T, N = cfg.replace_batch, cfg.walk_steps, cfg.n_live

    @jax.jit
    def iteration(key, U, L, logvol, logz):
        # --- retire the K worst -----------------------------------------
        order = jnp.argsort(L)
        dead_idx = order[:K]
        L_dead = L[dead_idx]
        X_dead = ptform(U[dead_idx])
        L_thresh = L_dead[-1]          # largest of the dead batch
        # per-batch shrinkage; each dead point shares the slab equally
        new_logvol = logvol - K / N
        log_dvol = logvol + jnp.log1p(-jnp.exp(-K / N)) - jnp.log(K)
        logwt_dead = L_dead + log_dvol
        logz = jnp.logaddexp(logz, jax.scipy.special.logsumexp(logwt_dead))

        # --- regenerate via constrained random walk ---------------------
        k_start, k_walk = jax.random.split(jnp.asarray(key))
        # start from random *surviving* live points
        start_idx = jax.random.choice(k_start, order[K:], (K,))
        u0 = U[start_idx]
        l0 = L[start_idx]
        # walk scale from live-point spread
        sigma = 2.0 * jnp.std(U, axis=0) / jnp.sqrt(jnp.asarray(float(dim)))

        def walk_body(t, carry):
            u, l, n_acc, k = carry
            k, k1 = jax.random.split(k)
            step = sigma * jax.random.normal(k1, (K, dim))
            u_prop = _reflect_unit(u + step)
            l_prop = loglike(ptform(u_prop))
            accept = l_prop > L_thresh
            u = jnp.where(accept[:, None], u_prop, u)
            l = jnp.where(accept, l_prop, l)
            return (u, l, n_acc + jnp.sum(accept), k)

        u_new, l_new, n_acc, _ = jax.lax.fori_loop(
            0, T, walk_body, (u0, l0, jnp.int32(0), k_walk))

        U = U.at[dead_idx].set(u_new)
        L = L.at[dead_idx].set(l_new)
        # termination diagnostic: evidence still reachable from live points
        logz_remain = jnp.max(L) + new_logvol
        return (U, L, new_logvol, logz, X_dead, logwt_dead, L_dead,
                logz_remain, n_acc)

    return iteration


def nested_sample(key, ptform: Callable, loglike: Callable, dim: int,
                  cfg: NestedConfig = NestedConfig(),
                  summary: Optional[dict] = None):
    """Run nested sampling; returns equal-weight posterior samples.

    ``ptform``/``loglike`` must be batched ``(n, dim)`` callables.
    """
    keys = split_host(key, cfg.max_iters + 2)
    U = jax.random.uniform(keys[0], (cfg.n_live, dim))
    L = loglike(ptform(U))
    iteration = build_ns_iteration(ptform, loglike, dim, cfg)

    logvol = jnp.float32(0.0)
    logz = jnp.float32(-1e30)
    dead_X: List[np.ndarray] = []
    dead_logwt: List[np.ndarray] = []
    ncall = cfg.n_live
    it = 0
    for it in range(cfg.max_iters):
        (U, L, logvol, logz, X_dead, logwt_dead, L_dead, logz_remain,
         n_acc) = iteration(keys[it + 1], U, L, logvol, logz)
        dead_X.append(np.asarray(X_dead))
        dead_logwt.append(np.asarray(logwt_dead))
        ncall += cfg.replace_batch * cfg.walk_steps
        # host sync once per iteration on two scalars
        gap = float(jnp.logaddexp(logz, logz_remain) - logz)
        if gap < cfg.dlogz:
            break

    # fold the remaining live points into the posterior
    X_live = np.asarray(ptform(U))
    logwt_live = np.asarray(L) + float(logvol) - np.log(cfg.n_live)
    logz_final = float(jnp.logaddexp(
        logz, jax.scipy.special.logsumexp(jnp.asarray(logwt_live))))

    all_X = np.concatenate(dead_X + [X_live], axis=0)
    all_logwt = np.concatenate(dead_logwt + [logwt_live], axis=0)
    weights = np.exp(all_logwt - all_logwt.max())
    weights /= weights.sum()

    if summary is not None:
        summary.update({
            "nlive": cfg.n_live,
            "niter": (it + 1) * cfg.replace_batch,
            "ncall": int(ncall),
            "eff": 100.0 * len(all_X) / max(ncall, 1),
            "logz": logz_final,
        })
    rng = np.random.default_rng(int(np.asarray(key)[1]))
    idx = rng.choice(len(all_X), size=len(all_X), p=weights)
    return all_X[idx]


class GlobalNestedSampler:
    """Reference-parity facade (``GlobalNestedSampler`` NestedSampling.py:20):
    ancestral sampling when the graph is a tree, nested sampling otherwise.
    """

    def __init__(self, nodes: Sequence[Variable],
                 factors: Sequence[Factor], **kwargs) -> None:
        self._nodes = list(nodes)
        self._dim = sum(v.dim for v in nodes)
        self.joint = StructuredJointFactor(factors, nodes)

    def sample(self, key=None, live_points: int = 1000,
               sampling_method: str = "nested", downsampling: bool = False,
               dlogz: float = 0.05, max_iters: int = 4000,
               res_summary: Optional[dict] = None, **kwargs) -> np.ndarray:
        if key is None:
            key = np.array([0, 7], dtype=np.uint32)
        if self.joint.if_direct_sampling:
            return np.asarray(self.joint.sample(key, live_points))
        cfg = NestedConfig(n_live=live_points,
                           replace_batch=max(live_points // 40, 8),
                           dlogz=dlogz, max_iters=max_iters)
        samples = nested_sample(key, self.joint.ptform, self.joint.loglike,
                                self._dim, cfg, summary=res_summary)
        if downsampling and samples.shape[0] > live_points:
            rng = np.random.default_rng(0)
            samples = samples[rng.choice(len(samples), live_points,
                                         replace=False)]
        return samples
