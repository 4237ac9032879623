"""Clique density model: flow stack + sample normalization + base measure.

Parity with reference ``src/slam/NFiSAM.py`` (``NormalizingFlowModelWithSeparator:68``,
``normalize_training_samples:515``) and ``src/flows/models.py``
(``NormalizingFlowModel:4``) — re-designed as pure jitted functions over
parameter pytrees with static configs, so the solver can cache one compiled
program per clique signature and reuse it across incremental steps.

Variable ordering convention (identical to the reference): columns are
``[augmented observations | separator | frontal]`` in reverse-elimination
order; ``aug_sep_dim`` = observation dims + separator dims.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..core.geometry import wrap_angle
from .base_dist import BaseDistribution
from .nsf import (NSFConfig, flow_forward, stack_forward, stack_inverse,
                  stack_forward_perdim, stack_inverse_masked)


# --------------------------------------------------------------------------
# Normalization (circular-aware; reference NFiSAM.py:515-548, 96-118)
# --------------------------------------------------------------------------
def circular_mean(samples: jax.Array, axis=0) -> jax.Array:
    """Circular mean in [-pi, pi] (scipy.stats.circmean equivalent)."""
    s = jnp.mean(jnp.sin(samples), axis=axis)
    c = jnp.mean(jnp.cos(samples), axis=axis)
    return jnp.arctan2(s, c)


def compute_normalizer(samples: jax.Array, circ_mask: np.ndarray,
                       scale_circular: bool = True):
    """Per-dim (mean, std); circular dims use circmean and wrapped residual
    std.  ``scale_circular=False`` for the circular-spline flow, which lives
    natively on [-pi, pi] (reference NFiSAM.py:529-535)."""
    circ = jnp.asarray(circ_mask)
    mean_e = jnp.mean(samples, axis=0)
    mean_c = circular_mean(samples)
    mean = jnp.where(circ, mean_c, mean_e)
    resid = jnp.where(circ, wrap_angle(samples - mean), samples - mean)
    std = jnp.std(resid, axis=0)
    if not scale_circular:
        std = jnp.where(circ, 1.0, std)
    std = jnp.clip(std, 1e-5, None)
    return mean, std


def normalize(samples: jax.Array, mean: jax.Array, std: jax.Array,
              circ_mask, init_dim: int = 0) -> jax.Array:
    """(x - mean) / std with angle wrapping on circular dims.  ``init_dim``
    offsets into the stored full-clique mean/std arrays when normalizing a
    column block (reference ``normalize_samples`` NFiSAM.py:96-106)."""
    d = samples.shape[-1]
    m = mean[init_dim:init_dim + d]
    s = std[init_dim:init_dim + d]
    circ = jnp.asarray(circ_mask)[init_dim:init_dim + d]
    resid = jnp.where(circ, wrap_angle(samples - m), samples - m)
    return resid / s


def unnormalize(z: jax.Array, mean: jax.Array, std: jax.Array, circ_mask,
                init_dim: int = 0) -> jax.Array:
    d = z.shape[-1]
    m = mean[init_dim:init_dim + d]
    s = std[init_dim:init_dim + d]
    circ = jnp.asarray(circ_mask)[init_dim:init_dim + d]
    x = z * s + m
    return jnp.where(circ, wrap_angle(x), x)


# --------------------------------------------------------------------------
# Pure model functions (jit-cached per NSFConfig)
# --------------------------------------------------------------------------
def model_forward(flow_params: List[dict], x_norm: jax.Array, cfg: NSFConfig,
                  base: BaseDistribution):
    """Normalized target samples -> (z, prior_logprob, log_det)."""
    z, log_det = stack_forward(flow_params, x_norm, cfg)
    return z, base.log_prob(z), log_det


def negative_log_likelihood(flow_params: List[dict], x_norm: jax.Array,
                            cfg: NSFConfig, base: BaseDistribution):
    _, prior_lp, log_det = model_forward(flow_params, x_norm, cfg, base)
    return -jnp.mean(prior_lp + log_det)


# --------------------------------------------------------------------------
# Cached one-dispatch programs (tunnel-latency critical: each call below is
# a single compiled executable launch instead of dozens of eager ops)
# --------------------------------------------------------------------------
from functools import lru_cache  # noqa: E402


def _use_pallas_inverse(cfg: NSFConfig) -> bool:
    """Fused Pallas AR-inverse on TPU (measured v5e: ~23x at clique-scale
    n=1000 where the XLA path is launch-bound, 1.2-1.7x at n>=32k where
    both are compute-bound; see BENCHMARKS.md).  ``NFISAM_PALLAS_INVERSE``
    = 1/0 forces it on/off; default: on for TPU backends at the dim range
    the unrolled kernel compiles quickly for."""
    import os
    env = os.environ.get("NFISAM_PALLAS_INVERSE", "auto").lower()
    if env in ("1", "true", "on"):
        return True
    if env in ("0", "false", "off"):
        return False
    return jax.default_backend() == "tpu" and cfg.dim <= 32


def _select_inverse_fn(cfg: NSFConfig):
    if _use_pallas_inverse(cfg):
        from .ar_inverse_pallas import stack_inverse_masked_pallas
        return stack_inverse_masked_pallas
    return stack_inverse_masked


def conditional_draw_core(flow_params, mean, std, circ_mask, key, prefix,
                          invert_mask, cfg: NSFConfig,
                          base: BaseDistribution, inverse_fn):
    """One conditional draw: normalize the [obs | separator] prefix, mask
    the dims to invert, draw the base, run the masked AR inverse,
    unnormalize.  Shared by the per-clique program below and the fused
    tree-sweep scan (``solver/posterior_pass.py``) so the two paths stay
    bit-identical by construction."""
    n = prefix.shape[0]
    x_prefix = normalize(prefix, mean, std, circ_mask, 0)
    x_prefix = jnp.where(invert_mask[None, :], 0.0, x_prefix)
    z_full = base.sample(key, n)
    x_full = inverse_fn(flow_params, z_full, x_prefix, invert_mask, cfg)
    return unnormalize(x_full, mean, std, circ_mask, init_dim=0)


@lru_cache(maxsize=64)
def _conditional_sample_program(cfg: NSFConfig):
    """Width-agnostic conditional sampler: the separator split arrives as
    data (zero-padded prefix + invert mask), so ONE compiled program per
    flow config serves every clique (per-``sep_dim`` variants of the
    unrolled inverse were the dominant compile cost at Plaza scale)."""
    base = BaseDistribution(cfg.circular_mask)
    inverse_fn = _select_inverse_fn(cfg)

    @jax.jit
    def run(flow_params, mean, std, circ_mask, key, obs_full,
            invert_mask):
        return conditional_draw_core(flow_params, mean, std, circ_mask,
                                     key, obs_full, invert_mask, cfg,
                                     base, inverse_fn)

    return run


@lru_cache(maxsize=64)
def _separator_forward_program(cfg: NSFConfig):
    """Width-agnostic separator marginal: run the FULL forward (the AR
    prefix property makes the first d columns self-contained) and sum the
    per-dim base log-probs and log-dets under a width mask — one compiled
    program per flow config."""
    from .base_dist import _LOG_TWO_PI, von_mises_log_prob

    circ_static = jnp.asarray(cfg.circular_mask)

    @jax.jit
    def run(flow_params, mean, std, circ_mask, x_sep_full, width_mask):
        x = normalize(x_sep_full, mean, std, circ_mask, init_dim=0)
        z, ld_perdim = stack_forward_perdim(flow_params, x, cfg)
        normal_lp = -0.5 * (z * z + _LOG_TWO_PI)
        base_lp = jnp.where(circ_static, von_mises_log_prob(z), normal_lp)
        prior_lp = jnp.sum(jnp.where(width_mask[None, :], base_lp, 0.0),
                           axis=-1)
        log_det = jnp.sum(jnp.where(width_mask[None, :], ld_perdim, 0.0),
                          axis=-1)
        return z, prior_lp, log_det

    return run


@lru_cache(maxsize=2048)
def _log_prob_program(cfg: NSFConfig):
    base = BaseDistribution(cfg.circular_mask)

    @jax.jit
    def run(flow_params, mean, std, circ_mask, x):
        xn = normalize(x, mean, std, circ_mask, init_dim=0)
        _, prior_lp, log_det = model_forward(flow_params, xn, cfg, base)
        return prior_lp + log_det - jnp.sum(jnp.log(std))

    return run


@dataclass
class CliqueFlowModel:
    """Host-side handle to one trained clique density model.

    ``aug_sep_dim`` counts [observation + separator] columns; the flow's
    total dim = aug_sep_dim + frontal_dim.
    """
    cfg: NSFConfig
    flow_params: List[dict]
    mean: jax.Array            # (dim,)
    std: jax.Array             # (dim,)
    circular_dim_list: List[bool]
    aug_sep_dim: int
    # trailing dummy columns added to bucket clique dims into few compiled
    # signatures (AR structure keeps real dims unaffected)
    pad_dims: int = 0
    # host-side fingerprint of the training inputs (key + config + data
    # shape); lets downstream checkpoint invalidation run with ZERO
    # device->host fetches (the tunneled TPU link degrades to ~30 ms per
    # op after d2h transfers, so per-clique array hashing is unaffordable)
    content_tag: str = ""

    @property
    def dim(self) -> int:
        return self.cfg.dim

    @property
    def base(self) -> BaseDistribution:
        return BaseDistribution(self.cfg.circular_mask)

    @property
    def separator_base(self) -> BaseDistribution | None:
        if self.aug_sep_dim == 0:
            return None
        return BaseDistribution(self.cfg.circular_mask[:self.aug_sep_dim])

    # -------------------------------------------------------------- queries
    def with_separator_dim(self, aug_sep_dim: int) -> "CliqueFlowModel":
        """Re-view the same density with a different separator/frontal split
        (reference ``root_clique_density_model_to_leaf`` NFiSAM.py:550)."""
        return CliqueFlowModel(self.cfg, self.flow_params, self.mean,
                               self.std, self.circular_dim_list, aug_sep_dim,
                               self.pad_dims, self.content_tag)

    @property
    def _mask(self):
        mask = list(self.circular_dim_list) + [False] * (
            self.cfg.dim - len(self.circular_dim_list))
        return jnp.asarray(np.asarray(mask, dtype=bool))

    def conditional_sample(self, key: jax.Array, num_samples: int,
                           obs_samples=None) -> jax.Array:
        """Sample frontal dims conditioned on [obs | separator] samples
        (reference ``conditional_sample_given_observation`` NFiSAM.py:120).
        One compiled-program launch per call; trailing pad columns are
        returned (callers slice to the width they need)."""
        if obs_samples is None:
            sep_dim = 0
            n = num_samples
            obs_full = jnp.zeros((n, self.cfg.dim), dtype=jnp.float32)
        else:
            obs_samples = jnp.asarray(obs_samples, dtype=jnp.float32)
            sep_dim = obs_samples.shape[1]
            n = obs_samples.shape[0]
            obs_full = jnp.concatenate(
                [obs_samples,
                 jnp.zeros((n, self.cfg.dim - sep_dim),
                           dtype=jnp.float32)], axis=1)
        invert_mask = jnp.asarray(np.arange(self.cfg.dim) >= sep_dim)
        run = _conditional_sample_program(self.cfg)
        x_out = run(self.flow_params, self.mean, self.std, self._mask, key,
                    obs_full, invert_mask)
        return x_out[:, sep_dim:]

    def separator_forward(self, x_sep: jax.Array):
        """Push separator samples through the flow prefix; returns
        (z, separator_prior_logprob, separator_log_det) — the separator
        marginal density used by ``FlowsPriorFactor.log_pdf``
        (reference NFiSAM.py:157-173, 233-251)."""
        x_sep = jnp.asarray(x_sep, dtype=jnp.float32)
        d_sep = x_sep.shape[-1]
        n = x_sep.shape[0]
        x_full = jnp.concatenate(
            [x_sep, jnp.zeros((n, self.cfg.dim - d_sep),
                              dtype=jnp.float32)], axis=1)
        width_mask = jnp.asarray(np.arange(self.cfg.dim) < d_sep)
        run = _separator_forward_program(self.cfg)
        z, prior_lp, log_det = run(self.flow_params, self.mean, self.std,
                                   self._mask, x_full, width_mask)
        return z[:, :d_sep], prior_lp, log_det

    def log_prob(self, x: jax.Array) -> jax.Array:
        """Full joint log density of unnormalized samples (n, dim)
        (pad columns included; constant offset for fixed pads)."""
        run = _log_prob_program(self.cfg)
        x = jnp.asarray(x, dtype=jnp.float32)
        if x.shape[-1] < self.cfg.dim:
            x = jnp.concatenate(
                [x, jnp.zeros((x.shape[0], self.cfg.dim - x.shape[-1]),
                              dtype=jnp.float32)], axis=-1)
        return run(self.flow_params, self.mean, self.std, self._mask, x)

    def sample(self, key: jax.Array, num_samples: int) -> jax.Array:
        return self.conditional_sample(key, num_samples)
