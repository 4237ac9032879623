"""Monotone rational-quadratic spline (RQS) transforms.

The math spec is Durkan et al. 2019 "Neural Spline Flows"; the reference
implementation being matched is ``/root/reference/src/flows/utils.py``
(``unconstrained_RQS:25``, ``RQS:69``).  TPU-first re-design:

* fully vectorized over arbitrary batch shapes ``(..., )`` with per-element
  spline parameters ``(..., K)`` — no boolean-mask gather/scatter (the
  reference's ``inputs[inside_intvl_mask]`` indexing is shape-dynamic and
  cannot be jitted); in/outside-interval handling is a ``where`` select with
  the clamped-input "double where" trick so gradients stay NaN-free;
* the bin search is a K-way comparison sum (K <= ~16), which XLA fuses into
  a handful of vector ops — no sort, no host round-trip;
* both the forward and inverse (quadratic solve) directions return
  ``log |det J|`` terms elementwise so callers can sum over dims.

This module is also the numerical ground truth for the fused Pallas
AR-inverse kernel (``flows/ar_inverse_pallas.py``), which embeds the same
spline math.  A standalone elementwise RQS Pallas kernel was built and
measured in round 2 at PARITY with XLA's own fusion of this module
(negative result recorded in BENCHMARKS.md) and removed — XLA fuses the
elementwise chain as well as a hand kernel; the win only exists where
fusion crosses the sequential AR dimension loop, which is what
``ar_inverse_pallas`` does.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

MIN_BIN_WIDTH = 1e-3
MIN_BIN_HEIGHT = 1e-3
MIN_DERIVATIVE = 1e-3
# softplus(x) = 1 - MIN_DERIVATIVE  =>  boundary derivative == 1 (linear tails)
_BOUNDARY_RAW_DERIV = float(np.log(np.exp(1.0 - MIN_DERIVATIVE) - 1.0))


def _normalize_bins(unnormalized: jax.Array, num_bins: int, left: float,
                    right: float, min_size: float):
    """softmax -> min-size floor -> cumulative knots in [left, right]."""
    probs = jax.nn.softmax(unnormalized, axis=-1)
    sizes = min_size + (1.0 - min_size * num_bins) * probs
    cum = jnp.cumsum(sizes, axis=-1)
    cum = jnp.concatenate([jnp.zeros_like(cum[..., :1]), cum], axis=-1)
    cum = (right - left) * cum + left
    # pin the endpoints exactly
    cum = cum.at[..., 0].set(left)
    cum = cum.at[..., -1].set(right)
    sizes = cum[..., 1:] - cum[..., :-1]
    return sizes, cum


def _search_bin(cum: jax.Array, x: jax.Array, num_bins: int) -> jax.Array:
    """Index of the bin containing x: sum of (x >= knot) - 1, clipped."""
    idx = jnp.sum((x[..., None] >= cum[..., :-1]).astype(jnp.int32), axis=-1) - 1
    return jnp.clip(idx, 0, num_bins - 1)


def _gather(params: jax.Array, idx: jax.Array) -> jax.Array:
    """Select per-element bin parameters: params (..., K), idx (...).

    Uses a one-hot multiply-reduce instead of ``take_along_axis``: TPU
    lowers gathers poorly for tiny K, while a masked reduction is a single
    fused VPU op."""
    K = params.shape[-1]
    onehot = (jax.lax.broadcasted_iota(jnp.int32, params.shape,
                                       params.ndim - 1)
              == idx[..., None])
    return jnp.sum(jnp.where(onehot, params, 0.0), axis=-1)


def rqs(inputs: jax.Array, unnorm_widths: jax.Array, unnorm_heights: jax.Array,
        unnorm_derivs: jax.Array, inverse: bool = False, left: float = 0.0,
        right: float = 1.0, bottom: float = 0.0, top: float = 1.0):
    """Core RQS transform on the interval; all elements assumed inside.

    ``unnorm_derivs`` already includes the two boundary knots (K+1 values).
    Returns ``(outputs, logabsdet)`` elementwise.
    """
    K = unnorm_widths.shape[-1]
    widths, cumw = _normalize_bins(unnorm_widths, K, left, right,
                                   MIN_BIN_WIDTH)
    heights, cumh = _normalize_bins(unnorm_heights, K, bottom, top,
                                    MIN_BIN_HEIGHT)
    derivs = MIN_DERIVATIVE + jax.nn.softplus(unnorm_derivs)

    idx = _search_bin(cumh if inverse else cumw, inputs, K)

    in_cumw = _gather(cumw[..., :-1], idx)
    in_w = _gather(widths, idx)
    in_cumh = _gather(cumh[..., :-1], idx)
    in_h = _gather(heights, idx)
    delta = in_h / in_w
    d0 = _gather(derivs[..., :-1], idx)
    d1 = _gather(derivs[..., 1:], idx)
    s = d0 + d1 - 2.0 * delta

    if inverse:
        y_rel = inputs - in_cumh
        a = in_h * (delta - d0) + y_rel * s
        b = in_h * d0 - y_rel * s
        c = -delta * y_rel
        disc = b * b - 4.0 * a * c
        disc = jnp.maximum(disc, 0.0)
        theta = (2.0 * c) / (-b - jnp.sqrt(disc))
        theta = jnp.clip(theta, 0.0, 1.0)
        outputs = theta * in_w + in_cumw
        t1mt = theta * (1.0 - theta)
        denom = delta + s * t1mt
        deriv_num = delta * delta * (d1 * theta * theta + 2.0 * delta * t1mt +
                                     d0 * (1.0 - theta) ** 2)
        logabsdet = -(jnp.log(deriv_num) - 2.0 * jnp.log(denom))
        return outputs, logabsdet

    theta = (inputs - in_cumw) / in_w
    theta = jnp.clip(theta, 0.0, 1.0)
    t1mt = theta * (1.0 - theta)
    denom = delta + s * t1mt
    numer = in_h * (delta * theta * theta + d0 * t1mt)
    outputs = in_cumh + numer / denom
    deriv_num = delta * delta * (d1 * theta * theta + 2.0 * delta * t1mt +
                                 d0 * (1.0 - theta) ** 2)
    logabsdet = jnp.log(deriv_num) - 2.0 * jnp.log(denom)
    return outputs, logabsdet


@partial(jax.jit, static_argnames=("inverse", "circular"))
def unconstrained_rqs(inputs: jax.Array, unnorm_widths: jax.Array,
                      unnorm_heights: jax.Array, unnorm_derivs: jax.Array,
                      inverse: bool = False, tail_bound: float = 5.0,
                      circular: bool = False):
    """RQS with linear tails outside [-B, B] (or periodic for circular dims).

    ``unnorm_derivs`` carries K-1 interior knots for the linear-tail case and
    K knots (the shared wrap-around derivative first) for the circular case —
    matching the reference's padding scheme (``flows/utils.py:37-44``).
    Elements outside the interval pass through identity with zero log-det.
    """
    B = tail_bound
    if circular:
        # periodic boundary: first == last derivative knot
        derivs = jnp.concatenate(
            [unnorm_derivs[..., -1:], unnorm_derivs], axis=-1)
        inputs = jnp.mod(inputs + B, 2.0 * B) - B
        inside = jnp.ones(inputs.shape, dtype=bool)
    else:
        pad = jnp.full_like(unnorm_derivs[..., :1], _BOUNDARY_RAW_DERIV)
        derivs = jnp.concatenate([pad, unnorm_derivs, pad], axis=-1)
        inside = (inputs >= -B) & (inputs <= B)

    safe_inputs = jnp.clip(inputs, -B, B)
    out_in, ld_in = rqs(safe_inputs, unnorm_widths, unnorm_heights, derivs,
                        inverse=inverse, left=-B, right=B, bottom=-B, top=B)
    outputs = jnp.where(inside, out_in, inputs)
    logabsdet = jnp.where(inside, ld_in, 0.0)
    return outputs, logabsdet
