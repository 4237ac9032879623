"""Fused Pallas TPU kernel for the autoregressive flow inverse.

The sampling hot path (reference ``flows.py:95-137``; ours
``nsf.flow_inverse_masked``) is sequential in dimension: every dim-step
runs a 3-layer conditioner and an RQS inverse, so the XLA path costs
``d * num_flows`` rounds of (3 small dots + ~40 elementwise ops), each a
separate kernel launch with HBM round trips for the intermediates.  This
kernel fuses the ENTIRE inverse of one flow — all ``d`` conditioner
evaluations and spline inversions — into one launch that keeps the state
matrix, spline parameters, and activations VMEM-resident.

Layout: dims on sublanes, samples on lanes — ``X (d_pad, n_blk)``.  Each
dim-step is then

* ``h1 = tanh(W1m[i] @ X + b1[i])`` — one MXU dot over the (masked)
  sublane axis; the autoregressive mask is baked into ``W1m`` on the host
  so rows ``>= i`` (zeros or pinned prefix values) never leak in;
* two more tiny dots for ``h2`` and the spline parameters ``P (3K, blk)``;
* the RQS inverse on row ``i`` as full-lane-width VPU ops (softmax /
  prefix-sum / bin-select unrolled over the static K);
* a masked write: inverted value where ``invert_mask[i]``, pinned prefix
  value otherwise (the separator/frontal split stays *data*, so one
  compiled program serves every separator width — same contract as
  ``nsf.flow_inverse_masked``).

Log-dets are not computed: conditional sampling discards them.
Numerical spec is identical to ``rqs.unconstrained_rqs`` (bin floors,
pinned endpoint knots with sizes recomputed from the pinned knots,
boundary-derivative padding, circular wrap).  Golden-tested against the
XLA path in ``tests/test_ar_inverse_pallas.py``.
"""
from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from .nsf import NSFConfig, _autoregressive_mask
from .rqs import (MIN_BIN_HEIGHT, MIN_BIN_WIDTH, MIN_DERIVATIVE,
                  _BOUNDARY_RAW_DERIV)

_LANE = 128
_SUBLANE = 8


def _rqs_inverse_row(z, P, K: int, bound: float, circular: bool):
    """Invert the spline for one dim: ``z (1, blk)``, ``P (3K, blk)``.

    Pure function of VMEM-resident rows; all K-wise steps unrolled
    (K is static and small). Mirrors ``rqs.unconstrained_rqs`` with
    ``inverse=True`` minus the log-det.
    """
    import jax.nn as jnn

    W = P[0:K, :]
    H = P[K:2 * K, :]

    def knots(raw, min_size):
        # softmax over the K sublane rows
        m = raw[0:1, :]
        for k in range(1, K):
            m = jnp.maximum(m, raw[k:k + 1, :])
        e = jnp.exp(raw - m)
        s = e[0:1, :]
        for k in range(1, K):
            s = s + e[k:k + 1, :]
        probs = e / s
        sizes = min_size + (1.0 - min_size * K) * probs
        # cumulative knots in [-bound, bound], endpoints pinned exactly;
        # bin sizes are recomputed from the pinned knots (matches
        # rqs._normalize_bins)
        rows = [jnp.full_like(z, -bound)]
        for k in range(K - 1):
            rows.append(rows[-1] + sizes[k:k + 1, :] * (2.0 * bound))
        rows.append(jnp.full_like(z, bound))
        return rows

    cumw = knots(W, MIN_BIN_WIDTH)
    cumh = knots(H, MIN_BIN_HEIGHT)

    # derivatives at the K+1 knots, padding per rqs.unconstrained_rqs
    if circular:
        draw = [P[3 * K - 1:3 * K, :]] + \
            [P[2 * K + k:2 * K + k + 1, :] for k in range(K)]
    else:
        b = jnp.full_like(z, _BOUNDARY_RAW_DERIV)
        draw = [b] + [P[2 * K + k:2 * K + k + 1, :] for k in range(K - 1)] \
            + [b]
    derivs = [MIN_DERIVATIVE + jnn.softplus(r) for r in draw]

    if circular:
        z_in = jnp.mod(z + bound, 2.0 * bound) - bound
        inside = jnp.ones_like(z, dtype=jnp.bool_)
    else:
        inside = (z >= -bound) & (z <= bound)
        z_in = jnp.clip(z, -bound, bound)

    # bin index on the HEIGHT knots (inverse direction)
    idx = jnp.zeros_like(z, dtype=jnp.int32)
    for k in range(1, K):
        idx = idx + (z_in >= cumh[k]).astype(jnp.int32)

    def select(rows, off=0):
        acc = jnp.where(idx == 0, rows[off], 0.0)
        for k in range(1, K):
            acc = acc + jnp.where(idx == k, rows[k + off], 0.0)
        return acc

    in_cumw = select(cumw)
    in_w = select([cumw[k + 1] - cumw[k] for k in range(K)])
    in_cumh = select(cumh)
    in_h = select([cumh[k + 1] - cumh[k] for k in range(K)])
    d0 = select(derivs)
    d1 = select(derivs, off=1)
    delta = in_h / in_w
    s = d0 + d1 - 2.0 * delta

    y_rel = z_in - in_cumh
    a = in_h * (delta - d0) + y_rel * s
    b2 = in_h * d0 - y_rel * s
    c = -delta * y_rel
    disc = jnp.maximum(b2 * b2 - 4.0 * a * c, 0.0)
    theta = jnp.clip((2.0 * c) / (-b2 - jnp.sqrt(disc)), 0.0, 1.0)
    out = theta * in_w + in_cumw
    return jnp.where(inside, out, z)


def _ar_inverse_kernel(z_ref, xp_ref, mask_ref, w1_ref, b1_ref, w2_ref,
                       b2_ref, w3_ref, b3_ref, out_ref, *, d: int, K: int,
                       hidden: int, tail_bound: float,
                       circular: tuple):
    """One flow's full masked AR inverse for a block of samples."""
    mask_col = mask_ref[...]                      # (d_pad, 1) f32 0/1
    # pinned prefix values at non-inverted rows; zeros at rows to invert
    out_ref[...] = (1.0 - mask_col) * xp_ref[...]

    for i in range(d):
        x = out_ref[...]                          # (d_pad, blk)
        h1 = jnp.tanh(
            jax.lax.dot_general(
                w1_ref[i], x, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + b1_ref[i])
        h2 = jnp.tanh(
            jax.lax.dot_general(
                w2_ref[i], h1, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + b2_ref[i])
        P = jax.lax.dot_general(
            w3_ref[i], h2, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b3_ref[i]

        bound = float(np.pi) if circular[i] else tail_bound
        x_inv = _rqs_inverse_row(z_ref[i:i + 1, :], P, K, bound,
                                 circular[i])
        m = mask_ref[i:i + 1, 0:1]                # (1, 1) broadcast
        out_ref[i:i + 1, :] = m * x_inv + (1.0 - m) * xp_ref[i:i + 1, :]


def _pad_rows(a: jax.Array, rows: int) -> jax.Array:
    if a.shape[0] == rows:
        return a
    return jnp.pad(a, ((0, rows - a.shape[0]),) + ((0, 0),) * (a.ndim - 1))


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def flow_inverse_masked_pallas(params: dict, z_full: jax.Array,
                               x_prefix_full: jax.Array,
                               invert_mask: jax.Array, cfg: NSFConfig,
                               interpret: bool = False) -> jax.Array:
    """Fused-kernel equivalent of ``nsf.flow_inverse_masked``."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = z_full.shape
    h, p, K = cfg.hidden_dim, cfg.params_per_dim, cfg.num_knots
    d_pad = -(-d // _SUBLANE) * _SUBLANE
    n_pad = -(-n // _LANE) * _LANE
    blk = min(n_pad, 4096)
    n_pad = -(-n_pad // blk) * blk

    f32 = jnp.float32
    zT = _pad_rows(z_full.astype(f32).T, d_pad)
    xpT = _pad_rows(x_prefix_full.astype(f32).T, d_pad)
    if n_pad != n:
        zT = jnp.pad(zT, ((0, 0), (0, n_pad - n)))
        xpT = jnp.pad(xpT, ((0, 0), (0, n_pad - n)))
    mask_col = _pad_rows(invert_mask.astype(f32)[:, None], d_pad)

    # AR mask baked into W1 so pinned-prefix rows >= i never leak into
    # dim i's conditioner; zero-pad the contraction axis to d_pad
    armask = jnp.asarray(_autoregressive_mask(d))
    w1m = params["W1"].astype(f32) * armask[:, None, :]
    w1m = jnp.pad(w1m, ((0, 0), (0, 0), (0, d_pad - d)))
    b1c = params["b1"].astype(f32)[:, :, None]            # (d, h, 1)
    w2 = params["W2"].astype(f32)
    b2c = params["b2"].astype(f32)[:, :, None]
    w3 = params["W3"].astype(f32)
    b3c = params["b3"].astype(f32)[:, :, None]            # (d, p, 1)

    circ = tuple(bool(c) for c in cfg.circular_mask[:d])
    kernel = functools.partial(_ar_inverse_kernel, d=d, K=K, hidden=h,
                               tail_bound=float(cfg.tail_bound),
                               circular=circ)

    def rep(shape):
        # whole parameter array in VMEM, same block for every program
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pl.ANY if interpret else
                            pltpu.VMEM)

    def col(rows):
        return pl.BlockSpec((rows, blk), lambda i: (0, i),
                            memory_space=pl.ANY if interpret else
                            pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=(n_pad // blk,),
        in_specs=[
            col(d_pad),                       # z
            col(d_pad),                       # x_prefix
            rep((d_pad, 1)),                  # invert mask column
            rep((d, h, d_pad)),               # W1 (AR-masked)
            rep((d, h, 1)),                   # b1
            rep((d, h, h)),                   # W2
            rep((d, h, 1)),                   # b2
            rep((d, p, h)),                   # W3
            rep((d, p, 1)),                   # b3
        ],
        out_specs=col(d_pad),
        out_shape=jax.ShapeDtypeStruct((d_pad, n_pad), f32),
        interpret=interpret,
    )(zT, xpT, mask_col, w1m, b1c, w2, b2c, w3, b3c)
    return out[:d, :n].T


def stack_inverse_masked_pallas(flow_params: List[dict], z_full: jax.Array,
                                x_prefix_full: jax.Array,
                                invert_mask: jax.Array, cfg: NSFConfig,
                                interpret: bool = False) -> jax.Array:
    """Fused-kernel equivalent of ``nsf.stack_inverse_masked``: invert the
    stack last-flow-first, one kernel launch per flow."""
    x_full = z_full
    for params in reversed(flow_params):
        x_full = flow_inverse_masked_pallas(params, z_full, x_prefix_full,
                                            invert_mask, cfg,
                                            interpret=interpret)
        z_full = x_full
    return x_full
