"""Pallas TPU kernel for the rational-quadratic spline transform.

Fuses the whole RQS pipeline — bin normalization (softmax + min-size
floor), cumulative knots, bin search, the rational-quadratic transform (or
its inverse quadratic solve), and log|det J| — into ONE kernel, so the
sampling-path inverse costs a single VMEM-resident pass instead of ~20
XLA ops with HBM round trips.

Layout: the ``(n, d)`` element grid is flattened to ``M = n*d`` lanes and
the K spline-parameter axis is placed on sublanes — ``params (K, M)``,
inputs ``(1, M)`` — so every op is a full-width VPU vector op and the
K-wise reductions (softmax, cumsum, bin select) are short unrolled
sublane loops (K is static and small).

Status: validated bit-for-bit against the XLA path (golden tests in
``tests/test_rqs_pallas.py``) and measured at parity with XLA's own fusion
on TPU v5e at clique-scale shapes — the standalone spline is memory-bound
either way, and the host-side ``(M, K) -> (K, M)`` transpose eats the
kernel's fusion win.  The XLA implementation in ``rqs.py`` therefore stays
the default for this op (and the autodiff path).  The follow-up identified
here — fusing the AR conditioner and the spline inverse of ALL dim-steps
into one kernel — is built and adopted on the sampling hot path: see
``ar_inverse_pallas.py`` (measured ~23x per inverse at clique-scale
n=1000, 1.2-1.7x at n>=32k; BENCHMARKS.md).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .rqs import (MIN_BIN_HEIGHT, MIN_BIN_WIDTH, MIN_DERIVATIVE,
                  _BOUNDARY_RAW_DERIV)

_LANE = 128


def _rqs_kernel(x_ref, w_ref, h_ref, d_ref, out_ref, ld_ref, *, K: int,
                inverse: bool, bound: float, circular: bool):
    import jax.nn as jnn

    # all values kept 2D (rows of shape (1, BLK)) — Mosaic lowers mixed
    # 1D/2D elementwise chains incorrectly on some shapes
    x = x_ref[...]                                # (1, BLK)
    W = w_ref[...]                                # (K, BLK)
    H = h_ref[...]
    Draw = d_ref[...]                             # (K+1, BLK) padded derivs

    # --- bin sizes: softmax over the K sublane rows + min-size floor ------
    def norm_bins(P, min_size):
        m = P[0:1, :]
        for k in range(1, K):
            m = jnp.maximum(m, P[k:k + 1, :])
        e = jnp.exp(P - m)
        s = e[0:1, :]
        for k in range(1, K):
            s = s + e[k:k + 1, :]
        probs = e / s
        return min_size + (1.0 - min_size * K) * probs

    widths = norm_bins(W, MIN_BIN_WIDTH) * (2.0 * bound)
    heights = norm_bins(H, MIN_BIN_HEIGHT) * (2.0 * bound)
    derivs = MIN_DERIVATIVE + jnn.softplus(Draw)   # (K+1, BLK)

    # --- cumulative knots (unrolled prefix sums), pinned at +/- bound -----
    cumw_rows = [jnp.full_like(x, -bound)]
    cumh_rows = [jnp.full_like(x, -bound)]
    for k in range(K):
        cumw_rows.append(cumw_rows[-1] + widths[k:k + 1, :])
        cumh_rows.append(cumh_rows[-1] + heights[k:k + 1, :])
    cumw_rows[-1] = jnp.full_like(x, bound)
    cumh_rows[-1] = jnp.full_like(x, bound)

    if circular:
        x_in = jnp.mod(x + bound, 2.0 * bound) - bound
        inside = jnp.ones_like(x, dtype=jnp.bool_)
    else:
        inside = (x >= -bound) & (x <= bound)
        x_in = jnp.clip(x, -bound, bound)

    # --- bin index + per-element parameter select (unrolled over K) -------
    search = cumh_rows if inverse else cumw_rows
    idx = jnp.zeros_like(x, dtype=jnp.int32)
    for k in range(1, K):
        idx = idx + (x_in >= search[k]).astype(jnp.int32)

    def select(rows_or_mat, off=0):
        if isinstance(rows_or_mat, list):
            get = lambda k: rows_or_mat[k + off]
        else:
            get = lambda k: rows_or_mat[k + off:k + off + 1, :]
        acc = jnp.where(idx == 0, get(0), 0.0)
        for k in range(1, K):
            acc = acc + jnp.where(idx == k, get(k), 0.0)
        return acc

    in_cumw = select(cumw_rows)
    in_w = select(widths)
    in_cumh = select(cumh_rows)
    in_h = select(heights)
    d0 = select(derivs)
    d1 = select(derivs, off=1)
    delta = in_h / in_w
    s = d0 + d1 - 2.0 * delta

    if inverse:
        y_rel = x_in - in_cumh
        a = in_h * (delta - d0) + y_rel * s
        b = in_h * d0 - y_rel * s
        c = -delta * y_rel
        disc = jnp.maximum(b * b - 4.0 * a * c, 0.0)
        theta = (2.0 * c) / (-b - jnp.sqrt(disc))
        theta = jnp.clip(theta, 0.0, 1.0)
        out = theta * in_w + in_cumw
        t1mt = theta * (1.0 - theta)
        denom = delta + s * t1mt
        dnum = delta * delta * (d1 * theta * theta + 2.0 * delta * t1mt +
                                d0 * (1.0 - theta) ** 2)
        ld = -(jnp.log(dnum) - 2.0 * jnp.log(denom))
    else:
        theta = jnp.clip((x_in - in_cumw) / in_w, 0.0, 1.0)
        t1mt = theta * (1.0 - theta)
        denom = delta + s * t1mt
        numer = in_h * (delta * theta * theta + d0 * t1mt)
        out = in_cumh + numer / denom
        dnum = delta * delta * (d1 * theta * theta + 2.0 * delta * t1mt +
                                d0 * (1.0 - theta) ** 2)
        ld = jnp.log(dnum) - 2.0 * jnp.log(denom)

    out_ref[...] = jnp.where(inside, out, x)
    ld_ref[...] = jnp.where(inside, ld, 0.0)


@functools.partial(jax.jit,
                   static_argnames=("inverse", "tail_bound", "circular",
                                    "interpret"))
def unconstrained_rqs_pallas(inputs: jax.Array, unnorm_widths: jax.Array,
                             unnorm_heights: jax.Array,
                             unnorm_derivs: jax.Array,
                             inverse: bool = False, tail_bound: float = 5.0,
                             circular: bool = False,
                             interpret: bool = False):
    """Drop-in replacement for ``rqs.unconstrained_rqs`` (same shapes and
    padding conventions) backed by the fused Pallas kernel."""
    from jax.experimental import pallas as pl

    shape = inputs.shape
    K = unnorm_widths.shape[-1]
    M = int(np.prod(shape)) if shape else 1

    x = inputs.reshape(1, M)
    W = unnorm_widths.reshape(M, K).T
    H = unnorm_heights.reshape(M, K).T
    if circular:
        Draw = jnp.concatenate(
            [unnorm_derivs[..., -1:], unnorm_derivs], axis=-1)
    else:
        pad = jnp.full(unnorm_derivs.shape[:-1] + (1,),
                       _BOUNDARY_RAW_DERIV, dtype=unnorm_derivs.dtype)
        Draw = jnp.concatenate([pad, unnorm_derivs, pad], axis=-1)
    Draw = Draw.reshape(M, K + 1).T

    # pad lanes to the VPU width and to a whole number of grid blocks
    M_pad = -(-M // _LANE) * _LANE
    blk = min(M_pad, 4096)
    M_pad = -(-M_pad // blk) * blk
    if M_pad != M:
        x = jnp.pad(x, ((0, 0), (0, M_pad - M)))
        W = jnp.pad(W, ((0, 0), (0, M_pad - M)))
        H = jnp.pad(H, ((0, 0), (0, M_pad - M)))
        Draw = jnp.pad(Draw, ((0, 0), (0, M_pad - M)))

    kernel = functools.partial(_rqs_kernel, K=K, inverse=inverse,
                               bound=float(tail_bound), circular=circular)
    from jax.experimental.pallas import tpu as pltpu
    grid = (M_pad // blk,)
    out, ld = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk), lambda i: (0, i),
                         memory_space=pl.ANY if interpret else
                         pltpu.VMEM),
            pl.BlockSpec((K, blk), lambda i: (0, i),
                         memory_space=pl.ANY if interpret else
                         pltpu.VMEM),
            pl.BlockSpec((K, blk), lambda i: (0, i),
                         memory_space=pl.ANY if interpret else
                         pltpu.VMEM),
            pl.BlockSpec((K + 1, blk), lambda i: (0, i),
                         memory_space=pl.ANY if interpret else
                         pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, blk), lambda i: (0, i),
                         memory_space=pl.ANY if interpret else
                         pltpu.VMEM),
            pl.BlockSpec((1, blk), lambda i: (0, i),
                         memory_space=pl.ANY if interpret else
                         pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, M_pad), inputs.dtype),
            jax.ShapeDtypeStruct((1, M_pad), inputs.dtype),
        ],
        interpret=interpret,
    )(x, W, H, Draw)
    return out[0, :M].reshape(shape), ld[0, :M].reshape(shape)
