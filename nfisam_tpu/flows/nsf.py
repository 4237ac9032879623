"""Autoregressive neural spline flow (NSF-AR), TPU-first.

Math parity with reference ``src/flows/flows.py`` (``NSF_AR:43``): dim ``i``'s
rational-quadratic spline parameters are produced by a 2-hidden-layer tanh
conditioner over dims ``< i`` (dim 0 gets free parameters).  Re-design:

* the reference evaluates ``d`` separate per-dim MLPs sequentially
  (``flows.py:77-83``); here all conditioners are fused into block-masked
  weight tensors evaluated with three einsums — one batched pass produces
  every dim's spline parameters, then a single vectorized RQS call
  transforms the whole ``(n, d)`` batch (MXU-friendly, no Python loop);
* the inverse is sequential in dimension by definition
  (``flows.py:95-137``); it is vectorized across samples and unrolled over
  the (small, static) dim axis so every step is a fused matmul + RQS
  inverse;
* the circular-spline variant ``NSF_AR_CS`` — referenced but **missing** in
  the reference (``NFiSAM.py:398``; SURVEY §7.4) — is implemented: circular
  dims use periodic splines on [-pi, pi] with a von Mises base.

Parameters are pytrees (dicts of arrays); configs are hashable statics so
jit caches per clique signature.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .rqs import unconstrained_rqs


@dataclass(frozen=True)
class NSFConfig:
    """Static flow configuration (hashable -> jit cache key)."""
    dim: int
    num_knots: int = 9            # K: number of spline bins
    tail_bound: float = 5.0       # B for Euclidean dims
    hidden_dim: int = 8
    num_flows: int = 1
    circular: Tuple[bool, ...] = ()   # per-dim flags; empty = all Euclidean

    @property
    def circular_mask(self) -> np.ndarray:
        if not self.circular:
            return np.zeros(self.dim, dtype=bool)
        return np.asarray(self.circular, dtype=bool)

    @property
    def params_per_dim(self) -> int:
        return 3 * self.num_knots   # W, H, D slots (D over-allocated by 1)


def _autoregressive_mask(d: int) -> np.ndarray:
    """mask[i, j] = 1 iff dim i may see input dim j (strictly lower)."""
    return (np.arange(d)[None, :] < np.arange(d)[:, None]).astype(np.float32)


def init_flow_params(key: jax.Array, cfg: NSFConfig) -> List[dict]:
    """Per-flow parameter pytrees for a stack of ``cfg.num_flows`` flows."""
    d, h, p = cfg.dim, cfg.hidden_dim, cfg.params_per_dim
    flows = []
    keys = jax.random.split(key, cfg.num_flows)
    fan_in1 = np.maximum(np.arange(d), 1).astype(np.float32)  # visible inputs
    for fk in keys:
        k1, k2, k3, k4 = jax.random.split(fk, 4)
        bound1 = (1.0 / np.sqrt(fan_in1))[:, None, None]
        params = {
            "W1": jax.random.uniform(k1, (d, h, d), minval=-1.0, maxval=1.0)
                  * bound1,
            "b1": jnp.zeros((d, h)),
            "W2": jax.random.uniform(k2, (d, h, h), minval=-1.0, maxval=1.0)
                  / np.sqrt(h),
            "b2": jnp.zeros((d, h)),
            "W3": jax.random.uniform(k3, (d, p, h), minval=-1.0, maxval=1.0)
                  / np.sqrt(h),
            # dim 0 has no inputs; its spline is driven purely by this bias,
            # mirroring the reference's free ``init_param`` (flows.py:57,63)
            "b3": jax.random.uniform(k4, (d, p), minval=-0.5, maxval=0.5),
        }
        flows.append(params)
    return flows


def conditioner_all_dims(params: dict, x: jax.Array, cfg: NSFConfig
                         ) -> jax.Array:
    """All dims' spline parameters in one batched pass: (n, d) -> (n, d, 3K)."""
    mask = jnp.asarray(_autoregressive_mask(cfg.dim))
    w1 = params["W1"] * mask[:, None, :]
    h1 = jnp.tanh(jnp.einsum("nj,ihj->nih", x, w1) + params["b1"])
    h2 = jnp.tanh(jnp.einsum("nih,igh->nig", h1, params["W2"]) + params["b2"])
    return jnp.einsum("nih,iph->nip", h2, params["W3"]) + params["b3"]


def _conditioner_one_dim(params: dict, x: jax.Array, i: int, cfg: NSFConfig
                         ) -> jax.Array:
    """Spline parameters for dim ``i`` only: (n, d) -> (n, 3K)."""
    mask = jnp.asarray(_autoregressive_mask(cfg.dim)[i])
    w1 = params["W1"][i] * mask[None, :]
    h1 = jnp.tanh(x @ w1.T + params["b1"][i])
    h2 = jnp.tanh(h1 @ params["W2"][i].T + params["b2"][i])
    return h2 @ params["W3"][i].T + params["b3"][i]


def _split_spline_params(P: jax.Array, cfg: NSFConfig):
    K = cfg.num_knots
    return P[..., :K], P[..., K:2 * K], P[..., 2 * K:]


def _apply_rqs_mixed(x: jax.Array, W, H, D, cfg: NSFConfig, inverse: bool):
    """Apply RQS per column, routing circular dims to periodic splines.

    The circular mask is static, so columns are partitioned at trace time
    into two fused vector calls.
    """
    circ = cfg.circular_mask
    if not circ.any():
        return unconstrained_rqs(x, W, H, D[..., :cfg.num_knots - 1],
                                 inverse=inverse, tail_bound=cfg.tail_bound)
    if circ.all():
        return unconstrained_rqs(x, W, H, D, inverse=inverse,
                                 tail_bound=float(np.pi), circular=True)
    e_idx = np.where(~circ)[0]
    c_idx = np.where(circ)[0]
    oe, lde = unconstrained_rqs(
        x[..., e_idx], W[..., e_idx, :], H[..., e_idx, :],
        D[..., e_idx, :cfg.num_knots - 1], inverse=inverse,
        tail_bound=cfg.tail_bound)
    oc, ldc = unconstrained_rqs(
        x[..., c_idx], W[..., c_idx, :], H[..., c_idx, :], D[..., c_idx, :],
        inverse=inverse, tail_bound=float(np.pi), circular=True)
    out = jnp.zeros_like(x).at[..., e_idx].set(oe).at[..., c_idx].set(oc)
    ld = jnp.zeros_like(x).at[..., e_idx].set(lde).at[..., c_idx].set(ldc)
    return out, ld


def _apply_rqs_one_dim(x_i: jax.Array, P_i: jax.Array, i: int,
                       cfg: NSFConfig, inverse: bool):
    W, H, D = _split_spline_params(P_i, cfg)
    if bool(cfg.circular_mask[i]):
        return unconstrained_rqs(x_i, W, H, D, inverse=inverse,
                                 tail_bound=float(np.pi), circular=True)
    return unconstrained_rqs(x_i, W, H, D[..., :cfg.num_knots - 1],
                             inverse=inverse, tail_bound=cfg.tail_bound)


# --------------------------------------------------------------------------
# Single-flow forward / inverse
# --------------------------------------------------------------------------
def flow_forward(params: dict, x: jax.Array, cfg: NSFConfig):
    """x -> (z, log_det) with log_det summed over dims; fully batched."""
    P = conditioner_all_dims(params, x, cfg)
    W, H, D = _split_spline_params(P, cfg)
    z, ld = _apply_rqs_mixed(x, W, H, D, cfg, inverse=False)
    return z, jnp.sum(ld, axis=-1)


def flow_inverse(params: dict, z: jax.Array, cfg: NSFConfig,
                 x_prefix: jax.Array | None = None, start_dim: int = 0):
    """Sequential-in-dim inverse, vectorized across samples.

    ``x_prefix`` (n, start_dim) supplies already-known (separator) columns;
    only dims >= start_dim are inverted, consuming z columns in order
    (reference ``inverse_given_separator`` flows.py:115-137).
    Returns the full (n, dim) array.
    """
    n = z.shape[0]
    cols = []
    if start_dim > 0:
        cols = [x_prefix[:, i] for i in range(start_dim)]
    for i in range(start_dim, cfg.dim):
        if cols:
            x_partial = jnp.stack(cols, axis=1)
            x_full = jnp.concatenate(
                [x_partial, jnp.zeros((n, cfg.dim - len(cols)))], axis=1)
        else:
            x_full = jnp.zeros((n, cfg.dim))
        P_i = _conditioner_one_dim(params, x_full, i, cfg)
        x_i, _ = _apply_rqs_one_dim(z[:, i - start_dim], P_i, i, cfg,
                                    inverse=True)
        cols.append(x_i)
    return jnp.stack(cols, axis=1)


def flow_inverse_masked(params: dict, z_full: jax.Array,
                        x_prefix_full: jax.Array, invert_mask: jax.Array,
                        cfg: NSFConfig) -> jax.Array:
    """Inverse where the separator/frontal split is *data*, not structure.

    ``z_full`` (n, dim) carries latent draws at the columns to invert;
    ``x_prefix_full`` (n, dim) carries known values at prefix columns;
    ``invert_mask`` (dim,) booleans select which. One compiled program
    serves every separator width of a flow config (the per-``sep_dim``
    unrolled-inverse variants were the dominant compile cost on large
    graphs). Prefix columns pay a discarded spline inversion — cheap
    relative to a recompile."""
    n = z_full.shape[0]
    cols = []
    for i in range(cfg.dim):
        if cols:
            x_partial = jnp.stack(cols, axis=1)
            x_full = jnp.concatenate(
                [x_partial, jnp.zeros((n, cfg.dim - len(cols)))], axis=1)
        else:
            x_full = jnp.zeros((n, cfg.dim))
        P_i = _conditioner_one_dim(params, x_full, i, cfg)
        x_inv, _ = _apply_rqs_one_dim(z_full[:, i], P_i, i, cfg,
                                      inverse=True)
        cols.append(jnp.where(invert_mask[i], x_inv,
                              x_prefix_full[:, i]))
    return jnp.stack(cols, axis=1)


# --------------------------------------------------------------------------
# Flow stacks
# --------------------------------------------------------------------------
def stack_forward(flow_params: List[dict], x: jax.Array, cfg: NSFConfig):
    """Compose flows; returns (z, total_log_det)."""
    total_ld = jnp.zeros(x.shape[0])
    for params in flow_params:
        x, ld = flow_forward(params, x, cfg)
        total_ld = total_ld + ld
    return x, total_ld


def stack_forward_perdim(flow_params: List[dict], x: jax.Array,
                         cfg: NSFConfig):
    """Compose flows keeping the per-dim log-det columns (n, dim) — used by
    the width-agnostic separator-marginal program."""
    total_ld = jnp.zeros_like(x)
    for params in flow_params:
        P = conditioner_all_dims(params, x, cfg)
        W, H, D = _split_spline_params(P, cfg)
        x, ld = _apply_rqs_mixed(x, W, H, D, cfg, inverse=False)
        total_ld = total_ld + ld
    return x, total_ld


def stack_inverse_masked(flow_params: List[dict], z_full: jax.Array,
                         x_prefix_full: jax.Array, invert_mask: jax.Array,
                         cfg: NSFConfig) -> jax.Array:
    """Invert the stack (last flow first) with a data-driven prefix mask;
    returns the full (n, dim) block."""
    for params in reversed(flow_params):
        x_full = flow_inverse_masked(params, z_full, x_prefix_full,
                                     invert_mask, cfg)
        # the next (earlier) flow inverts what this flow produced at the
        # inverted columns; prefix columns stay pinned
        z_full = x_full
    return x_full


def stack_inverse(flow_params: List[dict], z: jax.Array, cfg: NSFConfig,
                  x_prefix: jax.Array | None = None, start_dim: int = 0):
    """Invert the stack (last flow first). With a separator prefix, each
    flow's inverse clamps the known columns — matching the reference's
    conditional sampling semantics (``NFiSAM.py:140-155``)."""
    for params in reversed(flow_params):
        x_full = flow_inverse(params, z, cfg, x_prefix, start_dim)
        z = x_full[:, start_dim:]
    return x_full
