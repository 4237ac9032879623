"""Per-clique flow training as one compiled device program.

Parity with reference ``src/slam/NFiSAM.py:451-491`` (the Adam hot loop with
two early-stopping modes) — re-designed TPU-first:

* the whole training loop is a single ``lax.while_loop`` inside one jit:
  no per-iteration Python dispatch, no host sync until the loop exits
  (the reference pays a Python/torch round trip per iteration);
* early stopping is carried in the loop state: validation-based
  "slower stop" (val loss up => stop at ``slower_stop_rate * iter``) and
  loss-plateau stopping (relative change of windowed average below tol),
  matching the reference's semantics;
* data-parallel scaling: pass a ``jax.sharding.Mesh`` and the batch is
  sharded over the ``data`` axis; with replicated params XLA inserts the
  gradient ``psum`` over ICI automatically — the analog of the reference's
  missing DP backend (SURVEY §2.3);
* compiled programs are cached per ``(NSFConfig, TrainConfig, data shape)``
  signature, so incremental steps re-hitting a clique signature skip
  compilation entirely.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..flows.base_dist import BaseDistribution
from ..flows.model import negative_log_likelihood
from ..flows.nsf import NSFConfig, init_flow_params


@dataclass(frozen=True)
class TrainConfig:
    """Static training hyperparameters (reference ``NFiSAMArgs`` NFiSAM.py:18)."""
    max_iters: int = 2000
    learning_rate: float = 0.015
    average_window: int = 50
    loss_delta_tol: float = 1e-2
    validation_interval: int = 10
    slower_stop_rate: float = 2.0
    training_set_frac: float = 1.0


def _build_train_program(cfg: NSFConfig, tc: TrainConfig,
                         has_validation: bool):
    """Compile-once training program for one clique signature."""
    base = BaseDistribution(cfg.circular_mask)
    opt = optax.adam(tc.learning_rate)

    # The optimizer state lives on ONE flat vector: a 12-leaf pytree would
    # cost ~100 small VPU ops per Adam step; flattened it is ~6 fused ops.
    from jax.flatten_util import ravel_pytree

    def loss_fn(params, data):
        return negative_log_likelihood(params, data, cfg, base)

    def train(params_tree, train_data, test_data):
        flat0, unravel = ravel_pytree(params_tree)

        def flat_loss(flat, data):
            return loss_fn(unravel(flat), data)

        grad_fn = jax.value_and_grad(flat_loss)
        loss_fn_flat = flat_loss

        def body(carry):
            (t, params, opt_state, iter_loss, last_val, slow_iter,
             stop) = carry

            # --- validation-driven "slower stop" scheduling ---------------
            if has_validation:
                def run_val(args):
                    last_val, slow_iter = args
                    val_loss = loss_fn_flat(params, test_data)
                    worse = val_loss > last_val
                    new_slow = jnp.where(
                        worse & (slow_iter < 0),
                        jnp.int32(tc.slower_stop_rate * (t + 1)), slow_iter)
                    new_last = jnp.where(worse, last_val, val_loss)
                    return new_last, new_slow

                due = ((t + 1) % tc.validation_interval == 0) & \
                      (slow_iter < 0)
                last_val, slow_iter = jax.lax.cond(
                    due, run_val, lambda a: a, (last_val, slow_iter))
                stop_now = (slow_iter >= 0) & ((t + 1) >= slow_iter)
            else:
                # --- loss-plateau stopping on the training curve ----------
                # clamp the window so tiny max_iters (tests, dryruns) never
                # slice past the loss buffer
                w = min(tc.average_window, max(tc.max_iters // 2, 1))
                due = ((t % w) == 0) & (t >= 2 * w)
                t_safe = jnp.maximum(t, 2 * w)
                cur = jax.lax.dynamic_slice(iter_loss, (t_safe - w,),
                                            (w,)).mean()
                prev = jax.lax.dynamic_slice(iter_loss, (t_safe - 2 * w,),
                                             (w,)).mean()
                delta = jnp.abs(1.0 - cur / jnp.where(prev == 0.0, 1.0,
                                                      prev))
                stop_now = due & (delta < tc.loss_delta_tol)

            # --- Adam update (skipped on the stopping iteration) ----------
            def do_update(args):
                params, opt_state, iter_loss = args
                loss, grads = grad_fn(params, train_data)
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                iter_loss = iter_loss.at[t].set(loss)
                return params, opt_state, iter_loss

            def no_update(args):
                params, opt_state, iter_loss = args
                # keep the loss curve continuous on the stopping iteration
                prev = iter_loss[jnp.maximum(t - 1, 0)]
                return params, opt_state, iter_loss.at[t].set(prev)

            params, opt_state, iter_loss = jax.lax.cond(
                stop_now, no_update, do_update,
                (params, opt_state, iter_loss))

            return (t + 1, params, opt_state, iter_loss, last_val,
                    slow_iter, stop | stop_now)

        def cond(carry):
            t, *_, stop = carry
            return (~stop) & (t < tc.max_iters)

        opt_state = opt.init(flat0)
        init = (jnp.int32(0), flat0, opt_state,
                jnp.zeros(tc.max_iters), jnp.asarray(jnp.inf),
                jnp.int32(-1), jnp.asarray(False))
        t, flat, _, iter_loss, *_ = jax.lax.while_loop(cond, body, init)
        return unravel(flat), iter_loss, t

    return train


@lru_cache(maxsize=512)
def _cached_program(cfg: NSFConfig, tc: TrainConfig, has_validation: bool):
    return jax.jit(_build_train_program(cfg, tc, has_validation))


def _full_fit_core(cfg: NSFConfig, tc: TrainConfig,
                   scale_circular: bool, n: int):
    """Pure fit function: param init + shuffle + normalization +
    train/validation split + the whole Adam loop, as one traceable call.
    (key, samples_raw, circ_mask) -> (params, iter_loss, n_iters, mean,
    std).  The circular mask is a *traced input* so circular-pattern
    diversity across cliques never forces a recompile — together with
    dim-bucket padding this is what keeps the compiled-program count tiny
    on large graphs (SURVEY §7.3 item 3)."""
    from ..flows.model import compute_normalizer, normalize

    n_train = min(int(n * tc.training_set_frac), n)
    has_validation = n_train < n
    train = _build_train_program(cfg, tc, has_validation)

    def run(key, samples_raw, circ_mask):
        k_init, k_shuffle = jax.random.split(jnp.asarray(key))
        params = init_flow_params(k_init, cfg)
        if has_validation:
            # the shuffle only matters for the train/validation split; the
            # full-batch loss is permutation-invariant, and skipping the
            # gather keeps the sample axis shardable with no collective
            perm = jax.random.permutation(k_shuffle, samples_raw.shape[0])
            samples_raw = samples_raw[perm]
        mean, std = compute_normalizer(samples_raw, circ_mask,
                                       scale_circular=scale_circular)
        xn = normalize(samples_raw, mean, std, circ_mask)
        train_data = xn[:n_train]
        test_data = xn[n_train:] if has_validation else \
            jnp.zeros((1, cfg.dim))
        params, iter_loss, t = train(params, train_data, test_data)
        return params, iter_loss, t, mean, std

    return run


@lru_cache(maxsize=512)
def _cached_full_program(cfg: NSFConfig, tc: TrainConfig,
                         scale_circular: bool, n: int):
    """One device dispatch per clique fit — tunnel-latency critical."""
    return jax.jit(_full_fit_core(cfg, tc, scale_circular, n))


@lru_cache(maxsize=512)
def _cached_batched_program(cfg: NSFConfig, tc: TrainConfig,
                            scale_circular: bool, n: int, batch: int):
    """vmap of the full fit over a stack of same-signature cliques: one
    while_loop trains all of them, wall time = the slowest member — the
    tree-level parallelism the reference leaves unexploited
    (``FactorGraphSolver.py:423-477``; SURVEY §2.3)."""
    core = _full_fit_core(cfg, tc, scale_circular, n)
    return jax.jit(jax.vmap(core))


def fit_flows_batched(keys, samples_stack, cfg: NSFConfig, tc: TrainConfig,
                      circ_masks, scale_circular: bool = True,
                      mesh: Optional[jax.sharding.Mesh] = None):
    """Train ``B`` same-dim clique flows concurrently.

    ``keys`` (B, 2) raw key data; ``samples_stack`` (B, n, dim);
    ``circ_masks`` (B, dim) booleans.
    Returns stacked (params, iter_loss, n_iters, mean, std).

    With ``mesh`` (axes ``("clique", "data")``, see ``parallel.mesh``), the
    clique axis is sharded over ``clique`` and the sample axis over
    ``data`` — independent cliques land on different chips, and each
    clique's full-batch gradient is psum-reduced over its data shards
    (the clique- and data-parallelism of SURVEY §2.3, wired through the
    product path).  ``B`` is padded up to a multiple of the clique-axis
    size by repeating the last clique; padded results are discarded.
    """
    samples_stack = jnp.asarray(samples_stack, dtype=jnp.float32)
    keys = jnp.asarray(keys)
    masks = jnp.asarray(np.asarray(circ_masks, dtype=bool))
    B, n = samples_stack.shape[0], samples_stack.shape[1]
    # pad the clique axis to a power of two so wave widths (which vary
    # freely across incremental steps) hit a log-bounded set of compiled
    # programs; padded rows repeat the last clique and are discarded
    B_pad = 1
    while B_pad < B:
        B_pad *= 2
    n_clique = 1
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        n_clique = mesh.shape.get("clique", 1)
        # drop-remainder on the sample axis (mirrors fit_flow_raw); if the
        # batch is smaller than the data axis, replicate instead of shard
        n_data = mesh.shape.get("data", 1)
        keep_n = (n // n_data) * n_data
        if keep_n == 0:
            n_data = 1
        elif keep_n != n:
            samples_stack = samples_stack[:, :keep_n]
            n = keep_n
        B_pad += (-B_pad) % n_clique
    pad_b = B_pad - B
    if pad_b:
        rep = (pad_b,) + (1,) * (samples_stack.ndim - 1)
        samples_stack = jnp.concatenate(
            [samples_stack, jnp.tile(samples_stack[-1:], rep)], axis=0)
        keys = jnp.concatenate([keys, jnp.tile(keys[-1:], (pad_b, 1))],
                               axis=0)
        masks = jnp.concatenate(
            [masks, jnp.tile(masks[-1:], (pad_b, 1))], axis=0)
    if mesh is not None:
        samples_stack = jax.device_put(
            samples_stack,
            NamedSharding(mesh, P("clique",
                                  "data" if n_data > 1 else None, None)))
        keys = jax.device_put(keys, NamedSharding(mesh, P("clique", None)))
        masks = jax.device_put(masks, NamedSharding(mesh, P("clique", None)))
    program = _cached_batched_program(cfg, tc, scale_circular,
                                      int(n), int(B_pad))
    out = program(keys, samples_stack, masks)
    if pad_b:
        out = jax.tree_util.tree_map(lambda x: x[:B], out)
    return out


def fit_flow_raw(key, samples_raw, cfg: NSFConfig, tc: TrainConfig,
                 circular_dim_list, scale_circular: bool = True,
                 mesh: Optional[jax.sharding.Mesh] = None):
    """Fit a clique flow from raw (unnormalized) samples in ONE compiled
    call.  Returns (params, iter_loss, n_iters, mean, std)."""
    samples_raw = jnp.asarray(samples_raw, dtype=jnp.float32)
    circ_mask = np.asarray([bool(c) for c in circular_dim_list], dtype=bool)
    if mesh is not None:
        # shard the sample axis over ALL mesh axes (a lone clique fit wants
        # every chip); params stay replicated so XLA reduces the full-batch
        # gradient with one all-reduce over ICI
        from jax.sharding import NamedSharding, PartitionSpec as P
        n_dev = mesh.devices.size
        keep = (samples_raw.shape[0] // n_dev) * n_dev
        if keep == 0:
            # fewer samples than devices: replicate rather than truncate
            # to an empty batch (which would train an all-NaN flow)
            samples_raw = jax.device_put(
                samples_raw, NamedSharding(mesh, P(None, None)))
        else:
            if keep != samples_raw.shape[0]:
                samples_raw = samples_raw[:keep]
            samples_raw = jax.device_put(
                samples_raw, NamedSharding(mesh, P(tuple(mesh.axis_names),
                                                   None)))
    program = _cached_full_program(cfg, tc, scale_circular,
                                   int(samples_raw.shape[0]))
    return program(key, samples_raw, jnp.asarray(circ_mask))


def fit_flow(key: jax.Array, samples_norm: jax.Array, cfg: NSFConfig,
             tc: TrainConfig, mesh: Optional[jax.sharding.Mesh] = None,
             init_params: Optional[List[dict]] = None):
    """Train a flow stack on pre-normalized samples.

    Returns ``(flow_params, iter_loss, num_iters)``. With ``mesh`` given, the
    sample axis is sharded over the mesh's ``data`` axis (drop-remainder to
    keep shapes divisible) and gradients are psum-reduced by XLA.
    """
    k_init, k_shuffle = jax.random.split(key)
    if init_params is None:
        init_params = init_flow_params(k_init, cfg)

    n = samples_norm.shape[0]
    perm = jax.random.permutation(k_shuffle, n)
    samples_norm = jnp.asarray(samples_norm)[perm]
    n_train = min(int(n * tc.training_set_frac), n)
    has_validation = n_train < n
    train_data = samples_norm[:n_train]
    test_data = samples_norm[n_train:] if has_validation else \
        jnp.zeros((1, cfg.dim))

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        n_dev = mesh.devices.size
        keep = (train_data.shape[0] // n_dev) * n_dev
        train_data = jax.device_put(
            train_data[:keep], NamedSharding(mesh, P("data", None)))
        init_params = jax.device_put(
            init_params, NamedSharding(mesh, P()))

    program = _cached_program(cfg, tc, has_validation)
    params, iter_loss, t = program(init_params, train_data, test_data)
    return params, iter_loss, t
