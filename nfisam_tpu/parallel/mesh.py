"""Device-mesh utilities and sharded training/sampling programs.

The reference has no distributed runtime at all (SURVEY §2.3); these are the
TPU-native equivalents designed from scratch:

* ``data`` axis: flow-training minibatches and posterior sample draws are
  sharded across chips; with replicated flow params XLA inserts the
  gradient ``psum`` over ICI automatically;
* ``clique`` axis: independent Bayes-tree cliques of the same signature are
  stacked (vmap) and sharded across chips — the tree-level parallelism the
  reference leaves unexploited (its clique loop is sequential,
  ``FactorGraphSolver.py:423-477``).
"""
from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..flows.base_dist import BaseDistribution
from ..flows.model import negative_log_likelihood
from ..flows.nsf import NSFConfig, init_flow_params


def make_mesh(n_data: Optional[int] = None, n_clique: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (clique, data) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_clique
    assert n_clique * n_data == len(devices), \
        f"{n_clique} x {n_data} != {len(devices)} devices"
    arr = np.asarray(devices).reshape(n_clique, n_data)
    return Mesh(arr, axis_names=("clique", "data"))


def data_parallel_mesh(devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices).reshape(1, len(devices)),
                axis_names=("clique", "data"))


# --------------------------------------------------------------------------
# Sharded batched-clique training step
# --------------------------------------------------------------------------
def build_sharded_train_step(cfg: NSFConfig, mesh: Mesh,
                             learning_rate: float = 0.015):
    """One Adam step over a stack of same-signature cliques.

    params: pytree with leading clique axis, sharded over ``clique``;
    data:   (n_cliques, n_samples, dim), sharded over (clique, data).
    Returns a jitted step function; XLA lowers the gradient reduction to a
    psum over the ``data`` axis and keeps clique slices independent.
    """
    import optax
    base = BaseDistribution(cfg.circular_mask)
    opt = optax.adam(learning_rate)

    def one_clique_loss(params, data):
        return negative_log_likelihood(params, data, cfg, base)

    def batched_loss(params_stack, data_stack):
        losses = jax.vmap(one_clique_loss)(params_stack, data_stack)
        return jnp.sum(losses), losses

    param_sharding = NamedSharding(mesh, P("clique"))
    data_sharding = NamedSharding(mesh, P("clique", "data", None))

    @partial(jax.jit,
             in_shardings=(param_sharding, None, data_sharding),
             out_shardings=(param_sharding, None, None))
    def train_step(params_stack, opt_state, data_stack):
        (_, losses), grads = jax.value_and_grad(
            batched_loss, has_aux=True)(params_stack, data_stack)
        updates, opt_state = opt.update(grads, opt_state, params_stack)
        params_stack = optax.apply_updates(params_stack, updates)
        return params_stack, opt_state, losses

    def init(key, n_cliques: int):
        keys = jax.random.split(key, n_cliques)
        params_stack = jax.vmap(
            lambda k: init_flow_params(k, cfg))(keys)
        params_stack = jax.device_put(params_stack, param_sharding)
        opt_state = opt.init(params_stack)
        return params_stack, opt_state

    return train_step, init, data_sharding


# --------------------------------------------------------------------------
# Sharded posterior sampling
# --------------------------------------------------------------------------
def shard_samples(mesh: Mesh, samples: jax.Array) -> jax.Array:
    """Place a (n, d) sample block sharded over the data axis."""
    return jax.device_put(samples, NamedSharding(mesh, P("data", None)))


def build_sharded_conditional_sampler(cfg: NSFConfig, mesh: Mesh,
                                      sep_dim: int):
    """Root->leaf conditional draw with the sample axis sharded over
    ``data`` — the separator samples arrive sharded from the parent clique,
    and frontal draws stay sharded (no resharding between tree levels)."""
    from ..flows.nsf import stack_inverse

    in_shard = NamedSharding(mesh, P(("clique", "data"), None))

    @partial(jax.jit, static_argnums=(), in_shardings=(None, in_shard, None),
             out_shardings=in_shard)
    def draw(flow_params, x_prefix_norm, z):
        x_full = stack_inverse(flow_params, z, cfg, x_prefix_norm, sep_dim)
        return x_full[:, sep_dim:]

    return draw
