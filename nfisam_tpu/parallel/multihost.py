"""Multi-host (multi-process) clique-parallel training over DCN.

The reference is strictly single-process (SURVEY §2.3); this is the
host-level half of the TPU-native parallel design (§7.2 stage 9):

* **within a host**: the wavefront scheduler trains a bucket of
  same-signature cliques as one vmapped program, optionally sharded over
  the host's local (clique, data) mesh (``parallel/scheduler.py``);
* **across hosts**: each bucket's clique axis is split into contiguous
  per-process chunks — every process trains only its chunk on its local
  devices, then the trained parameter stacks are exchanged with one
  ``process_allgather`` (the DCN collective) so every process continues
  with the full tree.  The non-training solver work (graph surgery,
  simulation scheduling, posterior pass) is replicated: it is
  milliseconds per step, and replicating it keeps every process's host
  state — including the RNG key stream — in lockstep without any
  additional communication.

A cost model is deliberately unnecessary here (SURVEY §7.3 item 7):
cliques inside one bucket share dim, sample count, and max_iters, so
contiguous equal chunks are load-balanced by construction.  Waves train
single-signature cliques redundantly on every process (identical
results, zero communication) — chunking only ever pays off on the
homogeneous buckets that dominate training time.

Processes are expected to be started with ``jax.distributed.initialize``
(see ``scripts/dryrun_multihost.py`` for a 2-process local-CPU cluster).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np


def host_parallel_enabled(args) -> bool:
    """True when bucket chunking across processes should be used."""
    mode = getattr(args, "host_parallel", "auto")
    if mode in (False, 0, "off", "0", "false"):
        return False
    n = jax.process_count()
    if mode in (True, 1, "on", "1", "true"):
        return n > 1
    if mode == "auto":
        return n > 1
    raise ValueError(f"host_parallel={mode!r}: use True/False/'auto'")


def train_chunked(keys: np.ndarray, samples_stack, cfg, tc, masks,
                  scale_circular: bool = True,
                  mesh=None) -> Tuple[tuple, np.ndarray]:
    """Train a same-signature clique stack split across processes.

    Semantics identical to ``trainer.fit_flows_batched`` (per-clique
    results are independent of batch composition: the vmapped while_loop
    freezes stopped members), except each process only *computes* its
    contiguous chunk and the stacks are reassembled with one allgather.

    Returns ``(outputs, trained_idx)`` where ``outputs`` matches
    ``fit_flows_batched`` and ``trained_idx`` lists the clique indices
    THIS process trained (for observability/tests).
    """
    from jax.experimental import multihost_utils

    from ..train.trainer import fit_flows_batched

    B = int(np.asarray(keys).shape[0])
    P = jax.process_count()
    pid = jax.process_index()
    chunk = -(-B // P)

    keys = np.asarray(keys)
    samples = np.asarray(samples_stack)
    masks = np.asarray(masks, dtype=bool)
    pad = chunk * P - B
    if pad:
        keys = np.concatenate([keys, np.repeat(keys[-1:], pad, 0)], 0)
        samples = np.concatenate(
            [samples, np.repeat(samples[-1:], pad, 0)], 0)
        masks = np.concatenate([masks, np.repeat(masks[-1:], pad, 0)], 0)

    lo, hi = pid * chunk, (pid + 1) * chunk
    out_local = fit_flows_batched(keys[lo:hi], samples[lo:hi], cfg, tc,
                                  masks[lo:hi],
                                  scale_circular=scale_circular, mesh=mesh)
    # host-side gather: parameter stacks are tiny (KBs); one DCN collective
    # per bucket
    out_host = jax.tree_util.tree_map(np.asarray, out_local)
    gathered = multihost_utils.process_allgather(out_host)
    out = jax.tree_util.tree_map(
        lambda x: x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])[:B],
        gathered)
    trained_idx = np.arange(lo, min(hi, B))
    return out, trained_idx
