"""Clique-parallel training scheduler.

The reference trains Bayes-tree cliques strictly sequentially even though
leaves-to-root order only requires parents to wait on children
(``FactorGraphSolver.py:423-477``; SURVEY §2.3 calls this out as the
unexploited tree-level parallelism).  This scheduler:

1. partitions the un-modeled cliques into **wavefronts** — a clique joins a
   wavefront once all of its children are modeled;
2. inside a wavefront, buckets cliques by training signature
   ``(aug_dim, circular mask, sample count)`` and trains each bucket as a
   single vmapped program — one ``while_loop`` drives all of them, so the
   bucket costs the wall time of its slowest member;
3. on a multi-chip mesh the bucket's clique axis can additionally be
   sharded (see ``parallel/mesh.py``) — clique parallelism over chips,
   data parallelism within a clique.

``ParallelNFiSAM`` is a drop-in replacement for ``NFiSAM``.
"""
from __future__ import annotations

import time
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..flows.model import CliqueFlowModel
from ..graph.bayes_tree import CliqueNode
from ..samplers.simulation import SimulationBasedSampler
from ..solver.nfisam import FlowModelAdapter, NFiSAM
from ..train.trainer import fit_flows_batched


def wavefronts(clique_ordering: List[CliqueNode],
               already_modeled) -> List[List[CliqueNode]]:
    """Partition cliques into leaves-first waves; a clique is ready once
    every child is modeled or scheduled in an earlier wave."""
    done = set(c for c in clique_ordering if c in already_modeled)
    remaining = [c for c in clique_ordering if c not in done]
    waves: List[List[CliqueNode]] = []
    while remaining:
        wave = [c for c in remaining
                if all(ch in done for ch in c.children)]
        if not wave:
            raise RuntimeError("Cyclic clique dependency (corrupt tree)")
        waves.append(wave)
        done.update(wave)
        remaining = [c for c in remaining if c not in done]
    return waves


class ParallelNFiSAM(NFiSAM):
    """NF-iSAM with wavefront-parallel clique training.

    ``host_trained_cliques`` records which cliques THIS process actually
    trained when multi-host bucket chunking is active (observability for
    the ≥2-host dryrun/tests; empty in single-process runs)."""

    def __init__(self, args=None):
        super().__init__(args=args)
        self.host_trained_cliques: List[str] = []
        # per-bucket training log: (aug_dim, n_samples, bucket_size) for
        # every vmapped bucket actually dispatched — the measured wave
        # bucket population behind the batched-trainer MFU question
        # (VERDICT r3 task #2 / r4 task #3)
        self.bucket_log: List[Tuple[int, int, int]] = []

    def fit_tree_density_models(self, timer: Optional[List[float]] = None,
                                clique_dim_timer: Optional[List] = None,
                                *args, **kwargs) -> None:
        self._temp_training_loss = {}
        self._evict_stale_value_matches()
        ordering = self._working_bayes_tree.clique_ordering()
        t_begin = time.time()
        waves = wavefronts(ordering, self._clique_density_model)
        for wave in waves:
            # ---- simulate all cliques in the wave -----------------------
            sims = []
            for clique in wave:
                restored = self.try_load_clique_model(clique)
                if restored is not None:
                    model, true_obs = restored
                    self._clique_true_obs[clique] = true_obs
                    self._clique_density_model[clique] = model
                    self._finish_clique(clique, model)
                    continue
                t0 = time.time()
                subgraph = self._working_graph.clique_subgraph(clique)
                pattern = self._working_bayes_tree.clique_variable_pattern(
                    clique)
                sampler = SimulationBasedSampler(factors=subgraph.factors,
                                                 vars=pattern)
                samples, var_ordering, true_obs = sampler.sample(
                    self._next_key(), self._args.local_sample_num)
                if timer is not None:
                    timer.append(time.time() - t0)
                self._clique_true_obs[clique] = true_obs
                if self._args.store_clique_samples:
                    self._clique_samples[clique] = np.asarray(samples)
                sims.append((clique, samples, var_ordering))

            # ---- bucket by padded dim (masks are traced inputs) ---------
            buckets: Dict[Tuple, List] = {}
            for clique, samples, var_ordering in sims:
                circ = []
                for v in var_ordering:
                    circ += v.circular_dim_list
                samples, pad = self._pad_samples(samples, circ)
                key = (samples.shape[-1], samples.shape[0])
                if self._args.flow_type == "NSF_AR_CS":
                    # the circular-spline routing is static per config, so
                    # CS buckets must share the circular pattern
                    key = key + (tuple(circ) + (False,) * pad,)
                buckets.setdefault(key, []).append(
                    (clique, samples, var_ordering, circ, pad))

            for bkey, bucket_items in buckets.items():
                aug_dim, n = bkey[0], bkey[1]
                self.bucket_log.append((aug_dim, n, len(bucket_items)))
                t0 = time.time()
                cfg = self._flow_config(
                    aug_dim,
                    list(bucket_items[0][3]) + [False] * bucket_items[0][4])
                tc = self._args.train_config()
                scale_circ = self._args.flow_type == "NSF_AR"
                # measured B-sweep (PROFILE.json): the vmapped trainer is
                # VPU/HBM-bound — throughput peaks at B~4-8 and degrades
                # 2x by B=64, so huge buckets are CHUNKED; multi-host
                # chunking-by-process handles its own splitting
                from .multihost import host_parallel_enabled
                CHUNK = 8
                if host_parallel_enabled(self._args) or \
                        len(bucket_items) <= CHUNK:
                    chunks = [bucket_items]
                else:
                    chunks = [bucket_items[i:i + CHUNK]
                              for i in range(0, len(bucket_items), CHUNK)]
                for items in chunks:
                    self._fit_bucket_chunk(items, cfg, tc, scale_circ,
                                           aug_dim, n, timer, t0,
                                           clique_dim_timer, t_begin)

    def _fit_bucket_chunk(self, items, cfg, tc, scale_circ, aug_dim, n,
                          timer, t0, clique_dim_timer, t_begin) -> None:
        if len(items) == 1:
            clique, samples, var_ordering, circ_l, pad = items[0]
            from ..train.trainer import fit_flow_raw
            fit_key = self._next_key()
            params, iter_loss, n_iters, mean, std = fit_flow_raw(
                fit_key, samples, cfg,
                tc, circ_l + [False] * pad,
                scale_circular=scale_circ,
                mesh=self._args.data_parallel_mesh)
            stacked = [(clique, var_ordering, pad, params,
                        iter_loss, n_iters, mean, std, fit_key)]
        else:
            keys = np.stack([self._next_key() for _ in items])
            samples_stack = np.stack(
                [np.asarray(s) for (_, s, _, _, _) in items])
            masks = np.stack(
                [np.asarray(c + [False] * pd, dtype=bool)
                 for (_, _, _, c, pd) in items])
            from .multihost import (host_parallel_enabled,
                                    train_chunked)
            if host_parallel_enabled(self._args):
                # split the clique axis into contiguous per-process
                # chunks; trained stacks reassemble via one DCN
                # allgather (parallel/multihost.py)
                (p_s, il_s, t_s, m_s, s_s), trained_idx = \
                    train_chunked(
                        keys, samples_stack, cfg, tc, masks,
                        scale_circular=scale_circ,
                        mesh=self._args.data_parallel_mesh)
                # canonical (sorted) name: clique.vars is a set, so
                # join order would leak PYTHONHASHSEED into the
                # MULTIHOST artifact and churn it per regeneration
                self.host_trained_cliques.extend(
                    "".join(sorted(str(v.name)
                                   for v in items[i][0].vars))
                    for i in trained_idx)
            else:
                p_s, il_s, t_s, m_s, s_s = fit_flows_batched(
                    keys, samples_stack, cfg, tc, masks,
                    scale_circular=scale_circ,
                    mesh=self._args.data_parallel_mesh)
            stacked = []
            for b, (clique, _, var_ordering, _, pad) in \
                    enumerate(items):
                import jax
                params = jax.tree_util.tree_map(
                    lambda x: x[b], p_s)
                stacked.append((clique, var_ordering, pad, params,
                                il_s[b], t_s[b], m_s[b], s_s[b],
                                keys[b]))
        if timer is not None:
            timer.append(time.time() - t0)

        import hashlib
        for (clique, var_ordering, pad, params, iter_loss, n_iters,
             mean, std, fit_key) in stacked:
            circ_l = []
            for v in var_ordering:
                circ_l += v.circular_dim_list
            aug_sep_dim = aug_dim - pad - clique.frontal_dim
            tag = hashlib.sha256(
                np.asarray(fit_key).tobytes() + repr(cfg).encode() +
                str((n, aug_dim)).encode()).hexdigest()[:16]
            model = CliqueFlowModel(cfg, params, mean, std, circ_l,
                                    aug_sep_dim, pad_dims=pad,
                                    content_tag=tag)
            adapter = FlowModelAdapter(
                model, self._next_key,
                mesh=self._args.sample_mesh)
            clique_name = "".join(sorted(str(v.name)
                                         for v in clique.vars))
            self._temp_training_loss[clique_name] = (iter_loss,
                                                     n_iters)
            if self._model_store is not None:
                sig, _ = self._clique_signature(clique)
                self._model_store.save(sig, model)
            self._clique_density_model[clique] = adapter
            self._finish_clique(clique, adapter)
            if clique_dim_timer is not None:
                clique_dim_timer.append(
                    [clique.dim, time.time() - t_begin])

    def _finish_clique(self, clique: CliqueNode, model) -> None:
        """Emit the separator-marginal factor and eliminate the clique from
        the working graph."""
        new_sep_factor = None
        if clique.separator:
            sep_list = sorted(
                clique.separator,
                key=lambda v: self._reverse_ordering_map[v])
            new_sep_factor = self.clique_density_to_separator_factor(
                sep_list, model, self._clique_true_obs[clique])
            self._implicit_factors[clique] = new_sep_factor
        self._working_graph = self._working_graph.without_clique(
            clique=clique, new_factor=new_sep_factor)
