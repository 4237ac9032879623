"""Fused root-to-leaf posterior pass: the whole Bayes-tree conditional
sampling sweep in a handful of compiled launches.

The reference walks the tree on host and invokes each clique's flow
separately (``sample_posterior`` FactorGraphSolver.py:497-550); the
straight re-design (one compiled program per clique, solver.py:355) is
still HOST-DISPATCH bound at scale: Plaza-scale trees are ~200-clique
CHAINS (depth == #cliques, no level parallelism to exploit), and ~1.8 ms
of per-clique dispatch adds up to ~0.4 s per step — ~20x the actual
device time.

Here the tree walk is compiled away: cliques are laid out topologically
(parents first) over a single (n, D+1) sample buffer (one column per
variable dim, plus a trash column), and every maximal run of cliques
sharing one flow signature becomes ONE ``lax.scan`` whose per-step data
(stacked flow params, normalizers, gather/scatter column maps, RNG keys)
arrive as scan inputs:

    step: gather separator columns -> build [obs | sep] prefix ->
          normalize -> base draw -> masked AR inverse -> unnormalize ->
          scatter frontal columns

Plaza-scale trees bucket into ~2 signatures and ~3 runs, so the 199
per-clique launches collapse to 3.  Scan lengths and the buffer width are
padded (to multiples of 16 / 128) so incremental steps reuse a few
compiled programs; pad steps scatter into the trash column.
"""
from __future__ import annotations

import os
from collections.abc import Mapping
from functools import lru_cache
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..flows.base_dist import BaseDistribution
from ..flows.model import (CliqueFlowModel, _select_inverse_fn,
                           conditional_draw_core)
from ..flows.nsf import NSFConfig
from ..utils.keys import split_host

def _pow2_bucket(x: int, lo: int) -> int:
    """Next power of two >= max(x, lo): scan lengths and buffer widths
    grow monotonically over an incremental run, so linear padding grids
    trigger a fresh (slow) scan compile every few steps — power-of-2
    buckets bound the number of compiled variants to ~log of the final
    problem size at <=2x padded work (pad steps are trash-writes)."""
    b = lo
    while b < x:
        b *= 2
    return b


@lru_cache(maxsize=64)
def _fused_chain_program(cfg: NSFConfig):
    """One jitted scan program per flow signature; (L, n, D) variation is
    handled by shape-keyed retraces (bounded by the padding grid)."""
    base = BaseDistribution(cfg.circular_mask)
    inverse_fn = _select_inverse_fn(cfg)

    @jax.jit
    def run(buffer, stacked_params, mean, std, circ, prefix_src, obs_mask,
            obs_vals, invert_mask, dst, keys):

        def step(buf, xs):
            (params_i, mean_i, std_i, circ_i, src_i, omask_i, ovals_i,
             imask_i, dst_i, key_i) = xs
            gathered = buf[:, jnp.clip(src_i, 0)]
            prefix = jnp.where(
                omask_i[None, :], ovals_i[None, :],
                jnp.where(src_i[None, :] >= 0, gathered, 0.0))
            x_out = conditional_draw_core(params_i, mean_i, std_i, circ_i,
                                          key_i, prefix, imask_i, cfg,
                                          base, inverse_fn)
            buf = buf.at[:, dst_i].set(x_out)
            return buf, None

        xs = (stacked_params, mean, std, circ, prefix_src, obs_mask,
              obs_vals, invert_mask, dst, keys)
        buffer, _ = jax.lax.scan(step, buffer, xs)
        return buffer

    return run


# Stacking hundreds of small per-clique arrays with eager jnp.stack costs
# ~300 dispatched ops per leaf (expand_dims per element + concatenate);
# one jitted stack is a single dispatch (retraces cached per arity/shape).
@jax.jit
def _jstack(*xs):
    return jnp.stack(xs)


def _stack_tree(trees):
    return jax.tree_util.tree_map(lambda *xs: _jstack(*xs), *trees)


def fused_posterior_enabled() -> bool:
    env = os.environ.get("NFISAM_FUSED_POSTERIOR", "auto").lower()
    if env in ("1", "true", "on", "auto"):
        return True
    if env in ("0", "false", "off"):
        return False
    raise ValueError(
        f"NFISAM_FUSED_POSTERIOR={env!r}: use 1/true/on, 0/false/off, "
        f"or auto")


def fused_sample_posterior(solver, num_samples: int
                           ) -> Optional[Dict]:
    """Run the fused pass over ``solver``'s physical tree.  Returns the
    samples dict, or None if any clique's model is not a flow-backed
    adapter (caller falls back to the per-clique path)."""
    root = solver._physical_bayes_tree.root

    # ---------------------------------------------------------- host walk
    # topological clique order (parents before children) — same DFS the
    # per-clique path uses, so RNG key consumption matches it exactly;
    # children sorted canonically (hash-seed-independent, multi-host safe)
    topo = []
    stack = [root]
    while stack:
        clique = stack.pop()
        topo.append(clique)
        stack.extend(sorted(clique.children, key=str))

    specs = []
    col_of: Dict = {}        # variable -> first global buffer column
    D = 0
    for clique in topo:
        adapter = solver._clique_density_model.get(clique)
        model = getattr(adapter, "model", None)
        if not isinstance(model, CliqueFlowModel):
            return None
        frontal_list = sorted(
            clique.frontal, key=lambda v: solver._reverse_ordering_map[v])
        separator_list = sorted(
            clique.separator, key=lambda v: solver._reverse_ordering_map[v])
        for v in frontal_list:
            col_of[v] = D
            D += v.dim
        obs = np.asarray(solver._clique_true_obs[clique],
                         dtype=np.float32).reshape(-1)
        specs.append((clique, model, obs, separator_list, frontal_list))

    D_pad = _pow2_bucket(D + 1, 256)            # >= D+1 (trash at D_pad-1)
    trash = D_pad - 1

    # group maximal runs of identical flow signature
    runs: List[List] = []
    for spec in specs:
        if runs and runs[-1][0][1].cfg == spec[1].cfg:
            runs[-1].append(spec)
        else:
            runs.append([spec])

    buffer = jnp.zeros((num_samples, D_pad), dtype=jnp.float32)
    mesh = getattr(solver._args, "sample_mesh", None)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        axis = mesh.axis_names[-1]
        if num_samples % mesh.shape[axis] == 0:
            buffer = jax.device_put(buffer,
                                    NamedSharding(mesh, P(axis, None)))

    # stacked-parameter cache: stacking L~1000 per-clique pytrees costs
    # O(L) host dispatches PER STEP, and the long prefix of an
    # incremental run's topo order is unchanged between steps — the
    # 1024-pose scale run measured posterior host time creeping from
    # 0.01 s to 0.17 s/step from exactly this.  Keyed on the cliques'
    # content tags (stamped at training time), so any retrained clique
    # misses.
    stack_cache = getattr(solver, "_fused_stack_cache", None)
    if stack_cache is None:
        stack_cache = solver._fused_stack_cache = {}

    for run_specs in runs:
        cfg = run_specs[0][1].cfg
        dim = cfg.dim
        L = len(run_specs)
        L_pad = _pow2_bucket(L, 16)

        params, means, stds, keys = [], [], [], []
        circs = np.zeros((L_pad, dim), dtype=bool)
        src = np.full((L_pad, dim), -1, dtype=np.int32)
        omask = np.zeros((L_pad, dim), dtype=bool)
        ovals = np.zeros((L_pad, dim), dtype=np.float32)
        imask = np.ones((L_pad, dim), dtype=bool)
        dst = np.full((L_pad, dim), trash, dtype=np.int32)

        for i, (clique, model, obs, sep_list, frontal_list) in \
                enumerate(run_specs):
            o = len(obs)
            omask[i, :o] = True
            ovals[i, :o] = obs
            c = o
            for v in sep_list:
                src[i, c:c + v.dim] = np.arange(col_of[v],
                                                col_of[v] + v.dim)
                c += v.dim
            imask[i, :c] = False
            for v in frontal_list:
                dst[i, c:c + v.dim] = np.arange(col_of[v],
                                                col_of[v] + v.dim)
                c += v.dim
            params.append(model.flow_params)
            means.append(model.mean)
            stds.append(model.std)
            cl = model.circular_dim_list
            circs[i, :len(cl)] = cl
            keys.append(solver._next_key())
        # pad steps recycle the last clique's params; all writes hit trash.
        # Their keys derive from the last real key WITHOUT consuming the
        # solver stream, so the fused pass consumes exactly the same key
        # sequence as the per-clique walk (one per clique, topo order) and
        # whole solves are key-for-key reproducible across both paths.
        if L_pad > L:
            pad_keys = split_host(keys[-1], L_pad - L)
        for i in range(L, L_pad):
            params.append(params[-1])
            means.append(means[-1])
            stds.append(stds[-1])
            circs[i] = circs[L - 1]
            keys.append(pad_keys[i - L])

        tags = [m.content_tag for _, m, *_ in run_specs]
        tags += [tags[-1]] * (L_pad - L)
        if all(tags):
            # BLOCK-wise caching: one signature usually covers the WHOLE
            # tree, so a full-run key would miss on every step (any
            # retrained clique changes the tuple).  128-clique blocks
            # make the stable prefix hit while only the block containing
            # retrained cliques restacks; blocks then join with one
            # device-side concatenate per leaf.
            BLOCK = 128
            # capacity must cover at least one full pass worth of blocks
            # (x2 for step-to-step churn), else a >8192-clique tree
            # evicts its own blocks mid-pass and every step misses
            n_blocks = -(-L_pad // BLOCK)
            cap = max(64, 2 * n_blocks)
            blocks = []
            for b0 in range(0, L_pad, BLOCK):
                b1 = min(b0 + BLOCK, L_pad)
                key = (cfg, tuple(tags[b0:b1]))
                blk = stack_cache.pop(key, None)
                if blk is None:
                    blk = (_stack_tree(params[b0:b1]),
                           _jstack(*means[b0:b1]),
                           _jstack(*stds[b0:b1]))
                    while len(stack_cache) >= cap:
                        stack_cache.pop(next(iter(stack_cache)))
                # pop+reinsert = LRU order in the plain dict
                stack_cache[key] = blk
                blocks.append(blk)
            if len(blocks) == 1:
                p_stack, m_stack, s_stack = blocks[0]
            else:
                p_stack = jax.tree_util.tree_map(
                    lambda *bs: jnp.concatenate(bs, axis=0),
                    *[b[0] for b in blocks])
                m_stack = jnp.concatenate([b[1] for b in blocks], axis=0)
                s_stack = jnp.concatenate([b[2] for b in blocks], axis=0)
        else:
            # a model without a content tag (e.g. restored via an old
            # checkpoint) cannot be identity-keyed — stack fresh
            p_stack, m_stack, s_stack = (
                _stack_tree(params), _jstack(*means), _jstack(*stds))

        program = _fused_chain_program(cfg)
        args_dev = (p_stack, m_stack, s_stack, jnp.asarray(circs),
                    jnp.asarray(src), jnp.asarray(omask),
                    jnp.asarray(ovals), jnp.asarray(imask),
                    jnp.asarray(dst), jnp.asarray(np.stack(keys)))
        buffer = program(buffer, *args_dev)
        _maybe_prewarm_growth(solver, cfg, program, num_samples,
                              args_dev, L, L_pad, D, D_pad)

    return LazySamples(buffer, col_of)


def _maybe_prewarm_growth(solver, cfg, program, n, args_dev, L, L_pad,
                          D, D_pad) -> None:
    """Compile the NEXT power-of-2 bucket variants in background threads
    before growth reaches them.  Each (L_pad, D_pad) retrace of the fused
    scan costs 15-28 s on the tunneled TPU and lands as a p99 step spike
    (scale run: steps 16/37/53 at 24-28 s); a dummy-input call from a
    thread populates the jit cache while real steps keep dispatching, so
    the growth step is a cache hit."""
    import threading
    done = solver.__dict__.setdefault("_prewarm_done", set())
    targets = []
    if L >= (L_pad * 5) // 8:
        targets.append((2 * L_pad, D_pad))
    if D + 1 >= (D_pad * 3) // 4:
        targets.append((L_pad, 2 * D_pad))
        if L >= (L_pad * 5) // 8:
            targets.append((2 * L_pad, 2 * D_pad))
    for (L2, D2) in targets:
        key = (repr(cfg), L2, D2, n)
        if key in done:
            continue
        done.add(key)

        def work(L2=L2, D2=D2):
            try:
                def tile(x):
                    if x.shape[0] == L2:
                        return x
                    return jnp.concatenate([x] * (L2 // x.shape[0]),
                                           axis=0)

                (p, m, s, circ, src, om, ov, im, dst, keys) = args_dev
                p2 = jax.tree_util.tree_map(tile, p)
                buf2 = jnp.zeros((n, D2), jnp.float32)
                out = program(buf2, p2, tile(m), tile(s), tile(circ),
                              tile(src), tile(om), tile(ov), tile(im),
                              tile(dst), tile(keys))
                jax.block_until_ready(out)
            except Exception:   # prewarm is best-effort
                pass

        threading.Thread(target=work, daemon=False).start()


class LazySamples(Mapping):
    """Posterior samples as lazy column views of the fused buffer.

    Slicing ~800 per-variable device arrays eagerly costs ~0.2 s of
    dispatch per step at Plaza scale; the solver itself never reads the
    samples, so each slice is cut (and cached) only when a consumer asks
    for it.  Values are device arrays, preserving shardings."""

    def __init__(self, buffer, col_of):
        self._buffer = buffer
        self._col_of = col_of
        self._cache: Dict = {}

    def __getitem__(self, v):
        out = self._cache.get(v)
        if out is None:
            col = self._col_of[v]
            out = self._buffer[:, col:col + v.dim]
            self._cache[v] = out
        return out

    def __iter__(self):
        return iter(self._col_of)

    def __len__(self):
        return len(self._col_of)

    def materialize(self) -> Dict:
        """All variables as host numpy arrays with ONE device fetch.

        Iterating and ``np.asarray``-ing per variable costs one tunnel
        round trip each — ~1,000 variables at 0.1-0.5 s apiece turned
        the 1024-pose scale run's final accuracy pass into minutes."""
        buf = np.asarray(self._buffer)
        return {v: buf[:, col:col + v.dim]
                for v, col in self._col_of.items()}
