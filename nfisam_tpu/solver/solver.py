"""Incremental factor-graph solver core (abstract machinery).

Parity with reference ``src/slam/FactorGraphSolver.py`` (``SolverArgs:27``,
``FactorGraphSolver:68``): physical vs working graph split, elimination
orderings, incremental Bayes-tree surgery with density-model recycling,
leaves->root clique fitting, and root->leaf posterior sampling.

TPU-first orchestration notes:

* all numeric work (clique simulation, flow training, posterior draws)
  happens in jitted batched programs; the solver only sequences them;
* cliques at the same Bayes-tree depth are independent — they are grouped
  per level so backends can fan them out (sequential here; the parallel
  scheduler lives in ``nfisam_tpu/parallel``);
* RNG is an explicit ``jax.random`` key threaded through every step.
"""
from __future__ import annotations

import json
import time
from dataclasses import asdict, dataclass
from collections.abc import Mapping
from typing import Dict, List, Optional

import jax
import numpy as np

from ..core.variables import Variable, VariableType
from ..factors.factors import Factor, ImplicitPriorFactor
from ..graph.bayes_tree import BayesTree, CliqueNode
from ..graph.factor_graph import FactorGraph
from ..samplers.simulation import SimulationBasedSampler
from ..utils.keys import KeyStream


@dataclass
class SolverArgs:
    elimination_method: str = "natural"      # natural | pose_first | ccolamd
    posterior_sample_num: int = 500
    local_sample_num: int = 500
    store_clique_samples: bool = False
    local_sampling_method: str = "direct"    # direct | nested
    # NOTE: the reference's ``adaptive_posterior_sampling`` knob
    # (FactorGraphSolver.py:34) routes to ``adaptive_posterior``, which the
    # reference never implements (``:402-407`` raises unconditionally) — the
    # dead knob is intentionally not carried over.
    seed: int = 0
    # evidence-aware recycling (mode repair): when a NEW range factor is
    # inconsistent with the ENTIRE committed posterior of its endpoints
    # (no sample within ``mode_repair_sigma`` of the measured ring), the
    # contradicted landmark's clique is force-re-eliminated instead of
    # recycled, so its flow retrains against all current evidence.  The
    # reference recycles purely structurally (FactorGraphSolver.py:309-349)
    # and cannot undo a wrong ring-mode commitment; at 1,101 poses that
    # left the flow posterior 10x worse than the warm-started MAP.
    mode_repair: bool = True
    mode_repair_sigma: float = 4.0
    # thrash rails: at most this many repaired variables per update, and
    # a repaired variable is immune for this many updates afterwards —
    # a contradiction that survives its own retraining would otherwise
    # re-evict the same cliques every step
    mode_repair_max_per_step: int = 3
    mode_repair_cooldown: int = 10

    def json_str(self) -> str:
        return json.dumps(asdict(self))


class CliqueSeparatorFactor(ImplicitPriorFactor):
    """Marker base for separator-marginal factors pushed up the tree."""


class ConditionalSampler:
    def conditional_sample_given_observation(self, conditional_dim,
                                             obs_samples=None,
                                             sample_number=None):
        raise NotImplementedError


class FactorGraphSolver:
    """Abstract incremental solver; density modeling is subclass policy."""

    def __init__(self, args: SolverArgs):
        self._args = args
        self._physical_graph = FactorGraph()
        self._working_graph = FactorGraph()
        self._physical_bayes_tree: Optional[BayesTree] = None
        self._working_bayes_tree: Optional[BayesTree] = None
        self._implicit_factors: Dict[CliqueNode, Factor] = {}
        self._samples: Dict[Variable, np.ndarray] = {}
        self._new_nodes: List[Variable] = []
        self._new_factors: List[Factor] = []
        self._clique_samples: Dict[CliqueNode, np.ndarray] = {}
        self._clique_true_obs: Dict[CliqueNode, np.ndarray] = {}
        self._clique_density_model: Dict[CliqueNode, object] = {}
        self._clique_variable_pattern: Dict[CliqueNode, List[Variable]] = {}
        self._elimination_ordering: List[Variable] = []
        self._reverse_ordering_map: Dict[Variable, int] = {}
        self._temp_training_loss: Dict[str, List[float]] = {}
        self._keys = KeyStream(args.seed)
        # observability: variables force-re-eliminated by mode repair,
        # in trigger order (one entry per repaired variable per step)
        self.mode_repair_log: List[str] = []

    # ------------------------------------------------------------ plumbing
    def _next_key(self):
        """Raw threefry key derived on host (zero device round trips)."""
        return self._keys()

    @property
    def elimination_ordering(self) -> List[Variable]:
        return self._elimination_ordering

    @property
    def physical_vars(self) -> List[Variable]:
        return self._physical_graph.vars

    @property
    def working_vars(self) -> List[Variable]:
        return self._working_graph.vars

    @property
    def physical_factors(self) -> List[Factor]:
        return self._physical_graph.factors

    @property
    def working_factors(self) -> List[Factor]:
        return self._working_graph.factors

    @property
    def physical_bayes_tree(self) -> Optional[BayesTree]:
        return self._physical_bayes_tree

    @property
    def working_bayes_tree(self) -> Optional[BayesTree]:
        return self._working_bayes_tree

    def add_node(self, var: Variable) -> "FactorGraphSolver":
        self._new_nodes.append(var)
        return self

    def add_factor(self, factor: Factor) -> "FactorGraphSolver":
        self._new_factors.append(factor)
        return self

    # ------------------------------------------------------------ ordering
    def generate_ordering(self) -> None:
        method = self._args.elimination_method
        if method == "natural":
            self._elimination_ordering = \
                self._physical_graph.vars + self._new_nodes
        elif method == "pose_first":
            natural = self._physical_graph.vars + self._new_nodes
            poses = [v for v in natural
                     if v.type != VariableType.Landmark]
            lmks = [v for v in natural if v.type == VariableType.Landmark]
            self._elimination_ordering = poses + lmks
        elif method == "ccolamd":
            fixed = [v for v in self._elimination_ordering
                     if v not in set(self._working_graph.vars)]
            poses = [v for v in self._working_graph.vars
                     if v.type == VariableType.Pose]
            working = self._working_graph.analyze_elimination_ordering(
                method="ccolamd", last_vars=[poses[-1]] if poses else None)
            self._elimination_ordering = fixed + working
        else:
            raise ValueError(f"Unknown elimination method {method}")
        self._reverse_ordering_map = {
            v: i for i, v in enumerate(self._elimination_ordering[::-1])}

    # -------------------------------------------------------- incremental
    def update_physical_and_working_graphs(
            self, timer: Optional[List[float]] = None
    ) -> "FactorGraphSolver":
        """Fold new nodes/factors in, rebuild the working tree over affected
        variables, recycle untouched models (reference
        ``update_physical_and_working_graphs`` FactorGraphSolver.py:256)."""
        start = time.time()
        old_nodes = set(self.physical_vars)
        touched = set()
        for f in self._new_factors:
            touched |= set(f.vars)
        touched &= old_nodes
        repaired: set = set()
        self._update_count = getattr(self, "_update_count", 0) + 1
        if self._args.mode_repair and self._samples:
            repaired = self._mode_contradicted_vars(old_nodes)
            cool = getattr(self, "_repair_cooldown", {})
            repaired = {
                v for v in repaired
                if self._update_count - cool.get(v, -10 ** 9)
                > self._args.mode_repair_cooldown}
            if len(repaired) > self._args.mode_repair_max_per_step:
                repaired = set(sorted(
                    repaired,
                    key=str)[:self._args.mode_repair_max_per_step])
            if repaired:
                for v in repaired:
                    cool[v] = self._update_count
                self._repair_cooldown = cool
                self.mode_repair_log.extend(
                    sorted(str(v.name) for v in repaired))
                touched |= repaired
        # visible to try_load_clique_model until the next update
        self._repair_vars = repaired

        if self._physical_bayes_tree is not None:
            affected, sub_trees = \
                self._physical_bayes_tree.prune_affected(touched,
                                                         deep=repaired)
            # canonical subtree order: prune_affected returns a SET, and
            # the order decides separator-prior factor order in the working
            # graph (=> simulation schedules, RNG assignment) — sort so
            # every process of a multi-host run stays in lockstep
            sub_trees = sorted(sub_trees, key=lambda t: str(t.root))
            self._working_graph = \
                self._physical_graph.subgraph_with_separator_priors(
                    affected, sub_trees, self._implicit_factors)
        else:
            sub_trees = set()
            self._working_graph = FactorGraph()
        for node in self._new_nodes:
            self._working_graph.add_node(node)
        for factor in self._new_factors:
            self._working_graph.add_factor(factor)

        old_ordering = self._elimination_ordering
        self.generate_ordering()
        working_set = set(self.working_vars)
        self._working_bayes_tree = self._working_graph.build_bayes_tree(
            ordering=[v for v in self._elimination_ordering
                      if v in working_set])

        for node in self._new_nodes:
            self._physical_graph.add_node(node)
        for factor in self._new_factors:
            self._physical_graph.add_factor(factor)

        self._physical_bayes_tree = self._working_bayes_tree.copy()
        self._physical_bayes_tree.graft_subtrees(sub_trees)

        # a clique whose FRONTALS are touched by one of THIS step's
        # factors must never be structurally recycled even if its
        # variable set reappears verbatim: the stale model predates the
        # new evidence, and eliminating it via without_clique leaves the
        # new factor dangling on an eliminated frontal (measured:
        # delayed-release DA factors crashed exactly here, KeyError on
        # the observer).  Separator-only appearances stay recyclable —
        # those models are conditionals p(frontals | sep), still valid
        # functions when the separator's marginal shifts; blocking them
        # drops the sep-prior anchors downstream cliques simulate from.
        new_factor_vars: set = set()
        for f in self._new_factors:
            new_factor_vars |= set(f.vars)
        self._recycle_root_models(old_ordering, no_recycle=repaired,
                                  no_recycle_frontal=new_factor_vars)

        self._new_nodes = []
        self._new_factors = []
        if timer is not None:
            timer.append(time.time() - start)
        return self

    def _mode_contradicted_vars(self, old_nodes) -> set:
        """Landmarks whose committed posterior the NEW evidence cannot
        explain — the flow-path analog of the banked MAP's >4-sigma
        mode-escape re-scoring (``banked_joint.py``).

        A new range(-mixture) factor between two OLD variables is
        *contradicted* when, for every mixture hypothesis, (almost) no
        committed posterior sample lies within ``mode_repair_sigma`` of
        the measured ring (2nd-percentile of |dist - r|, so a couple of
        stray samples cannot mask a wrong-mode commitment).  Returning
        the landmark forces its cliques into the affected set
        (``prune_affected``), so they re-eliminate and retrain with the
        contradicting factor included instead of recycling the stale
        flow — the repair the reference's structural recycling
        (FactorGraphSolver.py:309-349) cannot perform.

        Tunnel-latency note: the check reads the async host SNAPSHOT of
        the previous posterior (``_repair_snapshot``, a 256-row
        subsample whose device->host copy was started right after the
        posterior dispatch) — by the time the next batch of factors
        arrives the copy has landed, so the check costs pure host numpy
        and ZERO blocking round trips.  A blocking mid-loop fetch here
        measured +0.1 s on the 0.3 s case1 solve."""
        from ..factors.factors import (R2RelativeGaussianLikelihoodFactor,
                                       SE2RelativeGaussianLikelihoodFactor,
                                       _RangeFactorBase)
        from ..factors.mixtures import BinaryFactorMixture
        col_view = self._snapshot_columns()
        if col_view is None:
            return set()

        # dead-reckon NEW poses through the new odometry chain so a range
        # from the current (uncommitted) pose to an OLD landmark can be
        # tested — the dominant evidence pattern in incremental streams
        dr: Dict[Variable, np.ndarray] = {}

        def lookup(v):
            s = col_view(v)
            return dr.get(v) if s is None else s

        progress = True
        while progress:
            progress = False
            for f in self._new_factors:
                if not isinstance(f, (SE2RelativeGaussianLikelihoodFactor,
                                      R2RelativeGaussianLikelihoodFactor)):
                    continue
                v1, v2 = f.vars[0], f.vars[1]
                s1 = lookup(v1)
                if s1 is None or lookup(v2) is not None:
                    continue
                if isinstance(f, SE2RelativeGaussianLikelihoodFactor):
                    c, s = np.cos(s1[:, 2]), np.sin(s1[:, 2])
                    dx, dy, dth = (float(f.obs[0]), float(f.obs[1]),
                                   float(f.obs[2]))
                    dr[v2] = np.stack(
                        [s1[:, 0] + c * dx - s * dy,
                         s1[:, 1] + s * dx + c * dy,
                         s1[:, 2] + dth], axis=1)
                else:
                    dr[v2] = s1[:, :2] + np.asarray(f.obs[:2],
                                                    dtype=s1.dtype)
                progress = True

        specs = []          # (factor, [(v1, v2, r, sigma), ...])
        for f in self._new_factors:
            if isinstance(f, BinaryFactorMixture):
                rings = [(c.vars[0], c.vars[1], float(c.obs[0]),
                          float(c.sigma)) for c in f.components
                         if isinstance(c, _RangeFactorBase)]
            elif isinstance(f, _RangeFactorBase):
                rings = [(f.vars[0], f.vars[1], float(f.obs[0]),
                          float(f.sigma))]
            else:
                continue
            if not rings or any(
                    lookup(v) is None
                    for (v1, v2, _, _) in rings for v in (v1, v2)):
                continue        # an endpoint has neither committed
            if not any(v in old_nodes       # posterior nor dead-reckon
                       for (v1, v2, _, _) in rings for v in (v1, v2)):
                continue        # nothing committed to repair
            specs.append((f, rings))
        if not specs:
            return set()

        out: set = set()
        for f, rings in specs:
            consistent = False
            for (v1, v2, r, sg) in rings:
                d = np.linalg.norm(lookup(v2)[:, :2] - lookup(v1)[:, :2],
                                   axis=1)
                # contradiction = (almost) no committed posterior mass
                # near the measured ring; the 2nd percentile keeps a
                # couple of stray samples from masking a wrong mode
                if np.quantile(np.abs(d - r), 0.02) <= \
                        self._args.mode_repair_sigma * sg:
                    consistent = True
                    break
            if consistent:
                continue
            for (v1, v2, r, sg) in rings:
                lmks = [v for v in (v1, v2)
                        if v.type == VariableType.Landmark
                        and v in old_nodes]
                out.update(lmks if lmks else
                           (v for v in (v1, v2) if v in old_nodes))
        return out

    def _start_repair_snapshot(self, fused, num_samples: int) -> None:
        """Fetch a 256-row posterior subsample to host in a BACKGROUND
        thread.  Any read of device data synchronizes with the whole
        device queue, so an in-loop fetch (even `copy_to_host_async`,
        which this platform serves synchronously) moves the queue drain
        into the host loop — measured +0.3 s on the 0.2 s case1 solve.
        The thread parks on the queue with the GIL released while the
        main loop keeps dispatching; the repair check then reads the
        latest COMPLETED snapshot (at most one step stale, fine for a
        mode-consistency test)."""
        import threading
        prev = getattr(self, "_snapshot_thread", None)
        if prev is not None and prev.is_alive():
            # previous fetch still parked on the device queue: DROP this
            # snapshot and keep the older one.  Joining here blocked the
            # main loop on the previous step's device completion and
            # de-pipelined the whole solve (measured: plaza steady steps
            # 0.03 s -> 0.25 s); a slightly staler snapshot is free and
            # semantically fine for a mode-consistency test.
            return
        snap = fused._buffer[:min(256, num_samples)]
        col_of = dict(fused._col_of)

        def work():
            try:
                buf = np.asarray(snap)
                self._repair_snapshot_host = (buf, col_of)
            except Exception:       # device teardown mid-fetch: skip
                pass

        # non-daemon: the interpreter joins it before teardown — a daemon
        # thread parked inside a native device fetch at shutdown aborts
        # the process ("FATAL: exception not rethrown") and can wedge the
        # TPU tunnel.  The join-prev above bounds it to one outstanding.
        t = threading.Thread(target=work, daemon=False)
        self._snapshot_thread = t
        t.start()

    def _snapshot_columns(self):
        """Accessor ``v -> (n, v.dim) host samples`` over the latest
        completed posterior snapshot (fused path) or the raw samples
        mapping (per-clique/CPU path); None when no posterior snapshot
        has landed yet."""
        snap = getattr(self, "_repair_snapshot_host", None)
        if snap is not None:
            buf, col_of = snap

            def view(v):
                col = col_of.get(v)
                if col is None:
                    return None
                return buf[:, col:col + v.dim]

            return view
        samples = self._samples
        if not samples:
            return None
        if hasattr(samples, "_buffer"):
            # fused/device samples but no snapshot landed yet (first
            # step, or the background fetch is still parked on the
            # device queue): SKIP the check rather than block the loop
            return None
        cache: Dict = {}

        def view(v):
            if v not in samples:
                return None
            out = cache.get(v)
            if out is None:
                out = np.asarray(samples[v])
                cache[v] = out
            return out

        return view

    def _recycle_root_models(self, old_ordering: List[Variable],
                             no_recycle: set = frozenset(),
                             no_recycle_frontal: set = frozenset()
                             ) -> None:
        """An old root clique that reappears with the same variables and
        in-clique ordering — now as a leaf — keeps its density model after a
        separator/frontal re-split (reference FactorGraphSolver.py:309-349).

        ``no_recycle``: mode-repaired variables — a dismantled clique that
        CONTAINS one (frontal or separator) may reappear with identical
        vars/ordering, and structural recycling would silently resurrect
        the wrong-support flow the repair just evicted.
        ``no_recycle_frontal``: this step's new-factor variables — blocks
        recycling only where they are FRONTAL (the stale model would
        absorb the frontals and leave the new factor dangling)."""
        stale = set(self._clique_density_model.keys()) - \
            self._physical_bayes_tree.clique_nodes
        if not stale:
            return
        # O(stale + cliques): index candidates by variable set and compare
        # in-clique column orderings via position maps instead of rebuilding
        # ordering-filtered lists per (stale, new) pair.
        by_vars: Dict[frozenset, CliqueNode] = {}
        for nc in self._working_bayes_tree.clique_nodes:
            by_vars[frozenset(nc.vars)] = nc
        old_pos = {v: i for i, v in enumerate(old_ordering)}
        new_pos = {v: i for i, v in enumerate(self._elimination_ordering)}
        # canonical order: recycling emits separator factors into the
        # working graph, so set-iteration order here would leak
        # PYTHONHASHSEED into factor order (multi-host determinism)
        matches = []
        for old_clique in sorted(stale, key=str):
            if no_recycle and (no_recycle & old_clique.vars):
                continue
            new_clique = by_vars.get(frozenset(old_clique.vars))
            if new_clique is None:
                continue
            if no_recycle_frontal and \
                    (no_recycle_frontal & new_clique.frontal):
                continue
            old_cols = sorted(old_clique.vars, key=old_pos.__getitem__)
            new_cols = sorted(new_clique.vars, key=new_pos.__getitem__)
            if old_cols != new_cols:
                continue
            matches.append((old_clique, new_clique))
        # elimination ORDER matters: each without_clique drops a clique's
        # frontals from the working graph, so a parent must only be
        # eliminated after every recycled child whose factors reference
        # those frontals via its own separator (child sep ⊆ parent vars).
        # Lexical order broke this for recycled CHAINS (a delayed-release
        # DA factor dismantles a run of pose cliques; eliminating the
        # parent first left the child's odometry factor dangling on a
        # dropped frontal — KeyError X12, round-5).  Leaf-to-root =
        # DEEPEST first; depth is computed iteratively (1,500-deep chains
        # blow Python recursion) and ties stay str-sorted for multi-host
        # determinism.
        depth: Dict[CliqueNode, int] = {}
        for _, nc in matches:
            d, node = 0, nc
            while node.parent is not None:
                node = node.parent
                d += 1
            depth[nc] = d
        matches.sort(key=lambda on: (-depth[on[1]], str(on[0])))
        for old_clique, new_clique in matches:
            # containment guard (cheap: without_clique scans factors
            # anyway): if ANY working-graph factor touches this clique's
            # frontals without being contained in it, eliminating now
            # would leave that factor dangling — skip recycling (the
            # clique simply retrains; correctness over reuse).
            frontal = new_clique.frontal
            cvars = new_clique.vars
            if any((set(f.vars) & frontal) and
                   not set(f.vars).issubset(cvars)
                   for f in self._working_graph.factors):
                continue
            self._clique_true_obs[new_clique] = \
                self._clique_true_obs[old_clique]
            if old_clique in self._clique_variable_pattern:
                self._clique_variable_pattern[new_clique] = \
                    self._clique_variable_pattern[old_clique]
            if old_clique in self._clique_samples:
                self._clique_samples[new_clique] = \
                    self._clique_samples[old_clique]
            self._clique_density_model[new_clique] = \
                self.root_clique_density_model_to_leaf(
                    old_clique, new_clique)
            new_sep_factor = None
            if new_clique.separator:
                sep_list = sorted(
                    new_clique.separator,
                    key=lambda v: self._reverse_ordering_map[v])
                new_sep_factor = self.clique_density_to_separator_factor(
                    sep_list, self._clique_density_model[new_clique],
                    self._clique_true_obs[old_clique])
                self._implicit_factors[new_clique] = new_sep_factor
            self._working_graph = self._working_graph.without_clique(
                clique=new_clique, new_factor=new_sep_factor)
        for old_clique in stale:
            self._clique_density_model.pop(old_clique, None)
            self._clique_true_obs.pop(old_clique, None)
            self._clique_variable_pattern.pop(old_clique, None)
            self._clique_samples.pop(old_clique, None)

    # ----------------------------------------------------------- inference
    def incremental_inference(self, timer: Optional[List[float]] = None,
                              clique_dim_timer: Optional[List] = None,
                              *args, **kwargs):
        self.fit_tree_density_models(timer=timer,
                                     clique_dim_timer=clique_dim_timer,
                                     *args, **kwargs)
        self._samples = self.sample_posterior(timer=timer)
        return self._samples

    def fit_clique_density_model(self, clique, samples, var_ordering,
                                 timer) -> "ConditionalSampler":
        raise NotImplementedError

    def try_load_clique_model(self, clique):
        """Hook: return (model, true_obs) from a checkpoint store, or None
        to simulate + train (subclass policy)."""
        return None

    def root_clique_density_model_to_leaf(self, old_clique, new_clique):
        raise NotImplementedError

    def clique_density_to_separator_factor(self, separator_var_list,
                                           density_model, true_obs):
        raise NotImplementedError

    def _evict_stale_value_matches(self) -> None:
        """Evict models claimed by VALUE-identical re-formed cliques.

        ``CliqueNode`` equality is by variable content, so a working-tree
        clique re-formed from the affected region with the exact same
        frontal/separator sets hits the model dict of its pre-update
        incarnation.  The 'already modeled' skip would then silently
        DROP its live factors (no separator factor is emitted either, so
        the next clique up cannot anchor its simulation — measured:
        delayed-release DA factors produced exactly this, because adding
        a factor over (pose, landmarks-already-in-separator) re-forms
        the clique verbatim).  A re-formed clique is distinguishable
        from a legitimately recycled one: recycling eliminated its
        factors from the working graph, so only re-forms still have
        non-implicit factors touching their frontals."""
        if self._working_bayes_tree is None:
            return
        for clique in list(self._working_bayes_tree.clique_nodes):
            if clique not in self._clique_density_model:
                continue
            sub = self._working_graph.clique_subgraph(clique)
            live = any(
                (set(f.vars) & clique.frontal)
                and not isinstance(f, CliqueSeparatorFactor)
                for f in sub.factors)
            if live:
                self._clique_density_model.pop(clique, None)
                self._clique_true_obs.pop(clique, None)
                self._clique_variable_pattern.pop(clique, None)
                self._clique_samples.pop(clique, None)

    def fit_tree_density_models(self,
                                timer: Optional[List[float]] = None,
                                clique_dim_timer: Optional[List] = None,
                                *args, **kwargs) -> None:
        """Leaves->root clique loop (reference
        ``fit_tree_density_models`` FactorGraphSolver.py:409)."""
        self._temp_training_loss = {}
        self._evict_stale_value_matches()
        clique_ordering = self._working_bayes_tree.clique_ordering()
        t_begin = time.time()
        while clique_ordering:
            t_clique = time.time()
            clique = clique_ordering.pop()
            if clique in self._clique_density_model:
                if clique_dim_timer is not None:
                    clique_dim_timer.append(
                        [clique.dim, time.time() - t_begin])
                continue

            restored = self.try_load_clique_model(clique)
            if restored is not None:
                model, true_obs = restored
            else:
                t0 = time.time()
                local_samples, sample_var_ordering, true_obs = \
                    self.clique_training_sampler(
                        clique, num_samples=self._args.local_sample_num,
                        method=self._args.local_sampling_method)
                if timer is not None:
                    timer.append(time.time() - t0)

                if self._args.store_clique_samples:
                    self._clique_samples[clique] = np.asarray(local_samples)

                model = self.fit_clique_density_model(
                    clique=clique, samples=local_samples,
                    var_ordering=sample_var_ordering, timer=timer)
            self._clique_true_obs[clique] = true_obs
            self._clique_density_model[clique] = model
            new_sep_factor = None
            if clique.separator:
                sep_list = sorted(
                    clique.separator,
                    key=lambda v: self._reverse_ordering_map[v])
                new_sep_factor = self.clique_density_to_separator_factor(
                    sep_list, model, true_obs)
                self._implicit_factors[clique] = new_sep_factor
            self._working_graph = self._working_graph.without_clique(
                clique=clique, new_factor=new_sep_factor)
            if clique_dim_timer is not None:
                clique_dim_timer.append([clique.dim,
                                         time.time() - t_begin])

    def clique_training_sampler(self, clique: CliqueNode, num_samples: int,
                                method: str):
        """Training samples for one clique (reference
        ``clique_training_sampler`` FactorGraphSolver.py:479)."""
        subgraph = self._working_graph.clique_subgraph(clique)
        pattern = self._working_bayes_tree.clique_variable_pattern(clique)
        if method == "direct":
            sampler = SimulationBasedSampler(factors=subgraph.factors,
                                             vars=pattern)
            samples, var_list, unused_obs = sampler.sample(
                self._next_key(), num_samples)
        elif method in ("nested", "dynamic nested"):
            from .nested_adapter import nested_clique_samples
            samples = nested_clique_samples(
                self._next_key(), pattern, subgraph.factors, num_samples,
                dynamic=(method == "dynamic nested"))
            var_list = pattern
            unused_obs = np.array([])
        else:
            raise ValueError(f"Unknown sampling method {method}")
        return samples, var_list, unused_obs

    def sample_posterior(self, timer: Optional[List[float]] = None
                         ) -> Mapping:
        """Root->leaf conditional sampling pass (reference
        ``sample_posterior`` FactorGraphSolver.py:497).  Returns a
        READ-ONLY mapping Variable -> (n, dim) device array (the fused
        path returns lazy buffer views; copy before mutating).

        Flow-backed trees run the FUSED pass (whole tree in a few scan
        launches — ``posterior_pass.py``; Plaza-scale chains are
        host-dispatch bound otherwise); anything else falls back to the
        per-clique walk below."""
        num_samples = self._args.posterior_sample_num
        start = time.time()
        from .posterior_pass import (fused_posterior_enabled,
                                     fused_sample_posterior)
        if fused_posterior_enabled():
            fused = fused_sample_posterior(self, num_samples)
            if fused is not None:
                if self._args.mode_repair:
                    self._start_repair_snapshot(fused, num_samples)
                if timer is not None:
                    timer.append(time.time() - start)
                return fused
        stack = [self._physical_bayes_tree.root]
        samples: Dict[Variable, np.ndarray] = {}
        while stack:
            clique = stack.pop()
            frontal_list = sorted(
                clique.frontal, key=lambda v: self._reverse_ordering_map[v])
            separator_list = sorted(
                clique.separator,
                key=lambda v: self._reverse_ordering_map[v])
            model = self._clique_density_model[clique]
            obs = self._clique_true_obs[clique]

            # stay on device for the whole root->leaf pass: per-clique host
            # conversions would force a sync per clique (Plaza-scale trees
            # have hundreds)
            import jax.numpy as jnp
            blocks = []
            if len(obs) != 0:
                blocks.append(jnp.broadcast_to(
                    jnp.asarray(obs, dtype=jnp.float32),
                    (num_samples, len(obs))))
            for v in separator_list:
                blocks.append(jnp.asarray(samples[v], dtype=jnp.float32))
            aug = jnp.concatenate(blocks, axis=1) if blocks else None

            if aug is not None and aug.shape[1] != 0:
                frontal = model.conditional_sample_given_observation(
                    conditional_dim=clique.frontal_dim, obs_samples=aug)
            else:
                frontal = model.conditional_sample_given_observation(
                    conditional_dim=clique.frontal_dim,
                    sample_number=num_samples)
            cur = 0
            for v in frontal_list:
                samples[v] = frontal[:, cur:cur + v.dim]
                cur += v.dim
            # canonical child order: key consumption must match the fused
            # pass and be hash-seed-independent (multi-host determinism)
            stack.extend(sorted(clique.children, key=str))
        if timer is not None:
            timer.append(time.time() - start)
        return samples

    def results(self):
        return list(self._samples.values()), list(self._samples.keys())

    def training_losses(self) -> Dict[str, List[float]]:
        """Materialize the per-clique training-loss curves (device->host).
        Curves are held as lazy device handles during the solve so the hot
        path never blocks on tunnel round trips."""
        out: Dict[str, List[float]] = {}
        for name, val in self._temp_training_loss.items():
            if isinstance(val, tuple):
                iter_loss, n_iters = val
                out[name] = [float(l)
                             for l in np.asarray(iter_loss)[:int(n_iters)]]
            else:
                out[name] = [float(l) for l in val]
        return out
