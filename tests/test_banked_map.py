"""Banked incremental MAP (``solver/banked_joint.py``) vs the round-3
batch LM baseline (``solver/map_solver.py``): same graphs, same MAP.

The banked solver is the scale-capable ISAM2-analog (reference
``gtsam_solution.cpp:18``): factor-type banks + pow-2 buckets + matrix-free
LM-CG + warm starts.  These tests pin it to the existing solver on graphs
small enough for the per-factor-traced baseline."""
import numpy as np
import pytest

from nfisam_tpu.io import (graph_file_parser,
                           group_nodes_factors_incrementally)
from nfisam_tpu.solver.banked_joint import (IncMAPConfig,
                                            IncrementalGaussNewtonMAP)
from nfisam_tpu.solver.map_solver import GaussNewtonMAP

CASE1 = "/root/repo/data/case1_factor_graph.fg"
LAWNMOWER = "/root/repo/data/lawnmower_4x4_factor_graph.fg"


def _compare(nodes, factors, atol=0.08):
    ref = GaussNewtonMAP(nodes, factors)
    x_ref, _, _, _ = ref.solve()
    ref_est = ref.results()

    m = IncrementalGaussNewtonMAP()
    m.update(nodes, factors)
    m.solve()
    est = m.results()
    for v in nodes:
        d = np.linalg.norm(est[v][:2] - ref_est[v][:2])
        assert d < atol, f"{v.name}: banked {est[v][:2]} vs " \
                         f"LM-ref {ref_est[v][:2]} (d={d:.3f})"
    return m


def test_banked_matches_batch_map_case1():
    nodes, truth, factors = graph_file_parser(CASE1, "fg")
    m = _compare(nodes, factors)
    # case1 measurements are self-consistent: MAP == stored truth
    est = m.results()
    for v, t in truth.items():
        assert np.linalg.norm(est[v][:2] - np.asarray(t)[:2]) < 0.05


def test_banked_matches_batch_map_with_mixtures():
    """lawnmower_4x4 has ambiguous-DA range mixtures; both solvers model
    them as smooth log-sum-exp densities and must agree."""
    nodes, truth, factors = graph_file_parser(LAWNMOWER, "fg")
    _compare(nodes, factors, atol=0.15)


def test_incremental_warm_start_matches_batch():
    """Feeding the graph step by step with warm-started re-solves must
    land on the batch MAP, with warm steps converging in few LM iters."""
    nodes, truth, factors = graph_file_parser(CASE1, "fg")
    batches = group_nodes_factors_incrementally(nodes, factors,
                                                incremental_step=1)
    m = IncrementalGaussNewtonMAP(IncMAPConfig(warm_max_iters=12))
    warm_iters = []
    for ns, fs in batches:
        m.update(ns, fs)
        m.solve()
        warm_iters.append(m.last_iterations)

    ref = GaussNewtonMAP(nodes, factors)
    ref.solve()
    ref_est = ref.results()
    est = m.results()
    for v in nodes:
        assert np.linalg.norm(est[v][:2] - ref_est[v][:2]) < 0.08
    # warm-started steps must be cheap (the flat-floor property)
    assert max(warm_iters[1:]) <= 12
