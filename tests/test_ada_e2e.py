"""End-to-end ambiguous-data-association inference on the case1_da graph
(the reference's journal-paper DA experiment: posterior hypothesis weights
must resolve the associations; ``FactorGraphSolver.py:913-933``)."""
import numpy as np

from nfisam_tpu.factors import BinaryFactorMixture
from nfisam_tpu.io import (graph_file_parser,
                           group_nodes_factors_incrementally)
from nfisam_tpu.solver import NFiSAM, NFiSAMArgs


def test_case1_da_hypothesis_weights_resolve():
    nodes, truth, factors = graph_file_parser(
        "data/case1_da_factor_graph.fg", "fg")
    batches = group_nodes_factors_incrementally(nodes, factors,
                                                incremental_step=None)
    args = NFiSAMArgs(posterior_sample_num=500, local_sample_num=1000,
                      flow_iterations=500, num_knots=8,
                      learning_rate=0.025, elimination_method="pose_first",
                      seed=0)
    solver = NFiSAM(args)
    mixtures = []
    for ns, fs in batches:
        for n in ns:
            solver.add_node(n)
        for f in fs:
            solver.add_factor(f)
            if isinstance(f, BinaryFactorMixture):
                mixtures.append(f)
        solver.update_physical_and_working_graphs()
        samples = solver.incremental_inference()

    assert len(mixtures) == 4
    # poses stay well localized despite the ambiguity
    for v, s in samples.items():
        if str(v.name).startswith("X"):
            err = np.linalg.norm(np.asarray(s).mean(0)[:2] - truth[v][:2])
            assert err < 3.0, (v.name, err)
    # hypothesis weights: X1 observes L1; X4 observes L2 (ground truth)
    by_observer = {str(f.observer_var.name): f for f in mixtures}
    w1 = by_observer["X1"].posterior_weights(samples)
    w4 = by_observer["X4"].posterior_weights(samples)
    names1 = [str(v.name) for v in by_observer["X1"].observed_vars]
    names4 = [str(v.name) for v in by_observer["X4"].observed_vars]
    assert w1[names1.index("L1")] > 0.7
    assert w4[names4.index("L2")] > 0.7
