"""Incremental NF-iSAM on the case1 range-SLAM graph (6 SE(2) poses,
2 landmarks, 8 range factors) — the reference's headline example
(``example/slam/small_range_gaussian_problem/run_nfisam.py``) with the
journal-paper configuration."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))


from nfisam_tpu.io import (graph_file_parser,
                           group_nodes_factors_incrementally)
from nfisam_tpu.solver import NFiSAM, NFiSAMArgs, run_incrementally

HERE = os.path.dirname(os.path.abspath(__file__))
FG = os.path.join(HERE, "..", "..", "data", "case1_factor_graph.fg")

if __name__ == "__main__":
    nodes, truth, factors = graph_file_parser(FG, "fg")
    batches = group_nodes_factors_incrementally(nodes, factors,
                                                incremental_step=1)
    args = NFiSAMArgs(posterior_sample_num=1000, local_sample_num=2000,
                      flow_iterations=2000, num_knots=9,
                      learning_rate=0.025, hidden_dim=8,
                      elimination_method="pose_first", seed=0)
    run_dir = run_incrementally(HERE, NFiSAM(args), batches, truth,
                                plot_args={})
    print("artifacts:", run_dir)
