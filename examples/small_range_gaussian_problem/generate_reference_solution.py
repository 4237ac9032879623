"""Nested-sampling ground truth for case1, step by step (the reference's
``icra_paper/generate_reference_solution.py`` /
``dynesty_run_batch`` role)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))


import numpy as np

from nfisam_tpu.io import (graph_file_parser,
                           group_nodes_factors_incrementally)
from nfisam_tpu.samplers import GlobalNestedSampler

HERE = os.path.dirname(os.path.abspath(__file__))
FG = os.path.join(HERE, "..", "..", "data", "case1_factor_graph.fg")

if __name__ == "__main__":
    nodes, truth, factors = graph_file_parser(FG, "fg")
    batches = group_nodes_factors_incrementally(nodes, factors,
                                                incremental_step=1)
    out_dir = os.path.join(HERE, "ns_reference")
    os.makedirs(out_dir, exist_ok=True)
    vs, fs = [], []
    for step, (ns_, fs_) in enumerate(batches):
        vs += ns_
        fs += fs_
        sampler = GlobalNestedSampler(nodes=vs, factors=fs)
        summary = {}
        samples = sampler.sample(live_points=1000, res_summary=summary)
        np.savetxt(os.path.join(out_dir, f"step{step}.sample"), samples)
        with open(os.path.join(out_dir, f"step{step}_ordering"), "w") as f:
            f.write(" ".join(str(v.name) for v in vs))
        print(f"step {step}: {samples.shape[0]} samples, {summary}")
