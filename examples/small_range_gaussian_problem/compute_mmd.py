"""Joint and per-marginal MMD of a solver run against the nested-sampling
reference (the reference's ``icra_paper/compute_mmd.py:101-149`` protocol:
RBF kernel, 500-sample subsets, translation dims)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))


import numpy as np

from nfisam_tpu.eval import mmd
from nfisam_tpu.io import graph_file_parser

HERE = os.path.dirname(os.path.abspath(__file__))
FG = os.path.join(HERE, "..", "..", "data", "case1_factor_graph.fg")


def translation_columns(mat, order, name2var, names):
    cur, pos = 0, {}
    for n in order:
        pos[n] = cur
        cur += name2var[n].dim
    return np.hstack([mat[:, pos[n]:pos[n] + 2] for n in names])


def main(run_prefix, ref_prefix, subset=500, seed=0):
    nodes, truth, factors = graph_file_parser(FG, "fg")
    name2var = {str(v.name): v for v in nodes}
    run = np.loadtxt(run_prefix)
    run_order = open(run_prefix + "_ordering").read().split()
    ref = np.loadtxt(ref_prefix + ".sample")
    ref_order = open(ref_prefix + "_ordering").read().split()
    rng = np.random.default_rng(seed)

    def pick(A):
        return A[rng.choice(len(A), min(subset, len(A)), replace=False)]

    joint_run = translation_columns(run, run_order, name2var, ref_order)
    joint_ref = translation_columns(ref, ref_order, name2var, ref_order)
    print("joint MMD:", mmd(pick(joint_run), pick(joint_ref)))
    for n in ref_order:
        a = translation_columns(run, run_order, name2var, [n])
        b = translation_columns(ref, ref_order, name2var, [n])
        print(f"  {n}: {mmd(pick(a), pick(b)):.4f}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
