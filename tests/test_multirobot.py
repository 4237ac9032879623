"""Multi-robot incremental grouping + solve (reference
``multirbt_group_nodes_factors_incrementally`` RunBatch.py:226)."""
import numpy as np

from nfisam_tpu.core import R2Variable, SE2Variable, VariableType
from nfisam_tpu.factors import (SE2R2RangeGaussianLikelihoodFactor,
                                SE2RelativeGaussianLikelihoodFactor,
                                UnarySE2ApproximateGaussianPriorFactor)
from nfisam_tpu.io import group_nodes_factors_incrementally
from nfisam_tpu.solver import NFiSAM, NFiSAMArgs


def _two_robot_graph(T=3):
    cov3 = np.diag([0.01, 0.01, 0.001])
    lm = R2Variable("L1", VariableType.Landmark)
    vars_, fs = [], []
    for rid, y0 in (("A", 0.0), ("B", 10.0)):
        xs = [SE2Variable(f"{rid}{t}") for t in range(T)]
        vars_ += xs
        fs.append(UnarySE2ApproximateGaussianPriorFactor(
            xs[0], np.array([0.0, y0, 0.0]), cov3))
        for a, b in zip(xs, xs[1:]):
            fs.append(SE2RelativeGaussianLikelihoodFactor(
                a, b, np.array([5.0, 0.0, 0.0]), cov3))
        fs.append(SE2R2RangeGaussianLikelihoodFactor(xs[-1], lm, 5.0, 0.4))
    vars_.append(lm)
    return vars_, fs, lm


def test_multirobot_grouping_interleaves_time_steps():
    vars_, fs, lm = _two_robot_graph()
    batches = group_nodes_factors_incrementally(vars_, fs,
                                                incremental_step=1)
    assert len(batches) == 3
    # each time step contains both robots' poses
    names0 = {str(v.name) for v in batches[0][0]}
    assert names0 == {"A0", "B0"}
    names1 = {str(v.name) for v in batches[1][0]}
    assert names1 == {"A1", "B1"}
    # the shared landmark enters with the first factor that observes it
    all_grouped = [v for b in batches for v in b[0]]
    assert lm in all_grouped
    assert sum(len(b[1]) for b in batches) == len(fs)


def test_multirobot_incremental_solve():
    vars_, fs, lm = _two_robot_graph()
    batches = group_nodes_factors_incrementally(vars_, fs,
                                                incremental_step=1)
    solver = NFiSAM(NFiSAMArgs(posterior_sample_num=300,
                               local_sample_num=600, flow_iterations=200,
                               num_knots=6, learning_rate=0.03,
                               elimination_method="pose_first", seed=6))
    for (ns, fs_) in batches:
        for n in ns:
            solver.add_node(n)
        for f in fs_:
            solver.add_factor(f)
        solver.update_physical_and_working_graphs()
        samples = solver.incremental_inference()
    assert set(samples) == set(vars_)
    a2 = np.asarray(samples[[v for v in vars_
                             if str(v.name) == "A2"][0]]).mean(0)
    b2 = np.asarray(samples[[v for v in vars_
                             if str(v.name) == "B2"][0]]).mean(0)
    assert abs(a2[0] - 10.0) < 1.0 and abs(a2[1] - 0.0) < 1.5
    assert abs(b2[0] - 10.0) < 1.0 and abs(b2[1] - 10.0) < 1.5
    # landmark consistent with both robots' ranges
    lmk = np.asarray(samples[lm])
    r_a = np.linalg.norm(lmk - a2[:2], axis=1)
    assert abs(r_a.mean() - 5.0) < 1.0
