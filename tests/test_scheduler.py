"""Wavefront scheduler tests: partition correctness and solver parity."""
import numpy as np

from nfisam_tpu.core import R2Variable, SE2Variable, VariableType
from nfisam_tpu.factors import (SE2R2RangeGaussianLikelihoodFactor,
                                SE2RelativeGaussianLikelihoodFactor,
                                UnarySE2ApproximateGaussianPriorFactor)
from nfisam_tpu.graph import BayesTree, CliqueNode
from nfisam_tpu.parallel import ParallelNFiSAM, wavefronts
from nfisam_tpu.solver import NFiSAM, NFiSAMArgs


def test_wavefronts_respect_dependencies():
    A, B, C, D, E = (SE2Variable(n) for n in "ABCDE")
    root = CliqueNode(frontal={E})
    c1 = CliqueNode(frontal={C}, separator={E})
    c2 = CliqueNode(frontal={D}, separator={E})
    c3 = CliqueNode(frontal={A}, separator={C})
    c4 = CliqueNode(frontal={B}, separator={C})
    root.attach_child(c1)
    root.attach_child(c2)
    c1.attach_child(c3)
    c1.attach_child(c4)
    tree = BayesTree(root=root)
    waves = wavefronts(tree.clique_ordering(), {})
    assert [len(w) for w in waves] == [3, 1, 1]
    assert set(waves[0]) == {c2, c3, c4}
    assert waves[1] == [c1]
    assert waves[2] == [root]


def test_wavefronts_skip_modeled():
    A, B = SE2Variable("A"), SE2Variable("B")
    root = CliqueNode(frontal={B})
    leaf = CliqueNode(frontal={A}, separator={B})
    root.attach_child(leaf)
    tree = BayesTree(root=root)
    waves = wavefronts(tree.clique_ordering(), {leaf: object()})
    assert [len(w) for w in waves] == [1]
    assert waves[0] == [root]


def _multi_robot_graph(R=2, T=3):
    vars_, fs = [], []
    cov3 = np.diag([0.01, 0.01, 0.001])
    for r in range(R):
        xs = [SE2Variable(f"{chr(65 + r)}{t}") for t in range(T)]
        lm = R2Variable(f"L{r}", VariableType.Landmark)
        vars_ += xs + [lm]
        fs.append(UnarySE2ApproximateGaussianPriorFactor(
            xs[0], np.array([20.0 * r, 0, 0]), cov3))
        for a, b in zip(xs, xs[1:]):
            fs.append(SE2RelativeGaussianLikelihoodFactor(
                a, b, np.array([5.0, 0, 0]), cov3))
        fs.append(SE2R2RangeGaussianLikelihoodFactor(xs[-1], lm, 5.0, 0.5))
    return vars_, fs


def test_parallel_solver_matches_sequential():
    vars_, fs = _multi_robot_graph()
    args = NFiSAMArgs(posterior_sample_num=300, local_sample_num=500,
                      flow_iterations=200, num_knots=6, learning_rate=0.03,
                      elimination_method="pose_first", seed=4)

    def run(cls):
        s = cls(args)
        for v in vars_:
            s.add_node(v)
        for f in fs:
            s.add_factor(f)
        s.update_physical_and_working_graphs()
        return s.incremental_inference()

    s_seq = run(NFiSAM)
    s_par = run(ParallelNFiSAM)
    assert set(s_seq) == set(s_par)
    for v in s_seq:
        m1 = np.asarray(s_seq[v]).mean(0)
        m2 = np.asarray(s_par[v]).mean(0)
        np.testing.assert_allclose(m1[:2], m2[:2], atol=1.0)
