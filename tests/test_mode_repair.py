"""Evidence-aware recycling (mode repair): when new range evidence
contradicts the ENTIRE committed posterior of a landmark, the solver must
force re-elimination of every clique containing it (frontal OR separator)
instead of recycling — the flow-path analog of the banked MAP's >4-sigma
mode-escape re-scoring (``solver/banked_joint.py``), closing the r4
VERDICT flow-vs-MAP repair gap.  The reference recycles purely
structurally (``FactorGraphSolver.py:309-349``) and cannot do this."""
import numpy as np

from nfisam_tpu.core import R2Variable, SE2Variable, VariableType
from nfisam_tpu.factors import (SE2R2RangeGaussianLikelihoodFactor,
                                SE2RelativeGaussianLikelihoodFactor,
                                UnaryR2GaussianPriorFactor,
                                UnarySE2ApproximateGaussianPriorFactor)
from nfisam_tpu.parallel.scheduler import ParallelNFiSAM
from nfisam_tpu.solver import NFiSAMArgs


COV3 = np.diag([0.01, 0.01, 0.001])


def _graph():
    """True L1 = (4, 0); the landmark prior is biased to (-4, 0) so the
    step-1 posterior (prior x radius-4 ring around X0) deterministically
    commits to the WRONG mirror mode.  Step 2 drives to (3, 0) and
    measures range 1.0 to L1 — consistent with (4, 0), ~19 sigma off the
    committed (-4, 0) mode."""
    x0, x1 = SE2Variable("X0"), SE2Variable("X1")
    l1 = R2Variable("L1", VariableType.Landmark)
    step1 = (
        [x0, l1],
        [UnarySE2ApproximateGaussianPriorFactor(x0, np.zeros(3), COV3),
         UnaryR2GaussianPriorFactor(l1, np.array([-4.0, 0.0]),
                                    covariance=np.eye(2) * 4.0),
         SE2R2RangeGaussianLikelihoodFactor(x0, l1, 4.0, 0.3)])
    step2 = (
        [x1],
        [SE2RelativeGaussianLikelihoodFactor(
            x0, x1, np.array([3.0, 0.0, 0.0]), COV3),
         SE2R2RangeGaussianLikelihoodFactor(x1, l1, 1.0, 0.3)])
    return l1, [step1, step2]


def _solve(mode_repair):
    l1, steps = _graph()
    args = NFiSAMArgs(posterior_sample_num=500, local_sample_num=2000,
                      flow_iterations=600, num_knots=6, hidden_dim=8,
                      learning_rate=0.03, elimination_method="pose_first",
                      seed=0, mode_repair=mode_repair)
    solver = ParallelNFiSAM(args)
    for ns, fs in steps:
        for n in ns:
            solver.add_node(n)
        for f in fs:
            solver.add_factor(f)
        solver.update_physical_and_working_graphs()
        samples = solver.incremental_inference()
        # land the repair snapshot deterministically (production runs
        # overlap it with the next step's host work)
        th = getattr(solver, "_snapshot_thread", None)
        if th is not None:
            th.join(timeout=10)
    return solver, {str(v.name): np.asarray(s) for v, s in samples.items()}


def test_step1_commits_wrong_mode_and_repair_triggers():
    solver, samples = _solve(mode_repair=True)
    # the contradiction was detected and logged exactly on the landmark
    assert solver.mode_repair_log == ["L1"], solver.mode_repair_log
    # after repair the posterior explains the new range: |X1 - L1| near 1
    # (the retraining draws L1 from the biased prior, so the conditional
    # extrapolates — 1.6 measured; the gate catches staying at the wrong
    # mode, which reads ~7)
    d = np.linalg.norm(samples["X1"][:, :2] - samples["L1"], axis=1)
    assert np.median(d) < 2.5, np.median(d)
    # and the landmark sits in the true half-plane, not the prior's
    assert np.mean(samples["L1"][:, 0] > 0) > 0.9


def test_deep_prune_reaches_separator_only_cliques():
    """``prune_affected(touched, deep={L})`` must mark cliques holding L
    only in their SEPARATOR (descendants of L's frontal clique) — the
    frontal-only rule cannot reach them, and their flows' trained
    support is the wrong region after a mode flip."""
    from nfisam_tpu.graph.bayes_tree import BayesTree, CliqueNode

    l1 = R2Variable("L1", VariableType.Landmark)
    xs = [SE2Variable(f"X{i}") for i in range(4)]
    # chain: root {L1} <- {X3 | L1} <- {X2 | X3, L1} <- {X1 | X2} <- {X0 | X1}
    root = CliqueNode({l1})
    c3 = CliqueNode({xs[3]}, {l1})
    c2 = CliqueNode({xs[2]}, {xs[3], l1})
    c1 = CliqueNode({xs[1]}, {xs[2]})
    c0 = CliqueNode({xs[0]}, {xs[1]})
    root.attach_child(c3)
    c3.attach_child(c2)
    c2.attach_child(c1)
    c1.attach_child(c0)
    tree = BayesTree(root=root)

    # frontal-only: touching X3 affects {X3} and the root; c2 (L1 in
    # separator) survives as a detached subtree
    affected, detached = tree.prune_affected({xs[3]})
    assert xs[2] not in affected
    # deep repair on L1: every clique CONTAINING L1 is affected — c2's
    # vars join the re-elimination set, and only the L1-free tail
    # {X1},{X0} is detached for recycling
    affected_d, detached_d = tree.prune_affected({xs[3]}, deep={l1})
    assert xs[2] in affected_d and xs[3] in affected_d and l1 in affected_d
    assert xs[1] not in affected_d and xs[0] not in affected_d
    det_roots = {frozenset(t.root.frontal) for t in detached_d}
    assert det_roots == {frozenset({xs[1]})}


def test_no_repair_on_consistent_evidence():
    """A stream whose new ranges agree with the committed posterior must
    never trigger repair (case1-style consistency)."""
    x0, x1 = SE2Variable("X0"), SE2Variable("X1")
    l1 = R2Variable("L1", VariableType.Landmark)
    steps = [
        ([x0, l1],
         [UnarySE2ApproximateGaussianPriorFactor(x0, np.zeros(3), COV3),
          UnaryR2GaussianPriorFactor(l1, np.array([4.0, 0.0]),
                                     covariance=np.eye(2) * 1.0),
          SE2R2RangeGaussianLikelihoodFactor(x0, l1, 4.0, 0.3)]),
        ([x1],
         [SE2RelativeGaussianLikelihoodFactor(
             x0, x1, np.array([3.0, 0.0, 0.0]), COV3),
          SE2R2RangeGaussianLikelihoodFactor(x1, l1, 1.0, 0.3)]),
    ]
    args = NFiSAMArgs(posterior_sample_num=400, local_sample_num=1500,
                      flow_iterations=400, num_knots=6, hidden_dim=8,
                      learning_rate=0.03, elimination_method="pose_first",
                      seed=0, mode_repair=True)
    solver = ParallelNFiSAM(args)
    for ns, fs in steps:
        for n in ns:
            solver.add_node(n)
        for f in fs:
            solver.add_factor(f)
        solver.update_physical_and_working_graphs()
        solver.incremental_inference()
        th = getattr(solver, "_snapshot_thread", None)
        if th is not None:
            th.join(timeout=10)
    assert solver.mode_repair_log == []
