"""End-to-end solver tests (reference models:
``tests/test_displacement_gaussian_factor_graph.py`` — analytic
linear-Gaussian oracle — and ``tests/test_slam_model_structure.py`` smoke).

Small configs keep runtime modest; quality asserts are posterior-moment
checks against closed forms / ground truth."""
import os

import jax
import numpy as np
import pytest

from nfisam_tpu.core import R2Variable, SE2Variable, VariableType
from nfisam_tpu.factors import (R2RelativeGaussianLikelihoodFactor,
                                SE2RelativeGaussianLikelihoodFactor,
                                SE2R2RangeGaussianLikelihoodFactor,
                                UnaryR2GaussianPriorFactor,
                                UnarySE2ApproximateGaussianPriorFactor)
from nfisam_tpu.solver import NFiSAM, NFiSAMArgs


def _linear_gaussian_chain(n=3, sigma=0.5):
    """R2 chain: prior on X0, displacement factors. Posterior is Gaussian
    with known marginal means (sum of displacements) — closed-form oracle."""
    xs = [R2Variable(f"X{i}") for i in range(n)]
    cov = np.eye(2) * sigma ** 2
    factors = [UnaryR2GaussianPriorFactor(xs[0], np.zeros(2),
                                          covariance=cov)]
    disp = np.array([1.0, 2.0])
    for a, b in zip(xs, xs[1:]):
        factors.append(R2RelativeGaussianLikelihoodFactor(
            a, b, disp, covariance=cov))
    return xs, factors, disp


def test_linear_gaussian_chain_posterior_matches_closed_form():
    xs, factors, disp = _linear_gaussian_chain(3, sigma=0.5)
    args = NFiSAMArgs(posterior_sample_num=2000, local_sample_num=2000,
                      flow_iterations=400, num_knots=8, learning_rate=0.03,
                      elimination_method="natural", seed=1)
    solver = NFiSAM(args)
    for x in xs:
        solver.add_node(x)
    for f in factors:
        solver.add_factor(f)
    solver.update_physical_and_working_graphs()
    samples = solver.incremental_inference()
    # marginal mean of X_k is k * disp; marginal cov is (k+1) * sigma^2 I
    for k, x in enumerate(xs):
        s = np.asarray(samples[x])
        np.testing.assert_allclose(s.mean(0), k * disp, atol=0.25)
        want_var = (k + 1) * 0.25
        np.testing.assert_allclose(s.var(0), want_var, rtol=0.5)


def test_incremental_equals_batch_structure():
    """Incremental updates keep every variable sampled and recycle models."""
    xs = [SE2Variable(f"X{i}") for i in range(4)]
    lm = R2Variable("L1", VariableType.Landmark)
    cov3 = np.diag([0.01, 0.01, 0.001])
    prior = UnarySE2ApproximateGaussianPriorFactor(
        xs[0], np.array([0.0, 0.0, 0.0]), cov3)
    odos = [SE2RelativeGaussianLikelihoodFactor(
        a, b, np.array([5.0, 0.0, 0.0]), cov3)
        for a, b in zip(xs, xs[1:])]
    ranges = [SE2R2RangeGaussianLikelihoodFactor(xs[i], lm, 7.0, 0.3)
              for i in (0, 2, 3)]

    args = NFiSAMArgs(posterior_sample_num=300, local_sample_num=500,
                      flow_iterations=200, num_knots=6, learning_rate=0.03,
                      elimination_method="pose_first", seed=2)
    solver = NFiSAM(args)
    steps = [
        ([xs[0], lm], [prior, ranges[0]]),
        ([xs[1]], [odos[0]]),
        ([xs[2]], [odos[1], ranges[1]]),
        ([xs[3]], [odos[2], ranges[2]]),
    ]
    n_models_after = []
    for ns, fs in steps:
        for n in ns:
            solver.add_node(n)
        for f in fs:
            solver.add_factor(f)
        solver.update_physical_and_working_graphs()
        samples = solver.incremental_inference()
        n_models_after.append(len(solver._clique_density_model))
        assert set(samples.keys()) == set(solver.physical_vars)
    # tree grows; models accumulate but stale ones are dropped
    assert n_models_after[-1] >= 2
    # all sample blocks have the right shape
    for v, s in samples.items():
        assert np.asarray(s).shape == (300, v.dim)


def test_posterior_respects_range_constraint():
    """A pose chain with a range to a landmark: posterior ranges should
    concentrate near the measured value."""
    x0 = SE2Variable("X0")
    lm = R2Variable("L1", VariableType.Landmark)
    cov3 = np.diag([0.01, 0.01, 0.001])
    args = NFiSAMArgs(posterior_sample_num=500, local_sample_num=1500,
                      flow_iterations=500, num_knots=9, learning_rate=0.03,
                      elimination_method="pose_first", seed=3)
    solver = NFiSAM(args)
    solver.add_node(x0)
    solver.add_node(lm)
    solver.add_factor(UnarySE2ApproximateGaussianPriorFactor(
        x0, np.zeros(3), cov3))
    solver.add_factor(SE2R2RangeGaussianLikelihoodFactor(x0, lm, 10.0, 0.5))
    solver.update_physical_and_working_graphs()
    samples = solver.incremental_inference()
    pose = np.asarray(samples[x0])
    lmk = np.asarray(samples[lm])
    r = np.linalg.norm(lmk - pose[:, :2], axis=1)
    assert abs(r.mean() - 10.0) < 0.5
    assert r.std() < 1.5


def test_nested_clique_training_path():
    """local_sampling_method='nested' routes clique training samples
    through the nested sampler (reference FactorGraphSolver.py:488-492)."""
    xs = [R2Variable(f"X{i}") for i in range(2)]
    cov = np.eye(2) * 0.25
    args = NFiSAMArgs(posterior_sample_num=200, local_sample_num=300,
                      flow_iterations=150, num_knots=6, learning_rate=0.03,
                      elimination_method="natural", seed=7,
                      local_sampling_method="nested")
    solver = NFiSAM(args)
    for x in xs:
        solver.add_node(x)
    solver.add_factor(UnaryR2GaussianPriorFactor(xs[0], np.zeros(2),
                                                 covariance=cov))
    solver.add_factor(R2RelativeGaussianLikelihoodFactor(
        xs[0], xs[1], np.array([1.0, 1.0]), covariance=cov))
    # extra prior closes a loop -> clique joint needs the NS path
    solver.add_factor(UnaryR2GaussianPriorFactor(
        xs[1], np.array([1.2, 1.0]), covariance=cov))
    solver.update_physical_and_working_graphs()
    samples = solver.incremental_inference()
    m1 = np.asarray(samples[xs[1]]).mean(0)
    assert np.linalg.norm(m1 - np.array([1.1, 1.0])) < 0.3


def test_training_losses_lazy_materialization():
    """Loss curves stay on device during the solve and materialize via
    solver.training_losses(); curves must be finite, non-empty, and
    truncated at the early-stop iteration."""
    xs, factors, disp = _linear_gaussian_chain(3, sigma=0.5)
    args = NFiSAMArgs(posterior_sample_num=200, local_sample_num=500,
                      flow_iterations=300, num_knots=8, learning_rate=0.03,
                      elimination_method="natural", seed=1)
    solver = NFiSAM(args)
    for x in xs:
        solver.add_node(x)
    for f in factors:
        solver.add_factor(f)
    solver.update_physical_and_working_graphs()
    solver.incremental_inference()
    # still lazy device handles
    assert all(isinstance(v, tuple)
               for v in solver._temp_training_loss.values())
    losses = solver.training_losses()
    assert losses
    for name, curve in losses.items():
        assert 0 < len(curve) <= 300
        assert all(np.isfinite(curve))
        # training should reduce NLL from the start to the minimum
        assert min(curve) < curve[0]


def test_delayed_kway_factor_on_recycled_chain():
    """Regression (round 5): a k-way DA factor released AFTER its
    observer pose is deep in the tree dismantles a RUN of pose cliques;
    recycling them leaf-to-root must not leave the child's odometry
    factor dangling on an eliminated frontal (was: KeyError on the
    observer's neighbor pose, lexical recycle order).  Models the
    defer_ambiguous stream on the scale workload at minimum size."""
    from nfisam_tpu.factors.mixtures import AmbiguousDataAssociationFactor

    xs = [SE2Variable(f"X{i}") for i in range(10)]
    ls = [R2Variable(f"L{i}", VariableType.Landmark) for i in range(2)]
    cov = np.diag([0.01, 0.01, 0.001])
    args = NFiSAMArgs(posterior_sample_num=150, local_sample_num=200,
                      flow_iterations=20, num_knots=5, hidden_dim=4,
                      learning_rate=0.02, elimination_method="pose_first",
                      seed=0)
    solver = NFiSAM(args)
    solver.add_node(xs[0])
    for lm in ls:
        solver.add_node(lm)
    solver.add_factor(UnarySE2ApproximateGaussianPriorFactor(
        xs[0], np.array([0.0, 0.0, 0.0]), cov))
    for lm, pos in zip(ls, ([5.0, 5.0], [5.0, -5.0])):
        solver.add_factor(UnaryR2GaussianPriorFactor(
            lm, np.array(pos), covariance=np.eye(2) * 0.3))
    solver.update_physical_and_working_graphs()
    solver.incremental_inference()
    for i in range(1, 10):
        solver.add_node(xs[i])
        solver.add_factor(SE2RelativeGaussianLikelihoodFactor(
            xs[i - 1], xs[i], np.array([1.0, 0.0, 0.0]), cov))
        if i == 8:
            # released 6 steps after its observer X2 was committed:
            # dismantles the X2..X8 clique chain in one step
            solver.add_factor(AmbiguousDataAssociationFactor(
                observer_var=xs[2], observed_vars=ls, weights=[0.5, 0.5],
                binary_factor_class=SE2R2RangeGaussianLikelihoodFactor,
                observation=np.array([5.5]), sigma=0.4))
        solver.update_physical_and_working_graphs()
        samples = solver.incremental_inference()
    got = {str(v.name) for v in samples}
    assert got == {str(v.name) for v in xs} | {str(v.name) for v in ls}
    for v, s in samples.items():
        assert np.all(np.isfinite(np.asarray(s)))
