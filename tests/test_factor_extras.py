"""Tests for the less-common factor types: slip-grip odometry, uncertain
range, bearing, SE2 mixture prior."""
import jax
import numpy as np
import pytest

from nfisam_tpu.core import R2Variable, SE2Variable, VariableType
from nfisam_tpu.core import geometry as g
import jax.numpy as jnp
from nfisam_tpu.factors import (RelativeGaussianSlipGripSE2Factor,
                                SE2BearingLikelihoodFactor,
                                UncertainR2RangeGaussianLikelihoodFactor,
                                UnarySE2ApproximateGaussianMixturePriorFactor)

KEY = jax.random.PRNGKey(0)


def test_slip_grip_mixture_sampling():
    x0, x1 = SE2Variable("X0"), SE2Variable("X1")
    cov = np.diag([0.001, 0.001, 0.0001])
    f = RelativeGaussianSlipGripSE2Factor(
        x0, x1, np.array([5.0, 0.0, 0.0]), cov, prob_slip=0.3)
    base = np.tile([[0.0, 0.0, 0.0]], (6000, 1))
    v2 = np.asarray(f.sample(KEY, var1=base))
    moved = v2[:, 0] > 2.5
    # ~70% grip (moved ~5m), ~30% slip (stayed near 0)
    assert 0.62 < moved.mean() < 0.78
    assert np.allclose(v2[moved, 0].mean(), 5.0, atol=0.1)
    assert np.allclose(v2[~moved, 0].mean(), 0.0, atol=0.1)
    # density is bimodal: slip and grip modes both more likely than between
    x_grip = np.array([[0, 0, 0, 5.0, 0, 0]])
    x_slip = np.array([[0, 0, 0, 0.0, 0, 0]])
    x_mid = np.array([[0, 0, 0, 2.5, 0, 0]])
    assert float(f.log_pdf(x_grip)[0]) > float(f.log_pdf(x_mid)[0])
    assert float(f.log_pdf(x_slip)[0]) > float(f.log_pdf(x_mid)[0])


def test_uncertain_range_fused_distribution():
    x0 = SE2Variable("X0")
    l1 = R2Variable("L1", VariableType.Landmark)
    f = UncertainR2RangeGaussianLikelihoodFactor(
        x0, l1, observation=10.0, sigma=1.0, observed_flag=True,
        unobserved_sigma=0.5)
    # fused moments per arXiv:1812.02609 product form
    s2, u2 = 1.0, 0.25
    want_mu = u2 * 10.0 / (s2 + u2)
    want_var = s2 * u2 / (s2 + u2)
    assert np.isclose(f.fused_mu, want_mu)
    assert np.isclose(f.fused_var, want_var)
    base = np.tile([[0.0, 0.0, 0.0]], (4000, 1))
    lmk = np.asarray(f.sample(KEY, var1=base))
    r = np.linalg.norm(lmk, axis=1)
    assert abs(r.mean() - want_mu) < 0.1
    assert abs(r.std() - np.sqrt(want_var)) < 0.1
    # unobserved miss model: loglike increases with distance
    f2 = UncertainR2RangeGaussianLikelihoodFactor(
        x0, l1, observation=10.0, sigma=1.0, observed_flag=False,
        unobserved_sigma=0.5)
    ll_near = float(f2.evaluate_loglike(np.array([0, 0, 0, 0.1, 0.0])))
    ll_far = float(f2.evaluate_loglike(np.array([0, 0, 0, 5.0, 0.0])))
    assert ll_far > ll_near


def test_bearing_factor_sampling_and_density():
    x0, x1 = SE2Variable("X0"), SE2Variable("X1")
    f = SE2BearingLikelihoodFactor(x0, x1, observation=np.pi / 4,
                                   sigma=0.02, min_range=1.0,
                                   max_range=3.0)
    base = np.tile([[0.0, 0.0, 0.0]], (4000, 1))
    v2 = np.asarray(f.sample(KEY, var1=base))
    r = np.linalg.norm(v2[:, :2], axis=1)
    assert np.all(r > 0.9) and np.all(r < 3.1)
    # headings concentrate at the observed bearing
    th = v2[:, 2]
    assert abs(np.angle(np.exp(1j * th).mean()) - np.pi / 4) < 0.05
    # observation sampling: bearing = theta2 - theta1 + noise
    obs = np.asarray(f.sample(KEY, var1=base, var2=v2))
    assert abs(obs.mean() - np.pi / 4) < 0.05
    lp_good = float(f.log_pdf(
        np.array([[0, 0, 0.0, 1, 1, np.pi / 4]]))[0])
    lp_bad = float(f.log_pdf(
        np.array([[0, 0, 0.0, 1, 1, np.pi / 2]]))[0])
    assert lp_good > lp_bad


def test_se2_mixture_prior_bimodal():
    x0 = SE2Variable("X0")
    poses = [np.array([0.0, 0.0, 0.0]), np.array([10.0, 0.0, np.pi / 2])]
    covs = [np.diag([0.01, 0.01, 0.001])] * 2
    f = UnarySE2ApproximateGaussianMixturePriorFactor(
        x0, poses, [0.5, 0.5], covs)
    s = np.asarray(f.sample(KEY, 4000))
    near0 = np.linalg.norm(s[:, :2], axis=1) < 1
    near1 = np.linalg.norm(s[:, :2] - np.array([10.0, 0.0]), axis=1) < 1
    assert near0.sum() + near1.sum() == 4000
    assert 0.42 < near0.mean() < 0.58
    lp = np.asarray(f.log_pdf(np.array(
        [[0, 0, 0], [10, 0, np.pi / 2], [5, 0, 0]])))
    assert lp[0] > lp[2] and lp[1] > lp[2]
    g0 = np.asarray(f.grad_x_log_pdf(np.array([[0.05, 0.0, 0.0]])))[0]
    assert g0[0] < 0  # pulled back toward the first mode
