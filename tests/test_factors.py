"""Factor-layer tests (reference model: ``tests/test_factor.py``):
densities match hand-assembled NumPy oracles; sampling is statistically
consistent with the declared noise models; gradients match autodiff /
finite differences; .fg text round-trips."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nfisam_tpu.factors as F
from nfisam_tpu.core import R2Variable, SE2Variable, VariableType
from nfisam_tpu.core import geometry as g

KEY = jax.random.PRNGKey(0)


def _vars():
    return (SE2Variable("X0"), SE2Variable("X1"),
            R2Variable("L1", VariableType.Landmark),
            R2Variable("L2", VariableType.Landmark))


# ---------------------------------------------------------------- R2 prior
def test_r2_gaussian_prior_log_pdf_oracle():
    _, _, l1, _ = _vars()
    mu = np.array([1.0, -2.0])
    cov = np.array([[0.5, 0.1], [0.1, 0.3]])
    f = F.UnaryR2GaussianPriorFactor(l1, mu, covariance=cov)
    x = np.random.default_rng(0).normal(size=(16, 2))
    delta = x - mu
    prec = np.linalg.inv(cov)
    expected = (-0.5 * np.einsum("ni,ij,nj->n", delta, prec, delta)
                - 0.5 * (2 * np.log(2 * np.pi) + np.log(np.linalg.det(cov))))
    np.testing.assert_allclose(np.asarray(f.log_pdf(x)), expected, rtol=1e-2, atol=1e-3)
    np.testing.assert_allclose(np.asarray(f.grad_x_log_pdf(x)),
                               -delta @ prec.T, rtol=1e-2, atol=1e-3)


def test_r2_prior_sampling_moments():
    _, _, l1, _ = _vars()
    mu = np.array([3.0, 4.0])
    cov = np.diag([0.25, 1.0])
    f = F.UnaryR2GaussianPriorFactor(l1, mu, covariance=cov)
    s = np.asarray(f.sample(KEY, 20000))
    np.testing.assert_allclose(s.mean(0), mu, atol=0.05)
    np.testing.assert_allclose(np.cov(s.T), cov, atol=0.05)


# ---------------------------------------------------------------- SE2 prior
def test_se2_prior_density_jacobian_correction():
    x0 = SE2Variable("X0")
    pose = np.array([0.0, 0.0, np.pi / 2])
    cov = np.diag([0.02, 0.01, 0.05])
    f = F.UnarySE2ApproximateGaussianPriorFactor(x0, pose, cov)
    x = np.asarray(f.sample(KEY, 8))
    # oracle: N(log(T0^-1 T); 0, cov) * |det dlog/dx|
    lp = np.asarray(f.log_pdf(x))
    inv_pose = np.asarray(g.se2_inverse(jnp.asarray(pose)))
    for i in range(x.shape[0]):
        dT = np.asarray(g.se2_compose(jnp.asarray(inv_pose),
                                      jnp.asarray(x[i])))
        v = np.asarray(g.se2_log(jnp.asarray(dT)))
        det = abs(float(g.se2_det_grad_logmap(jnp.asarray(dT))))
        prec = np.linalg.inv(cov)
        want = (-0.5 * v @ prec @ v
                - 0.5 * (3 * np.log(2 * np.pi) + np.log(np.linalg.det(cov)))
                + np.log(det))
        assert np.isclose(lp[i], want, rtol=1e-3, atol=1e-2)


def test_se2_prior_sample_mean():
    x0 = SE2Variable("X0")
    pose = np.array([1.0, 2.0, 0.5])
    cov = np.diag([0.01, 0.01, 0.01])
    f = F.UnarySE2ApproximateGaussianPriorFactor(x0, pose, cov)
    s = np.asarray(f.sample(KEY, 20000))
    np.testing.assert_allclose(s.mean(0)[:2], pose[:2], atol=0.02)
    assert abs(np.angle(np.exp(1j * s[:, 2]).mean()) - 0.5) < 0.02


def test_se2_prior_grad_matches_fd():
    x0 = SE2Variable("X0")
    pose = np.array([0.3, -0.2, 0.4])
    cov = np.diag([0.04, 0.03, 0.02])
    f = F.UnarySE2ApproximateGaussianPriorFactor(x0, pose, cov)
    x = np.array([[0.35, -0.1, 0.5]])
    grad = np.asarray(f.grad_x_log_pdf(x))[0]
    eps = 1e-4
    for d in range(3):
        xp, xm = x.copy(), x.copy()
        xp[0, d] += eps
        xm[0, d] -= eps
        fd = (float(f.log_pdf(xp)[0]) - float(f.log_pdf(xm)[0])) / (2 * eps)
        assert np.isclose(grad[d], fd, rtol=1e-2, atol=1e-3)


# ------------------------------------------------------------- SE2 relative
def test_se2_relative_consistency():
    x0, x1, _, _ = _vars()
    obs = np.array([2.0, 0.0, np.pi / 4])
    cov = np.diag([1e-4, 1e-4, 1e-5])
    f = F.SE2RelativeGaussianLikelihoodFactor(x0, x1, obs, cov)
    base = np.tile(np.array([[1.0, 1.0, np.pi / 2]]), (2000, 1))
    v2 = np.asarray(f.sample(KEY, var1=base))
    # forward-sampled poses must compose back to the observation
    rel = np.asarray(g.se2_between(jnp.asarray(base), jnp.asarray(v2)))
    np.testing.assert_allclose(rel.mean(0), obs, atol=0.01)
    # backward sampling inverts forward sampling
    v1 = np.asarray(f.sample(KEY, var2=v2))
    np.testing.assert_allclose(v1.mean(0), base[0], atol=0.02)
    # observation sampling
    o = np.asarray(f.sample(KEY, var1=base, var2=v2))
    np.testing.assert_allclose(o.mean(0), obs, atol=0.01)


def test_se2_relative_log_pdf_peak():
    x0, x1, _, _ = _vars()
    obs = np.array([2.0, 0.0, 0.0])
    cov = np.diag([0.01, 0.01, 0.001])
    f = F.SE2RelativeGaussianLikelihoodFactor(x0, x1, obs, cov)
    exact = np.array([[0.0, 0.0, 0.0, 2.0, 0.0, 0.0]])
    off = np.array([[0.0, 0.0, 0.0, 2.5, 0.0, 0.0]])
    assert float(f.log_pdf(exact)[0]) > float(f.log_pdf(off)[0])


def test_se2_relative_unif_to_sample_matches_dist():
    x0, x1, _, _ = _vars()
    obs = np.array([1.0, 0.5, 0.3])
    cov = np.diag([0.04, 0.01, 0.01])
    f = F.SE2RelativeGaussianLikelihoodFactor(x0, x1, obs, cov)
    u = np.asarray(jax.random.uniform(KEY, (4000, 3)))
    base = np.tile(np.array([[0.0, 0.0, 0.0]]), (4000, 1))
    s_u = np.asarray(f.unif_to_sample(u, var1=base))
    s_r = np.asarray(f.sample(KEY, var1=base))
    np.testing.assert_allclose(s_u.mean(0), s_r.mean(0), atol=0.02)
    np.testing.assert_allclose(s_u.std(0), s_r.std(0), atol=0.02)


# ----------------------------------------------------------------- range
def test_range_factor_sampling_and_density():
    x0, _, l1, _ = _vars()
    f = F.SE2R2RangeGaussianLikelihoodFactor(x0, l1, 10.0, 0.5)
    base = np.tile(np.array([[1.0, 2.0, 0.3]]), (5000, 1))
    lmk = np.asarray(f.sample(KEY, var1=base))
    assert lmk.shape == (5000, 2)
    r = np.linalg.norm(lmk - base[:, :2], axis=1)
    assert abs(r.mean() - 10.0) < 0.05
    assert abs(r.std() - 0.5) < 0.05
    x = np.hstack([base[:4], lmk[:4]])
    lp = np.asarray(f.log_pdf(x))
    want = (-0.5 * (r[:4] - 10.0) ** 2 / 0.25
            - 0.5 * np.log(2 * np.pi) - np.log(0.5))
    np.testing.assert_allclose(lp, want, rtol=1e-3, atol=1e-2)


def test_range_factor_grad_matches_fd():
    x0, _, l1, _ = _vars()
    f = F.SE2R2RangeGaussianLikelihoodFactor(x0, l1, 5.0, 1.0)
    x = np.array([[0.0, 0.0, 0.3, 3.0, 4.0]])
    grad = np.asarray(f.grad_x_log_pdf(x))[0]
    eps = 1e-5
    for d in range(5):
        xp, xm = x.copy(), x.copy()
        xp[0, d] += eps
        xm[0, d] -= eps
        fd = (float(f.log_pdf(xp)[0]) - float(f.log_pdf(xm)[0])) / (2 * eps)
        assert np.isclose(grad[d], fd, rtol=1e-2, atol=1e-4)


def test_se2se2_range_appends_heading():
    x0, x1, _, _ = _vars()
    f = F.SE2SE2RangeGaussianLikelihoodFactor(x0, x1, 4.0, 0.1)
    base = np.tile(np.array([[0.0, 0.0, 0.0]]), (100, 1))
    s = np.asarray(f.sample(KEY, var1=base))
    assert s.shape == (100, 3)
    assert np.all(np.abs(s[:, 2]) <= np.pi)


# ----------------------------------------------------------------- mixtures
def test_ada_factor_mixture_density():
    x0, _, l1, l2 = _vars()
    f = F.AmbiguousDataAssociationFactor(
        observer_var=x0, observed_vars=[l1, l2], weights=np.array([0.6, 0.4]),
        binary_factor_class=F.SE2R2RangeGaussianLikelihoodFactor,
        observation=5.0, sigma=0.5)
    assert f.vars == [x0, l1, l2]
    x = np.array([[0.0, 0.0, 0.0, 5.0, 0.0, 0.0, 5.0]])
    comp1 = F.SE2R2RangeGaussianLikelihoodFactor(x0, l1, 5.0, 0.5)
    comp2 = F.SE2R2RangeGaussianLikelihoodFactor(x0, l2, 5.0, 0.5)
    want = np.log(0.6 * np.exp(float(comp1.log_pdf(x[:, :5])[0])) +
                  0.4 * np.exp(float(comp2.log_pdf(x[:, [0, 1, 2, 5, 6]])[0])))
    got = float(f.log_pdf(x)[0])
    assert np.isclose(got, want, rtol=1e-3, atol=1e-2)


def test_ada_sample_observer_bimodal():
    x0, _, l1, l2 = _vars()
    f = F.AmbiguousDataAssociationFactor(
        observer_var=x0, observed_vars=[l1, l2], weights=np.array([0.5, 0.5]),
        binary_factor_class=F.SE2R2RangeGaussianLikelihoodFactor,
        observation=1.0, sigma=0.05)
    n = 4000
    v2s = {l1: jnp.tile(jnp.array([[0.0, 0.0]]), (n, 1)),
           l2: jnp.tile(jnp.array([[100.0, 0.0]]), (n, 1))}
    s = np.asarray(f.sample_observer(KEY, v2s))
    near1 = np.linalg.norm(s[:, :2], axis=1) < 5
    near2 = np.linalg.norm(s[:, :2] - np.array([100.0, 0.0]), axis=1) < 5
    assert near1.sum() + near2.sum() == n
    assert 0.4 < near1.mean() < 0.6


def test_null_hypo_factor_weights_posterior():
    x0, _, l1, _ = _vars()
    f = F.BinaryFactorWithNullHypo(
        var1=x0, var2=l1, weights=np.array([0.9, 0.1]),
        binary_factor_class=F.SE2R2RangeGaussianLikelihoodFactor,
        observation=5.0, sigma=0.5, null_sigma_scale=10.0)
    assert f.vars == [x0, l1]
    # posterior weights with samples near the inlier hypothesis
    var2x = {x0: np.tile([[0.0, 0.0, 0.0]], (100, 1)),
             l1: np.tile([[5.0, 0.0]], (100, 1))}
    w = f.posterior_weights(var2x)
    assert w[0] > 0.9


# ---------------------------------------------------------------- text io
def test_fg_text_roundtrip():
    x0, x1, l1, l2 = _vars()
    lines = [
        "Factor SE2RelativeGaussianLikelihoodFactor X0 X1 30.0 0.0 0.0 "
        "covariance 0.04 0.0 0.0 0.0 0.0016 0.0 0.0 0.0 0.0004",
        "Factor SE2R2RangeGaussianLikelihoodFactor X0 L1 42.4 2.0",
        "Factor UnarySE2ApproximateGaussianPriorFactor X0 0.0 0.0 1.57 "
        "covariance 0.0004 0.0 0.0 0.0 1.6e-05 0.0 0.0 0.0 4e-06",
    ]
    for line in lines:
        f = F.Factor.construct_from_text(line, [x0, x1, l1, l2])
        f2 = F.Factor.construct_from_text(str(f), [x0, x1, l1, l2])
        assert type(f) is type(f2)
        np.testing.assert_allclose(np.asarray(f.observation, dtype=float),
                                   np.asarray(f2.observation, dtype=float))


def test_ada_text_roundtrip():
    x0, _, l1, l2 = _vars()
    f = F.AmbiguousDataAssociationFactor(
        observer_var=x0, observed_vars=[l1, l2], weights=np.array([0.5, 0.5]),
        binary_factor_class=F.SE2R2RangeGaussianLikelihoodFactor,
        observation=5.0, sigma=0.5)
    f2 = F.Factor.construct_from_text(str(f), [x0, l1, l2])
    assert isinstance(f2, F.AmbiguousDataAssociationFactor)
    assert [v.name for v in f2.observed_vars] == ["L1", "L2"]
    np.testing.assert_allclose(f2.weights, [0.5, 0.5])
