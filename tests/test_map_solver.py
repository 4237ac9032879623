"""MAP/Laplace baseline tests (role of the reference's GTSAM harness)."""
import jax
import numpy as np

from nfisam_tpu.core import R2Variable
from nfisam_tpu.eval import gaussian_displacement_graph_moments
from nfisam_tpu.factors import (R2RelativeGaussianLikelihoodFactor,
                                UnaryR2GaussianPriorFactor)
from nfisam_tpu.io import graph_file_parser
from nfisam_tpu.solver import GaussNewtonMAP


def test_map_matches_closed_form_gaussian():
    x0, x1 = R2Variable("X0"), R2Variable("X1")
    cov = np.eye(2) * 0.5
    factors = [UnaryR2GaussianPriorFactor(x0, np.zeros(2), covariance=cov),
               R2RelativeGaussianLikelihoodFactor(
                   x0, x1, np.array([2.0, 1.0]), covariance=cov),
               UnaryR2GaussianPriorFactor(x1, np.array([2.5, 1.0]),
                                          covariance=cov)]
    mu, Sigma = gaussian_displacement_graph_moments(
        [x0, x1], {(x0, x1): (np.array([2.0, 1.0]), cov)},
        {x0: (np.zeros(2), cov), x1: (np.array([2.5, 1.0]), cov)})
    m = GaussNewtonMAP([x0, x1], factors)
    x, lap_cov, nll, it = m.solve()
    np.testing.assert_allclose(x, mu, atol=1e-3)
    np.testing.assert_allclose(lap_cov, Sigma, rtol=0.05, atol=1e-3)
    s = m.sample(jax.random.PRNGKey(0), 5000)
    np.testing.assert_allclose(s.mean(0), mu, atol=0.05)


def test_map_solves_case1_to_truth():
    nodes, truth, factors = graph_file_parser(
        "data/case1_factor_graph.fg", "fg")
    m = GaussNewtonMAP(nodes, factors)
    m.solve()
    res = m.results()
    errs = [np.linalg.norm(res[v][:2] - truth[v][:2]) for v in nodes]
    assert max(errs) < 1.0
