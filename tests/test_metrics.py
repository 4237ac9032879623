"""Metrics tests: KSD sanity, MMD discrimination, alignment, utils."""
import json

import numpy as np

from nfisam_tpu.core import R2Variable
from nfisam_tpu.eval import (gaussian_kernel_stein_discrepancy, kabsch_umeyama,
                             mmd, rmse, sample_mean)
from nfisam_tpu.factors import UnaryR2GaussianPriorFactor
from nfisam_tpu.samplers import JointFactor
from nfisam_tpu.utils import (NumpyEncoder, is_spd, reject_outliers,
                              theta_to_pipi)


def test_mmd_discriminates():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(400, 2))
    b = rng.normal(size=(400, 2))
    c = rng.normal(size=(400, 2)) + 2.0
    assert mmd(a, b) < 0.1
    assert mmd(a, c) > 0.3


def test_ksd_accepts_correct_distribution():
    x0 = R2Variable("X0")
    jf = JointFactor([UnaryR2GaussianPriorFactor(x0, np.zeros(2),
                                                 covariance=np.eye(2))],
                     [x0])
    rng = np.random.default_rng(1)
    good = rng.normal(size=(150, 2))
    bad = rng.normal(size=(150, 2)) + 1.5
    u_good, p_good, _, _ = gaussian_kernel_stein_discrepancy(
        jf, np.eye(2), good, nboot=30)
    u_bad, p_bad, _, _ = gaussian_kernel_stein_discrepancy(
        jf, np.eye(2), bad, nboot=30)
    assert u_good < u_bad
    # (the reference's bootstrap statistic scale makes absolute p-values
    # unreliable at these n; parity keeps its formula, so only check range)
    assert 0.0 <= p_good <= 1.0 and 0.0 <= p_bad <= 1.0


def test_kabsch_umeyama_recovers_similarity():
    rng = np.random.default_rng(2)
    B = rng.normal(size=(50, 2))
    th = 0.7
    R_true = np.array([[np.cos(th), -np.sin(th)],
                       [np.sin(th), np.cos(th)]])
    A = 2.0 * B @ R_true.T + np.array([1.0, -3.0])
    R, c, t = kabsch_umeyama(A, B)
    np.testing.assert_allclose(c, 2.0, rtol=1e-5)
    np.testing.assert_allclose(A, c * B @ R.T + t, atol=1e-6)


def test_rigid_gauge_transform_no_scale():
    """Gauge anchoring is RIGID: exact rotation+translation recovery,
    det(R)=+1, and — unlike kabsch_umeyama — no scale absorption even
    when the point sets differ in spread."""
    from nfisam_tpu.eval.metrics import rigid_gauge_transform
    rng = np.random.default_rng(3)
    ref = rng.normal(size=(64, 2))
    th = -0.4
    R_true = np.array([[np.cos(th), -np.sin(th)],
                       [np.sin(th), np.cos(th)]])
    est = (R_true @ ref.T).T + np.array([5.0, 2.0])
    R, t = rigid_gauge_transform(ref, est)
    np.testing.assert_allclose((R @ est.T).T + t, ref, atol=1e-9)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-12)
    # inflate the estimate 3x: a similarity fit would shrink it back;
    # the rigid fit must keep unit scale (norm ratios preserved)
    est3 = 3.0 * est
    R3, t3 = rigid_gauge_transform(ref, est3)
    mapped = (R3 @ est3.T).T + t3
    ratio = (np.sqrt(mapped.var(0).sum()) /
             np.sqrt(est3.var(0).sum()))     # rotation-invariant spread
    np.testing.assert_allclose(ratio, 1.0, rtol=1e-9)


def test_anchor_samples_restores_gauge():
    """A posterior rotated 0.2 rad about the origin anchors back onto
    the reference estimate: positions AND headings corrected, sample
    spread (gauge-invariant) preserved."""
    from nfisam_tpu.core import R2Variable, SE2Variable, VariableType
    from nfisam_tpu.eval.metrics import anchor_samples
    rng = np.random.default_rng(5)
    xs = [SE2Variable(f"X{i}") for i in range(4)]
    lm = R2Variable("L1", VariableType.Landmark)
    truth = {v: np.array([3.0 * i, 1.0 * i, 0.1 * i])
             for i, v in enumerate(xs)}
    truth[lm] = np.array([5.0, -2.0])
    ang = 0.2
    R = np.array([[np.cos(ang), -np.sin(ang)],
                  [np.sin(ang), np.cos(ang)]])
    samples = {}
    for v, mu in truth.items():
        n = 300
        s = np.zeros((n, v.dim))
        s[:, :2] = (R @ mu[:2]).T + rng.normal(scale=0.05, size=(n, 2))
        if v.dim == 3:
            s[:, 2] = mu[2] + ang + rng.normal(scale=0.02, size=n)
        samples[v] = s
    anchored, got_ang = anchor_samples(samples, truth)
    np.testing.assert_allclose(got_ang, -ang, atol=0.02)
    for v, mu in truth.items():
        m = anchored[v].mean(0)
        np.testing.assert_allclose(m[:2], mu[:2], atol=0.05)
        if v.dim == 3:
            np.testing.assert_allclose(m[2], mu[2], atol=0.05)
        # spread untouched by the rigid map
        np.testing.assert_allclose(
            np.sqrt(anchored[v][:, :2].var(0).sum()),
            np.sqrt(np.asarray(samples[v])[:, :2].var(0).sum()),
            rtol=1e-6)


def test_sample_mean_circular():
    from nfisam_tpu.core import SE2Variable
    v = SE2Variable("X")
    samples = np.stack([np.zeros(100), np.zeros(100),
                        np.concatenate([np.full(50, np.pi - 0.1),
                                        np.full(50, -np.pi + 0.1)])],
                       axis=1)
    means, var2mean = sample_mean(samples, [v])
    assert abs(abs(means[2]) - np.pi) < 1e-6   # wraps to +/- pi, not 0


def test_small_utils():
    assert abs(theta_to_pipi(3 * np.pi) - (-np.pi)) < 1e-9
    assert is_spd(np.eye(3))
    assert not is_spd(np.array([[1.0, 2.0], [2.0, 1.0]]))
    data = np.concatenate([np.random.default_rng(0).normal(size=100),
                           [50.0]])
    keep = reject_outliers(data)
    assert 100 not in keep or len(keep) <= 100
    s = json.dumps({"a": np.arange(3)}, cls=NumpyEncoder)
    assert json.loads(s)["a"] == [0, 1, 2]
