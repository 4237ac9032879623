"""End-to-end NSF_AR_CS (circular-spline) solver path — the flow variant
the reference references but never implemented (SURVEY §7.4)."""
import jax
import numpy as np

from nfisam_tpu.core import R2Variable, SE2Variable, VariableType
from nfisam_tpu.factors import (SE2R2RangeGaussianLikelihoodFactor,
                                SE2RelativeGaussianLikelihoodFactor,
                                UnarySE2ApproximateGaussianPriorFactor)
from nfisam_tpu.flows import (BaseDistribution, CliqueFlowModel, NSFConfig,
                              compute_normalizer, normalize)
from nfisam_tpu.solver import NFiSAM, NFiSAMArgs
from nfisam_tpu.train import TrainConfig, fit_flow


def test_cs_flow_learns_wrapped_distribution():
    """A bimodal circular density near +/- pi: the Euclidean flow struggles
    with the wrap; the circular flow must capture both lobes."""
    rng = np.random.default_rng(0)
    th = np.concatenate([rng.normal(np.pi - 0.15, 0.1, 1500),
                         rng.normal(-np.pi + 0.15, 0.1, 1500)])
    th = (th + np.pi) % (2 * np.pi) - np.pi
    data = np.stack([rng.normal(size=3000), th], axis=1).astype(np.float32)
    cfg = NSFConfig(dim=2, num_knots=10, circular=(False, True))
    mean, std = compute_normalizer(data, cfg.circular_mask,
                                   scale_circular=False)
    xn = normalize(data, mean, std, cfg.circular_mask)
    params, losses, t = fit_flow(jax.random.PRNGKey(0), xn, cfg,
                                 TrainConfig(max_iters=600,
                                             learning_rate=0.03))
    model = CliqueFlowModel(cfg, params, mean, std, [False, True], 0)
    s = np.asarray(model.sample(jax.random.PRNGKey(1), 4000))
    assert np.all(np.abs(s[:, 1]) <= np.pi + 1e-4)
    # both lobes present
    near_pi = np.abs(np.abs(s[:, 1]) - np.pi) < 0.5
    assert near_pi.mean() > 0.7
    upper = (s[:, 1] > 0) & near_pi
    lower = (s[:, 1] < 0) & near_pi
    assert upper.sum() > 400 and lower.sum() > 400


def test_solver_with_cs_flow_matches_truth():
    xs = [SE2Variable(f"X{i}") for i in range(3)]
    lm = R2Variable("L1", VariableType.Landmark)
    cov3 = np.diag([0.01, 0.01, 0.002])
    args = NFiSAMArgs(posterior_sample_num=300, local_sample_num=800,
                      flow_iterations=300, num_knots=8, learning_rate=0.03,
                      flow_type="NSF_AR_CS",
                      elimination_method="pose_first", seed=5)
    solver = NFiSAM(args)
    for v in xs + [lm]:
        solver.add_node(v)
    solver.add_factor(UnarySE2ApproximateGaussianPriorFactor(
        xs[0], np.array([0.0, 0.0, np.pi - 0.05]), cov3))
    for a, b in zip(xs, xs[1:]):
        solver.add_factor(SE2RelativeGaussianLikelihoodFactor(
            a, b, np.array([5.0, 0.0, 0.0]), cov3))
    solver.add_factor(SE2R2RangeGaussianLikelihoodFactor(
        xs[2], lm, 4.0, 0.3))
    solver.update_physical_and_working_graphs()
    samples = solver.incremental_inference()
    # heading near pi: wrapped mean must stay near pi (not collapse to 0)
    th = np.asarray(samples[xs[0]])[:, 2]
    wrapped_mean = np.angle(np.exp(1j * th).mean())
    assert abs(abs(wrapped_mean) - (np.pi - 0.05)) < 0.15
    # trajectory moves "backwards" in x since heading ~ pi
    m1 = np.asarray(samples[xs[1]]).mean(0)
    assert m1[0] < -4.0
    r = np.linalg.norm(np.asarray(samples[lm]) -
                       np.asarray(samples[xs[2]])[:, :2], axis=1)
    assert abs(r.mean() - 4.0) < 0.6
