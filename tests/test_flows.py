"""Flow-layer golden tests: RQS invertibility and log-det antisymmetry
(exact properties the reference never unit-tested — SURVEY §4), NSF-AR
round trips, conditional sampling, and density estimation quality on
closed-form targets."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nfisam_tpu.flows import (BaseDistribution, CliqueFlowModel, NSFConfig,
                              compute_normalizer, flow_forward, flow_inverse,
                              init_flow_params, normalize,
                              stack_forward, stack_inverse,
                              unconstrained_rqs, unnormalize,
                              von_mises_log_prob, von_mises_sample)
from nfisam_tpu.train import TrainConfig, fit_flow

KEY = jax.random.PRNGKey(0)


def _rand_spline_params(key, shape, K):
    k1, k2, k3 = jax.random.split(key, 3)
    W = jax.random.normal(k1, shape + (K,))
    H = jax.random.normal(k2, shape + (K,))
    D = jax.random.normal(k3, shape + (K - 1,))
    return W, H, D


# ------------------------------------------------------------------- RQS
def test_rqs_roundtrip_and_logdet():
    K = 9
    W, H, D = _rand_spline_params(KEY, (512,), K)
    x = jax.random.uniform(jax.random.PRNGKey(1), (512,), minval=-4.9,
                           maxval=4.9)
    y, ld_f = unconstrained_rqs(x, W, H, D, inverse=False, tail_bound=5.0)
    x2, ld_i = unconstrained_rqs(y, W, H, D, inverse=True, tail_bound=5.0)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-3)
    np.testing.assert_allclose(np.asarray(ld_f), -np.asarray(ld_i),
                               atol=5e-3)


def test_rqs_identity_outside_interval():
    K = 5
    W, H, D = _rand_spline_params(KEY, (8,), K)
    x = jnp.array([-7.0, 6.0, 5.5, -5.1, 9.9, -100.0, 50.0, 5.01])
    y, ld = unconstrained_rqs(x, W, H, D, inverse=False, tail_bound=5.0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ld), 0.0, atol=1e-6)


def test_rqs_monotone():
    K = 7
    W, H, D = _rand_spline_params(jax.random.PRNGKey(3), (), K)
    x = jnp.linspace(-4.99, 4.99, 1000)
    Wb = jnp.broadcast_to(W, (1000, K))
    Hb = jnp.broadcast_to(H, (1000, K))
    Db = jnp.broadcast_to(D, (1000, K - 1))
    y, _ = unconstrained_rqs(x, Wb, Hb, Db, inverse=False, tail_bound=5.0)
    assert np.all(np.diff(np.asarray(y)) > 0)


def test_rqs_logdet_matches_autodiff():
    K = 6
    W, H, D = _rand_spline_params(jax.random.PRNGKey(4), (), K)

    def f(x):
        y, _ = unconstrained_rqs(x[None], W[None], H[None], D[None],
                                 inverse=False, tail_bound=5.0)
        return y[0]

    for xv in [-3.0, -0.5, 0.1, 2.7, 4.5]:
        deriv = float(jax.grad(f)(jnp.asarray(xv)))
        _, ld = unconstrained_rqs(jnp.asarray([xv]), W[None], H[None],
                                  D[None], inverse=False, tail_bound=5.0)
        assert np.isclose(np.log(deriv), float(ld[0]), atol=1e-3)


def test_rqs_circular_periodic():
    K = 8
    k1, k2, k3 = jax.random.split(KEY, 3)
    W = jax.random.normal(k1, (4, K))
    H = jax.random.normal(k2, (4, K))
    D = jax.random.normal(k3, (4, K))  # K derivatives for circular
    x = jnp.array([-np.pi + 0.01, 0.0, 1.5, np.pi - 0.01])
    y, ld = unconstrained_rqs(x, W, H, D, inverse=False,
                              tail_bound=float(np.pi), circular=True)
    assert np.all(np.abs(np.asarray(y)) <= np.pi + 1e-5)
    x2, _ = unconstrained_rqs(y, W, H, D, inverse=True,
                              tail_bound=float(np.pi), circular=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)


# ------------------------------------------------------------------- NSF
def test_nsf_forward_inverse_roundtrip():
    cfg = NSFConfig(dim=5, num_knots=8, hidden_dim=8, num_flows=2)
    params = init_flow_params(KEY, cfg)
    x = jax.random.normal(jax.random.PRNGKey(5), (64, 5)) * 2.0
    z, ld = stack_forward(params, x, cfg)
    assert z.shape == (64, 5) and ld.shape == (64,)
    x2 = stack_inverse(params, z, cfg)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=2e-3)


def test_nsf_autoregressive_property():
    """z_i must not depend on x_j for j > i."""
    cfg = NSFConfig(dim=4, num_knots=5)
    params = init_flow_params(KEY, cfg)
    x = jax.random.normal(jax.random.PRNGKey(6), (1, 4))
    z0, _ = flow_forward(params[0], x, cfg)
    x_mod = x.at[0, 3].add(10.0)
    z1, _ = flow_forward(params[0], x_mod, cfg)
    np.testing.assert_allclose(np.asarray(z0[0, :3]), np.asarray(z1[0, :3]),
                               atol=1e-6)
    assert abs(float(z0[0, 3] - z1[0, 3])) > 1e-4


def test_nsf_inverse_given_separator_clamps_prefix():
    cfg = NSFConfig(dim=6, num_knots=6, num_flows=1)
    params = init_flow_params(KEY, cfg)
    x = jax.random.normal(jax.random.PRNGKey(7), (32, 6))
    z, _ = stack_forward(params, x, cfg)
    # invert only the last 3 dims given the true first 3 columns
    x_rec = stack_inverse(params, z[:, 3:], cfg, x_prefix=x[:, :3],
                          start_dim=3)
    np.testing.assert_allclose(np.asarray(x_rec[:, 3:]),
                               np.asarray(x[:, 3:]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(x_rec[:, :3]),
                               np.asarray(x[:, :3]), atol=1e-6)


# ------------------------------------------------------------- von Mises
def test_von_mises_sampler_moments():
    s = np.asarray(von_mises_sample(KEY, (20000,)))
    assert np.all(np.abs(s) <= np.pi)
    # E[cos(theta)] = I1(1)/I0(1) ~ 0.44639
    assert abs(np.cos(s).mean() - 0.44639) < 0.02
    assert abs(np.sin(s).mean()) < 0.02


def test_von_mises_log_prob_normalized():
    th = np.linspace(-np.pi, np.pi, 20001)
    p = np.exp(np.asarray(von_mises_log_prob(jnp.asarray(th))))
    assert abs(np.trapezoid(p, th) - 1.0) < 1e-3


# ------------------------------------------------------------- training
def test_fit_flow_learns_correlated_gaussian():
    rng = np.random.default_rng(0)
    cov = np.array([[1.0, 0.8], [0.8, 1.0]])
    data = rng.multivariate_normal([0, 0], cov, size=2000).astype(np.float32)
    cfg = NSFConfig(dim=2, num_knots=8, hidden_dim=8)
    mean, std = compute_normalizer(jnp.asarray(data), cfg.circular_mask)
    xn = normalize(jnp.asarray(data), mean, std, cfg.circular_mask)
    tc = TrainConfig(max_iters=600, learning_rate=0.03)
    params, iter_loss, t = fit_flow(KEY, xn, cfg, tc)
    # loss decreased substantially
    losses = np.asarray(iter_loss)[:int(t)]
    assert losses[-1] < losses[0] - 0.3
    # samples from the model match the target moments
    model = CliqueFlowModel(cfg, params, mean, std, [False, False], 0)
    s = np.asarray(model.sample(jax.random.PRNGKey(8), 4000))
    got_cov = np.cov(s.T)
    assert abs(got_cov[0, 1] / np.sqrt(got_cov[0, 0] * got_cov[1, 1])
               - 0.8) < 0.1


def test_fit_flow_early_stop_plateau():
    data = np.random.default_rng(1).normal(size=(500, 2)).astype(np.float32)
    cfg = NSFConfig(dim=2, num_knots=5)
    mean, std = compute_normalizer(jnp.asarray(data), cfg.circular_mask)
    xn = normalize(jnp.asarray(data), mean, std, cfg.circular_mask)
    tc = TrainConfig(max_iters=2000, learning_rate=0.05, average_window=25,
                     loss_delta_tol=5e-2)
    _, _, t = fit_flow(KEY, xn, cfg, tc)
    assert int(t) < 2000  # plateau stopping fired


def test_conditional_sample_matches_conditional_gaussian():
    """Train on a correlated 2-D Gaussian; conditional samples of x1 | x0
    must match the closed-form conditional."""
    rng = np.random.default_rng(2)
    rho = 0.9
    cov = np.array([[1.0, rho], [rho, 1.0]])
    data = rng.multivariate_normal([0, 0], cov, size=3000).astype(np.float32)
    cfg = NSFConfig(dim=2, num_knots=8)
    mean, std = compute_normalizer(jnp.asarray(data), cfg.circular_mask)
    xn = normalize(jnp.asarray(data), mean, std, cfg.circular_mask)
    params, _, _ = fit_flow(KEY, xn, cfg,
                            TrainConfig(max_iters=800, learning_rate=0.03))
    model = CliqueFlowModel(cfg, params, mean, std, [False, False], 1)
    x0 = 1.0
    obs = np.full((4000, 1), x0, dtype=np.float32)
    s = np.asarray(model.conditional_sample(jax.random.PRNGKey(9), 0,
                                            obs_samples=obs))
    assert abs(s.mean() - rho * x0) < 0.12
    assert abs(s.std() - np.sqrt(1 - rho ** 2)) < 0.12


def test_separator_forward_marginal_density():
    """The separator marginal of the flow equals the empirical marginal:
    for an AR flow the prefix dims form a self-contained flow."""
    rng = np.random.default_rng(3)
    data = rng.normal(size=(2000, 3)).astype(np.float32) * \
        np.array([1.0, 2.0, 0.5], dtype=np.float32)
    cfg = NSFConfig(dim=3, num_knots=6)
    mean, std = compute_normalizer(jnp.asarray(data), cfg.circular_mask)
    xn = normalize(jnp.asarray(data), mean, std, cfg.circular_mask)
    params, _, _ = fit_flow(KEY, xn, cfg,
                            TrainConfig(max_iters=400, learning_rate=0.03))
    model = CliqueFlowModel(cfg, params, mean, std, [False] * 3, 2)
    x_sep = np.asarray([[0.0, 0.0], [1.0, 1.0], [2.0, -2.0]],
                       dtype=np.float32)
    z, prior_lp, log_det = model.separator_forward(jnp.asarray(x_sep))
    lp = np.asarray(prior_lp + log_det)
    # density at the mode should exceed density in the tail
    assert lp[0] > lp[2]
