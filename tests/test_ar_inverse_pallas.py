"""Golden tests: fused Pallas AR-inverse kernel vs the XLA reference path
(``nsf.stack_inverse_masked``), interpret mode on CPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nfisam_tpu.flows.ar_inverse_pallas import (
    flow_inverse_masked_pallas, stack_inverse_masked_pallas)
from nfisam_tpu.flows.nsf import (NSFConfig, flow_inverse_masked,
                                  init_flow_params, stack_forward,
                                  stack_inverse_masked)


def _setup(dim, circular=(), num_flows=1, n=64, seed=0):
    cfg = NSFConfig(dim=dim, num_knots=7, hidden_dim=8,
                    num_flows=num_flows, circular=circular)
    params = init_flow_params(jax.random.PRNGKey(seed), cfg)
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed + 1))
    z = jax.random.normal(k1, (n, dim)) * 1.5
    xp = jax.random.normal(k2, (n, dim)) * 0.8
    return cfg, params, z, xp


@pytest.mark.parametrize("sep_dim", [0, 2, 5])
def test_single_flow_matches_xla(sep_dim):
    cfg, params, z, xp = _setup(dim=6)
    mask = jnp.asarray(np.arange(6) >= sep_dim)
    xp = jnp.where(mask[None, :], 0.0, xp)
    ref = flow_inverse_masked(params[0], z, xp, mask, cfg)
    got = flow_inverse_masked_pallas(params[0], z, xp, mask, cfg,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_circular_dims_match_xla():
    circ = (False, False, True, False, True)
    cfg, params, z, xp = _setup(dim=5, circular=circ)
    mask = jnp.asarray(np.arange(5) >= 2)
    xp = jnp.where(mask[None, :], 0.0, xp)
    ref = flow_inverse_masked(params[0], z, xp, mask, cfg)
    got = flow_inverse_masked_pallas(params[0], z, xp, mask, cfg,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_stack_of_flows_matches_xla():
    cfg, params, z, xp = _setup(dim=4, num_flows=2)
    mask = jnp.asarray(np.arange(4) >= 1)
    xp = jnp.where(mask[None, :], 0.0, xp)
    ref = stack_inverse_masked(params, z, xp, mask, cfg)
    got = stack_inverse_masked_pallas(params, z, xp, mask, cfg,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_inverse_round_trips_forward():
    """forward(inverse(z)) == z on the inverted columns (inside bounds)."""
    cfg, params, z, xp = _setup(dim=5, n=128, seed=3)
    mask = jnp.ones(5, dtype=bool)
    xp = jnp.zeros_like(xp)
    x = stack_inverse_masked_pallas(params, z, xp, mask, cfg,
                                    interpret=True)
    z_back, _ = stack_forward(params, x, cfg)
    inside = np.abs(np.asarray(z)) <= cfg.tail_bound
    np.testing.assert_allclose(np.asarray(z_back)[inside],
                               np.asarray(z)[inside], rtol=1e-4, atol=1e-4)


def test_non_multiple_shapes():
    """Odd n and dim exercise the sublane/lane padding paths."""
    cfg, params, z, xp = _setup(dim=9, n=37, seed=5)
    mask = jnp.asarray(np.arange(9) >= 4)
    xp = jnp.where(mask[None, :], 0.0, xp)
    ref = flow_inverse_masked(params[0], z, xp, mask, cfg)
    got = flow_inverse_masked_pallas(params[0], z, xp, mask, cfg,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
