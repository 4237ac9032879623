"""Golden tests: the Pallas RQS kernel must match the XLA reference
implementation bit-for-bit up to f32 noise (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nfisam_tpu.flows.rqs import unconstrained_rqs
from nfisam_tpu.flows.rqs_pallas import unconstrained_rqs_pallas

KEY = jax.random.PRNGKey(0)


def _params(key, shape, K, circular=False):
    k1, k2, k3 = jax.random.split(key, 3)
    W = jax.random.normal(k1, shape + (K,))
    H = jax.random.normal(k2, shape + (K,))
    D = jax.random.normal(k3, shape + (K if circular else K - 1,))
    return W, H, D


@pytest.mark.parametrize("inverse", [False, True])
def test_pallas_matches_xla(inverse):
    K = 9
    W, H, D = _params(KEY, (300,), K)
    x = jax.random.uniform(jax.random.PRNGKey(1), (300,), minval=-6.0,
                           maxval=6.0)  # includes out-of-interval elements
    y_ref, ld_ref = unconstrained_rqs(x, W, H, D, inverse=inverse,
                                      tail_bound=5.0)
    y_pl, ld_pl = unconstrained_rqs_pallas(x, W, H, D, inverse=inverse,
                                           tail_bound=5.0, interpret=True)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ld_pl), np.asarray(ld_ref),
                               atol=5e-4, rtol=1e-4)


def test_pallas_matches_xla_circular():
    K = 8
    W, H, D = _params(jax.random.PRNGKey(2), (200,), K, circular=True)
    x = jax.random.uniform(jax.random.PRNGKey(3), (200,),
                           minval=-np.pi, maxval=np.pi)
    y_ref, ld_ref = unconstrained_rqs(x, W, H, D, inverse=False,
                                      tail_bound=float(np.pi),
                                      circular=True)
    y_pl, ld_pl = unconstrained_rqs_pallas(x, W, H, D, inverse=False,
                                           tail_bound=float(np.pi),
                                           circular=True, interpret=True)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ld_pl), np.asarray(ld_ref),
                               atol=5e-4, rtol=1e-4)


def test_pallas_2d_batch_shape():
    K = 5
    W, H, D = _params(jax.random.PRNGKey(4), (32, 6), K)
    x = jax.random.uniform(jax.random.PRNGKey(5), (32, 6), minval=-4.0,
                           maxval=4.0)
    y_ref, ld_ref = unconstrained_rqs(x, W, H, D, inverse=False,
                                      tail_bound=5.0)
    y_pl, ld_pl = unconstrained_rqs_pallas(x, W, H, D, inverse=False,
                                           tail_bound=5.0, interpret=True)
    assert y_pl.shape == (32, 6)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref),
                               atol=2e-5, rtol=1e-5)
