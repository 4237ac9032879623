"""SE(2) geometry golden tests (reference test model:
``tests/test_2d_geometry_classes.py``) plus exp/log round-trip and Jacobian
finite-difference checks the reference lacks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nfisam_tpu.core import geometry as g


def test_wrap_angle():
    assert np.isclose(float(g.wrap_angle(jnp.pi + 0.1)), -jnp.pi + 0.1,
                      atol=1e-6)
    assert np.isclose(float(g.wrap_angle(-jnp.pi - 0.1)), jnp.pi - 0.1,
                      atol=1e-6)


def test_compose_inverse_identity():
    key = jax.random.PRNGKey(0)
    a = g.se2_exp(jax.random.normal(key, (64, 3)))
    ident = g.se2_compose(a, g.se2_inverse(a))
    np.testing.assert_allclose(np.asarray(ident), 0.0, atol=1e-5)


def test_exp_log_roundtrip():
    key = jax.random.PRNGKey(1)
    v = jax.random.normal(key, (256, 3)) * jnp.array([5.0, 5.0, 1.0])
    T = g.se2_exp(v)
    np.testing.assert_allclose(np.asarray(g.se2_log(T)), np.asarray(v),
                               atol=1e-4)


def test_exp_log_small_angle():
    v = jnp.array([[1.0, -2.0, 1e-9], [0.3, 0.4, 0.0]])
    T = g.se2_exp(v)
    np.testing.assert_allclose(np.asarray(T[:, :2]), np.asarray(v[:, :2]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(g.se2_log(T)), np.asarray(v),
                               atol=1e-6)


def test_compose_matches_matrix_product():
    rng = np.random.default_rng(2)
    for _ in range(10):
        a, b = rng.normal(size=3), rng.normal(size=3)

        def mat(p):
            c, s = np.cos(p[2]), np.sin(p[2])
            return np.array([[c, -s, p[0]], [s, c, p[1]], [0, 0, 1]])

        m = mat(a) @ mat(b)
        got = np.asarray(g.se2_compose(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(mat(got), m, atol=1e-5)


def test_det_grad_logmap_matches_jacobian_det():
    """det(d log / dx) from the closed form equals the autodiff Jacobian
    determinant of se2_log (up to sign)."""
    rng = np.random.default_rng(3)
    for _ in range(5):
        T = np.array([rng.normal(), rng.normal(),
                      rng.uniform(-2.5, 2.5)])
        J = jax.jacfwd(g.se2_log)(jnp.asarray(T))
        det_ad = abs(float(jnp.linalg.det(J)))
        det_cf = abs(float(g.se2_det_grad_logmap(jnp.asarray(T))))
        assert np.isclose(det_ad, det_cf, rtol=1e-4)


def test_grad_x_logmap_matches_autodiff():
    rng = np.random.default_rng(4)
    for _ in range(5):
        T = jnp.asarray([rng.normal(), rng.normal(), rng.uniform(-2.0, 2.0)])
        J_ad = jax.jacfwd(g.se2_log)(T)
        J_cf = g.se2_grad_x_logmap(T)
        np.testing.assert_allclose(np.asarray(J_cf), np.asarray(J_ad),
                                   atol=1e-3)


def test_grad_xi_expmap_is_inverse_of_grad_x_logmap():
    T = jnp.asarray([1.0, -0.5, 0.8])
    A = np.asarray(g.se2_grad_x_logmap(T))
    B = np.asarray(g.se2_grad_xi_expmap(T))
    np.testing.assert_allclose(A @ B, np.eye(3), atol=1e-4)


def test_range_and_bearing():
    pose = jnp.asarray([[0.0, 0.0, np.pi / 2]])
    pt = jnp.asarray([[0.0, 2.0]])
    rng_, brg = g.se2_range_and_bearing(pose, pt)
    assert np.isclose(float(rng_[0]), 2.0, atol=1e-6)
    assert np.isclose(float(brg[0]), 0.0, atol=1e-6)
