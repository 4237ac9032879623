"""Numpy stand-ins for TransportMaps.Likelihoods (usage sites: reference
src/stats/Likelihoods.py:93-295, src/stats/Distributions.py:343,
src/factors/Factors.py:938-948)."""
import numpy as np


class LikelihoodBase:
    pass


class LogLikelihood(LikelihoodBase):
    """Base carrying the observation y and the latent dimensionality."""

    def __init__(self, y, dim):
        self._y = y
        self._dim = dim

    @property
    def y(self):
        return self._y

    @property
    def dim(self):
        return self._dim

    def evaluate(self, x, *args, **kwargs):
        raise NotImplementedError

    def grad_x(self, x, *args, **kwargs):
        raise NotImplementedError


class AdditiveLinearGaussianLogLikelihood(LogLikelihood):
    """log p(y | x) for the model y = c + T x + eps, eps ~ N(mu, sigma).

    The reference constructs it with y, c, mu, sigma, precision, T
    (Factors.py:945-947, Likelihoods.py:93-95) and calls .evaluate(x) /
    .grad_x(x) with x of shape (n, dim_x)."""

    def __init__(self, y, c, mu, sigma, precision=None, T=None):
        y = np.atleast_1d(np.asarray(y, dtype=float))
        super().__init__(y, T.shape[1])
        self._c = np.atleast_1d(np.asarray(c, dtype=float))
        self._mu = np.atleast_1d(np.asarray(mu, dtype=float))
        self._T = np.asarray(T, dtype=float)
        if precision is not None:
            self._precision = np.atleast_2d(np.asarray(precision,
                                                       dtype=float))
            sigma_mat = np.linalg.inv(self._precision)
        else:
            sigma_mat = np.atleast_2d(np.asarray(sigma, dtype=float))
            self._precision = np.linalg.inv(sigma_mat)
        dy = y.shape[0]
        sign, logdet = np.linalg.slogdet(sigma_mat)
        self._log_norm = -0.5 * (dy * np.log(2.0 * np.pi) + logdet)

    def evaluate(self, x, *args, **kwargs):
        x = np.atleast_2d(np.asarray(x, dtype=float))
        r = (self._y + 0.0)[None, :] - self._c[None, :] \
            - self._mu[None, :] - x @ self._T.T
        return self._log_norm - 0.5 * np.einsum(
            "ni,ij,nj->n", r, self._precision, r)

    def grad_x(self, x, *args, **kwargs):
        x = np.atleast_2d(np.asarray(x, dtype=float))
        r = (self._y + 0.0)[None, :] - self._c[None, :] \
            - self._mu[None, :] - x @ self._T.T
        return (r @ self._precision) @ self._T
