"""Numpy stand-ins for the TransportMaps.Distributions classes used by the
reference (see usage sites: reference src/stats/Distributions.py:153-454,
src/factors/Factors.py:336-2774, src/utils/Statistics.py:21)."""
import numpy as np


class Distribution:
    """Base: only carries dimensionality; subclasses implement the API."""

    def __init__(self, dim=None):
        self._dim = dim

    @property
    def dim(self):
        return self._dim

    def rvs(self, m, *args, **kwargs):
        raise NotImplementedError

    def pdf(self, x, *args, **kwargs):
        return np.exp(self.log_pdf(x))

    def log_pdf(self, x, *args, **kwargs):
        raise NotImplementedError

    def grad_x_log_pdf(self, x, *args, **kwargs):
        raise NotImplementedError


class GaussianDistribution(Distribution):
    """Multivariate normal with either covariance or precision given,
    matching the attribute surface the reference reads (.mu/.mean/.sigma/
    .covariance/.precision, rvs/pdf/log_pdf/grad_x_log_pdf/hess_x_log_pdf)."""

    def __init__(self, mu, sigma=None, precision=None):
        mu = np.atleast_1d(np.asarray(mu, dtype=float))
        super().__init__(mu.shape[0])
        self._mu = mu
        if sigma is not None:
            self._sigma = np.atleast_2d(np.asarray(sigma, dtype=float))
            self._precision = np.linalg.inv(self._sigma)
        else:
            self._precision = np.atleast_2d(np.asarray(precision,
                                                       dtype=float))
            self._sigma = np.linalg.inv(self._precision)
        sign, logdet = np.linalg.slogdet(self._sigma)
        self._log_norm = -0.5 * (self.dim * np.log(2.0 * np.pi) + logdet)
        self._chol = np.linalg.cholesky(self._sigma)

    @property
    def mu(self):
        return self._mu

    @property
    def mean(self):
        return self._mu

    @property
    def sigma(self):
        return self._sigma

    @property
    def covariance(self):
        return self._sigma

    @property
    def precision(self):
        return self._precision

    def rvs(self, m, *args, **kwargs):
        z = np.random.standard_normal((m, self.dim))
        return self._mu[None, :] + z @ self._chol.T

    def log_pdf(self, x, *args, **kwargs):
        x = np.atleast_2d(np.asarray(x, dtype=float))
        r = x - self._mu[None, :]
        return self._log_norm - 0.5 * np.einsum(
            "ni,ij,nj->n", r, self._precision, r)

    def pdf(self, x, *args, **kwargs):
        return np.exp(self.log_pdf(x))

    def grad_x_log_pdf(self, x, *args, **kwargs):
        x = np.atleast_2d(np.asarray(x, dtype=float))
        return -(x - self._mu[None, :]) @ self._precision

    def hess_x_log_pdf(self, x, *args, **kwargs):
        x = np.atleast_2d(np.asarray(x, dtype=float))
        return np.broadcast_to(-self._precision,
                               (x.shape[0], self.dim, self.dim)).copy()


class StandardNormalDistribution(GaussianDistribution):
    def __init__(self, dim):
        super().__init__(mu=np.zeros(dim), sigma=np.eye(dim))


class PullBackTransportMapDistribution(Distribution):
    """Only reachable via the reference's ImplicitPriorFactor
    (Factors.py:852-909), which none of the benchmark graphs use."""

    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            "PullBackTransportMapDistribution is not needed by the "
            "benchmark graphs; shim does not implement it")
