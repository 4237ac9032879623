"""Factor library with vectorized JAX kernels.

Parity with reference ``src/factors/Factors.py`` (~18 concrete factor types,
lines 20-3462) — re-designed TPU-first:

* every numeric method (``log_pdf``, ``grad_x_log_pdf``, ``sample``,
  ``unif_to_sample``, ``evaluate_loglike``) is vectorized over the sample
  axis and backed by jitted module-level kernels — the reference's
  per-sample ``SE2Pose`` Python loops (``Factors.py:1222-1317``) become a
  handful of fused array ops;
* sampling takes explicit ``jax.random`` keys (reproducible across hosts);
* gradients of the SE(2) wrapped-Gaussian densities come from ``jax.grad``
  through the geometry layer instead of hand-derived chain rules
  (``Factors.py:1450-1474``), with the log-det-Jacobian correction of
  ``det_grad_x_logmap`` included exactly as in the reference
  (``Factors.py:816-827, 1436-1448``);
* text (de)serialization keeps the reference's ``.fg`` grammar, with a
  registry instead of ``eval`` dispatch (``Factors.py:50``).
"""
from __future__ import annotations

from abc import ABC
from functools import partial
from typing import Dict, Iterable, List, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..core import geometry as geom
from ..core.distributions import (GaussianDistribution,
                                  GaussianMixtureDistribution,
                                  GaussianRangeDistribution, _spd_sqrt)
from ..core.variables import (R1Variable, Bearing2DVariable, SE2Variable,
                              Variable, VariableType)

_TWO_PI = 2.0 * np.pi
_LOG_TWO_PI = float(np.log(_TWO_PI))

FACTOR_REGISTRY: Dict[str, type] = {}

def _se2_inverse_np(pose: np.ndarray) -> np.ndarray:
    """Host-side SE(2) inverse for factor construction (no device ops)."""
    x, y, th = float(pose[0]), float(pose[1]), float(pose[2])
    c, si = np.cos(th), np.sin(th)
    return np.array([-(c * x + si * y), -(-si * x + c * y),
                     float((-th + np.pi) % (2 * np.pi) - np.pi)])



def register_factor(cls):
    FACTOR_REGISTRY[cls.__name__] = cls
    return cls


class UnknownVariableError(KeyError):
    """A factor line references a variable that has not been declared.

    Distinct from KeyError so the ``.fg`` reader can report the
    declare-Variables-before-Factors hint ONLY for this case instead of
    swallowing every KeyError raised during factor construction."""


class _NameLookup(dict):
    """name -> Variable map that raises UnknownVariableError on misses."""

    def __missing__(self, key):
        raise UnknownVariableError(key)


def vars_by_name(variables: Iterable[Variable]) -> "_NameLookup":
    return _NameLookup({v.name: v for v in variables})


# ==========================================================================
# Base protocol
# ==========================================================================
class Factor(ABC):
    """Abstract factor (reference ``Factors.py:20``)."""

    @property
    def vars(self) -> List[Variable]:
        raise NotImplementedError

    @property
    def dim(self) -> int:
        return sum(v.dim for v in self.vars)

    @property
    def var_dim(self):
        return [(v, v.dim) for v in self.vars]

    @property
    def is_gaussian(self) -> bool:
        return False

    @property
    def circular_dim_list(self) -> List[bool]:
        out: List[bool] = []
        for v in self.vars:
            out += v.circular_dim_list
        return out

    def log_pdf(self, x) -> jax.Array:
        raise NotImplementedError

    def log_ancestral_density(self, x, var1_sampled: bool = True
                              ) -> jax.Array:
        """Log density of the measure ``sample``/``unif_to_sample``
        actually draws from when this factor is used as an ancestral
        (tree) edge.  For most factors this equals ``log_pdf`` (the
        conditional density over the drawn variable), but ring-sampled
        range factors draw radius x uniform-angle, whose 2D density
        carries a state-dependent -log(rho) polar Jacobian that
        ``log_pdf`` (the 1D range likelihood) does not include.  MCMC
        move kernels over the ancestral measure (e.g. SMC's MH prior
        ratio) must use this, not ``log_pdf``."""
        return self.log_pdf(x)

    def pdf(self, x) -> jax.Array:
        return jnp.exp(self.log_pdf(x))

    def grad_x_log_pdf(self, x) -> jax.Array:
        raise NotImplementedError

    def evaluate_loglike(self, x) -> jax.Array:
        """Log-likelihood at a single flattened location ``x`` of shape (dim,)."""
        return self.log_pdf(jnp.asarray(x).reshape(1, -1))[0]

    # ---------------------------------------------------------------- text
    @classmethod
    def construct_from_text(cls, line: str, variables: Iterable[Variable]
                            ) -> "Factor":
        tok = line.strip().split()
        if tok[0] == "Factor":
            tok = tok[1:]
        klass = FACTOR_REGISTRY.get(tok[0])
        if klass is None:
            raise ValueError(f"Unknown factor type {tok[0]}")
        return klass.construct_from_text(" ".join(tok), variables)

    def __str__(self) -> str:
        raise NotImplementedError


class UnaryFactor(Factor, ABC):
    @property
    def var(self) -> Variable:
        return self.vars[0]


class BinaryFactor(Factor, ABC):
    @property
    def var1(self) -> Variable:
        return self.vars[0]

    @property
    def var2(self) -> Variable:
        return self.vars[1]


class UndefinedFactor(Factor):
    """Fill-in edge created during symbolic elimination (``Factors.py:75``)."""

    def __init__(self, vars: List[Variable]) -> None:
        self._vars = list(vars)

    @property
    def vars(self) -> List[Variable]:
        return self._vars

    def __str__(self) -> str:
        return "Factor UndefinedFactor " + " ".join(v.name for v in self._vars)


class PriorFactor(Factor, ABC):
    """Factor that can be sampled unconditionally (``Factors.py:93``)."""

    def sample(self, key: jax.Array, num_samples: int) -> jax.Array:
        raise NotImplementedError

    def unif_to_sample(self, u) -> jax.Array:
        raise NotImplementedError


class LikelihoodFactor(Factor, ABC):
    """Conditional factor with an observation (``Factors.py:154``)."""

    @property
    def observation(self) -> np.ndarray:
        raise NotImplementedError

    @property
    def observation_var(self) -> Variable:
        raise NotImplementedError

    @property
    def measurement_dim(self) -> int:
        return int(np.asarray(self.observation).reshape(-1).shape[0])

    def sample(self, key: jax.Array, var1=None, var2=None) -> jax.Array:
        """Directional sampling: exactly like the reference protocol —
        given var1 draw var2; given var2 draw var1; given both draw the
        observation (``Factors.py:197, 1001``)."""
        raise NotImplementedError


class ImplicitPriorFactor(PriorFactor, ABC):
    """Prior without closed-form density (e.g. learned flows)."""


# ==========================================================================
# Gaussian prior factors
# ==========================================================================
@register_factor
class UnaryR2GaussianPriorFactor(PriorFactor, UnaryFactor):
    """Gaussian prior on an R^2 variable (``Factors.py:362``)."""

    measurement_variable_type = R1Variable

    def __init__(self, var: Variable, mu, covariance=None, precision=None):
        self._vars = [var]
        self.dist = GaussianDistribution(mu, covariance, precision)

    @property
    def vars(self):
        return self._vars

    @property
    def mu(self):
        return self.dist.mu

    @property
    def covariance(self):
        return self.dist.sigma

    @property
    def observation(self):
        return self.dist.mu

    @property
    def is_gaussian(self):
        return True

    def log_pdf(self, x):
        return self.dist.log_pdf(x)

    def grad_x_log_pdf(self, x):
        return self.dist.grad_x_log_pdf(x)

    def sample(self, key, num_samples):
        return self.dist.rvs(key, num_samples)

    def unif_to_sample(self, u):
        return self.dist.unif_to_sample(u)

    def evaluate_loglike(self, x):
        return self.dist.log_pdf(jnp.asarray(x).reshape(1, -1))[0]

    def __str__(self):
        c = self.covariance
        vals = [self.vars[0].name, str(self.mu[0]), str(self.mu[1]),
                "covariance", str(c[0, 0]), str(c[0, 1]), str(c[1, 0]),
                str(c[1, 1])]
        return "Factor " + type(self).__name__ + " " + " ".join(vals)

    @classmethod
    def construct_from_text(cls, line, variables):
        tok = line.strip().split()
        assert tok[0] == cls.__name__
        n2v = vars_by_name(variables)
        var = n2v[tok[1]]
        mu = np.array([float(tok[2]), float(tok[3])])
        key = tok[4]
        mat = np.array([[float(tok[5]), float(tok[6])],
                        [float(tok[7]), float(tok[8])]])
        if key == "covariance":
            return cls(var, mu, covariance=mat)
        if key == "precision":
            return cls(var, mu, precision=mat)
        raise ValueError("Must specify either covariance or precision")


# Reference defines GaussianPriorFactor at Factors.py:329 (general dim).
@register_factor
class GaussianPriorFactor(PriorFactor, UnaryFactor):
    def __init__(self, var: Variable, mean, covariance=None, precision=None):
        self._vars = [var]
        self.dist = GaussianDistribution(mean, covariance, precision)

    @property
    def vars(self):
        return self._vars

    @property
    def is_gaussian(self):
        return True

    @property
    def observation(self):
        return self.dist.mu

    def log_pdf(self, x):
        return self.dist.log_pdf(x)

    def grad_x_log_pdf(self, x):
        return self.dist.grad_x_log_pdf(x)

    def sample(self, key, num_samples):
        return self.dist.rvs(key, num_samples)

    def unif_to_sample(self, u):
        return self.dist.unif_to_sample(u)

    def evaluate_loglike(self, x):
        return self.dist.log_pdf(jnp.asarray(x).reshape(1, -1))[0]

    def __str__(self):
        c = self.dist.sigma.reshape(-1)
        vals = [self.vars[0].name] + [str(m) for m in self.dist.mu] + \
               ["covariance"] + [str(v) for v in c]
        return "Factor " + type(self).__name__ + " " + " ".join(vals)


@register_factor
class UnaryR2RangeGaussianPriorFactor(PriorFactor, UnaryFactor):
    """Ring prior: known range from a fixed center (``Factors.py:2226``)."""

    measurement_variable_type = R1Variable

    def __init__(self, var: Variable, center, mu: float, sigma: float):
        self._vars = [var]
        self.dist = GaussianRangeDistribution(center, mu, sigma ** 2)
        self.sigma = float(sigma)

    @property
    def vars(self):
        return self._vars

    @property
    def mu(self):
        return self.dist.mu

    @property
    def center(self):
        return self.dist.center

    @property
    def covariance(self):
        return self.dist.variance

    @property
    def observation(self):
        return self.dist.mu

    def log_pdf(self, x):
        return self.dist.log_pdf(x)

    def grad_x_log_pdf(self, x):
        return jax.vmap(jax.grad(lambda p: self.dist.log_pdf(p[None])[0]))(
            jnp.asarray(x))

    def sample(self, key, num_samples):
        return self.dist.rvs(key, num_samples)

    def unif_to_sample(self, u):
        return self.dist.unif_to_sample(u)

    def evaluate_loglike(self, x):
        return self.dist.log_pdf(jnp.asarray(x).reshape(1, -1))[0]

    def __str__(self):
        vals = [self.vars[0].name, "center:", str(self.center[0]),
                str(self.center[1]), "mu:", str(self.mu), "sigma",
                str(self.covariance)]
        return "Factor " + type(self).__name__ + " " + " ".join(vals)

    @classmethod
    def construct_from_text(cls, line, variables):
        tok = line.strip().split()
        assert tok[0] == cls.__name__
        n2v = vars_by_name(variables)
        # grammar: <name> center: cx cy mu: m sigma s  (tolerate bare floats)
        vals = [t for t in tok[2:] if not t.endswith(":") and
                t not in ("sigma", "center", "mu")]
        cx, cy, mu, var_or_sigma = (float(v) for v in vals[:4])
        return cls(n2v[tok[1]], np.array([cx, cy]), mu,
                   float(np.sqrt(var_or_sigma)))


@register_factor
class UncertainUnaryR2RangeGaussianPriorFactor(UnaryR2RangeGaussianPriorFactor):
    """Sensor-failure-aware ring prior (``Factors.py:536``): when observed,
    the effective radius distribution shrinks via the product of the range
    noise and an observability kernel (arXiv:1812.02609)."""

    def __init__(self, var, center, mu, sigma, observed_flag=True,
                 unobserved_sigma=0.3):
        s2, u2 = sigma ** 2, unobserved_sigma ** 2
        new_var = s2 * u2 / (s2 + u2)
        new_mu = u2 * mu / (s2 + u2)
        super().__init__(var, center, new_mu, float(np.sqrt(new_var)))
        self.raw_mu = mu
        self.raw_sigma = sigma
        self.observed_flag = observed_flag
        self.unobserved_sigma = unobserved_sigma

    def evaluate_loglike(self, x):
        x = jnp.asarray(x).reshape(-1)
        delta = jnp.linalg.norm(x - self.center)
        if not self.observed_flag:
            return jnp.log(1.0 - jnp.exp(-0.5 * delta ** 2 /
                                         self.unobserved_sigma ** 2))
        return -0.5 * (delta - self.mu) ** 2 / self.covariance


# --------------------------------------------------------------------------
# SE(2) wrapped-Gaussian prior
# --------------------------------------------------------------------------
@partial(jax.jit, static_argnums=3)
def _se2_prior_sample(key, prior_pose, cov_sqrt, n):
    z = jax.random.normal(key, (n, 3))
    noise = z @ cov_sqrt.T
    return geom.se2_compose(jnp.broadcast_to(prior_pose, (n, 3)),
                            geom.se2_exp(noise))


@jax.jit
def _se2_prior_log_pdf(x, inv_prior, prec_chol, log_norm):
    dT = geom.se2_compose(jnp.broadcast_to(inv_prior, x.shape), x)
    v = geom.se2_log(dT)
    det_jac = jnp.abs(geom.se2_det_grad_logmap(dT))
    white = v @ prec_chol
    return log_norm - 0.5 * jnp.sum(white * white, -1) + jnp.log(det_jac)


@register_factor
class UnarySE2ApproximateGaussianPriorFactor(PriorFactor, UnaryFactor):
    """SE(2) prior with exp-map Gaussian noise and log-det-Jacobian
    corrected density (``Factors.py:682``; pdf with Jacobian :816-827)."""

    def __init__(self, var: Variable, prior_pose, covariance,
                 correlated_R_t: bool = True):
        self._vars = [var]
        self.prior_pose = np.asarray(prior_pose, dtype=np.float64).reshape(3)
        self.inv_prior = _se2_inverse_np(self.prior_pose)
        self.covariance = np.asarray(covariance, dtype=np.float64)
        self.precision = np.linalg.inv(self.covariance)
        self.cov_sqrt = _spd_sqrt(self.covariance)
        self.prec_chol = np.linalg.cholesky(self.precision)
        self.log_norm = -0.5 * (3 * _LOG_TWO_PI +
                                np.log(np.linalg.det(self.covariance)))

    @property
    def vars(self):
        return self._vars

    @property
    def observation(self):
        return self.prior_pose

    @property
    def mu(self):
        return self.prior_pose

    @property
    def is_gaussian(self):
        return True

    def sample(self, key, num_samples):
        return _se2_prior_sample(key, self.prior_pose, self.cov_sqrt,
                                 num_samples)

    def unif_to_sample(self, u):
        u = jnp.asarray(u)
        squeeze = u.ndim == 1
        z = jax.scipy.stats.norm.ppf(jnp.atleast_2d(u))
        noise = z @ self.cov_sqrt.T
        out = geom.se2_compose(jnp.broadcast_to(self.prior_pose, noise.shape),
                               geom.se2_exp(noise))
        return out[0] if squeeze else out

    def log_pdf(self, x):
        return _se2_prior_log_pdf(jnp.asarray(x), self.inv_prior,
                                  self.prec_chol, self.log_norm)

    def grad_x_log_pdf(self, x):
        f = lambda p: _se2_prior_log_pdf(p[None], self.inv_prior,
                                         self.prec_chol, self.log_norm)[0]
        return jax.vmap(jax.grad(f))(jnp.asarray(x))

    def __str__(self):
        c = self.covariance
        vals = [self.vars[0].name] + [str(v) for v in self.prior_pose] + \
               ["covariance"] + [str(v) for v in c.reshape(-1)]
        return "Factor " + type(self).__name__ + " " + " ".join(vals)

    @classmethod
    def construct_from_text(cls, line, variables):
        tok = line.strip().split()
        assert tok[0] == cls.__name__
        n2v = vars_by_name(variables)
        pose = np.array([float(tok[2]), float(tok[3]), float(tok[4])])
        mat = np.array([float(t) for t in tok[6:15]]).reshape(3, 3)
        if tok[5] == "covariance":
            cov = mat
        elif tok[5] == "information":
            cov = np.linalg.inv(mat)
        else:
            raise ValueError("covariance or information expected")
        return cls(n2v[tok[1]], pose, cov)


@register_factor
class UnarySE2ApproximateGaussianMixturePriorFactor(PriorFactor, UnaryFactor):
    """Multimodal SE(2) prior with manifold-mixture noise (``Factors.py:630``)."""

    def __init__(self, var: Variable, prior_poses: Sequence, weights,
                 covariances: Sequence):
        self._vars = [var]
        self.prior_poses = np.stack([np.asarray(p, dtype=np.float64).reshape(3)
                                     for p in prior_poses])
        w = np.asarray(weights, dtype=np.float64)
        self.weights = w / w.sum()
        self.covs = np.stack([np.asarray(c, dtype=np.float64)
                              for c in covariances])
        self.cov_sqrts = np.stack([_spd_sqrt(c) for c in self.covs])
        self.precisions = np.stack([np.linalg.inv(c) for c in self.covs])
        self.prec_chols = np.stack([np.linalg.cholesky(p)
                                    for p in self.precisions])
        self.log_norms = -0.5 * (3 * _LOG_TWO_PI +
                                 np.log(np.linalg.det(self.covs)))

    @property
    def vars(self):
        return self._vars

    @property
    def observation(self):
        return self.prior_poses

    @property
    def covariance(self):
        return self.covs

    def sample(self, key, num_samples):
        kc, kn = jax.random.split(key)
        comps = jax.random.choice(kc, len(self.weights), (num_samples,),
                                  p=jnp.asarray(self.weights))
        z = jax.random.normal(kn, (num_samples, 3))
        noise = jnp.einsum("nd,nde->ne", z, self.cov_sqrts[comps])
        return geom.se2_compose(self.prior_poses[comps], geom.se2_exp(noise))

    def log_pdf(self, x):
        x = jnp.asarray(x)
        comp_lps = []
        for k in range(len(self.weights)):
            lp = _se2_prior_log_pdf(
                x, geom.se2_inverse(jnp.asarray(self.prior_poses[k])),
                self.prec_chols[k], self.log_norms[k])
            comp_lps.append(lp + jnp.log(self.weights[k]))
        return jax.scipy.special.logsumexp(jnp.stack(comp_lps, -1), axis=-1)

    def grad_x_log_pdf(self, x):
        f = lambda p: self.log_pdf(p[None])[0]
        return jax.vmap(jax.grad(f))(jnp.asarray(x))

    def unif_to_sample(self, u):
        # component from first coordinate, remaining dims drive the noise
        u = jnp.asarray(u).reshape(-1)
        cum = jnp.cumsum(jnp.asarray(self.weights))
        comp = jnp.argmax(u[0] * 0.9999999 < cum)
        z = jax.scipy.stats.norm.ppf(jnp.clip(u, 1e-12, 1 - 1e-12))
        noise = jnp.asarray(self.cov_sqrts)[comp] @ z
        return geom.se2_compose(jnp.asarray(self.prior_poses)[comp],
                                geom.se2_exp(noise))

    def __str__(self):
        line = ["Factor", type(self).__name__, str(self.vars[0].name)]
        line += [str(p) for p in self.prior_poses]
        line.append(np.array_str(self.covs))
        return " ".join(line)


# ==========================================================================
# Relative (odometry) factors
# ==========================================================================
@register_factor
class R2RelativeGaussianLikelihoodFactor(LikelihoodFactor, BinaryFactor):
    """Linear displacement factor on R^d (``Factors.py:912``)."""

    measurement_dim = 2
    measurement_type = None  # set after class body (R2Variable)

    def __init__(self, var1, var2, observation, covariance=None,
                 precision=None):
        if var1.dim != var2.dim:
            raise ValueError("vars must share dimensionality")
        self._vars = [var1, var2]
        self.obs = np.asarray(observation, dtype=np.float64).reshape(-1)
        self.noise = GaussianDistribution(np.zeros(var1.dim), covariance,
                                          precision)
        from ..core.variables import R2Variable
        self._obs_var = R2Variable(name=f"O{var1.name}{var2.name}",
                                   variable_type=VariableType.Measurement)

    @property
    def vars(self):
        return self._vars

    @property
    def observation(self):
        return self.obs

    @property
    def observation_var(self):
        return self._obs_var

    @property
    def covariance(self):
        return self.noise.sigma

    @property
    def is_gaussian(self):
        return True

    def sample(self, key, var1=None, var2=None):
        if var1 is None and var2 is None:
            raise ValueError("need samples of at least one variable")
        n = (var1 if var1 is not None else var2).shape[0]
        noise = self.noise.rvs(key, n)
        if var1 is None:
            return jnp.asarray(var2) - noise - self.obs
        if var2 is None:
            return jnp.asarray(var1) + noise + self.obs
        return jnp.asarray(var2) - jnp.asarray(var1) + noise

    def unif_to_sample(self, u, var1=None, var2=None):
        noise = jax.scipy.stats.norm.ppf(jnp.asarray(u)) @ self.noise.cov_sqrt.T
        if var1 is None and var2 is None:
            raise ValueError("need one var")
        if var1 is None:
            return jnp.asarray(var2) - noise - self.obs
        return jnp.asarray(var1) + noise + self.obs

    def log_pdf(self, x):
        d = self.vars[0].dim
        delta = x[:, d:] - x[:, :d] - self.obs
        return self.noise.log_pdf(delta)

    def grad_x_log_pdf(self, x):
        d = self.vars[0].dim
        delta = jnp.asarray(x)[:, d:] - jnp.asarray(x)[:, :d] - self.obs
        g = self.noise.grad_x_log_pdf(delta)
        return jnp.concatenate([-g, g], axis=-1)

    def __str__(self):
        c = self.covariance
        vals = [self.var1.name, self.var2.name, str(self.obs[0]),
                str(self.obs[1]), "covariance", str(c[0, 0]), str(c[0, 1]),
                str(c[1, 0]), str(c[1, 1])]
        return "Factor " + type(self).__name__ + " " + " ".join(vals)

    @classmethod
    def construct_from_text(cls, line, variables):
        tok = line.strip().split()
        assert tok[0] == cls.__name__
        n2v = vars_by_name(variables)
        obs = np.array([float(tok[3]), float(tok[4])])
        mat = np.array([[float(tok[6]), float(tok[7])],
                        [float(tok[8]), float(tok[9])]])
        kw = {tok[5]: mat}
        return cls(n2v[tok[1]], n2v[tok[2]], obs, **kw)


# --- SE(2) relative odometry ------------------------------------------------
# Jitted directional samplers: params are traced args so all factors of one
# type share a single compiled program per batch shape (tunnel-latency
# critical: one device dispatch per schedule op instead of ~10 eager ops).
@jax.jit
def _se2_rel_sample_fwd(key, obs, cov_sqrt, var1):
    z = jax.random.normal(key, var1.shape)
    T_ij = geom.se2_compose(jnp.broadcast_to(obs, var1.shape),
                            geom.se2_exp(z @ cov_sqrt.T))
    return geom.se2_compose(var1, T_ij)


@jax.jit
def _se2_rel_sample_bwd(key, obs, cov_sqrt, var2):
    z = jax.random.normal(key, var2.shape)
    T_ij = geom.se2_compose(jnp.broadcast_to(obs, var2.shape),
                            geom.se2_exp(z @ cov_sqrt.T))
    return geom.se2_compose(var2, geom.se2_inverse(T_ij))


@jax.jit
def _se2_rel_sample_obs(key, cov_sqrt, var1, var2):
    z = jax.random.normal(key, var1.shape)
    return geom.se2_compose(geom.se2_between(var1, var2),
                            geom.se2_exp(z @ cov_sqrt.T))


@partial(jax.jit, static_argnums=(4,))
def _range_sample_dir(key, obs, sigma, src_xy, pad_heading: bool):
    kr, ka, kh = jax.random.split(key, 3)
    n = src_xy.shape[0]
    dist = obs + sigma * jax.random.normal(kr, (n, 1))
    ang = jax.random.uniform(ka, (n, 1), minval=-jnp.pi, maxval=jnp.pi)
    xy = src_xy + jnp.concatenate([dist * jnp.cos(ang),
                                   dist * jnp.sin(ang)], -1)
    if not pad_heading:
        return xy
    heading = jax.random.uniform(kh, (n, 1), minval=-jnp.pi, maxval=jnp.pi)
    return jnp.concatenate([xy, heading], -1)


@jax.jit
def _range_sample_obs(key, sigma, t1, t2):
    noise = sigma * jax.random.normal(key, (t1.shape[0], 1))
    return jnp.linalg.norm(t2 - t1, axis=1, keepdims=True) + noise


@jax.jit
def _se2_rel_log_pdf(x, inv_obs, prec_chol, log_norm):
    Ti, Tj = x[:, :3], x[:, 3:]
    rel = geom.se2_between(Ti, Tj)
    dT = geom.se2_compose(jnp.broadcast_to(inv_obs, rel.shape), rel)
    v = geom.se2_log(dT)
    det_jac = jnp.abs(geom.se2_det_grad_logmap(dT))
    white = v @ prec_chol
    return log_norm - 0.5 * jnp.sum(white * white, -1) + jnp.log(det_jac)


@register_factor
class SE2RelativeGaussianLikelihoodFactor(LikelihoodFactor, BinaryFactor):
    """SE(2) odometry with wrapped-Gaussian (exp-map) noise
    (``Factors.py:1095``; sampling :1196-1317, density :1436-1448)."""

    measurement_dim = 3
    measurement_type = SE2Variable

    def __init__(self, var1, var2, observation, covariance,
                 correlated_R_t: bool = True):
        self._vars = [var1, var2]
        self.obs = np.asarray(observation, dtype=np.float64).reshape(3)
        self.inv_obs = _se2_inverse_np(self.obs)
        self.covariance = np.asarray(covariance, dtype=np.float64)
        self.precision = np.linalg.inv(self.covariance)
        self.cov_sqrt = _spd_sqrt(self.covariance)
        self.prec_chol = np.linalg.cholesky(self.precision)
        self.log_norm = -0.5 * (3 * _LOG_TWO_PI +
                                np.log(np.linalg.det(self.covariance)))
        self._obs_var = SE2Variable(name=f"O{var1.name}{var2.name}",
                                    variable_type=VariableType.Measurement)

    @property
    def vars(self):
        return self._vars

    @property
    def observation(self):
        return self.obs

    @property
    def observation_var(self):
        return self._obs_var

    @property
    def noise_cov(self):
        return self.covariance

    @property
    def is_gaussian(self):
        return True

    def _noised_obs(self, key, n):
        z = jax.random.normal(key, (n, 3))
        noise = z @ self.cov_sqrt.T
        return geom.se2_compose(jnp.broadcast_to(self.obs, (n, 3)),
                                geom.se2_exp(noise))

    def sample(self, key, var1=None, var2=None):
        if var1 is None and var2 is None:
            raise ValueError("need samples of at least one variable")
        if var1 is None:
            return _se2_rel_sample_bwd(key, self.obs, self.cov_sqrt,
                                       jnp.asarray(var2))
        if var2 is None:
            return _se2_rel_sample_fwd(key, self.obs, self.cov_sqrt,
                                       jnp.asarray(var1))
        return _se2_rel_sample_obs(key, self.cov_sqrt, jnp.asarray(var1),
                                   jnp.asarray(var2))

    def unif_to_sample(self, u, var1=None, var2=None):
        u = jnp.asarray(u)
        squeeze = u.ndim == 1
        z = jax.scipy.stats.norm.ppf(jnp.atleast_2d(u))
        noise = z @ self.cov_sqrt.T
        T_ij = geom.se2_compose(jnp.broadcast_to(self.obs, noise.shape),
                                geom.se2_exp(noise))
        if var1 is None and var2 is None:
            raise ValueError("need one var")
        if var1 is None:
            out = geom.se2_compose(jnp.atleast_2d(jnp.asarray(var2)),
                                   geom.se2_inverse(T_ij))
        else:
            out = geom.se2_compose(jnp.atleast_2d(jnp.asarray(var1)), T_ij)
        return out[0] if squeeze else out

    def log_pdf(self, x):
        return _se2_rel_log_pdf(jnp.asarray(x), self.inv_obs, self.prec_chol,
                                self.log_norm)

    def grad_x_log_pdf(self, x):
        f = lambda p: _se2_rel_log_pdf(p[None], self.inv_obs, self.prec_chol,
                                       self.log_norm)[0]
        return jax.vmap(jax.grad(f))(jnp.asarray(x))

    def __str__(self):
        c = self.covariance
        vals = [self.var1.name, self.var2.name] + \
               [str(v) for v in self.obs] + ["covariance"] + \
               [str(v) for v in c.reshape(-1)]
        return "Factor " + type(self).__name__ + " " + " ".join(vals)

    @classmethod
    def construct_from_text(cls, line, variables):
        tok = line.strip().split()
        assert tok[0] == cls.__name__
        n2v = vars_by_name(variables)
        obs = np.array([float(tok[3]), float(tok[4]), float(tok[5])])
        mat = np.array([float(t) for t in tok[7:16]]).reshape(3, 3)
        if tok[6] == "information":
            mat = np.linalg.inv(mat)
        return cls(n2v[tok[1]], n2v[tok[2]], obs, mat)


@register_factor
class RelativeGaussianSlipGripSE2Factor(LikelihoodFactor, BinaryFactor):
    """Slip/grip odometry mixture (``Factors.py:1720``): with probability
    ``prob_slip`` the true relative motion is zero (wheel slip); otherwise a
    normal relative factor.  Sampling is per-sample Bernoulli (the reference
    draws one shared coin per batch — a defect we do not replicate)."""

    measurement_dim = 3
    measurement_type = SE2Variable

    def __init__(self, var1, var2, observation, covariance, prob_slip=0.0,
                 correlated_Rt=True):
        self._vars = [var1, var2]
        self.obs = np.asarray(observation, dtype=np.float64).reshape(3)
        self.prob_slip = float(prob_slip)
        self.grip = SE2RelativeGaussianLikelihoodFactor(
            var1, var2, observation, covariance)
        self.cov_sqrt = self.grip.cov_sqrt
        self._obs_var = SE2Variable(name=f"O{var1.name}{var2.name}",
                                    variable_type=VariableType.Measurement)

    @property
    def vars(self):
        return self._vars

    @property
    def observation(self):
        return self.obs

    @property
    def observation_var(self):
        return self._obs_var

    def _noised_rel(self, key, n):
        kb, kn = jax.random.split(key)
        z = jax.random.normal(kn, (n, 3))
        noise = geom.se2_exp(z @ self.cov_sqrt.T)
        slipped = jax.random.uniform(kb, (n, 1)) < self.prob_slip
        with_obs = geom.se2_compose(jnp.broadcast_to(self.obs, (n, 3)), noise)
        return jnp.where(slipped, noise, with_obs)

    def sample(self, key, var1=None, var2=None):
        if var1 is None and var2 is None:
            raise ValueError("need samples of at least one variable")
        if var1 is None:
            var2 = jnp.asarray(var2)
            rel = self._noised_rel(key, var2.shape[0])
            return geom.se2_compose(var2, geom.se2_inverse(rel))
        if var2 is None:
            var1 = jnp.asarray(var1)
            rel = self._noised_rel(key, var1.shape[0])
            return geom.se2_compose(var1, rel)
        var1, var2 = jnp.asarray(var1), jnp.asarray(var2)
        kb, kn = jax.random.split(key)
        n = var1.shape[0]
        z = jax.random.normal(kn, (n, 3))
        noise = geom.se2_exp(z @ self.cov_sqrt.T)
        slipped = jax.random.uniform(kb, (n, 1)) < self.prob_slip
        true_rel = geom.se2_between(var1, var2)
        obs_grip = geom.se2_compose(true_rel, noise)
        obs_slip = geom.se2_compose(jnp.broadcast_to(self.obs, (n, 3)), noise)
        return jnp.where(slipped, obs_slip, obs_grip)

    def log_pdf(self, x):
        grip_lp = self.grip.log_pdf(x) + jnp.log(1.0 - self.prob_slip)
        slip_f = SE2RelativeGaussianLikelihoodFactor(
            self.var1, self.var2, np.zeros(3), self.grip.covariance)
        slip_lp = slip_f.log_pdf(x) + jnp.log(max(self.prob_slip, 1e-300))
        return jnp.logaddexp(grip_lp, slip_lp)


# ==========================================================================
# Bearing factor
# ==========================================================================
@register_factor
class SE2BearingLikelihoodFactor(LikelihoodFactor, BinaryFactor):
    """Bearing-only factor between SE(2) poses (``Factors.py:1481``)."""

    measurement_dim = 1
    measurement_type = Bearing2DVariable

    def __init__(self, var1, var2, observation, sigma, min_range=0.1,
                 max_range=1.0):
        assert min_range < max_range
        self._vars = [var1, var2]
        self.obs = np.asarray(observation, dtype=np.float64).reshape(1)
        self.sigma = float(sigma)
        self.variance = sigma ** 2
        self.min_range = float(min_range)
        self.max_range = float(max_range)
        self._obs_var = Bearing2DVariable(
            name=f"O{var1.name}{var2.name}",
            variable_type=VariableType.Measurement)

    @property
    def vars(self):
        return self._vars

    @property
    def observation(self):
        return self.obs

    @property
    def observation_var(self):
        return self._obs_var

    def sample(self, key, var1=None, var2=None):
        if var1 is not None and var2 is not None:
            var1, var2 = jnp.asarray(var1), jnp.asarray(var2)
            noise = self.sigma * jax.random.normal(key, (var1.shape[0], 1))
            return geom.wrap_angle(var2[:, 2:3] - var1[:, 2:3] + noise)
        ka, kd = jax.random.split(key)
        if var2 is None:
            var1 = jnp.asarray(var1)
            n = var1.shape[0]
            ang = self.obs + self.sigma * jax.random.normal(ka, (n, 1))
            dist = jax.random.uniform(kd, (n, 1), minval=self.min_range,
                                      maxval=self.max_range)
            th1 = var1[:, 2:3]
            xy = var1[:, :2] + jnp.concatenate(
                [dist * jnp.cos(th1), dist * jnp.sin(th1)], -1)
            th2 = geom.wrap_angle(th1 + ang)
            return jnp.concatenate([xy, th2], -1)
        var2 = jnp.asarray(var2)
        n = var2.shape[0]
        ang = geom.wrap_angle(var2[:, 2:3] - self.obs -
                              self.sigma * jax.random.normal(ka, (n, 1)))
        dist = jax.random.uniform(kd, (n, 1), minval=self.min_range,
                                  maxval=self.max_range)
        xy = var2[:, :2] - jnp.concatenate(
            [dist * jnp.cos(ang), dist * jnp.sin(ang)], -1)
        return jnp.concatenate([xy, ang], -1)

    def unif_to_sample(self, u, var1=None, var2=None):
        u = jnp.asarray(u).reshape(-1)
        ang = (self.sigma * jax.scipy.stats.norm.ppf(u[1]) + self.obs[0])
        dist = self.min_range + u[0] * (self.max_range - self.min_range)
        if var1 is None:
            var2 = jnp.asarray(var2).reshape(-1)
            th = geom.wrap_angle(var2[2] - ang)
            xy = var2[:2] - jnp.array([dist * jnp.cos(th),
                                       dist * jnp.sin(th)])
            return jnp.concatenate([xy, th[None]])
        var1 = jnp.asarray(var1).reshape(-1)
        th1 = var1[2]
        xy = var1[:2] + jnp.array([dist * jnp.cos(th1), dist * jnp.sin(th1)])
        return jnp.concatenate([xy, geom.wrap_angle(th1 + ang)[None]])

    def log_pdf(self, x):
        x = jnp.asarray(x)
        delta = x[:, 5] - x[:, 2] - self.obs[0]
        return (-0.5 * delta ** 2 / self.variance
                - 0.5 * (_LOG_TWO_PI + jnp.log(self.variance)))

    def evaluate_loglike(self, x):
        x = jnp.asarray(x).reshape(-1)
        delta = x[5] - x[2] - self.obs[0]
        return (-0.5 * delta ** 2 / self.variance
                - 0.5 * _LOG_TWO_PI - jnp.log(self.sigma))

    def __str__(self):
        vals = [self.var1.name, self.var2.name, str(self.obs[0]),
                str(self.sigma), str(self.min_range), str(self.max_range)]
        return "Factor " + type(self).__name__ + " " + " ".join(vals)

    @classmethod
    def construct_from_text(cls, line, variables):
        tok = line.strip().split()
        assert tok[0] == cls.__name__
        n2v = vars_by_name(variables)
        args = [n2v[tok[1]], n2v[tok[2]], float(tok[3]), float(tok[4])]
        extras = [float(t) for t in tok[5:7]]
        return cls(*args, *extras)


# ==========================================================================
# Range factors
# ==========================================================================
class _RangeFactorBase(LikelihoodFactor, BinaryFactor):
    """Shared machinery for all Gaussian range factors.

    Reference: R2R2 ``Factors.py:2026``, SE2R2 ``:2510``, SE2SE2 ``:2754``.
    The translation block of each endpoint starts at index 0 by convention
    (asserted in the reference at ``Factors.py:2786-2787``).
    """

    measurement_dim = 1
    measurement_type = R1Variable

    def __init__(self, var1, var2, observation, sigma=1.0):
        self._vars = [var1, var2]
        self.obs = (np.asarray(observation, dtype=np.float64).reshape(1)
                    if not np.isscalar(observation)
                    else np.array([float(observation)]))
        self.sigma = float(sigma)
        self.variance = sigma ** 2
        self._obs_var = R1Variable(name=f"O{var1.name}{var2.name}",
                                   variable_type=VariableType.Measurement)

    @property
    def vars(self):
        return self._vars

    @property
    def observation(self):
        return self.obs

    @property
    def observation_var(self):
        return self._obs_var

    # -- helpers
    def _t1(self, x):
        return x[:, :2]

    def _t2(self, x):
        d1 = self.var1.dim
        return x[:, d1:d1 + 2]

    def sample(self, key, var1=None, var2=None):
        if var1 is None and var2 is None:
            raise ValueError("need samples of at least one variable")
        if var1 is not None and var2 is not None:
            var1, var2 = jnp.asarray(var1), jnp.asarray(var2)
            return _range_sample_obs(key, self.sigma, var1[:, :2],
                                     var2[:, :2])
        if var2 is None:
            var1 = jnp.asarray(var1)
            return _range_sample_dir(key, self.obs, self.sigma,
                                     var1[:, :2], self.var2.dim == 3)
        var2 = jnp.asarray(var2)
        return _range_sample_dir(key, self.obs, self.sigma, var2[:, :2],
                                 self.var1.dim == 3)

    def unif_to_sample(self, u, var1=None, var2=None):
        """Supports both a single ``(du,)`` draw and batched ``(n, du)``."""
        u = jnp.asarray(u)
        squeeze = u.ndim == 1
        u = jnp.atleast_2d(u)
        dist = self.sigma * jax.scipy.stats.norm.ppf(u[:, 0]) + self.obs[0]
        ang = (u[:, 1] - 0.5) * _TWO_PI
        shift = jnp.stack([dist * jnp.cos(ang), dist * jnp.sin(ang)], -1)
        if var1 is None and var2 is None:
            raise ValueError("need one var")
        src = jnp.atleast_2d(jnp.asarray(var2 if var1 is None else var1))
        target = self.var1 if var1 is None else self.var2
        xy = src[:, :2] + shift
        if target.dim == 2:
            out = xy
        else:
            heading = (u[:, 2] - 0.5) * _TWO_PI
            out = jnp.concatenate([xy, heading[:, None]], -1)
        return out[0] if squeeze else out

    def log_pdf(self, x):
        x = jnp.asarray(x)
        delta = (jnp.linalg.norm(self._t2(x) - self._t1(x), axis=1)
                 - self.obs[0])
        return (-0.5 * delta ** 2 / self.variance
                - 0.5 * _LOG_TWO_PI - jnp.log(self.sigma))

    def log_ancestral_density(self, x, var1_sampled: bool = True):
        """Density of the ring draw (``_range_sample_dir`` /
        ``unif_to_sample``): Gaussian radius x uniform angle.  In the
        target's 2D coordinates that is N(rho; r, sigma)/(2*pi*rho) —
        ``log_pdf`` plus the polar Jacobian -log(2*pi*rho); when the
        drawn endpoint is SE(2) its heading is uniform, adding a
        constant -log(2*pi).  ``var1_sampled`` names the KNOWN endpoint
        (joint.py tree-binary convention), so the drawn target is var2
        when True."""
        x = jnp.asarray(x)
        rho = jnp.maximum(
            jnp.linalg.norm(self._t2(x) - self._t1(x), axis=1), 1e-8)
        target = self.var2 if var1_sampled else self.var1
        out = self.log_pdf(x) - jnp.log(_TWO_PI * rho)
        if target.dim == 3:
            out = out - jnp.log(_TWO_PI)
        return out

    def grad_x_log_pdf(self, x):
        """Analytic gradient with the reference's near-zero-distance guard
        (``Factors.py:2203-2220``)."""
        x = jnp.asarray(x)
        d1 = self.var1.dim
        diff = self._t1(x) - self._t2(x)
        dist = jnp.linalg.norm(diff, axis=1, keepdims=True)
        delta = dist - self.obs[0]
        dist_safe = jnp.maximum(dist, 1e-8)
        coeff = (-delta / self.variance) / dist_safe
        g1 = coeff * diff
        out = jnp.zeros_like(x)
        out = out.at[:, :2].set(g1)
        out = out.at[:, d1:d1 + 2].set(-g1)
        return out

    def evaluate_loglike(self, x):
        x = jnp.asarray(x).reshape(-1)
        d1 = self.var1.dim
        delta = jnp.linalg.norm(x[:2] - x[d1:d1 + 2]) - self.obs[0]
        return (-0.5 * delta ** 2 / self.variance
                - 0.5 * _LOG_TWO_PI - jnp.log(self.sigma))

    def __str__(self):
        vals = [self.var1.name, self.var2.name, str(self.obs[0]),
                str(self.sigma)]
        return "Factor " + type(self).__name__ + " " + " ".join(vals)

    @classmethod
    def construct_from_text(cls, line, variables):
        tok = line.strip().split()
        assert tok[0] == cls.__name__
        n2v = vars_by_name(variables)
        return cls(n2v[tok[1]], n2v[tok[2]], float(tok[3]), float(tok[4]))


@register_factor
class R2RangeGaussianLikelihoodFactor(_RangeFactorBase):
    """Range between two R^2 variables (``Factors.py:2026``)."""


@register_factor
class SE2R2RangeGaussianLikelihoodFactor(_RangeFactorBase):
    """Range from an SE(2) pose to an R^2 landmark (``Factors.py:2510``)."""


@register_factor
class SE2SE2RangeGaussianLikelihoodFactor(_RangeFactorBase):
    """Range between two SE(2) poses (``Factors.py:2754``)."""


@register_factor
class UncertainR2RangeGaussianLikelihoodFactor(_RangeFactorBase):
    """Sensor-failure-aware range factor (``Factors.py:2311``;
    arXiv:1812.02609): when observed, samples use the posterior-fused radius
    distribution; when unobserved, the loglike is the miss model."""

    def __init__(self, var1, var2, observation, sigma=1.0,
                 observed_flag=False, unobserved_sigma=0.3):
        super().__init__(var1, var2, observation, sigma)
        self.raw_sigma = float(sigma)
        self.observed_flag = bool(observed_flag)
        self.unobserved_sigma = float(unobserved_sigma)
        s2, u2 = sigma ** 2, unobserved_sigma ** 2
        self.fused_var = s2 * u2 / (s2 + u2)
        self.fused_mu = u2 * float(self.obs[0]) / (s2 + u2)
        # sampling / ppf use the fused distribution
        self.obs_fused = np.array([self.fused_mu])

    def sample(self, key, var1=None, var2=None):
        assert self.observed_flag
        saved_obs, saved_sigma = self.obs, self.sigma
        try:
            self.obs = self.obs_fused
            self.sigma = float(np.sqrt(self.fused_var))
            return super().sample(key, var1, var2)
        finally:
            self.obs, self.sigma = saved_obs, saved_sigma

    def unif_to_sample(self, u, var1=None, var2=None):
        assert self.observed_flag
        saved_obs, saved_sigma = self.obs, self.sigma
        try:
            self.obs = self.obs_fused
            self.sigma = float(np.sqrt(self.fused_var))
            return super().unif_to_sample(u, var1, var2)
        finally:
            self.obs, self.sigma = saved_obs, saved_sigma

    def evaluate_loglike(self, x):
        x = jnp.asarray(x).reshape(-1)
        d1 = self.var1.dim
        delta = jnp.linalg.norm(x[:2] - x[d1:d1 + 2])
        if not self.observed_flag:
            return jnp.log(1.0 - jnp.exp(-0.5 * delta ** 2 /
                                         self.unobserved_sigma ** 2))
        return -0.5 * (delta - self.fused_mu) ** 2 / self.fused_var

    def __str__(self):
        vals = [self.var1.name, self.var2.name, str(self.obs[0]),
                str(self.raw_sigma), str(int(self.observed_flag)),
                str(self.unobserved_sigma)]
        return "Factor " + type(self).__name__ + " " + " ".join(vals)

    @classmethod
    def construct_from_text(cls, line, variables):
        tok = line.strip().split()
        assert tok[0] == cls.__name__
        n2v = vars_by_name(variables)
        return cls(n2v[tok[1]], n2v[tok[2]], float(tok[3]), float(tok[4]),
                   bool(int(tok[5])), float(tok[6]))
