"""Mixture / ambiguous-data-association factors.

Parity with reference ``src/factors/Factors.py`` lines 3012-3462
(``KWayFactor:3012``, ``BinaryFactorMixture:3043``,
``AmbiguousDataAssociationFactor:3192``, ``BinaryFactorWithNullHypo:3300``)
— re-designed with vectorized per-component evaluation: each component is
evaluated on the full batch and the per-sample component assignment is a
select, instead of the reference's block-partitioned ``np.random.multinomial``
slicing (equivalent in distribution, and jit-friendly).
"""
from __future__ import annotations

from typing import Dict, Iterable, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.variables import Variable
from ..utils.keys import split_host
from .factors import (FACTOR_REGISTRY, BinaryFactor, Factor,
                      LikelihoodFactor, register_factor)


class KWayFactor(Factor):
    """Marker for factors connecting an observer to K candidates."""

    @property
    def root_var(self) -> Variable:
        raise NotImplementedError

    @property
    def child_vars(self) -> List[Variable]:
        raise NotImplementedError


class BinaryFactorMixture(LikelihoodFactor):
    """Weighted mixture of binary factors (``Factors.py:3043``)."""

    def __init__(self, observer_var: Variable,
                 observed_vars: Sequence[Variable], weights,
                 binary_factor_class, obs_arr: Sequence, sigma_arr: Sequence):
        w = np.asarray(weights, dtype=np.float64)
        assert np.all(w > 0)
        assert len(w) == len(obs_arr) == len(sigma_arr) == len(observed_vars)
        self.observer_var = observer_var
        # de-duplicate observed vars, preserving order
        seen = set()
        self.observed_vars = [v for v in observed_vars
                              if not (v in seen or seen.add(v))]
        self._vars = [observer_var] + self.observed_vars
        self.weights = w / w.sum()
        self.cum_weights = np.cumsum(self.weights)
        self.observations = list(obs_arr)
        self.sigmas = list(sigma_arr)
        self.components = [binary_factor_class(observer_var, var, obs_arr[i],
                                               sigma_arr[i])
                           for i, var in enumerate(observed_vars)]
        # column indices of each variable in the stacked (observer, observed)
        self.var2idx: Dict[Variable, np.ndarray] = {}
        start = 0
        for v in self._vars:
            self.var2idx[v] = np.arange(start, start + v.dim)
            start += v.dim
        self.comp2idx = {
            comp: np.concatenate([self.var2idx[comp.var1],
                                  self.var2idx[comp.var2]])
            for comp in self.components}

    # ------------------------------------------------------------------ meta
    @property
    def vars(self):
        return self._vars

    @property
    def observation_var(self):
        return self.components[0].observation_var

    @property
    def measurement_dim(self):
        return self.observation_var.dim

    @property
    def is_gaussian(self):
        return False

    # ------------------------------------------------------------- densities
    def component_log_pdfs(self, x) -> jax.Array:
        """(n, k) weighted per-component log densities."""
        x = jnp.asarray(x)
        cols = []
        for i, comp in enumerate(self.components):
            cols.append(comp.log_pdf(x[:, self.comp2idx[comp]]) +
                        jnp.log(self.weights[i]))
        return jnp.stack(cols, axis=-1)

    def log_pdf(self, x):
        return jax.scipy.special.logsumexp(self.component_log_pdfs(x), -1)

    def pdf(self, x):
        return jnp.exp(self.log_pdf(x))

    def evaluate_loglike(self, x):
        """Max-approximated mixture loglike when one hypothesis dominates
        (reference ``Factors.py:3109-3124``)."""
        x = jnp.asarray(x).reshape(-1)
        lps = self.component_log_pdfs(x[None])[0]
        top2 = jax.lax.top_k(lps, min(2, lps.shape[0]))[0]
        dominated = (top2.shape[0] < 2) | (top2[0] - top2[-1] > 5.0)
        return jnp.where(dominated, top2[0],
                         jax.scipy.special.logsumexp(lps))

    def grad_x_log_pdf(self, x):
        x = jnp.asarray(x)
        lps = self.component_log_pdfs(x)           # (n, k) already weighted
        resp = jax.nn.softmax(lps, axis=-1)
        out = jnp.zeros_like(x)
        for i, comp in enumerate(self.components):
            idx = self.comp2idx[comp]
            g = comp.grad_x_log_pdf(x[:, idx])
            out = out.at[:, idx].add(resp[:, i:i + 1] * g)
        return out

    # -------------------------------------------------------------- sampling
    def _component_assignment(self, key, n):
        return jax.random.choice(key, len(self.components), (n,),
                                 p=jnp.asarray(self.weights))

    def sample_observations(self, key, var_samples: Dict[Variable, jax.Array]
                            ) -> jax.Array:
        """Draw observation columns given samples of all endpoint vars
        (reference ``Factors.py:3146-3157``)."""
        n = var_samples[self.observer_var].shape[0]
        kc, ks = split_host(key)
        comps = self._component_assignment(kc, n)
        keys = split_host(ks, len(self.components))
        out = jnp.zeros((n, self.measurement_dim))
        for i, comp in enumerate(self.components):
            obs_i = comp.sample(keys[i], var1=var_samples[comp.var1],
                                var2=var_samples[comp.var2])
            out = jnp.where((comps == i)[:, None], obs_i, out)
        return out

    def posterior_weights(self, var2x: Dict[Variable, np.ndarray]) -> np.ndarray:
        """Re-evaluate hypothesis weights from posterior samples
        (reference ``Factors.py:3159-3180``)."""
        x = np.concatenate([np.asarray(var2x[v]) for v in self.vars], axis=1)
        like = np.stack([
            np.asarray(comp.pdf(x[:, self.comp2idx[comp]])) * self.weights[i]
            for i, comp in enumerate(self.components)])
        tot = like.sum(axis=0)
        ok = tot > 0.0
        hypo = np.full((len(self.components), x.shape[0]), 0.5)
        hypo[:, ok] = like[:, ok] / tot[ok]
        return hypo.sum(axis=1) / hypo.sum()

    # ------------------------------------------------------------------ text
    def _str_tail(self) -> List[str]:
        line = ["Observer", str(self.observer_var.name), "Observed"]
        line += [str(v.name) for v in self.observed_vars]
        line += ["Weights"] + [str(w) for w in self.weights]
        line += ["Binary", type(self.components[0]).__name__, "Observation"]
        obs = self.observations[0]
        if isinstance(obs, (np.ndarray, list)):
            line += [str(v) for v in np.asarray(obs).reshape(-1)]
        else:
            line += [str(obs)]
        line += ["Sigma"]
        sig = self.sigmas[0]
        if np.isscalar(sig):
            line += [str(sig)]
        else:
            line += [str(v) for v in np.asarray(sig).reshape(-1)]
        return line

    @staticmethod
    def _parse_common(tok: List[str], variables: Iterable[Variable]):
        from .factors import vars_by_name
        n2v = vars_by_name(variables)
        i_obsr = tok.index("Observer") + 1
        i_obsd = tok.index("Observed") + 1
        i_w = tok.index("Weights") + 1
        i_f = tok.index("Binary") + 1
        i_o = tok.index("Observation") + 1
        i_s = tok.index("Sigma") + 1
        observer = n2v[tok[i_obsr]]
        observed = [n2v[tok[i]] for i in range(i_obsd, i_w - 1)]
        weights = np.array(tok[i_w:i_f - 1], dtype=float)
        binary_cls = FACTOR_REGISTRY[tok[i_f]]
        obs_len = i_s - i_o - 1
        if obs_len == 1:
            observation = float(tok[i_o])
            sigma = float(tok[i_s])
        else:
            observation = np.array(tok[i_o:i_s - 1], dtype=float)
            sigma = np.array(tok[i_s:i_s + obs_len * obs_len],
                             dtype=float).reshape(obs_len, obs_len)
        return observer, observed, weights, binary_cls, observation, sigma, \
            n2v, tok


class BinaryMixtureWithSameData(BinaryFactorMixture):
    @property
    def observation(self):
        return self.components[0].observation


@register_factor
class AmbiguousDataAssociationFactor(BinaryMixtureWithSameData, KWayFactor):
    """K-way ambiguous data association (``Factors.py:3192``): one observer,
    K candidate observed variables sharing one raw measurement."""

    def __init__(self, observer_var, observed_vars, weights,
                 binary_factor_class, observation, sigma):
        k = len(observed_vars)
        assert k == len(weights)
        super().__init__(observer_var, observed_vars, weights,
                         binary_factor_class, [observation] * k, [sigma] * k)

    @property
    def root_var(self):
        return self.observer_var

    @property
    def child_vars(self):
        return self.observed_vars

    def sample_observer(self, key, var2sample: Dict[Variable, jax.Array]
                        ) -> jax.Array:
        """Sample the observer variable given all observed vars
        (reference ``Factors.py:3260``)."""
        n = var2sample[self.observed_vars[0]].shape[0]
        kc, ks = split_host(key)
        comps = self._component_assignment(kc, n)
        keys = split_host(ks, len(self.components))
        out = jnp.zeros((n, self.observer_var.dim))
        for i, comp in enumerate(self.components):
            if comp.var1 == self.observer_var:
                s = comp.sample(keys[i], var2=var2sample[comp.var2])
            else:
                s = comp.sample(keys[i], var1=var2sample[comp.var1])
            out = jnp.where((comps == i)[:, None], s, out)
        return out

    def __str__(self):
        return "Factor " + type(self).__name__ + " " + \
            " ".join(self._str_tail())

    @classmethod
    def construct_from_text(cls, line, variables):
        tok = line.strip().split()
        assert tok[0] == cls.__name__
        observer, observed, weights, bcls, obs, sigma, _, _ = \
            cls._parse_common(tok, variables)
        return cls(observer, observed, weights, bcls, obs, sigma)


@register_factor
class BinaryFactorWithNullHypo(BinaryMixtureWithSameData, BinaryFactor):
    """Outlier-robust binary factor: true hypothesis + inflated-noise null
    hypothesis (``Factors.py:3300``)."""

    def __init__(self, var1, var2, weights, binary_factor_class, observation,
                 sigma, null_sigma_scale=10.0):
        assert len(weights) == 2
        self.null_sigma_scale = float(null_sigma_scale)
        super().__init__(var1, [var2, var2], weights, binary_factor_class,
                         [observation] * 2,
                         [sigma, sigma * null_sigma_scale])

    def _mixture_binary_sample(self, key, var1=None, var2=None):
        given = var1 if var1 is not None else var2
        n = jnp.asarray(given).shape[0]
        kc, ks = split_host(key)
        comps = self._component_assignment(kc, n)
        keys = split_host(ks, len(self.components))
        outs = []
        for i, comp in enumerate(self.components):
            outs.append(comp.sample(keys[i], var1=var1, var2=var2))
        out = outs[0]
        for i in range(1, len(outs)):
            out = jnp.where((comps == i)[:, None], outs[i], out)
        return out

    def sample(self, key, var1=None, var2=None):
        if var1 is None and var2 is None:
            raise ValueError("need samples of at least one variable")
        if var1 is not None and var2 is not None:
            n = jnp.asarray(var1).shape[0]
            kc, ks = split_host(key)
            comps = self._component_assignment(kc, n)
            keys = split_host(ks, len(self.components))
            out = jnp.zeros((n, self.measurement_dim))
            for i, comp in enumerate(self.components):
                s = comp.sample(keys[i], var1=var1, var2=var2)
                out = jnp.where((comps == i)[:, None], s, out)
            return out
        return self._mixture_binary_sample(key, var1, var2)

    def unif_to_sample(self, u, var1=None, var2=None):
        """CDF-inversion through the mixture: the first uniform coordinate
        picks the component and is rescaled (``Factors.py:3376-3404``).
        Supports single ``(du,)`` and batched ``(n, du)`` input."""
        u = jnp.asarray(u, dtype=jnp.float32)
        squeeze = u.ndim == 1
        u = jnp.atleast_2d(u)
        cum = jnp.asarray(self.cum_weights)
        comp_idx = jnp.clip(
            jnp.sum((u[:, :1] >= cum[None, :-1]).astype(jnp.int32), axis=1),
            0, len(self.components) - 1)
        offsets = jnp.concatenate([jnp.zeros(1), cum[:-1]])
        w = jnp.asarray(self.weights)
        u0 = (u[:, 0] - offsets[comp_idx]) / w[comp_idx]
        u = u.at[:, 0].set(jnp.clip(u0, 0.0, 1.0))
        v1 = None if var1 is None else jnp.atleast_2d(jnp.asarray(var1))
        v2 = None if var2 is None else jnp.atleast_2d(jnp.asarray(var2))
        outs = [comp.unif_to_sample(u, var1=v1, var2=v2)
                for comp in self.components]
        out = outs[0]
        for i in range(1, len(outs)):
            out = jnp.where((comp_idx == i)[:, None], outs[i], out)
        return out[0] if squeeze else out

    def __str__(self):
        tail = self._str_tail() + ["NullSigmaScale", str(self.null_sigma_scale)]
        return "Factor " + type(self).__name__ + " " + " ".join(tail)

    @classmethod
    def construct_from_text(cls, line, variables):
        tok = line.strip().split()
        assert tok[0] == cls.__name__
        observer, observed, weights, bcls, obs, sigma, _, _ = \
            cls._parse_common(tok, variables)
        i_null = tok.index("NullSigmaScale") + 1
        return cls(observer, observed[0], weights, bcls, obs, sigma,
                   float(tok[i_null]))
