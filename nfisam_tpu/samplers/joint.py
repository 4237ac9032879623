"""Dense joint densities over a variable list, and the structured
(ancestral) prior transform used by nested sampling.

Parity with reference ``src/sampler/sampler_utils.py`` (``JointFactor:11``,
``StructuredJointFactorForSLAM:140``, ``JointFactorForNestedSampler:281``)
— re-designed TPU-first: the joint log-density over all factors compiles to
ONE jitted program evaluating every factor on the full ``(n, dim)`` batch
(the reference's per-point Python ``loglike`` was the scalability killer:
5.18M interpreter calls on case1 step 5, SURVEY §3.5).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.variables import Variable
from ..factors.factors import Factor
from ..factors.utils import unpack_prior_binary_nh_da_factors
from ..utils.keys import split_host


class JointFactor:
    """Joint density = product of factors over a stacked variable vector."""

    def __init__(self, factors: Sequence[Factor],
                 vars: Sequence[Variable]) -> None:
        self._vars = list(vars)
        self._factors = list(factors)
        self.var_to_indices: Dict[Variable, List[int]] = {}
        cur = 0
        for v in self._vars:
            self.var_to_indices[v] = list(range(cur, cur + v.dim))
            cur += v.dim
        self.dim = cur
        self.factor_to_indices: Dict[Factor, List[int]] = {}
        for f in self._factors:
            idx: List[int] = []
            for v in f.vars:
                idx += self.var_to_indices[v]
            self.factor_to_indices[f] = idx
        self._jit_log_pdf = None
        self._jit_grad = None

    @property
    def vars(self) -> List[Variable]:
        return self._vars

    @property
    def factors(self) -> List[Factor]:
        return self._factors

    @property
    def is_gaussian(self) -> bool:
        return all(f.is_gaussian for f in self._factors)

    @property
    def circular_dim_list(self) -> List[bool]:
        out: List[bool] = []
        for v in self._vars:
            out += v.circular_dim_list
        return out

    # ------------------------------------------------------------ compiled
    def _build(self):
        idx_list = [np.asarray(self.factor_to_indices[f])
                    for f in self._factors]
        factors = self._factors

        def log_pdf_all(x):
            total = jnp.zeros(x.shape[0])
            for f, idx in zip(factors, idx_list):
                total = total + f.log_pdf(x[:, idx])
            return total

        self._jit_log_pdf = jax.jit(log_pdf_all)
        self._jit_grad = jax.jit(
            lambda x: jax.vmap(jax.grad(
                lambda row: log_pdf_all(row[None])[0]))(x))

    def log_pdf(self, x) -> jax.Array:
        if self._jit_log_pdf is None:
            self._build()
        return self._jit_log_pdf(jnp.asarray(x, dtype=jnp.float32))

    def pdf(self, x) -> jax.Array:
        return jnp.exp(self.log_pdf(x))

    def grad_x_log_pdf(self, x) -> jax.Array:
        if self._jit_log_pdf is None:
            self._build()
        return self._jit_grad(jnp.asarray(x, dtype=jnp.float32))


class StructuredJointFactor(JointFactor):
    """Joint factor with an ancestral-sampling split: 'tree' factors drive
    the prior transform; the rest become the nested-sampling likelihood
    (reference ``StructuredJointFactorForSLAM`` sampler_utils.py:140)."""

    def __init__(self, factors: Sequence[Factor],
                 variable_pattern: Sequence[Variable]) -> None:
        super().__init__(factors, variable_pattern)
        priors, binaries, nh, da = unpack_prior_binary_nh_da_factors(
            list(factors))
        sampled: set = set()
        self.tree_priors: List[Factor] = []
        self.likelihood_factors: List[Factor] = []
        for f in priors:
            if set(f.vars) & sampled:
                self.likelihood_factors.append(f)
            else:
                self.tree_priors.append(f)
                sampled.update(f.vars)
        self.tree_binaries: List = []   # (factor, var1_sampled: bool)
        queue = list(binaries)
        added_nh = False
        guard = 0
        while queue or (nh and not added_nh):
            if not added_nh and not queue:
                queue = list(nh)
                added_nh = True
            f = queue.pop(0)
            known = [v for v in f.vars if v in sampled]
            if len(known) == 0:
                queue.append(f)
                guard += 1
                if guard > 10000:
                    raise ValueError("Disconnected factors: " + str(f))
                continue
            if len(known) == 2:
                self.likelihood_factors.append(f)
                continue
            v1, v2 = f.vars[0], f.vars[1]
            if known[0] == v1:
                if v1.dim < v2.dim and queue:
                    queue.append(f)
                    continue
                if v1.dim < v2.dim:
                    raise ValueError(
                        "Only remaining factor needs landmark->pose "
                        "sampling: " + str(f))
                self.tree_binaries.append((f, True))
                sampled.add(v2)
            else:
                if v2.dim < v1.dim and queue:
                    queue.append(f)
                    continue
                if v2.dim < v1.dim:
                    raise ValueError(
                        "Only remaining factor needs landmark->pose "
                        "sampling: " + str(f))
                self.tree_binaries.append((f, False))
                sampled.add(v1)
        for f in da:
            if set(f.vars).issubset(sampled):
                self.likelihood_factors.append(f)
            else:
                raise ValueError("Unsampled DA variables in " + str(f))
        assert len(sampled) == len(self._vars)
        self._jit_ptform = None
        self._jit_loglike = None

    @property
    def if_direct_sampling(self) -> bool:
        return len(self.likelihood_factors) == 0

    # ------------------------------------------------------------ sampling
    def sample(self, key, num_samples: int) -> jax.Array:
        """Pure ancestral draw through the tree factors."""
        x = jnp.zeros((num_samples, self.dim))
        n_ops = len(self.tree_priors) + len(self.tree_binaries)
        keys = split_host(key, max(n_ops, 1))
        ki = 0
        for f in self.tree_priors:
            idx = np.asarray(self.factor_to_indices[f])
            x = x.at[:, idx].set(f.sample(keys[ki], num_samples))
            ki += 1
        for f, var1_sampled in self.tree_binaries:
            idx = self.factor_to_indices[f]
            i1 = np.asarray(idx[:f.vars[0].dim])
            i2 = np.asarray(idx[f.vars[0].dim:])
            if var1_sampled:
                x = x.at[:, i2].set(f.sample(keys[ki], var1=x[:, i1]))
            else:
                x = x.at[:, i1].set(f.sample(keys[ki], var2=x[:, i2]))
            ki += 1
        return x

    # ------------------------------------------------- nested-sampling API
    def _build_ns(self):
        tree_priors = self.tree_priors
        tree_binaries = self.tree_binaries
        f2i = {f: np.asarray(i) for f, i in self.factor_to_indices.items()}

        def ptform(u):
            """(n, dim) unit cube -> (n, dim) parameters."""
            x = jnp.zeros_like(u)
            for f in tree_priors:
                idx = f2i[f]
                x = x.at[:, idx].set(f.unif_to_sample(u[:, idx]))
            for f, var1_sampled in tree_binaries:
                idx = self.factor_to_indices[f]
                i1 = np.asarray(idx[:f.vars[0].dim])
                i2 = np.asarray(idx[f.vars[0].dim:])
                if var1_sampled:
                    x = x.at[:, i2].set(
                        f.unif_to_sample(u[:, i2], var1=x[:, i1]))
                else:
                    x = x.at[:, i1].set(
                        f.unif_to_sample(u[:, i1], var2=x[:, i2]))
            return x

        like_factors = self.likelihood_factors

        def loglike(x):
            """(n, dim) params -> (n,) likelihood of non-tree factors."""
            total = jnp.zeros(x.shape[0])
            for f in like_factors:
                xi = x[:, f2i[f]]
                total = total + jax.vmap(f.evaluate_loglike)(xi)
            return total

        def logprior(x):
            """(n, dim) params -> (n,) ancestral (tree-factor) log density
            — the density of the measure ``sample``/``ptform`` draw from.
            MCMC move kernels over that measure (SMC's MH) need this
            explicitly: a random-walk step in x-space that only weighs the
            tempered likelihood targets ``like^beta`` instead of
            ``prior * like^beta`` and inflates the posterior."""
            total = jnp.zeros(x.shape[0])
            for f in tree_priors:
                total = total + f.log_pdf(x[:, f2i[f]])
            for f, var1_sampled in tree_binaries:
                # NOT log_pdf: ring-sampled range edges carry a polar
                # -log(rho) Jacobian in the measure sample()/ptform
                # actually draw from (advisor round-4 finding)
                total = total + f.log_ancestral_density(
                    x[:, f2i[f]], var1_sampled=var1_sampled)
            return total

        self._jit_ptform = jax.jit(ptform)
        self._jit_loglike = jax.jit(loglike)
        self._jit_logprior = jax.jit(logprior)

    def ptform(self, u) -> jax.Array:
        if self._jit_ptform is None:
            self._build_ns()
        return self._jit_ptform(jnp.asarray(u, dtype=jnp.float32))

    def loglike(self, x) -> jax.Array:
        if self._jit_loglike is None:
            self._build_ns()
        return self._jit_loglike(jnp.asarray(x, dtype=jnp.float32))

    def log_prior_tree(self, x) -> jax.Array:
        if self._jit_loglike is None:
            self._build_ns()
        return self._jit_logprior(jnp.asarray(x, dtype=jnp.float32))
