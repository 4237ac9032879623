"""MAP + Laplace-marginal baseline solver.

Role parity with the reference's GTSAM C++ comparison harness
(``src/external/gtsam/gtsam_solution.cpp``: parse ``.fg`` -> nonlinear
least squares via LM/iSAM2 -> Gaussian samples from marginals; max-mixture
factor ``include/factors/maxmixture_factor.h``).  TPU-idiomatic re-design:
the joint log-density and its derivatives come from JAX autodiff over the
batched factor banks, and the whole damped-Newton (Levenberg-Marquardt)
loop runs as one jitted ``while_loop`` — no per-factor Jacobian
hand-derivation, and mixture factors contribute through their smooth
log-sum-exp density (a softened max-mixture).
"""
from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.variables import Variable
from ..factors.factors import Factor
from ..utils.keys import split_host
from .solver import SolverArgs
from ..samplers.joint import StructuredJointFactor


@dataclass(frozen=True)
class MAPConfig:
    max_iters: int = 100
    init_damping: float = 1e-4
    damping_up: float = 10.0
    damping_down: float = 0.1
    tol: float = 1e-8


class GaussNewtonMAP:
    """Levenberg-Marquardt MAP with Laplace (inverse-Hessian) marginals."""

    def __init__(self, nodes: Sequence[Variable],
                 factors: Sequence[Factor],
                 cfg: MAPConfig = MAPConfig()) -> None:
        self.nodes = list(nodes)
        self.cfg = cfg
        self.joint = StructuredJointFactor(factors, nodes)
        self.dim = self.joint.dim
        self._solve_fn = None

    def _build(self):
        jf = self.joint
        cfg = self.cfg

        def neg_logp(x):
            return -jf.log_pdf(x[None])[0]

        grad_fn = jax.grad(neg_logp)
        hess_fn = jax.hessian(neg_logp)

        @jax.jit
        def solve(x0):
            def body(carry):
                x, lam, f_val, it, done = carry
                g = grad_fn(x)
                Hm = hess_fn(x)
                # LM step: (H + lam * diag(H)) dx = -g
                diag = jnp.clip(jnp.diag(Hm), 1e-9, None)
                A = Hm + lam * jnp.diag(diag)
                dx = -jnp.linalg.solve(A, g)
                x_new = x + dx
                f_new = neg_logp(x_new)
                better = f_new < f_val
                x = jnp.where(better, x_new, x)
                f_next = jnp.where(better, f_new, f_val)
                lam = jnp.where(better, lam * cfg.damping_down,
                                lam * cfg.damping_up)
                lam = jnp.clip(lam, 1e-12, 1e8)
                done = better & (jnp.abs(f_val - f_new) <
                                 cfg.tol * (1.0 + jnp.abs(f_val)))
                return (x, lam, f_next, it + 1, done)

            def cond(carry):
                _, _, _, it, done = carry
                return (~done) & (it < cfg.max_iters)

            init = (x0, jnp.float32(cfg.init_damping), neg_logp(x0),
                    jnp.int32(0), jnp.asarray(False))
            x, _, f_val, it, _ = jax.lax.while_loop(cond, body, init)
            H = hess_fn(x)
            cov = jnp.linalg.inv(H + 1e-9 * jnp.eye(self.dim))
            return x, cov, f_val, it

        self._solve_fn = solve

    def solve(self, x0: Optional[np.ndarray] = None,
              key=None, timer: Optional[List[float]] = None):
        """Returns (map_point, laplace_cov, final_nll, iters)."""
        if self._solve_fn is None:
            self._build()
        if x0 is None:
            key = key if key is not None else np.array([0, 17],
                                                       dtype=np.uint32)
            # best-of-N ancestral draws by joint density: the ancestral
            # *mean* is a bad start for multimodal (ring) likelihoods —
            # e.g. a range-only landmark's mean sits at the ring center
            draws = self.joint.sample(key, 512)
            lps = np.asarray(self.joint.log_pdf(draws))
            x0 = np.asarray(draws)[int(np.argmax(lps))]
        t0 = time.time()
        x, cov, f_val, it = self._solve_fn(jnp.asarray(x0,
                                                       dtype=jnp.float32))
        x = np.asarray(x)
        if timer is not None:
            timer.append(time.time() - t0)
        self.map_point = x
        self.laplace_cov = np.asarray(cov)
        self.final_nll = float(f_val)
        self.iterations = int(it)
        return x, self.laplace_cov, self.final_nll, self.iterations

    def sample(self, key, num_samples: int) -> np.ndarray:
        """Gaussian samples from the Laplace approximation (the role of the
        GTSAM harness's marginal sampling)."""
        if not hasattr(self, "map_point"):
            self.solve()
        # eigenvalue clipping keeps sampling well-defined when the MAP sits
        # on a degenerate direction (e.g. unobserved heading)
        w, V = np.linalg.eigh(0.5 * (self.laplace_cov +
                                     self.laplace_cov.T))
        w = np.clip(w, 1e-12, None)
        L = V * np.sqrt(w)
        z = np.asarray(jax.random.normal(key, (num_samples, self.dim)))
        return self.map_point + z @ L.T

    def results(self) -> Dict[Variable, np.ndarray]:
        out: Dict[Variable, np.ndarray] = {}
        for v in self.nodes:
            idx = self.joint.var_to_indices[v]
            out[v] = self.map_point[np.asarray(idx)]
        return out
