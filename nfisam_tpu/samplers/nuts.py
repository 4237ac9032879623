"""Gradient MCMC comparison sampler (NUTS-class).

Role parity with reference ``src/sampler/NUTSampler.py``
(``GlobalMCMCSampler:18``): a gradient-based MCMC baseline over the same
joint factor.  The reference bridges numpy log-probs into pymc3/theano's
compiled NUTS; here the log-density *and its gradient are native JAX*
(``theano_functions.py`` has no equivalent — autodiff replaces the hand
bridge, SURVEY §2.2), so the entire sampler is one jitted program.

Algorithm: dynamic-length No-U-Turn sampling in its iterative multinomial
form (Hoffman & Gelman 2014; Betancourt 2017) with dual-averaging step-size
and diagonal mass-matrix adaptation during warmup.  Chains are vectorized:
all chains take leapfrog steps in lockstep batches.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.variables import Variable
from ..factors.factors import Factor
from ..utils.keys import split_host
from .joint import StructuredJointFactor


@dataclass(frozen=True)
class NUTSConfig:
    num_samples: int = 1000
    num_warmup: int = 500
    max_treedepth: int = 8
    target_accept: float = 0.8
    num_chains: int = 4


def _leapfrog(grad_fn, q, p, eps, inv_mass):
    p = p + 0.5 * eps * grad_fn(q)
    q = q + eps * inv_mass * p
    p = p + 0.5 * eps * grad_fn(q)
    return q, p


def build_nuts_kernel(logprob_fn: Callable, dim: int, cfg: NUTSConfig):
    """One NUTS transition, vectorized over chains via vmap.

    Iterative tree doubling with multinomial state selection.  Validity
    follows canonical NUTS (Stan / iterative form of Phan & Pradhan): a
    new subtree is merged into the sample ONLY if it contains no internal
    U-turn (checked against O(log n) stored checkpoint states at the
    power-of-two block boundaries) and no divergent leaf (dH < -1000);
    an invalid subtree is discarded wholesale and the transition ends.
    Round-4 regression context: merging unchecked subtrees measurably
    over-dispersed a ring posterior (arc std 1.15 vs analytic 0.70).
    """
    grad_fn = jax.grad(logprob_fn)
    D = cfg.max_treedepth

    def popcount(x):
        return jax.lax.population_count(jnp.uint32(x)).astype(jnp.int32)

    def ctz(x):
        # count of trailing zeros of x (x > 0)
        x = jnp.uint32(x)
        return popcount(~x & (x - 1))

    def kernel(key, q0, eps, inv_mass):
        kp, kd, ku = jax.random.split(key, 3)
        p0 = jax.random.normal(kp, (dim,)) / jnp.sqrt(inv_mass)
        logp0 = logprob_fn(q0)
        H0 = logp0 - 0.5 * jnp.sum(p0 * p0 * inv_mass)

        dirs = jax.random.bernoulli(kd, 0.5, (D,))
        unif_keys = jax.random.split(ku, D)

        def is_turn(dq, p_a, p_b):
            return (jnp.dot(dq, p_a * inv_mass) < 0) | \
                   (jnp.dot(dq, p_b * inv_mass) < 0)

        # carry: (q_minus, p_minus, q_plus, p_plus, q_sample, logw_total,
        #         depth, stop, accept_stat_sum, accept_stat_n)
        def doubling_body(carry):
            (qm, pm, qp, pp, q_s, logw, depth, stop, acc_sum, acc_n) = carry
            go_right = dirs[depth]
            n_steps = 2 ** depth

            def step_body(i, sc):
                (q, p, logw_new, q_new, acc_s, acc_c, ki, ckq, ckp,
                 bad) = sc
                q, p = _leapfrog(grad_fn, q, p, jnp.where(go_right, eps,
                                                          -eps), inv_mass)
                H = logprob_fn(q) - 0.5 * jnp.sum(p * p * inv_mass)
                dH = H - H0
                diverged = (dH < -1000.0) | ~jnp.isfinite(dH)
                acc_s = acc_s + jnp.minimum(1.0, jnp.exp(dH))
                acc_c = acc_c + 1
                # multinomial: keep this point with prob w/(w_tot)
                logw_new2 = jnp.logaddexp(logw_new, dH)
                k1, ki = jax.random.split(ki)
                take = jnp.log(jax.random.uniform(k1)) < dH - logw_new2
                q_new = jnp.where(take, q, q_new)

                # checkpoint store: leaf i (even) starts power-of-2 blocks;
                # slot = popcount(i) bounds live checkpoints to log(n)+1
                slot_st = popcount(i)
                store = (i % 2) == 0
                ckq = jnp.where(store, ckq.at[slot_st].set(q), ckq)
                ckp = jnp.where(store, ckp.at[slot_st].set(p), ckp)

                # within-subtree U-turn checks: every aligned block of
                # size 2^k (k>=1) ending at leaf i, i.e. 2^k | (i+1);
                # its start-state checkpoint sits at slot pc-1+c-k.
                # Orient the displacement by build direction: leftward
                # subtrees integrate with -eps, so (q - ckq) points
                # opposite the momenta on a straight trajectory and must
                # be flipped to recover the canonical q_plus - q_minus.
                c = ctz(i + 1)
                pc = popcount(i + 1)
                sign = jnp.where(go_right, 1.0, -1.0)
                turn = jnp.asarray(False)
                for k in range(1, D + 1):
                    active = k <= c
                    slot = jnp.clip(pc - 1 + c - k, 0, D)
                    dq = sign * (q - ckq[slot])
                    turn = turn | (active & is_turn(dq, ckp[slot], p))
                return (q, p, logw_new2, q_new, acc_s, acc_c, ki, ckq,
                        ckp, bad | turn | diverged)

            q_start = jnp.where(go_right, qp, qm)
            p_start = jnp.where(go_right, pp, pm)
            ckq0 = jnp.zeros((D + 1, dim), q_start.dtype)
            ckp0 = jnp.zeros((D + 1, dim), p_start.dtype)
            (q_end, p_end, logw_sub, q_sub, acc_sum, acc_n, _, _, _,
             sub_bad) = jax.lax.fori_loop(
                0, n_steps, step_body,
                (q_start, p_start, -jnp.inf, q_start, acc_sum, acc_n,
                 unif_keys[depth], ckq0, ckp0, jnp.asarray(False)))

            valid = ~sub_bad
            qm2 = jnp.where(go_right | sub_bad, qm, q_end)
            pm2 = jnp.where(go_right | sub_bad, pm, p_end)
            qp2 = jnp.where(go_right & valid, q_end, qp)
            pp2 = jnp.where(go_right & valid, p_end, pp)

            # multinomial merge of the new subtree — only if it is valid
            logw2 = jnp.where(valid, jnp.logaddexp(logw, logw_sub), logw)
            k2 = jax.random.fold_in(unif_keys[depth], 1)
            take_sub = valid & (jnp.log(jax.random.uniform(k2)) <
                                logw_sub - logw2)
            q_s2 = jnp.where(take_sub, q_sub, q_s)

            # merged-tree U-turn check across the two halves
            dq = qp2 - qm2
            uturn = is_turn(dq, pm2, pp2)
            return (qm2, pm2, qp2, pp2, q_s2, logw2, depth + 1,
                    uturn | sub_bad, acc_sum, acc_n)

        def doubling_cond(carry):
            depth, stop = carry[6], carry[7]
            return (~stop) & (depth < D)

        init = (q0, p0, q0, p0, q0, jnp.float32(0.0), jnp.int32(0),
                jnp.asarray(False), jnp.float32(0.0), jnp.int32(0))
        out = jax.lax.while_loop(doubling_cond, doubling_body, init)
        q_new, acc_sum, acc_n = out[4], out[8], out[9]
        accept_stat = acc_sum / jnp.maximum(acc_n, 1)
        return q_new, accept_stat

    return kernel


def nuts_sample(key, logprob_fn: Callable, dim: int, init_q: np.ndarray,
                cfg: NUTSConfig = NUTSConfig()):
    """Run vectorized-chain NUTS; returns (samples, diagnostics)."""
    kernel = build_nuts_kernel(logprob_fn, dim, cfg)
    C = cfg.num_chains

    mu = jnp.log(10.0 * 0.1)
    gamma, t0, kappa = 0.05, 10.0, 0.75
    target = cfg.target_accept

    @jax.jit
    def warmup_step(carry, key):
        q, eps, eps_bar, H_bar, t, inv_mass = carry
        keys = jax.random.split(jnp.asarray(key), C)
        q, acc = jax.vmap(lambda k, qq: kernel(k, qq, eps, inv_mass))(
            keys, q)
        mean_acc = jnp.mean(acc)
        H_bar = (1 - 1 / (t + t0)) * H_bar + (target - mean_acc) / (t + t0)
        log_eps = mu - jnp.sqrt(t) / gamma * H_bar
        eta = t ** (-kappa)
        log_eps_bar = eta * log_eps + (1 - eta) * jnp.log(eps_bar)
        return (q, jnp.exp(log_eps), jnp.exp(log_eps_bar), H_bar, t + 1,
                inv_mass), q

    @jax.jit
    def sample_step(carry, key):
        q, eps, inv_mass = carry
        keys = jax.random.split(jnp.asarray(key), C)
        q, acc = jax.vmap(lambda k, qq: kernel(k, qq, eps, inv_mass))(
            keys, q)
        return (q, eps, inv_mass), (q, acc)

    q = jnp.asarray(np.broadcast_to(init_q, (C, dim)).copy(),
                    dtype=jnp.float32)
    q = q + 0.01 * jax.random.normal(jax.random.PRNGKey(0), q.shape)
    inv_mass = jnp.ones(dim)
    eps = jnp.float32(0.1)

    # phase 1: step-size adaptation
    n_half = cfg.num_warmup // 2
    keys1 = split_host(key, n_half)
    carry = (q, eps, jnp.float32(0.1), jnp.float32(0.0), jnp.float32(1.0),
             inv_mass)
    carry, qs = jax.lax.scan(warmup_step, carry, jnp.asarray(keys1))
    q, eps, eps_bar = carry[0], carry[1], carry[2]
    # phase 2: mass-matrix estimation from warmup draws, then re-adapt eps
    draws = qs.reshape(-1, dim)
    inv_mass = jnp.clip(jnp.var(draws, axis=0), 1e-6, None)
    keys2 = split_host(np.asarray(split_host(key, 1))[0], n_half)
    carry = (q, eps_bar, eps_bar, jnp.float32(0.0), jnp.float32(1.0),
             inv_mass)
    carry, _ = jax.lax.scan(warmup_step, carry, jnp.asarray(keys2))
    q, eps_bar = carry[0], carry[2]

    n_per_chain = -(-cfg.num_samples // C)
    keys3 = split_host(np.asarray(split_host(key, 2))[1], n_per_chain)
    (_, _, _), (qs, accs) = jax.lax.scan(
        sample_step, (q, eps_bar, inv_mass), jnp.asarray(keys3))
    samples = np.asarray(qs).reshape(-1, dim)[:cfg.num_samples]
    diags = {"accept_rate": float(jnp.mean(accs)),
             "step_size": float(eps_bar)}
    return samples, diags


class GlobalMCMCSampler:
    """Reference-parity facade (``GlobalMCMCSampler`` NUTSampler.py:18)."""

    def __init__(self, nodes: Sequence[Variable],
                 factors: Sequence[Factor], **kwargs) -> None:
        self._nodes = list(nodes)
        self._dim = sum(v.dim for v in nodes)
        self.joint = StructuredJointFactor(factors, nodes)

    def sample(self, key=None, num_samples: int = 1000,
               num_warmup: int = 500, num_chains: int = 4,
               init_point: Optional[np.ndarray] = None, **kwargs
               ) -> np.ndarray:
        if key is None:
            key = np.array([0, 11], dtype=np.uint32)
        if init_point is None:
            init_point = np.asarray(
                self.joint.sample(key, 64)).mean(axis=0)

        jf = self.joint

        def logprob(q):
            return jf.log_pdf(q[None])[0]

        cfg = NUTSConfig(num_samples=num_samples, num_warmup=num_warmup,
                         num_chains=num_chains)
        samples, self.diagnostics = nuts_sample(key, logprob, self._dim,
                                                init_point, cfg)
        return samples
