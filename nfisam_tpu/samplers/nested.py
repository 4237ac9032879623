"""Vectorized nested sampling, JAX-native, with static and DYNAMIC modes.

Role parity with reference ``src/sampler/NestedSampling.py``
(``GlobalNestedSampler:20``, dynamic mode ``:93-129``): the ground-truth
posterior reference path.  The reference wraps dynesty, whose per-point
Python likelihood is the scalability killer (5.18M interpreter calls on
case1 step 5 — SURVEY §3.5).

TPU-first re-design:

* **Batched replacement**: each iteration retires the K worst live points
  at once and regenerates them with vectorized constrained proposals;
  every likelihood evaluation is a fused ``(K, dim)`` batch in one
  compiled program.  The host loop only checks the dlogz scalar.
* **Proposals**: constrained random walk (``rwalk``) or random-direction
  slice sampling with shrinkage (``rslice``, Neal 2003 fixed-interval
  variant — valid because the bracket always contains the current live
  point).  Slice proposals self-tune (no step-size to adapt) and are what
  dynesty recommends for these dimensions.
* **Birth-death evidence bookkeeping**: every point ever created carries
  its birth likelihood threshold.  Evidence and posterior weights come
  from the merged birth-death record (Higson et al. 2019 "dynamic nested
  sampling"), so runs with *varying* live-point counts — and unions of
  independent runs — are handled by one estimator.  ``logzerr`` comes from
  resimulating the Beta(n,1) shrinkage factors.
* **Dynamic mode** (`dynamic_nested_sample`): after a base pass, extra
  batches of live points are injected between the likelihood bounds that
  carry the posterior mass (the dynesty ``DynamicNestedSampler`` analog,
  reference ``NestedSampling.py:93-129``), then all runs are merged.

Validated against the reference's committed dynesty artifacts: case1
step-5 logz agreement within the stated error (see BENCHMARKS.md).
"""
from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.variables import Variable
from ..factors.factors import Factor
from ..utils.keys import split_host
from .joint import StructuredJointFactor


PROPOSALS = ("rslice", "rwalk", "grad")


@dataclass(frozen=True)
class NestedConfig:
    n_live: int = 1000
    replace_batch: int = 25        # K dead points per iteration
    walk_steps: int = 30           # T steps (rwalk proposal)
    slices: int = 5                # random-direction slices (rslice)
    max_shrink: int = 64           # shrinkage cap per slice
    max_iters: int = 4000
    dlogz: float = 0.05
    proposal: str = "rslice"       # rslice | rwalk | grad

    def __post_init__(self):
        if self.proposal not in PROPOSALS:
            raise ValueError(
                f"NestedConfig.proposal={self.proposal!r}: "
                f"expected one of {PROPOSALS}")


def _reflect_unit(u: jax.Array) -> jax.Array:
    """Reflect proposals back into [0, 1]^d."""
    u = jnp.mod(u, 2.0)
    return jnp.where(u > 1.0, 2.0 - u, u)


# --------------------------------------------------------------------------
# constrained proposal kernels (operate on (K, dim) batches inside jit)
# --------------------------------------------------------------------------

def _rwalk_replace(key, u0, l0, L_thresh, sigma, ptform, loglike, T):
    """T constrained Gaussian random-walk steps; returns (u, l, ncall)."""
    K, dim = u0.shape

    def body(t, carry):
        u, l, nc, k = carry
        k, k1 = jax.random.split(k)
        step = sigma * jax.random.normal(k1, (K, dim))
        u_prop = _reflect_unit(u + step)
        l_prop = loglike(ptform(u_prop))
        accept = l_prop > L_thresh
        u = jnp.where(accept[:, None], u_prop, u)
        l = jnp.where(accept, l_prop, l)
        return (u, l, nc + K, k)

    u, l, ncall, _ = jax.lax.fori_loop(0, T, body,
                                       (u0, l0, jnp.int32(0), key))
    return u, l, ncall


def _rslice_replace(key, u0, l0, L_thresh, ptform, loglike, S, max_shrink):
    """S random-direction slice-sampling updates with shrinkage.

    Fixed initial bracket [-1, 1] along a random unit direction (the
    reflection map makes any |t| meaningful inside the cube); shrinkage
    converges to the current point, which satisfies the constraint, so
    termination is guaranteed.
    """
    K, dim = u0.shape

    def one_slice(carry, k):
        u, l, nc = carry
        kd, kp, kw = jax.random.split(k, 3)
        d = jax.random.normal(kd, (K, dim))
        d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
        # Neal 2003 fixed-length interval: placed uniformly at random so it
        # contains t=0 (the current point).  A deterministically centered
        # bracket would break reversibility and bias samples toward the
        # mode (observed as logz biased high on the case1 oracle).
        off = jax.random.uniform(kp, (K,))
        w = 2.0
        lo0 = -w * off
        hi0 = lo0 + w

        def cond(st):
            i, lo, hi, done, _u, _l, _k, _nc = st
            return (~jnp.all(done)) & (i < max_shrink)

        def body(st):
            i, lo, hi, done, u_out, l_out, kk, nc2 = st
            kk, kt = jax.random.split(kk)
            t = lo + (hi - lo) * jax.random.uniform(kt, (K,))
            u_prop = _reflect_unit(u + t[:, None] * d)
            l_prop = loglike(ptform(u_prop))
            acc = (l_prop > L_thresh) & (~done)
            u_out = jnp.where(acc[:, None], u_prop, u_out)
            l_out = jnp.where(acc, l_prop, l_out)
            done = done | acc
            shrink = ~done
            lo = jnp.where(shrink & (t < 0), t, lo)
            hi = jnp.where(shrink & (t >= 0), t, hi)
            return (i + 1, lo, hi, done, u_out, l_out, kk, nc2 + K)

        st = (jnp.int32(0), lo0, hi0,
              jnp.zeros(K, bool), u, l, kw, nc)
        _, _, _, _, u, l, _, nc = jax.lax.while_loop(cond, body, st)
        return (u, l, nc), None

    keys = jax.random.split(key, S)
    (u, l, ncall), _ = jax.lax.scan(one_slice, (u0, l0, jnp.int32(0)), keys)
    return u, l, ncall


def _grad_replace(key, u0, l0, L_thresh, sigma, ptform, loglike, T):
    """Gradient-guided constrained proposal: reflective Hamiltonian slice.

    Parity with the one reference sampler capability that had no
    counterpart: dynesty's gradient-guided NS driven by the analytic
    chain-rule Jacobian ``jac_u`` / ``grad_u_loglike``
    (reference ``sampler_utils.py:310-348``).  There the gradient is
    hand-derived per factor; here it is ``jax.grad`` of the whole
    ``loglike ∘ ptform`` composition in unit-cube coordinates — free, and
    batched over the K replacements.

    Dynamics (reflective slice sampling, Neal 2003 §reflective): a random
    velocity is integrated for T steps of per-dim size ``sigma``; crossing
    the unit-cube boundary reflects position and velocity; a step landing
    below the likelihood threshold MOVES there and reflects the velocity
    off the constraint surface ``v <- v - 2 (v.g / g.g) g`` (gradient at
    the OUTSIDE point, so the reverse trajectory reflects identically —
    the map is an isometry-composed involution, hence volume-preserving
    and reversible).  The endpoint is accepted iff it satisfies the
    constraint; otherwise the walker stays (a plain rejected MCMC move).
    The earlier stay-in-place variant biased samples toward the interior
    and read logz ~4 sigma HIGH on the analytic oracle.
    """
    K, dim = u0.shape

    def glike_sum(u):
        return jnp.sum(loglike(ptform(u)))

    grad_u = jax.grad(glike_sum)   # (K, dim): rows decouple under the sum

    def body(t, carry):
        u, v, nc, k = carry
        u_raw = u + sigma * v
        m = jnp.mod(u_raw, 2.0)
        u_new = jnp.where(m > 1.0, 2.0 - m, m)   # cube reflection
        v = jnp.where(m > 1.0, -v, v)
        l_new = loglike(ptform(u_new))
        below = l_new <= L_thresh
        # bounce off the constraint surface at the outside point
        g = grad_u(u_new)
        g2 = jnp.sum(g * g, axis=1, keepdims=True)
        v_bounce = v - 2.0 * g * (jnp.sum(v * g, axis=1, keepdims=True)
                                  / jnp.where(g2 > 0, g2, 1.0))
        v = jnp.where(below[:, None], v_bounce, v)
        # 2K calls per step: one likelihood batch + one gradient batch
        return (u_new, v, nc + 2 * K, k)

    k_v, _ = jax.random.split(key)
    v0 = jax.random.normal(k_v, (K, dim))
    u_T, _, ncall, _ = jax.lax.fori_loop(
        0, T, body, (u0, v0, jnp.int32(0), key))
    l_T = loglike(ptform(u_T))
    ok = l_T > L_thresh
    u = jnp.where(ok[:, None], u_T, u0)
    l = jnp.where(ok, l_T, l0)
    return u, l, ncall + K


def build_ns_iteration(ptform: Callable, loglike: Callable, dim: int,
                       cfg: NestedConfig):
    K, N = cfg.replace_batch, cfg.n_live

    @jax.jit
    def iteration(key, U, L, logvol, logz):
        # --- retire the K worst -----------------------------------------
        order = jnp.argsort(L)
        dead_idx = order[:K]
        L_dead = L[dead_idx]
        X_dead = ptform(U[dead_idx])
        L_thresh = L_dead[-1]          # largest of the dead batch
        # running evidence (termination diagnostic only; final weights come
        # from the birth-death merge)
        new_logvol = logvol - K / N
        log_dvol = logvol + jnp.log1p(-jnp.exp(-K / N)) - jnp.log(K)
        logz = jnp.logaddexp(logz, jax.scipy.special.logsumexp(
            L_dead + log_dvol))

        # --- regenerate via constrained proposals ------------------------
        k_start, k_prop = jax.random.split(jnp.asarray(key))
        start_idx = jax.random.choice(k_start, order[K:], (K,))
        u0, l0 = U[start_idx], L[start_idx]
        if cfg.proposal == "rwalk":
            sigma = 2.0 * jnp.std(U, axis=0) / jnp.sqrt(
                jnp.asarray(float(dim)))
            u_new, l_new, ncall = _rwalk_replace(
                k_prop, u0, l0, L_thresh, sigma, ptform, loglike,
                cfg.walk_steps)
        elif cfg.proposal == "grad":
            sigma = jnp.std(U, axis=0) / jnp.sqrt(
                jnp.asarray(float(dim)))
            u_new, l_new, ncall = _grad_replace(
                k_prop, u0, l0, L_thresh, sigma, ptform, loglike,
                cfg.walk_steps)
        else:
            u_new, l_new, ncall = _rslice_replace(
                k_prop, u0, l0, L_thresh, ptform, loglike,
                cfg.slices, cfg.max_shrink)

        U = U.at[dead_idx].set(u_new)
        L = L.at[dead_idx].set(l_new)
        logz_remain = jnp.max(L) + new_logvol
        return (U, L, new_logvol, logz, X_dead, L_dead, dead_idx,
                L_thresh, logz_remain, ncall)

    return iteration


# --------------------------------------------------------------------------
# birth-death run record + merge (Higson et al. 2019)
# --------------------------------------------------------------------------

@dataclass
class NSRun:
    """Every point ever created: position, death likelihood, birth
    threshold (-inf for points drawn from the unconstrained prior)."""
    X: np.ndarray          # (n, dim) parameter positions
    L_death: np.ndarray    # (n,)
    L_birth: np.ndarray    # (n,)
    ncall: int


def combine_runs(runs: Sequence[NSRun],
                 n_sim: int = 64,
                 rng: Optional[np.random.Generator] = None
                 ) -> Tuple[np.ndarray, np.ndarray, float, float]:
    """Merge birth-death records into posterior weights and evidence.

    At each death L_i the number of live points is
    ``n_i = #{j : L_birth_j < L_i <= L_death_j}``; prior volume shrinks by
    ``E[log t] = -1/n_i`` per death.  Returns (X, logwt, logz, logzerr);
    logzerr from ``n_sim`` resimulations of log t_i ~ -Exp(1)/n_i.
    """
    X = np.concatenate([r.X for r in runs], axis=0)
    Ld = np.concatenate([np.asarray(r.L_death, np.float64) for r in runs])
    Lb = np.concatenate([np.asarray(r.L_birth, np.float64) for r in runs])
    order = np.argsort(Ld, kind="stable")
    X, Ld, Lb = X[order], Ld[order], Lb[order]
    n = len(Ld)
    births_sorted = np.sort(Lb)
    # points born strictly below L_i, minus deaths already processed
    n_alive = np.searchsorted(births_sorted, Ld, side="left") \
        - np.arange(n)
    n_alive = np.maximum(n_alive, 1).astype(np.float64)

    log_t = -1.0 / n_alive
    logX = np.cumsum(log_t)
    logX_prev = np.concatenate([[0.0], logX[:-1]])
    # log(X_{i-1} - X_i), stable
    log_dX = logX_prev + np.log1p(-np.exp(logX - logX_prev))
    logwt = Ld + log_dX
    m = logwt.max()
    logz = m + np.log(np.exp(logwt - m).sum())

    if rng is None:
        rng = np.random.default_rng(0)
    # resimulate shrinkage for the error bar
    sim_log_t = -rng.exponential(size=(n_sim, n)) / n_alive[None, :]
    sim_logX = np.cumsum(sim_log_t, axis=1)
    sim_prev = np.concatenate([np.zeros((n_sim, 1)), sim_logX[:, :-1]],
                              axis=1)
    with np.errstate(divide="ignore"):
        sim_ldX = sim_prev + np.log1p(-np.exp(sim_logX - sim_prev))
    sim_lw = Ld[None, :] + sim_ldX
    mm = sim_lw.max(axis=1, keepdims=True)
    sim_logz = mm[:, 0] + np.log(np.exp(sim_lw - mm).sum(axis=1))
    logzerr = float(np.std(sim_logz))
    return X, logwt, float(logz), logzerr


def _run_ns(key, ptform: Callable, loglike: Callable, dim: int,
            cfg: NestedConfig,
            init_U: Optional[jax.Array] = None,
            init_L: Optional[jax.Array] = None,
            L_birth0: float = -np.inf,
            stop_at_L: float = np.inf) -> NSRun:
    """One nested-sampling run; live points at termination are folded into
    the record as final deaths (no replacement)."""
    keys = split_host(key, cfg.max_iters + 2)
    if init_U is None:
        U = jax.random.uniform(keys[0], (cfg.n_live, dim))
        L = loglike(ptform(U))
        ncall = cfg.n_live
    else:
        U, L = init_U, init_L
        ncall = 0
    B = np.full(cfg.n_live, L_birth0, dtype=np.float64)

    iteration = build_ns_iteration(ptform, loglike, dim, cfg)
    logvol = jnp.float32(0.0)
    logz = jnp.float32(-1e30)
    dead_X: List[np.ndarray] = []
    dead_L: List[np.ndarray] = []
    dead_B: List[np.ndarray] = []
    for it in range(cfg.max_iters):
        (U, L, logvol, logz, X_dead, L_dead, dead_idx, L_thresh,
         logz_remain, nc) = iteration(keys[it + 1], U, L, logvol, logz)
        # exact birth tracking: the device reports which slots retired;
        # their recorded births leave B and the refills inherit L_thresh
        idx = np.asarray(dead_idx)
        dead_B.append(B[idx].copy())
        B[idx] = float(L_thresh)
        dead_X.append(np.asarray(X_dead))
        dead_L.append(np.asarray(L_dead, np.float64))
        ncall += int(nc)
        gap = float(jnp.logaddexp(logz, logz_remain) - logz)
        stop = gap < cfg.dlogz
        if stop_at_L < np.inf:
            stop = stop or float(L_thresh) > stop_at_L
        if stop:
            break
    live_X = np.asarray(ptform(U))
    live_L = np.asarray(jax.device_get(L), np.float64)
    X = np.concatenate(dead_X + [live_X], axis=0)
    Ld = np.concatenate(dead_L + [live_L])
    Lb = np.concatenate(dead_B + [B])
    return NSRun(X=X, L_death=Ld, L_birth=Lb, ncall=ncall)


def nested_sample(key, ptform: Callable, loglike: Callable, dim: int,
                  cfg: NestedConfig = NestedConfig(),
                  summary: Optional[dict] = None) -> np.ndarray:
    """Static nested sampling; returns equal-weight posterior samples.

    ``ptform``/``loglike`` must be batched ``(n, dim)`` callables.
    """
    run = _run_ns(key, ptform, loglike, dim, cfg)
    X, logwt, logz, logzerr = combine_runs([run])
    return _finish(key, [run], X, logwt, logz, logzerr, cfg, summary)


def dynamic_nested_sample(key, ptform: Callable, loglike: Callable,
                          dim: int, cfg: NestedConfig = NestedConfig(),
                          n_batches: int = 4,
                          batch_live: Optional[int] = None,
                          frac_lo: float = 0.02, frac_hi: float = 0.95,
                          summary: Optional[dict] = None) -> np.ndarray:
    """Dynamic nested sampling: base pass + posterior-targeted batches
    (dynesty ``DynamicNestedSampler`` analog, ref NestedSampling.py:93-129).

    Each batch injects ``batch_live`` live points born at the likelihood
    L_lo below which only ``frac_lo`` of the posterior mass lies, and runs
    until the batch threshold passes the ``frac_hi`` mass bound; all runs
    merge through the birth-death estimator.
    """
    if batch_live is None:
        batch_live = max(cfg.n_live // 4, 64)
    k_base, *k_batches = split_host(key, n_batches + 1)
    runs = [_run_ns(k_base, ptform, loglike, dim, cfg)]

    bcfg = replace(cfg, n_live=batch_live,
                   replace_batch=max(batch_live // 40, 8))
    for kb in k_batches:
        X, logwt, logz, _ = combine_runs(runs)
        # combine_runs returns points sorted by death likelihood, so the
        # weight quantiles index directly into the sorted L record
        Ld_all = np.sort(np.concatenate([r.L_death for r in runs]))
        w = np.exp(logwt - logwt.max())
        w /= w.sum()
        cw = np.cumsum(w)
        L_lo = float(Ld_all[np.searchsorted(cw, frac_lo)])
        L_hi = float(Ld_all[min(np.searchsorted(cw, frac_hi),
                                len(Ld_all) - 1)])
        # seed batch live points above L_lo: rejection from fresh prior
        # uniforms, then slice decorrelation AT the L_lo constraint
        kb = jnp.asarray(kb)
        k1, k2, k3 = jax.random.split(kb, 3)
        u_cand = jax.random.uniform(k1, (4 * batch_live, dim))
        l_cand = np.asarray(loglike(ptform(u_cand)), np.float64)
        ok = np.where(l_cand > L_lo)[0]
        if len(ok) == 0:
            # constrained region too small for rejection; skip batch
            continue
        reps = np.resize(ok, batch_live)
        u0 = jnp.asarray(np.asarray(u_cand)[reps])
        l0 = jnp.asarray(l_cand[reps], jnp.float32)
        # duplicated seeds violate the i.i.d.-birth assumption of the
        # birth-death estimator: scale the slice decorrelation with the
        # duplication factor so heavily-recycled batches still mix
        dup = -(-batch_live // len(ok))
        decorrelate = cfg.slices * min(dup, 8)
        u0, l0, nc = _rslice_replace(k2, u0, l0, jnp.float32(L_lo),
                                     ptform, loglike, decorrelate,
                                     cfg.max_shrink)
        brun = _run_ns(k3, ptform, loglike, dim, bcfg,
                       init_U=u0, init_L=l0, L_birth0=L_lo,
                       stop_at_L=L_hi)
        brun = NSRun(X=brun.X, L_death=brun.L_death, L_birth=brun.L_birth,
                     ncall=brun.ncall + int(4 * batch_live) + int(nc))
        runs.append(brun)

    X, logwt, logz, logzerr = combine_runs(runs)
    return _finish(key, runs, X, logwt, logz, logzerr, cfg, summary)


def _finish(key, runs, X, logwt, logz, logzerr, cfg, summary):
    weights = np.exp(logwt - logwt.max())
    weights /= weights.sum()
    if summary is not None:
        summary.update({
            "nlive": cfg.n_live,
            "niter": int(sum(len(r.L_death) for r in runs)),
            "ncall": int(sum(r.ncall for r in runs)),
            "eff": 100.0 * len(X) / max(sum(r.ncall for r in runs), 1),
            "logz": float(logz),
            "logzerr": float(logzerr),
        })
    rng = np.random.default_rng(int(np.asarray(key)[1]))
    idx = rng.choice(len(X), size=len(X), p=weights)
    return X[idx]


class GlobalNestedSampler:
    """Reference-parity facade (``GlobalNestedSampler`` NestedSampling.py:20):
    ancestral sampling when the graph is a tree, nested sampling otherwise;
    ``dynamic=True`` selects the DynamicNestedSampler analog.
    """

    def __init__(self, nodes: Sequence[Variable],
                 factors: Sequence[Factor], **kwargs) -> None:
        self._nodes = list(nodes)
        self._dim = sum(v.dim for v in nodes)
        self.joint = StructuredJointFactor(factors, nodes)

    def sample(self, key=None, live_points: int = 1000,
               sampling_method: str = "nested", downsampling: bool = False,
               dlogz: float = 0.05, max_iters: int = 4000,
               dynamic: bool = False, n_batches: int = 4,
               proposal: str = "rslice",
               res_summary: Optional[dict] = None, **kwargs) -> np.ndarray:
        if key is None:
            key = np.array([0, 7], dtype=np.uint32)
        if self.joint.if_direct_sampling:
            return np.asarray(self.joint.sample(key, live_points))
        cfg = NestedConfig(n_live=live_points,
                           replace_batch=max(live_points // 40, 8),
                           dlogz=dlogz, max_iters=max_iters,
                           proposal=proposal)
        # reference convention (NestedSampling.py:41): any sampling_method
        # other than "nested" selects the dynamic sampler
        dynamic = dynamic or sampling_method not in ("nested",)
        if dynamic:
            samples = dynamic_nested_sample(
                key, self.joint.ptform, self.joint.loglike, self._dim,
                cfg, n_batches=n_batches, summary=res_summary)
        else:
            samples = nested_sample(key, self.joint.ptform,
                                    self.joint.loglike, self._dim, cfg,
                                    summary=res_summary)
        if downsampling and samples.shape[0] > live_points:
            rng = np.random.default_rng(0)
            samples = samples[rng.choice(len(samples), live_points,
                                         replace=False)]
        return samples
