"""Factor-type-banked joint density + incremental warm-started MAP.

Role parity: the reference's incremental MAP comparison harness is GTSAM's
ISAM2 (``src/external/gtsam/gtsam_solution.cpp:18`` — per-step ms-scale
incremental solves).  The round-3 JAX baseline (``solver/map_solver.py``)
is batch-only and traces one program term per factor
(``samplers/joint.py:72-77``), which cannot scale past a few hundred
factors: a 1,000-pose graph would trace ~2,000 factor calls and retrace
them every step.

TPU-first re-design:

* **banks, not factors**: factors are grouped by type into stacked
  parameter banks (SE2 priors, SE2 odometry, R2 priors/relative, and one
  unified range-mixture bank covering plain ranges, ambiguous data
  association, and null-hypothesis outlier factors).  The joint negative
  log density of the whole graph evaluates as ~5 fused gather+einsum
  kernels regardless of factor count.
* **pow-2 bucket padding**: the state vector and each bank's row count
  pad to power-of-two buckets (invalid rows are weight-masked, pad state
  dims carry a unit-Gaussian regularizer), so an incremental run compiles
  O(log N) programs total instead of one per step.
* **matrix-free LM**: the damped-Newton step solves
  ``(H + lam I) dx = -g`` by conjugate gradients on Hessian-vector
  products (``jvp`` of ``grad``) — no dense Hessian, no O(dim^2) memory;
  the entire LM loop is one ``lax.while_loop`` in one jitted program.
* **warm start**: the previous step's estimate carries over; new poses
  initialize by dead-reckoning (odometry composition), new landmarks by
  scoring candidate points on the measured range ring — the ISAM2-analog
  that keeps per-step floor cost flat as the graph grows.
"""
from __future__ import annotations

import time
from dataclasses import dataclass
from functools import lru_cache
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import geometry as geom
from ..core.variables import Variable
from ..factors.factors import (Factor,
                               R2RelativeGaussianLikelihoodFactor,
                               SE2RelativeGaussianLikelihoodFactor,
                               UnaryR2GaussianPriorFactor,
                               UnarySE2ApproximateGaussianPriorFactor,
                               _RangeFactorBase)
from ..factors.mixtures import BinaryFactorMixture

_LOG_TWO_PI = float(np.log(2.0 * np.pi))


def _pow2(x: int, lo: int = 8) -> int:
    b = lo
    while b < x:
        b *= 2
    return b


@dataclass(frozen=True)
class IncMAPConfig:
    max_iters: int = 150
    cg_iters: int = 300
    init_damping: float = 1e-3
    damping_up: float = 10.0
    damping_down: float = 0.2
    # f32 objective: ~1e-6 relative is the resolution floor; tighter
    # values never trigger and every solve runs to max_iters
    tol: float = 1e-6
    warm_max_iters: int = 15    # LM iterations for warm-started re-solves
    landmark_init_candidates: int = 16
    # backend pin: the floor is a REFERENCE baseline, not the product
    # path.  Measured attribution (results/map_compile_probe.json): XLA
    # compiles this program in 2-5 s even at D_pad=16384 — the round-4
    # "710 s compile" was cold-run EXECUTION: a cold solve is 150 LM x
    # 300 CG = 45k strictly sequential tiny gather/scatter iterations,
    # ~0.3-0.7 ms each on the tunneled TPU (latency-bound, no
    # parallelism at D<=16k), so even warm 15-iter re-solves would cost
    # seconds on TPU vs milliseconds on CPU.
    device: str = "cpu"


# ---------------------------------------------------------------- density
def _banked_nll(x, banks):
    """Negative log joint density (+ a constant from pad regularizers).

    ``x``: (D_pad,) stacked state.  ``banks``: dict of device arrays; all
    row counts are padded, with per-row ``valid`` masks.
    """
    total = 0.0

    # pad-dim regularizer: unit Gaussian keeps H nonsingular on dims no
    # factor touches (pad columns + genuinely unconstrained dims)
    total = total + 0.5 * jnp.sum((x * banks["pad_mask"]) ** 2)

    if "sp_idx" in banks:                       # SE2 priors
        X = x[banks["sp_idx"]]                          # (n, 3)
        dT = geom.se2_compose(banks["sp_inv_prior"], X)
        v = geom.se2_log(dT)
        det = jnp.abs(geom.se2_det_grad_logmap(dT))
        white = jnp.einsum("ni,nij->nj", v, banks["sp_prec_chol"])
        lp = (banks["sp_log_norm"] - 0.5 * jnp.sum(white * white, -1)
              + jnp.log(jnp.maximum(det, 1e-12)))
        total = total - jnp.sum(lp * banks["sp_valid"])

    if "so_idx1" in banks:                      # SE2 odometry (relative)
        Ti = x[banks["so_idx1"]]
        Tj = x[banks["so_idx2"]]
        rel = geom.se2_between(Ti, Tj)
        dT = geom.se2_compose(banks["so_inv_obs"], rel)
        v = geom.se2_log(dT)
        det = jnp.abs(geom.se2_det_grad_logmap(dT))
        white = jnp.einsum("ni,nij->nj", v, banks["so_prec_chol"])
        lp = (banks["so_log_norm"] - 0.5 * jnp.sum(white * white, -1)
              + jnp.log(jnp.maximum(det, 1e-12)))
        total = total - jnp.sum(lp * banks["so_valid"])

    if "rp_idx" in banks:                       # R2 priors
        X = x[banks["rp_idx"]]                          # (n, 2)
        d = X - banks["rp_mu"]
        white = jnp.einsum("ni,nij->nj", d, banks["rp_prec_chol"])
        lp = banks["rp_log_norm"] - 0.5 * jnp.sum(white * white, -1)
        total = total - jnp.sum(lp * banks["rp_valid"])

    if "rr_idx1" in banks:                      # R2 relative
        d = (x[banks["rr_idx2"]] - x[banks["rr_idx1"]]
             - banks["rr_obs"])
        white = jnp.einsum("ni,nij->nj", d, banks["rr_prec_chol"])
        lp = banks["rr_log_norm"] - 0.5 * jnp.sum(white * white, -1)
        total = total - jnp.sum(lp * banks["rr_valid"])

    if "rg_obs_idx" in banks:                   # range mixtures (K comps)
        obs_t = x[banks["rg_obs_idx"]]                  # (n, 2)
        cand_t = x[banks["rg_cand_idx"]]                # (n, K, 2)
        d = cand_t - obs_t[:, None, :]
        # safe norm: pad rows gather identical columns (dist exactly 0),
        # and d|v|/dv is NaN at 0 — the 0-valid mask does NOT stop NaN
        # from poisoning reverse-mode/jvp (0 * NaN = NaN), which silently
        # turned every Hessian-vector product NaN and made LM reject all
        # steps.  The reference guards its range gradient the same way
        # (Factors.py:2203-2220, max(dist, 1e-8)).
        dist = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)
        delta = dist - banks["rg_r"]                    # (n, K) per-comp obs
        comp_lp = (banks["rg_logw"]
                   - 0.5 * delta ** 2 / banks["rg_sigma"] ** 2
                   - 0.5 * _LOG_TWO_PI - jnp.log(banks["rg_sigma"]))
        lp = jax.scipy.special.logsumexp(comp_lp, axis=-1)
        total = total - jnp.sum(lp * banks["rg_valid"])

    return total


@lru_cache(maxsize=256)
def _solve_program(sig: tuple, cfg: IncMAPConfig, warm: bool):
    """One compiled LM-CG program per bucket signature."""
    max_iters = cfg.warm_max_iters if warm else cfg.max_iters

    def solve(x0, banks):
        nll = lambda x: _banked_nll(x, banks)       # noqa: E731
        grad_fn = jax.grad(nll)

        def body(carry):
            x, lam, f_val, it, done = carry
            g = grad_fn(x)

            def hvp(v):
                return jax.jvp(grad_fn, (x,), (v,))[1] + lam * v

            dx, _ = jax.scipy.sparse.linalg.cg(
                hvp, -g, maxiter=cfg.cg_iters, tol=1e-8)
            x_new = x + dx
            f_new = nll(x_new)
            better = f_new < f_val
            x = jnp.where(better, x_new, x)
            f_next = jnp.where(better, f_new, f_val)
            lam = jnp.where(better, lam * cfg.damping_down,
                            lam * cfg.damping_up)
            lam = jnp.clip(lam, 1e-10, 1e10)
            done = better & (jnp.abs(f_val - f_new) <
                             cfg.tol * (1.0 + jnp.abs(f_val)))
            return (x, lam, f_next, it + 1, done)

        def cond(carry):
            _, _, _, it, done = carry
            return (~done) & (it < max_iters)

        f0 = nll(x0)
        init = (x0, jnp.float32(cfg.init_damping), f0, jnp.int32(0),
                jnp.asarray(False))
        x, _, f_val, it, _ = jax.lax.while_loop(cond, body, init)
        return x, f_val, it

    return jax.jit(solve)


# ------------------------------------------------------------------ banks
class _Bank:
    """Append-only host-side column store with pow-2 device padding."""

    def __init__(self, **cols):
        self.cols: Dict[str, list] = {k: [] for k in cols}
        self.types = cols

    def append(self, **row):
        for k, v in row.items():
            self.cols[k].append(v)

    def __len__(self):
        return len(next(iter(self.cols.values()))) if self.cols else 0


class IncrementalGaussNewtonMAP:
    """Incremental MAP over banked factors with warm-started LM-CG.

    Usage::

        m = IncrementalGaussNewtonMAP()
        m.update(new_nodes, new_factors)   # per incremental step
        x = m.solve()                      # warm-started after step 1
        est = m.results()                  # Variable -> np estimate
    """

    def __init__(self, cfg: IncMAPConfig = IncMAPConfig()):
        self.cfg = cfg
        self.vars: List[Variable] = []
        self.offset: Dict[Variable, int] = {}
        self.dim = 0
        self._x: Optional[np.ndarray] = None       # warm-start estimate
        self._solved_once = False
        self._se2p = _Bank(idx=None, inv_prior=None, prec_chol=None,
                           log_norm=None)
        self._se2o = _Bank(idx1=None, idx2=None, inv_obs=None,
                           prec_chol=None, log_norm=None)
        self._r2p = _Bank(idx=None, mu=None, prec_chol=None, log_norm=None)
        self._r2r = _Bank(idx1=None, idx2=None, obs=None, prec_chol=None,
                          log_norm=None)
        # unified range-mixture bank rows: (obs_idx2, cand_offsets list,
        # r, sigmas list, logw list)
        self._rg: List[tuple] = []
        self._k_max = 1
        self.factors: List[Factor] = []
        self.last_iterations = 0
        self.last_nll = float("nan")

    # -------------------------------------------------------- construction
    def update(self, new_nodes: Sequence[Variable],
               new_factors: Sequence[Factor]) -> None:
        import contextlib
        for v in new_nodes:
            if v in self.offset:
                continue
            self.offset[v] = self.dim
            self.vars.append(v)
            self.dim += v.dim
        if self._x is not None and self.dim > len(self._x):
            self._x = np.concatenate(
                [self._x, np.zeros(self.dim - len(self._x), np.float32)])
        for f in new_factors:
            self._add_factor(f)
            self.factors.append(f)
        if self._x is not None:
            # same backend pin as solve(): the ring-scoring evaluates
            # factor log_pdfs, and on a tunneled-TPU default backend
            # each call is a ~0.5 s round trip
            with self._device_ctx():
                self._init_new_values(new_nodes, new_factors)

    def _device_ctx(self):
        import contextlib
        if self.cfg.device:
            try:
                return jax.default_device(
                    jax.devices(self.cfg.device)[0])
            except RuntimeError:
                pass
        return contextlib.nullcontext()

    def _prec_chol_lognorm(self, cov: np.ndarray):
        prec = np.linalg.inv(cov)
        chol = np.linalg.cholesky(prec)
        log_norm = -0.5 * (cov.shape[0] * _LOG_TWO_PI +
                           np.log(np.linalg.det(cov)))
        return chol, log_norm

    def _add_factor(self, f: Factor) -> None:
        if isinstance(f, UnarySE2ApproximateGaussianPriorFactor):
            self._se2p.append(idx=self.offset[f.vars[0]],
                              inv_prior=f.inv_prior,
                              prec_chol=f.prec_chol, log_norm=f.log_norm)
        elif isinstance(f, SE2RelativeGaussianLikelihoodFactor):
            self._se2o.append(idx1=self.offset[f.vars[0]],
                              idx2=self.offset[f.vars[1]],
                              inv_obs=f.inv_obs, prec_chol=f.prec_chol,
                              log_norm=f.log_norm)
        elif isinstance(f, UnaryR2GaussianPriorFactor):
            chol, ln = self._prec_chol_lognorm(np.asarray(f.covariance))
            self._r2p.append(idx=self.offset[f.vars[0]],
                             mu=np.asarray(f.mu, dtype=np.float64),
                             prec_chol=chol, log_norm=ln)
        elif isinstance(f, R2RelativeGaussianLikelihoodFactor):
            chol, ln = self._prec_chol_lognorm(np.asarray(f.covariance))
            self._r2r.append(idx1=self.offset[f.vars[0]],
                             idx2=self.offset[f.vars[1]],
                             obs=np.asarray(f.obs, dtype=np.float64),
                             prec_chol=chol, log_norm=ln)
        elif isinstance(f, BinaryFactorMixture):
            comps = []
            for w, c in zip(f.weights, f.components):
                if not isinstance(c, _RangeFactorBase):
                    raise NotImplementedError(
                        f"non-range mixture component {type(c).__name__}")
                comps.append((self.offset[c.vars[1]], float(c.obs[0]),
                              float(c.sigma), float(np.log(w))))
            self._rg.append((self.offset[f.vars[0]], comps))
            self._k_max = max(self._k_max, len(comps))
        elif isinstance(f, _RangeFactorBase):
            self._rg.append((self.offset[f.vars[0]],
                             [(self.offset[f.vars[1]], float(f.obs[0]),
                               float(f.sigma), 0.0)]))
        else:
            raise NotImplementedError(
                f"unsupported factor type {type(f).__name__}")

    # ------------------------------------------------------- initialization
    def _init_new_values(self, new_nodes, new_factors) -> None:
        """Dead-reckon new poses; ring-score new landmarks (the warm-start
        half of the ISAM2 analog)."""
        new = [v for v in new_nodes]
        known = {v for v in self.vars if v not in set(new)}
        x = self._x
        for f in new_factors:
            if isinstance(f, SE2RelativeGaussianLikelihoodFactor):
                v1, v2 = f.vars
                if v2 in new and v1 not in new:
                    o = self.offset[v1]
                    pose = np.asarray(geom.se2_compose(
                        jnp.asarray(x[o:o + 3], jnp.float32),
                        jnp.asarray(f.obs, jnp.float32)))
                    x[self.offset[v2]:self.offset[v2] + 3] = pose
                    known.add(v2)
                    new = [v for v in new if v != v2]
            elif isinstance(f, UnarySE2ApproximateGaussianPriorFactor):
                v = f.vars[0]
                if v in new:
                    x[self.offset[v]:self.offset[v] + 3] = f.prior_pose
                    known.add(v)
                    new = [v for v in new if v != f.vars[0]]
            elif isinstance(f, UnaryR2GaussianPriorFactor):
                v = f.vars[0]
                if v in new:
                    x[self.offset[v]:self.offset[v] + 2] = f.mu
                    known.add(v)
                    new = [v for v in new if v != f.vars[0]]
        # landmarks: candidates on the measured ring around the observer,
        # scored by every factor that touches the landmark.  Landmarks
        # touched AGAIN by new range factors are re-scored too — a
        # landmark first seen through one range sits on an ambiguous
        # ring, and once a second range disambiguates it the warm start
        # must be allowed to jump ring modes (local LM cannot; this is
        # the relinearization-hygiene half of the ISAM2 analog).
        new_set = set(new)
        range_like = [f for f in new_factors
                      if isinstance(f, (_RangeFactorBase,
                                        BinaryFactorMixture))]
        lmk_candidates: Dict[Variable, list] = {}
        for f in range_like:
            for v in f.vars[1:]:
                if v.dim != 2:
                    continue
                obs_var = f.vars[0]
                o = self.offset[obs_var]
                center = x[o:o + 2].copy()
                if isinstance(f, BinaryFactorMixture):
                    r = float(f.components[0].obs[0])
                    sg = float(f.components[0].sigma)
                else:
                    r = float(f.obs[0])
                    sg = float(f.sigma)
                lmk_candidates.setdefault(v, []).append((center, r, sg))
        for v, rings in lmk_candidates.items():
            all_touch = [f for f in self.factors if v in f.vars]
            if v not in new_set and len(all_touch) > 12:
                # settled landmark — but a new range that disagrees with
                # the incumbent estimate by >4 sigma signals a wrong-mode
                # commitment worth re-scoring (mode-escape hygiene)
                inc = x[self.offset[v]:self.offset[v] + 2]
                consistent = all(
                    abs(np.linalg.norm(inc - c) - r) < 4.0 * sg
                    for (c, r, sg) in rings)
                if consistent:
                    continue
            cands = []
            for (c, r, sg) in rings:
                # arc spacing <= ~2 sigma so the true mode's basin is
                # always sampled — a fixed candidate count left ~80 m
                # gaps on 200 m rings and cold starts fell into wrong
                # modes 20+ nats worse than the optimum
                M = int(np.clip(np.pi * r / max(sg, 1e-3),
                                self.cfg.landmark_init_candidates, 512))
                angs = np.linspace(-np.pi, np.pi, M, endpoint=False)
                cands.append(c[None] + r * np.stack([np.cos(angs),
                                                     np.sin(angs)], 1))
            if v not in new_set:
                # keep the incumbent estimate in the running
                cands.append(x[self.offset[v]:self.offset[v] + 2][None])
            cands = np.concatenate(cands, axis=0)
            # pad the candidate count to a pow-2 bucket (repeat the
            # first candidate): the scorers are jitted per batch shape,
            # and an arbitrary count per call compiles a fresh program
            # every step
            n_pad = _pow2(len(cands), 16) - len(cands)
            if n_pad:
                cands = np.concatenate(
                    [cands, np.repeat(cands[:1], n_pad, 0)], 0)
            # one batched log_pdf per factor: rows = all candidates
            scores = np.zeros(len(cands))
            for f in all_touch:
                cols = []
                for fv in f.vars:
                    if fv == v:
                        cols.append(cands.astype(np.float32))
                    else:
                        of = self.offset[fv]
                        cols.append(np.broadcast_to(
                            x[of:of + fv.dim].astype(np.float32),
                            (len(cands), fv.dim)))
                rows = np.concatenate(cols, axis=1)
                scores += np.asarray(f.log_pdf(rows))
            best = cands[int(np.argmax(scores))]
            x[self.offset[v]:self.offset[v] + 2] = best

    # ------------------------------------------------------------- solving
    def _device_banks(self) -> Tuple[tuple, dict]:
        D_pad = _pow2(self.dim, 16)
        banks: Dict[str, jnp.ndarray] = {}
        sig: List = [D_pad]

        pad_mask = np.zeros(D_pad, np.float32)
        pad_mask[self.dim:] = 1.0
        banks["pad_mask"] = jnp.asarray(pad_mask)

        def put(prefix, bank: _Bank, idx_cols, mat_cols, vec_cols,
                scal_cols, width):
            n = len(bank)
            if n == 0:
                return
            n_pad = _pow2(n, 8)
            sig.append((prefix, n_pad))
            valid = np.zeros(n_pad, np.float32)
            valid[:n] = 1.0
            banks[f"{prefix}_valid"] = jnp.asarray(valid)
            for c in idx_cols:
                base = np.asarray(bank.cols[c], np.int32)
                arr = np.zeros((n_pad, width), np.int32)
                arr[:n] = base[:, None] + np.arange(width)
                banks[f"{prefix}_{c}"] = jnp.asarray(arr)
            for c in mat_cols:
                base = np.stack(bank.cols[c]).astype(np.float32)
                arr = np.zeros((n_pad,) + base.shape[1:], np.float32)
                arr[:n] = base
                # identity pads keep cholesky well-defined under masking
                arr[n:] = np.eye(base.shape[1], dtype=np.float32)
                banks[f"{prefix}_{c}"] = jnp.asarray(arr)
            for c in vec_cols:
                base = np.stack(bank.cols[c]).astype(np.float32)
                arr = np.zeros((n_pad,) + base.shape[1:], np.float32)
                arr[:n] = base
                banks[f"{prefix}_{c}"] = jnp.asarray(arr)
            for c in scal_cols:
                base = np.asarray(bank.cols[c], np.float32)
                arr = np.zeros(n_pad, np.float32)
                arr[:n] = base
                banks[f"{prefix}_{c}"] = jnp.asarray(arr)

        put("sp", self._se2p, ["idx"], ["prec_chol"], ["inv_prior"],
            ["log_norm"], 3)
        put("so", self._se2o, ["idx1", "idx2"], ["prec_chol"],
            ["inv_obs"], ["log_norm"], 3)
        put("rp", self._r2p, ["idx"], ["prec_chol"], ["mu"],
            ["log_norm"], 2)
        put("rr", self._r2r, ["idx1", "idx2"], ["prec_chol"], ["obs"],
            ["log_norm"], 2)

        n = len(self._rg)
        if n:
            K = self._k_max
            n_pad = _pow2(n, 8)
            sig.append(("rg", n_pad, K))
            obs_idx = np.zeros((n_pad, 2), np.int32)
            cand_idx = np.zeros((n_pad, K, 2), np.int32)
            # per-COMPONENT range obs: a general BinaryFactorMixture may
            # carry a different measurement per hypothesis (advisor
            # round-4 finding); SameData mixtures just repeat it
            r = np.zeros((n_pad, K), np.float32)
            sigma = np.ones((n_pad, K), np.float32)
            logw = np.full((n_pad, K), -1e9, np.float32)
            valid = np.zeros(n_pad, np.float32)
            for i, (oi, comps) in enumerate(self._rg):
                valid[i] = 1.0
                obs_idx[i] = [oi, oi + 1]
                for k in range(K):
                    ci, rk, sk, lwk = comps[min(k, len(comps) - 1)]
                    cand_idx[i, k] = [ci, ci + 1]
                    r[i, k] = rk
                    sigma[i, k] = sk
                    logw[i, k] = lwk if k < len(comps) else -1e9
            banks["rg_obs_idx"] = jnp.asarray(obs_idx)
            banks["rg_cand_idx"] = jnp.asarray(cand_idx)
            banks["rg_r"] = jnp.asarray(r)
            banks["rg_sigma"] = jnp.asarray(sigma)
            banks["rg_logw"] = jnp.asarray(logw)
            banks["rg_valid"] = jnp.asarray(valid)
        return tuple(sig), banks

    def _cold_start(self) -> np.ndarray:
        """Best-of-N ancestral scoring is overkill here: priors +
        dead-reckoning + ring scoring give the same quality start.  Walk
        factors in insertion order (parents appear before children in
        every incremental stream)."""
        self._x = np.zeros(self.dim, np.float32)
        self._init_new_values(list(self.vars), self.factors)
        return self._x

    def solve(self, timer: Optional[List[float]] = None,
              force_cold: bool = False) -> np.ndarray:
        t0 = time.time()
        with self._device_ctx():
            if self._x is None or force_cold:
                self._cold_start()
        warm = self._solved_once and not force_cold
        with self._device_ctx():
            sig, banks = self._device_banks()
            program = _solve_program(sig, self.cfg, warm)
            D_pad = sig[0]
            x0 = np.zeros(D_pad, np.float32)
            x0[:self.dim] = self._x[:self.dim]
            x, f_val, it = program(jnp.asarray(x0), banks)
        x = np.asarray(x)[:self.dim]
        self._x = x.copy()
        self._solved_once = True
        self.last_iterations = int(it)
        self.last_nll = float(f_val)
        if timer is not None:
            timer.append(time.time() - t0)
        return x

    def results(self) -> Dict[Variable, np.ndarray]:
        out: Dict[Variable, np.ndarray] = {}
        for v in self.vars:
            o = self.offset[v]
            out[v] = self._x[o:o + v.dim]
        return out
