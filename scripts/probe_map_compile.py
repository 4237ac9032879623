#!/usr/bin/env python
"""Attribute the banked-MAP LM-CG TPU compile cost (VERDICT r4 #9: 710 s
per bucket at scale, CPU compiles the same program in seconds).

Builds synthetic banks at increasing D_pad and times jit-compile of
(a) the production program (jax.scipy CG inside the LM while_loop) and
(b) a fixed-iteration fori_loop CG variant, on whatever backend runs this.
"""
import os
import sys
import time
from functools import partial

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(HERE, ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

from nfisam_tpu.solver.banked_joint import (IncMAPConfig, _banked_nll,
                                            _solve_program)


def synth_banks(D_pad, n_so, n_rg, K=2):
    rng = np.random.default_rng(0)
    banks = {}
    pad_mask = np.zeros(D_pad, np.float32)
    banks["pad_mask"] = jnp.asarray(pad_mask)
    idx1 = rng.integers(0, D_pad - 6, n_so)
    banks["so_idx1"] = jnp.asarray(
        (idx1[:, None] + np.arange(3)).astype(np.int32))
    banks["so_idx2"] = jnp.asarray(
        (idx1[:, None] + 3 + np.arange(3)).astype(np.int32))
    banks["so_inv_obs"] = jnp.asarray(
        np.tile(np.array([1.0, 0, 0], np.float32), (n_so, 1)))
    banks["so_prec_chol"] = jnp.asarray(
        np.tile(np.eye(3, dtype=np.float32), (n_so, 1, 1)))
    banks["so_log_norm"] = jnp.zeros(n_so)
    banks["so_valid"] = jnp.ones(n_so)
    oi = rng.integers(0, D_pad - 2, n_rg)
    banks["rg_obs_idx"] = jnp.asarray(
        (oi[:, None] + np.arange(2)).astype(np.int32))
    ci = rng.integers(0, D_pad - 2, (n_rg, K))
    banks["rg_cand_idx"] = jnp.asarray(
        (ci[..., None] + np.arange(2)).astype(np.int32))
    banks["rg_r"] = jnp.asarray(
        np.full((n_rg, K), 5.0, np.float32))
    banks["rg_sigma"] = jnp.ones((n_rg, K))
    banks["rg_logw"] = jnp.zeros((n_rg, K))
    banks["rg_valid"] = jnp.ones(n_rg)
    return banks


def fori_cg_program(cfg: IncMAPConfig, max_iters: int):
    """LM with fixed-iteration hand-rolled CG (no early-exit cond)."""

    def solve(x0, banks):
        nll = lambda x: _banked_nll(x, banks)       # noqa: E731
        grad_fn = jax.grad(nll)

        def body(carry):
            x, lam, f_val, it, done = carry
            g = grad_fn(x)

            def hvp(v):
                return jax.jvp(grad_fn, (x,), (v,))[1] + lam * v

            def cg_step(_, s):
                xk, rk, pk, rs = s
                Ap = hvp(pk)
                alpha = rs / jnp.maximum(jnp.vdot(pk, Ap), 1e-30)
                xk = xk + alpha * pk
                rk = rk - alpha * Ap
                rs2 = jnp.vdot(rk, rk)
                pk = rk + (rs2 / jnp.maximum(rs, 1e-30)) * pk
                return (xk, rk, pk, rs2)

            b = -g
            s0 = (jnp.zeros_like(b), b, b, jnp.vdot(b, b))
            dx, *_ = jax.lax.fori_loop(0, cfg.cg_iters, cg_step, s0)
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
            return (~carry[4]) & (carry[3] < max_iters)

        f0 = nll(x0)
        init = (x0, jnp.float32(cfg.init_damping), f0, jnp.int32(0),
                jnp.asarray(False))
        x, _, f_val, it, _ = jax.lax.while_loop(cond, body, init)
        return x, f_val, it

    return jax.jit(solve)


def main():
    print(f"# backend: {jax.default_backend()}", flush=True)
    cfg = IncMAPConfig()
    for D_pad in (2048, 8192, 16384):
        n_so, n_rg = D_pad // 4, D_pad // 16
        banks = synth_banks(D_pad, n_so, n_rg)
        x0 = jnp.zeros(D_pad)
        for name, make in (
                ("scipy_cg", lambda: _solve_program(
                    ("probe", D_pad), cfg, warm=False)),
                ("fori_cg", lambda: fori_cg_program(cfg, cfg.max_iters))):
            prog = make()
            t0 = time.time()
            lowered = prog.lower(x0, banks)
            t_lower = time.time() - t0
            t0 = time.time()
            compiled = lowered.compile()
            t_compile = time.time() - t0
            t0 = time.time()
            out = compiled(x0, banks)
            np.asarray(out[1])
            t_run = time.time() - t0
            print(f"D_pad={D_pad:6d} {name}: lower {t_lower:6.1f}s "
                  f"compile {t_compile:7.1f}s first-run {t_run:6.1f}s "
                  f"(f={float(out[1]):.3e}, iters={int(out[2])})",
                  flush=True)


if __name__ == "__main__":
    main()
