"""Concurrent cold-start prewarm: trace + compile + cache the programs a
solve is going to need, in background threads, before the solver reaches
them.

The reference has no compile step at all (eager torch); its cold start IS
its steady state (~32 s on case1).  Here steady state is ~0.4 s but the
first solve pays JAX tracing + XLA compilation for each distinct program.
With pow-2 dim bucketing (``NFiSAMArgs.dim_bucket_floor``) a whole solve
typically uses ONE flow signature, so the full program set is predictable
at solver construction:

* the clique-flow trainer (``train.trainer._cached_full_program``),
* the fused root-to-leaf posterior scan
  (``solver.posterior_pass._fused_chain_program``) plus its parameter-
  stacking ``_jstack`` variants,
* the width-agnostic conditional-sample program
  (``flows.model._conditional_sample_program``, used by separator-factor
  sampling during clique simulation),
* the per-factor-type simulation kernels (``factors.factors._se2_*``,
  ``_range_*``).

Each warmer CALLS the real jitted program once on dummy data of the real
shapes/dtypes, which populates the in-process pjit executable cache (an
AOT ``.lower().compile()`` would only populate the persistent disk cache
and the solve would still re-trace).  Tracing is GIL-bound but XLA
compilation releases the GIL, so 4 warm threads overlap most of the
compile wall-clock with each other and with host-side graph work.

Gate: ``NFISAM_PREWARM=0`` disables.
"""
from __future__ import annotations

import os
import threading
from typing import List, Optional

import numpy as np


def prewarm_enabled() -> bool:
    env = os.environ.get("NFISAM_PREWARM", "1").lower()
    if env in ("1", "true", "on"):
        return True
    if env in ("0", "false", "off"):
        return False
    raise ValueError(f"NFISAM_PREWARM={env!r}: use 1/true/on or 0/false/off")


_warmed = set()
_lock = threading.Lock()


def _cfg_for(args, dim: int):
    from ..flows.nsf import NSFConfig
    from ..solver.nfisam import effective_hidden_dim
    return NSFConfig(dim=dim, num_knots=args.num_knots,
                     hidden_dim=effective_hidden_dim(args, dim),
                     num_flows=args.flow_number, circular=())


def _warm_trainer(args, dim: int) -> None:
    """Same entry the solver uses (``fit_flow_raw``), dummy data."""
    from .trainer import fit_flow_raw
    cfg = _cfg_for(args, dim)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(args.local_sample_num, dim)).astype(np.float32)
    key = np.zeros(2, dtype=np.uint32)
    out = fit_flow_raw(key, x, cfg, args.train_config(), [False] * dim,
                       scale_circular=True, mesh=args.data_parallel_mesh)
    import jax
    jax.block_until_ready(out)


def _warm_conditional(args, dim: int) -> None:
    """Conditional-sample program at simulation batch size (separator
    factors sample ``local_sample_num`` rows during clique simulation)."""
    import jax
    import jax.numpy as jnp

    from ..flows.model import _conditional_sample_program
    from ..flows.nsf import init_flow_params
    cfg = _cfg_for(args, dim)
    prog = _conditional_sample_program(cfg)
    params = init_flow_params(jnp.zeros(2, jnp.uint32), cfg)
    mean = jnp.zeros(dim)
    std = jnp.ones(dim)
    mask = jnp.asarray(np.zeros(dim, dtype=bool))
    key = np.zeros(2, dtype=np.uint32)
    obs_full = jnp.zeros((args.local_sample_num, dim), dtype=jnp.float32)
    invert = jnp.asarray(np.arange(dim) >= 2)
    jax.block_until_ready(
        prog(params, mean, std, mask, key, obs_full, invert))


def _warm_fused_pass(args, dim: int) -> None:
    """Fused posterior scan at the default padding grid (L_pad=16,
    D_pad=256) plus the ``_jstack`` parameter-stacking variants."""
    import jax
    import jax.numpy as jnp

    from ..flows.nsf import init_flow_params
    from ..solver.posterior_pass import (_fused_chain_program, _jstack,
                                         _stack_tree)
    cfg = _cfg_for(args, dim)
    L, D_pad = 16, 256
    n = args.posterior_sample_num
    prog = _fused_chain_program(cfg)
    p0 = init_flow_params(jnp.zeros(2, jnp.uint32), cfg)
    stacked = _stack_tree([p0] * L)
    zero_d = jnp.zeros(dim)
    means = _jstack(*([zero_d] * L))
    stds = _jstack(*([zero_d + 1.0] * L))
    circs = jnp.asarray(np.zeros((L, dim), dtype=bool))
    src = jnp.asarray(np.full((L, dim), -1, dtype=np.int32))
    omask = jnp.asarray(np.zeros((L, dim), dtype=bool))
    ovals = jnp.asarray(np.zeros((L, dim), dtype=np.float32))
    imask = jnp.asarray(np.ones((L, dim), dtype=bool))
    dst = jnp.asarray(np.full((L, dim), D_pad - 1, dtype=np.int32))
    keys = jnp.asarray(np.zeros((L, 2), dtype=np.uint32))
    buffer = jnp.zeros((n, D_pad), dtype=jnp.float32)
    jax.block_until_ready(
        prog(buffer, stacked, means, stds, circs, src, omask, ovals,
             imask, dst, keys))


def _warm_sim_kernels(args, _dim: int) -> None:
    """Per-factor-type simulation kernels at the solve's batch size, with
    the dtypes the factor classes store (f64 numpy params, python-float
    sigmas -> weak scalars) so the cache keys match exactly."""
    import jax
    import jax.numpy as jnp

    from ..factors.factors import (_range_sample_dir, _range_sample_obs,
                                   _se2_prior_sample, _se2_rel_sample_bwd,
                                   _se2_rel_sample_fwd, _se2_rel_sample_obs)
    n = args.local_sample_num
    key = np.zeros(2, dtype=np.uint32)
    p3 = np.zeros(3, dtype=np.float64)
    c33 = np.eye(3, dtype=np.float64)
    v3 = jnp.zeros((n, 3), dtype=jnp.float32)
    t2 = jnp.zeros((n, 2), dtype=jnp.float32)
    obs1 = np.zeros(1, dtype=np.float64)
    outs = [
        _se2_prior_sample(key, p3, c33, n),
        _se2_rel_sample_fwd(key, p3, c33, v3),
        _se2_rel_sample_bwd(key, p3, c33, v3),
        _se2_rel_sample_obs(key, c33, v3, v3),
        _range_sample_dir(key, obs1, 1.0, t2, False),
        _range_sample_dir(key, obs1, 1.0, t2, True),
        _range_sample_obs(key, 1.0, t2, t2),
    ]
    jax.block_until_ready(outs)


_WARMERS = (_warm_trainer, _warm_fused_pass, _warm_conditional,
            _warm_sim_kernels)


def _safe(fn, args, dim: int) -> None:
    try:
        fn(args, dim)
    except Exception:  # never let a prewarm failure break a solve
        pass


def prewarm_solver_programs(args, dims=None,
                            block: bool = False
                            ) -> Optional[List[threading.Thread]]:
    """Fire background warmers for every program a solve with ``args`` is
    expected to compile.  Returns the threads (or None if skipped)."""
    if not prewarm_enabled():
        return None
    if getattr(args, "flow_type", "NSF_AR") != "NSF_AR":
        return None   # NSF_AR_CS configs depend on per-clique circular masks
    if dims is None:
        if int(getattr(args, "pad_dim_multiple", 0) or 0) > 1:
            return None   # legacy multiple-of-k bucketing: many signatures
        dims = (max(int(getattr(args, "dim_bucket_floor", 16) or 16), 2),)

    jobs = []
    for d in dims:
        sig = (d, args.num_knots, args.hidden_dim, args.flow_number,
               args.local_sample_num, args.posterior_sample_num,
               id(args.data_parallel_mesh), repr(args.train_config()))
        with _lock:
            if sig in _warmed:
                continue
            _warmed.add(sig)
        jobs.append(d)
    if not jobs:
        return None

    threads = []
    for d in jobs:
        for fn in _WARMERS:
            t = threading.Thread(target=_safe, args=(fn, args, d),
                                 daemon=True, name=f"prewarm-{fn.__name__}")
            t.start()
            threads.append(t)
    if block:
        for t in threads:
            t.join()
    return threads
