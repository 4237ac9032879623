#!/usr/bin/env python
"""Device-utilization accounting for the two hot programs (round-2 VERDICT
weak #6: "fast" was argued only vs a CPU baseline, never vs what the chip
could do).

For (a) one clique-flow fit and (b) the fused root-to-leaf posterior pass,
at clique scale AND at saturated batch sizes, reports:

* wall time per call / per Adam iteration,
* achieved FLOP/s vs chip peak (MFU).  FLOPs are ANALYTIC (einsum MAC
  counts + a per-scalar RQS estimate): XLA's ``cost_analysis`` counts a
  ``while_loop`` body once regardless of trip count and sees zero FLOPs
  inside Pallas kernels, so it cannot price either program;
* a samples/sec-vs-batch-size curve locating where the chip saturates.

Every timed call gets a FRESH RNG key: repeat calls with bit-identical
input buffers can be served from a result cache in the tunneled-TPU stack
and read ~0 wall time.

Peak reference: TPU v5e (v5 lite) = 197 TFLOP/s bf16; these programs run
f32 (~1/2 MXU rate), so MFU is quoted against the f32 peak.  Structural
context for the numbers: with d=16, h=8 conditioners the MXU's 128x128
systolic array is at most ~1% occupied by construction — per-clique flows
are far below chip scale, which is exactly why the parallel design trains
clique BUCKETS and shards the sample axis (parallel/scheduler.py) instead
of chasing single-flow MFU.  Prints a table and one JSON line; also
written to PROFILE.json.
"""
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(HERE), ".jax_cache"))

import jax                                                   # noqa: E402
import jax.numpy as jnp                                      # noqa: E402
import numpy as np                                           # noqa: E402

from nfisam_tpu.flows.nsf import NSFConfig, init_flow_params  # noqa: E402
from nfisam_tpu.train.trainer import (TrainConfig,            # noqa: E402
                                      _cached_full_program)

PEAK_BF16 = 197e12          # TPU v5e MXU peak, bf16
PEAK_F32 = PEAK_BF16 / 2    # f32 inputs halve MXU throughput

DIM, KNOTS, HIDDEN = 16, 9, 8
CFG = NSFConfig(dim=DIM, num_knots=KNOTS, hidden_dim=HIDDEN, num_flows=1)
RQS_FLOPS_PER_SCALAR = 45   # bin-search compares + rational quadratic


def conditioner_flops_per_sample(d=DIM, h=HIDDEN, p=3 * KNOTS) -> int:
    """All-dims masked conditioner: three einsums (MACs x2)."""
    return 2 * (d * h * d + d * h * h + d * p * h)


def trainer_flops_per_iter(n: int) -> float:
    """value_and_grad of the NLL: ~3x the forward cost (fwd + bwd)."""
    fwd = n * (conditioner_flops_per_sample()
               + DIM * RQS_FLOPS_PER_SCALAR)
    return 3.0 * fwd


def inverse_flops_per_sample() -> float:
    """Sequential AR inverse: one single-dim conditioner (three matvecs,
    MACs x2) plus one RQS inversion per dim step."""
    matvecs = DIM * HIDDEN + HIDDEN * HIDDEN + HIDDEN * 3 * KNOTS
    return DIM * (2 * matvecs + RQS_FLOPS_PER_SCALAR)


def sync(out):
    """Force completion with a 1-element device fetch: on the tunneled
    'axon' platform ``block_until_ready`` returns once the buffer HANDLE
    exists, not once the computation finished (measured: a 0.25 s training
    call 'blocks' in 0.4 ms) — only a real d2h read synchronizes."""
    leaf = jax.tree_util.tree_leaves(out)[-1]
    np.asarray(jnp.ravel(leaf)[0])
    return out


def timed_keys(fn, make_args, reps=3):
    """Time fn over reps calls, each with a FRESH key (cache busting)."""
    sync(fn(*make_args(0)))
    t0 = time.time()
    for r in range(1, reps + 1):
        out = sync(fn(*make_args(r)))
    return (time.time() - t0) / reps, out


def profile_trainer():
    """One clique fit (journal config: 2000 iters, n=2000) and a saturated
    fit (n=262144, 100 iters — per-iter cost is the quantity of interest
    and multi-second single calls can trip the tunneled-TPU RPC
    deadline)."""
    rows = []
    for n, max_iters in ((2000, 2000), (262144, 100)):
        tc = TrainConfig(max_iters=max_iters, learning_rate=0.025,
                         loss_delta_tol=0.0)   # no early stop: fixed work
        prog = _cached_full_program(CFG, tc, True, n)
        x = np.random.default_rng(0).normal(size=(n, DIM)).astype(np.float32)
        mask = jnp.asarray(np.zeros(DIM, dtype=bool))

        def make_args(r, x=x, mask=mask):
            return (np.array([7, r], dtype=np.uint32), x, mask)

        wall, out = timed_keys(prog, make_args, reps=2)
        iters = int(out[2])
        flops = trainer_flops_per_iter(n) * iters
        mfu = flops / wall / PEAK_F32
        rows.append({"component": "clique_fit", "n": n, "iters": iters,
                     "wall_s": round(wall, 4),
                     "per_iter_us": round(1e6 * wall / max(iters, 1), 1),
                     "analytic_flops": flops,
                     "mfu_f32_pct": round(100 * mfu, 4)})
        print(f"clique_fit n={n:>7}: {wall:7.3f} s/call, {iters} iters, "
              f"{1e6 * wall / max(iters, 1):8.1f} us/iter, "
              f"MFU {100 * mfu:7.4f}% (f32 peak)", file=sys.stderr)
    return rows


def profile_batched_trainer():
    """The bucketed (vmapped) clique trainer at bucket sizes B — the
    round-3 VERDICT weak #2 measurement: the parallel design claims
    clique batching recovers the utilization a d=16 flow cannot reach
    alone (``parallel/scheduler.py`` buckets; ``trainer.py``
    ``fit_flows_batched``).  Fixed work (no early stop) so the FLOP count
    is exact; reports throughput (clique-fits/s) and MFU per B."""
    from nfisam_tpu.train.trainer import _cached_batched_program
    n, iters = 2000, 500
    tc = TrainConfig(max_iters=iters, learning_rate=0.025,
                     loss_delta_tol=0.0)
    rows = []
    base_mfu = None
    for B in (1, 4, 16, 64):
        prog = _cached_batched_program(CFG, tc, True, n, B)
        rng = np.random.default_rng(0)
        x = rng.normal(size=(B, n, DIM)).astype(np.float32)
        masks = jnp.asarray(np.zeros((B, DIM), dtype=bool))

        def make_args(r, x=x, masks=masks, B=B):
            keys = np.zeros((B, 2), dtype=np.uint32)
            keys[:, 0] = 7
            keys[:, 1] = np.arange(B) + 1000 * r
            return (jnp.asarray(keys), x, masks)

        wall, out = timed_keys(prog, make_args, reps=2)
        it = int(np.asarray(out[2])[0])
        flops = B * trainer_flops_per_iter(n) * it
        mfu = flops / wall / PEAK_F32
        if base_mfu is None:
            base_mfu = mfu
        rows.append({"component": "clique_fit_batched", "B": B, "n": n,
                     "iters": it, "wall_s": round(wall, 4),
                     "clique_fits_per_s": round(B / wall, 2),
                     "analytic_flops": flops,
                     "mfu_f32_pct": round(100 * mfu, 4),
                     "mfu_recovery_vs_B1": round(mfu / base_mfu, 2)})
        print(f"clique_fit_batched B={B:>3}: {wall:7.3f} s/call, "
              f"{B / wall:8.2f} fits/s, MFU {100 * mfu:7.4f}% "
              f"({mfu / base_mfu:5.2f}x vs B=1)", file=sys.stderr)
    return rows


def profile_fused_pass():
    """The fused posterior scan (16-clique chain) across batch sizes:
    samples/sec curve + MFU at clique scale and saturation."""
    from nfisam_tpu.solver.posterior_pass import (_fused_chain_program,
                                                  _jstack, _stack_tree)
    L, D_pad = 16, 256
    prog = _fused_chain_program(CFG)
    p0 = init_flow_params(jnp.zeros(2, jnp.uint32), CFG)
    stacked = _stack_tree([p0] * L)
    zero_d = jnp.zeros(DIM)
    means = _jstack(*([zero_d] * L))
    stds = _jstack(*([zero_d + 1.0] * L))
    circs = jnp.asarray(np.zeros((L, DIM), dtype=bool))
    src = jnp.asarray(np.full((L, DIM), -1, dtype=np.int32))
    omask = jnp.asarray(np.zeros((L, DIM), dtype=bool))
    ovals = jnp.asarray(np.zeros((L, DIM), dtype=np.float32))
    imask = jnp.asarray(np.ones((L, DIM), dtype=bool))
    # scatter into real columns so the work matches production
    dst = jnp.asarray(np.stack(
        [np.arange(i * DIM, (i + 1) * DIM) % (D_pad - 1)
         for i in range(L)]).astype(np.int32))

    rows = []
    for n in (1000, 4096, 16384, 65536, 262144):
        buffer = jnp.zeros((n, D_pad), dtype=jnp.float32)

        def make_args(r, buffer=buffer):
            keys = np.zeros((L, 2), dtype=np.uint32)
            keys[:, 1] = r
            return (buffer, stacked, means, stds, circs, src, omask,
                    ovals, imask, dst, jnp.asarray(keys))

        wall, _ = timed_keys(prog, make_args, reps=2)
        flops = n * L * inverse_flops_per_sample()
        sps = n / wall
        rows.append({"component": "fused_posterior_pass", "n": n,
                     "wall_s": round(wall, 5),
                     "samples_per_s": round(sps),
                     "analytic_flops": flops,
                     "mfu_f32_pct": round(100 * flops / wall / PEAK_F32,
                                          4)})
        print(f"fused_pass n={n:>8}: {wall * 1e3:9.2f} ms/call, "
              f"{sps / 1e6:8.3f} M samples/s, "
              f"MFU {100 * flops / wall / PEAK_F32:7.4f}% (f32 peak)",
              file=sys.stderr)
    return rows


def main():
    backend = jax.default_backend()
    print(f"# backend: {backend}, device: {jax.devices()[0]}",
          file=sys.stderr)
    rows = (profile_trainer() + profile_batched_trainer()
            + profile_fused_pass())
    fp = [r for r in rows if r["component"] == "fused_posterior_pass"]
    best = max(r["samples_per_s"] for r in fp)
    sat = next(r["n"] for r in fp if r["samples_per_s"] >= 0.7 * best)
    launch_bound = fp[0]["samples_per_s"] < 0.1 * best
    bt = [r for r in rows if r["component"] == "clique_fit_batched"]
    out = {"backend": backend, "rows": rows,
           "saturation_batch": sat,
           "clique_scale_launch_bound": bool(launch_bound),
           "batched_trainer_mfu_recovery": bt[-1]["mfu_recovery_vs_B1"]
           if bt else None,
           "peak_f32_flops": PEAK_F32}
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(HERE), "PROFILE.json"),
              "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
