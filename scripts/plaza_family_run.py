"""Plaza-family benchmark runner (reference spec
``example/slam/plaza_dataset/run_nfisam.py:5-21``: incremental_step=5,
knots 9, <=2000 iters, 2000 train samples, lr .01, pose_first, 1000
posterior samples).  Covers Plaza1/Plaza2 and the ambiguous-DA variants.

Round-4 additions (VERDICT weak #5):

* **divergence gate**: each stream's final step is checked against the
  truth-initialized banked MAP floor (max posterior-mean error vs
  3x floor max error and 15 m absolute) and the DA resolution floor
  (resolved fraction >= 0.7); a diverged stream is marked in the JSON
  and the process exits 2 — mechanically flagged instead of visible
  only to a human reading the range column.
* **mitigation (--defer-da)**: delayed hypothesis commitment — an
  ambiguous-DA factor is withheld from the solver until every candidate
  landmark has >=2 committed unambiguous factors (bounded at +6 steps),
  so early cliques cannot harden a wrong association before the
  landmark is localized.  Run with/without across seeds to measure the
  diverged-stream rate (reference mixture machinery being tuned:
  ``src/factors/Factors.py:3146-3180``).

Usage: python scripts/plaza_family_run.py <dataset> [seed] [--defer-da]
Writes /tmp/<dataset>_results.json (seed/defer suffixes when given).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import numpy as np

from nfisam_tpu.io import (graph_file_parser,
                           group_nodes_factors_incrementally)
from nfisam_tpu.parallel.scheduler import ParallelNFiSAM
from nfisam_tpu.solver import NFiSAMArgs

ARGS = [a for a in sys.argv[1:] if not a.startswith("--")]
DEFER_DA = "--defer-da" in sys.argv
DATASET = ARGS[0] if ARGS else "plaza2"
SEED = int(ARGS[1]) if len(ARGS) > 1 else 0
DATA = f"/root/repo/data/{DATASET}_factor_graph.fg"
SUFFIX = ("" if SEED == 0 else f"_seed{SEED}") + \
    ("_deferda" if DEFER_DA else "")
OUT = f"/tmp/{DATASET}{SUFFIX}_results.json"
DEFER_MAX_STEPS = 6
from nfisam_tpu.io.stream_policy import defer_ambiguous  # noqa: E402


HYPO_EVERY = 10   # hypothesis-weight sampling cadence (hundreds of DA
                  # factors x ~150 steps would be dispatch-bound per step)


def geometric_true_component(factor, truth):
    """Index of the candidate whose ground-truth distance to the observer
    best matches the measured range — the 'true' association for
    resolution curves (the .fg grammar does not label it)."""
    obs = float(np.asarray(factor.observation).reshape(-1)[0])
    o = np.asarray(truth[factor.vars[0]])[:2]
    ds = [abs(float(np.linalg.norm(
        np.asarray(truth[v])[:2] - o)) - obs) for v in factor.vars[1:]]
    return int(np.argmin(ds))


def hypo_snapshot(factors_in, samples, truth):
    """Mean posterior weight on the geometric-truth component, and the
    fraction of DA factors resolved (>0.9) onto it.

    One posterior fetch + CPU-pinned evaluation: per-factor jnp calls on
    the tunneled-TPU default backend cost ~0.4 s EACH — 151 DA factors
    made every snapshot ~70 s (measured: a 103 s solve wrapped in a
    1,222 s run)."""
    from nfisam_tpu.factors.mixtures import BinaryFactorMixture
    if hasattr(samples, "materialize"):
        samples = samples.materialize()
    else:
        samples = {v: np.asarray(s) for v, s in samples.items()}
    ws = []
    have = set(samples)
    cpu = jax.devices("cpu")[0]
    for f in factors_in:
        if not isinstance(f, BinaryFactorMixture) or len(f.vars) < 3:
            continue
        if not set(f.vars).issubset(have):
            continue
        with jax.default_device(cpu):
            w = np.asarray(f.posterior_weights(samples))
        ws.append(float(w[geometric_true_component(f, truth)]))
    if not ws:
        return None
    ws = np.asarray(ws)
    return {"n": len(ws), "mean_true_weight": round(float(ws.mean()), 3),
            "resolved_frac": round(float((ws > 0.9).mean()), 3)}


def map_floor(nodes, truth, factors):
    """Truth-initialized banked MAP floor (reference parity: the GTSAM
    harness reads init values from the file, gtsam_solution.cpp)."""
    import numpy as np

    from nfisam_tpu.solver.banked_joint import IncrementalGaussNewtonMAP
    m = IncrementalGaussNewtonMAP()
    m.update(nodes, factors)
    x = np.zeros(m.dim, np.float32)
    for v in nodes:
        o = m.offset[v]
        x[o:o + v.dim] = np.asarray(truth[v])[:v.dim]
    m._x = x
    m._solved_once = True
    m.solve()
    est = m.results()
    errs = np.array([np.linalg.norm(est[v][:2] - truth[v][:2])
                     for v in nodes if v in truth])
    return (float(np.sqrt((errs ** 2).mean())), float(errs.max()))


def main():
    nodes, truth, factors = graph_file_parser(DATA, "fg")
    batches = group_nodes_factors_incrementally(nodes, factors,
                                                incremental_step=5)
    if DEFER_DA:
        batches = defer_ambiguous(batches, max_steps=DEFER_MAX_STEPS)
    args = NFiSAMArgs(posterior_sample_num=1000, local_sample_num=2000,
                      flow_iterations=2000, num_knots=9,
                      learning_rate=0.01, hidden_dim=8,
                      elimination_method="pose_first", seed=SEED)
    solver = ParallelNFiSAM(args)
    is_ada = "ada" in DATASET
    step_times = []
    hypo_curve = []
    samples = None
    t_all = time.time()
    for i, (ns, fs) in enumerate(batches):
        for n in ns:
            solver.add_node(n)
        for f in fs:
            solver.add_factor(f)
        t0 = time.time()
        solver.update_physical_and_working_graphs()
        samples = solver.incremental_inference()
        step_times.append(time.time() - t0)
        if is_ada and (i % HYPO_EVERY == 0 or i == len(batches) - 1):
            snap = hypo_snapshot(solver.physical_factors, samples, truth)
            if snap is not None:
                hypo_curve.append({"step": i, **snap})
                print(f"step {i}: DA true-assoc weight "
                      f"{snap['mean_true_weight']} over {snap['n']} "
                      f"factors, resolved {snap['resolved_frac']}",
                      flush=True)
        if i % 10 == 0 or step_times[-1] > 30:
            print(f"step {i}/{len(batches)}: {step_times[-1]:.1f}s, "
                  f"total {time.time() - t_all:.0f}s", flush=True)
    total = time.time() - t_all

    if hasattr(samples, "materialize"):
        samples = samples.materialize()   # ONE device fetch for all vars
    means = {v: np.asarray(samples[v]).mean(0) for v in samples}
    errs = np.array([np.linalg.norm(means[v][:2] - truth[v][:2])
                     for v in samples if v in truth])
    max_err = float(errs.max())

    floor_rmse, floor_max = map_floor(nodes, truth, factors)
    reasons = []
    if max_err > max(3.0 * floor_max, 15.0):
        reasons.append(f"max posterior-mean error {max_err:.1f} m > "
                       f"max(3x floor max {floor_max:.1f}, 15)")
    resolved = hypo_curve[-1]["resolved_frac"] if hypo_curve else None
    if resolved is not None and resolved < 0.7:
        reasons.append(f"DA resolution {resolved} < 0.7")

    result = {"dataset": DATASET,
              "seed": SEED,
              "defer_da": DEFER_DA,
              "total_s": round(total, 1),
              # solver cost alone (sum of per-step solve walls); total_s
              # additionally includes the per-step DA-hypothesis
              # snapshots and progress diagnostics
              "solve_s": round(sum(step_times), 1),
              "n_steps": len(batches),
              "mean_step_s": round(float(np.mean(step_times)), 2),
              "median_step_s": round(float(np.median(step_times)), 2),
              "max_step_s": round(float(np.max(step_times)), 2),
              "trans_rmse": round(float(np.sqrt((errs ** 2).mean())), 3),
              "max_err": round(max_err, 2),
              "map_floor_rmse": round(floor_rmse, 3),
              "map_floor_max_err": round(floor_max, 2),
              "diverged": bool(reasons),
              "diverged_reasons": reasons}
    if hypo_curve:
        result["hypo_final"] = hypo_curve[-1]
    print(json.dumps(result), flush=True)
    with open(OUT, "w") as f:
        json.dump({**result,
                   "hypo_curve": hypo_curve,
                   "step_times": [round(t, 3) for t in step_times]}, f)
    if reasons:
        print("# DIVERGED STREAM: " + "; ".join(reasons), file=sys.stderr)
        sys.exit(2)


if __name__ == "__main__":
    main()
