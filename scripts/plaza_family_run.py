"""Plaza-family benchmark runner (reference spec
``example/slam/plaza_dataset/run_nfisam.py:5-21``: incremental_step=5,
knots 9, <=2000 iters, 2000 train samples, lr .01, pose_first, 1000
posterior samples).  Covers Plaza1/Plaza2 and the ambiguous-DA variants.

Usage: python scripts/plaza_family_run.py <dataset> [seed]
       # dataset: plaza1 | plaza2 | plaza1_ada0.4
Writes /tmp/<dataset>_results.json (or _seed{N} when a seed is given).
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

DATASET = sys.argv[1] if len(sys.argv) > 1 else "plaza2"
SEED = int(sys.argv[2]) if len(sys.argv) > 2 else 0
DATA = f"/root/repo/data/{DATASET}_factor_graph.fg"
OUT = (f"/tmp/{DATASET}_results.json" if SEED == 0
       else f"/tmp/{DATASET}_seed{SEED}_results.json")


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
    fraction of DA factors resolved (>0.9) onto it."""
    from nfisam_tpu.factors.mixtures import BinaryFactorMixture
    ws = []
    have = set(samples)
    for f in factors_in:
        if not isinstance(f, BinaryFactorMixture) or len(f.vars) < 3:
            continue
        if not set(f.vars).issubset(have):
            continue
        w = np.asarray(f.posterior_weights(samples))
        ws.append(float(w[geometric_true_component(f, truth)]))
    if not ws:
        return None
    ws = np.asarray(ws)
    return {"n": len(ws), "mean_true_weight": round(float(ws.mean()), 3),
            "resolved_frac": round(float((ws > 0.9).mean()), 3)}


def main():
    nodes, truth, factors = graph_file_parser(DATA, "fg")
    batches = group_nodes_factors_incrementally(nodes, factors,
                                                incremental_step=5)
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

    means = {v: np.asarray(samples[v]).mean(0) for v in samples}
    errs = np.array([np.linalg.norm(means[v][:2] - truth[v][:2])
                     for v in samples if v in truth])
    result = {"dataset": DATASET,
              "total_s": round(total, 1),
              "n_steps": len(batches),
              "mean_step_s": round(float(np.mean(step_times)), 2),
              "median_step_s": round(float(np.median(step_times)), 2),
              "max_step_s": round(float(np.max(step_times)), 2),
              "trans_rmse": round(float(np.sqrt((errs ** 2).mean())), 3),
              "max_err": round(float(errs.max()), 2)}
    if hypo_curve:
        result["hypo_final"] = hypo_curve[-1]
    print(json.dumps(result), flush=True)
    with open(OUT, "w") as f:
        json.dump({**result,
                   "hypo_curve": hypo_curve,
                   "step_times": [round(t, 3) for t in step_times]}, f)


if __name__ == "__main__":
    main()
