"""random_4x4 10-seed grid sweep (reference
``example/slam/manhattan_world_with_range/random_4x4/run_nfisam.py``:
knots 9, hidden 8, <=2000 iters, 2000 train samples, lr .01,
incremental_step=1, pose_first, 1000 posterior samples).

The reference sweeps seeds via ``NFiSAM_empirial_study`` and aggregates
RMSE/time grids in ``mmd_rmse_time_da_plot_grid.py``; this runs all 10
committed seed datasets end-to-end and records per-seed wall time and
RMSE.  Writes /tmp/random4x4_sweep.json.
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


def run_seed(seed_id: int) -> dict:
    nodes, truth, factors = graph_file_parser(
        f"/root/repo/data/random_4x4_seed{seed_id}.fg", "fg")
    batches = group_nodes_factors_incrementally(nodes, factors,
                                                incremental_step=1)
    solver = ParallelNFiSAM(NFiSAMArgs(
        posterior_sample_num=1000, local_sample_num=2000,
        flow_iterations=2000, num_knots=9, learning_rate=0.01,
        hidden_dim=8, elimination_method="pose_first", seed=0))
    t0 = time.time()
    samples = None
    for ns, fs in batches:
        for n in ns:
            solver.add_node(n)
        for f in fs:
            solver.add_factor(f)
        solver.update_physical_and_working_graphs()
        samples = solver.incremental_inference()
    total = time.time() - t0
    errs, lmk = [], []
    for v in samples:
        if v not in truth:
            continue
        e = float(np.linalg.norm(
            np.asarray(samples[v]).mean(0)[:2] - truth[v][:2]))
        errs.append(e)
        if v.name.startswith("L"):
            lmk.append(e)
    return {"seed": seed_id,
            "total_s": round(total, 2),
            "n_steps": len(batches),
            "trans_rmse": round(float(np.sqrt(np.mean(
                np.array(errs) ** 2))), 2),
            "landmark_rmse": round(float(np.sqrt(np.mean(
                np.array(lmk) ** 2))), 2) if lmk else None}


def main():
    results = [run_seed(s) for s in range(10)]
    for r in results:
        print(json.dumps(r), flush=True)
    totals = [r["total_s"] for r in results]
    rmses = [r["trans_rmse"] for r in results]
    agg = {"seeds": 10,
           "total_s_all": round(sum(totals), 1),
           "median_seed_s": round(float(np.median(totals)), 2),
           "median_rmse": round(float(np.median(rmses)), 2),
           "per_seed": results}
    print(json.dumps({k: v for k, v in agg.items() if k != "per_seed"}),
          flush=True)
    with open("/tmp/random4x4_sweep.json", "w") as f:
        json.dump(agg, f, indent=1)


if __name__ == "__main__":
    main()
