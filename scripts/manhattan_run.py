"""Manhattan-world lawnmower_4x4 north-star benchmark (BASELINE.md target).

Reference spec ``example/slam/manhattan_world_with_range/lawnmower_4x4/
run_nfisam.py:7-27``: knots 9, hidden 8, <=2000 iters, 2000 train samples,
lr .02, incremental_step=1, pose_first, 1000 posterior samples; dataset
seed1/pada0.4_r2_odom0.01_mada3 (16 SE2 poses, 3 landmarks, 32 factors,
6 ambiguous-DA range factors).

Usage:
  python scripts/manhattan_run.py            # real backend (TPU)
  NFISAM_MESH=8 python scripts/manhattan_run.py   # virtual 8-dev CPU mesh

Writes /tmp/manhattan_results.json (step times, landmark/pose RMSE,
posterior samples/sec/chip).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

MESH_N = int(os.environ.get("NFISAM_MESH", "0"))
if MESH_N:
    # the axon TPU harness overrides JAX_PLATFORMS; force cpu via jax.config
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               f" --xla_force_host_platform_device_count={MESH_N}").strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax

if MESH_N:
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import numpy as np

from nfisam_tpu.io import (graph_file_parser,
                           group_nodes_factors_incrementally)
from nfisam_tpu.parallel.scheduler import ParallelNFiSAM
from nfisam_tpu.solver import NFiSAMArgs

DATA = "/root/repo/data/lawnmower_4x4_factor_graph.fg"
# optional argv seed: accuracy-spread runs (one timed pass, per-seed file)
SEED = int(sys.argv[1]) if len(sys.argv) > 1 else 0
OUT = ("/tmp/manhattan_results.json" if SEED == 0
       else f"/tmp/manhattan_seed{SEED}_results.json")


def build_solver():
    kwargs = dict(posterior_sample_num=1000, local_sample_num=2000,
                  flow_iterations=2000, num_knots=9, learning_rate=0.02,
                  hidden_dim=8, elimination_method="pose_first", seed=SEED)
    if MESH_N:
        from nfisam_tpu.parallel.mesh import make_mesh
        n_clique = 2 if MESH_N % 2 == 0 else 1
        mesh = make_mesh(n_data=MESH_N // n_clique, n_clique=n_clique,
                         devices=jax.devices()[:MESH_N])
        args = NFiSAMArgs(data_parallel_mesh=mesh, sample_mesh=mesh,
                          **kwargs)
    else:
        args = NFiSAMArgs(**kwargs)
    return ParallelNFiSAM(args)


def run_once(tag):
    nodes, truth, factors = graph_file_parser(DATA, "fg")
    batches = group_nodes_factors_incrementally(nodes, factors,
                                                incremental_step=1)
    solver = build_solver()
    step_times, post_times = [], []
    samples = None
    t_all = time.time()
    for i, (ns, fs) in enumerate(batches):
        for n in ns:
            solver.add_node(n)
        for f in fs:
            solver.add_factor(f)
        t0 = time.time()
        solver.update_physical_and_working_graphs()
        tp = time.time()
        samples = solver.incremental_inference()
        step_times.append(time.time() - t0)
        post_times.append(time.time() - tp)
        print(f"[{tag}] step {i}/{len(batches)}: {step_times[-1]:.2f}s",
              flush=True)
    total = time.time() - t_all

    if hasattr(samples, "materialize"):
        samples = samples.materialize()   # ONE device fetch for all vars
    errs, lmk_errs = [], []
    for v in samples:
        if v not in truth:
            continue
        mean = np.asarray(samples[v]).mean(0)
        e = float(np.linalg.norm(mean[:2] - np.asarray(truth[v])[:2]))
        errs.append(e)
        if v.name.startswith("L"):
            lmk_errs.append(e)
    n_chips = max(1, MESH_N)
    return {"total_s": round(total, 2),
            "n_steps": len(batches),
            "step_times": [round(t, 3) for t in step_times],
            "median_step_s": round(float(np.median(step_times)), 3),
            "trans_rmse": round(float(np.sqrt(np.mean(
                np.array(errs) ** 2))), 3),
            "landmark_rmse": round(float(np.sqrt(np.mean(
                np.array(lmk_errs) ** 2))), 3) if lmk_errs else None,
            "posterior_samples_per_sec_per_chip": round(
                1000.0 * len(batches) / (sum(post_times) * n_chips), 0),
            "mesh_devices": MESH_N or 1}


def main():
    if SEED:
        res = {"steady": run_once(f"seed{SEED}")}
        print(json.dumps({k: {kk: vv for kk, vv in v.items()
                              if kk != "step_times"}
                          for k, v in res.items()}), flush=True)
        with open(OUT, "w") as f:
            json.dump(res, f, indent=1)
        return
    cold = run_once("cold")
    warm = run_once("warm")     # steady state: all signatures compiled
    res = {"cold": cold, "steady": warm}
    print(json.dumps({k: {kk: vv for kk, vv in v.items()
                          if kk != "step_times"} for k, v in res.items()},
                     indent=1), flush=True)
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
