"""manhattan_plaza benchmark via the empirical-study driver (reference
``example/slam/manhattan_world_with_range/manhattan_plaza/run_nfisam.py``:
knots 9, hidden 8, 500 iters, 2000 train samples, lr .01,
incremental_step=1, pose_first; dataset seed0/pada0.4_r2_odom0.01_mada3:
136 SE2 poses, 3 landmarks, 272 factors, 59 ambiguous-DA ranges).

Exercises the full ``nfisam_empirical_study`` -> ``run_incrementally``
path (run dirs, per-step artifacts, posterior plots, hypoweights).
"""
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import numpy as np

from nfisam_tpu.io import graph_file_parser
from nfisam_tpu.solver.run import nfisam_empirical_study

CASE_DIR = "/tmp/manhattan_plaza"


def main():
    os.makedirs(CASE_DIR, exist_ok=True)
    shutil.copy(os.path.join(REPO, "data",
                             "manhattan_plaza_factor_graph.fg"),
                f"{CASE_DIR}/factor_graph.fg")
    t0 = time.time()
    run_dirs = nfisam_empirical_study(
        knots=[9], iters=[500], training_samples=[2000],
        learning_rates=[0.01], hidden_dims=[8],
        case_dir=CASE_DIR, data_file="factor_graph.fg", data_format="fg",
        incremental_step=1, prior_cov_scale=1.0,
        plot_args={"xlim": (-150, 400), "ylim": (-150, 400)},
        posterior_sample_num=1000, elimination_method="pose_first",
        training_set_frac=1.0, loss_delta_tol=1e-9, average_window=50)
    total = time.time() - t0
    run_dir = run_dirs[0]

    nodes, truth, factors = graph_file_parser(
        f"{CASE_DIR}/factor_graph.fg", "fg")
    # last step's samples from the artifact file
    last = max(int(f[4:].split("_")[0].split(".")[0])
               for f in os.listdir(run_dir)
               if f.startswith("step") and f[4:].split("_")[0]
               .split(".")[0].isdigit())
    X = np.loadtxt(f"{run_dir}/step{last}")
    order = open(f"{run_dir}/step{last}_ordering").read().split()
    name2var = {v.name: v for v in nodes}
    cur, errs, lmk = 0, [], []
    for nm in order:
        v = name2var[nm]
        mean = X[:, cur:cur + v.dim].mean(0)
        cur += v.dim
        if v in truth:
            e = float(np.linalg.norm(mean[:2] - truth[v][:2]))
            errs.append(e)
            if nm.startswith("L"):
                lmk.append(e)
    steps = [float(t) for t in open(f"{run_dir}/step_timing").read().split()]
    res = {"total_s": round(total, 1),
           "solve_s": round(sum(steps), 1),
           "n_steps": len(steps),
           "median_step_s": round(float(np.median(steps)), 3),
           "trans_rmse": round(float(np.sqrt(np.mean(
               np.array(errs) ** 2))), 3),
           "landmark_rmse": round(float(np.sqrt(np.mean(
               np.array(lmk) ** 2))), 3) if lmk else None,
           "run_dir": run_dir}
    print(json.dumps(res), flush=True)
    with open("/tmp/manhattan_plaza_results.json", "w") as f:
        json.dump(res, f)


if __name__ == "__main__":
    main()
