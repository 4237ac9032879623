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

    # Gaussian MAP floor on the same graph (max-mixture LM + Laplace):
    # the flow posterior mean must land within 1.1x of it — the round-2
    # "lands at the Gaussian floor" prose overstated a 20% gap; this run
    # is now GATED on the claim instead (exit 1)
    from nfisam_tpu.solver.map_solver import GaussNewtonMAP
    m = GaussNewtonMAP(nodes, factors)
    x_map, _, _, _ = m.solve()
    cur2, map_errs, map_lmk = 0, [], []
    for v in m.joint.vars:
        mean = x_map[cur2:cur2 + v.dim]
        cur2 += v.dim
        if v in truth:
            e = float(np.linalg.norm(mean[:2] - truth[v][:2]))
            map_errs.append(e)
            if str(v.name).startswith("L"):
                map_lmk.append(e)
    floor_rmse = float(np.sqrt(np.mean(np.array(map_errs) ** 2)))
    floor_lmk = float(np.sqrt(np.mean(np.array(map_lmk) ** 2))) \
        if map_lmk else None

    trans_rmse = float(np.sqrt(np.mean(np.array(errs) ** 2)))
    gate = trans_rmse <= 1.1 * floor_rmse
    res = {"total_s": round(total, 1),
           "solve_s": round(sum(steps), 1),
           "n_steps": len(steps),
           "median_step_s": round(float(np.median(steps)), 3),
           "trans_rmse": round(trans_rmse, 3),
           "landmark_rmse": round(float(np.sqrt(np.mean(
               np.array(lmk) ** 2))), 3) if lmk else None,
           "map_floor_trans_rmse": round(floor_rmse, 3),
           "map_floor_landmark_rmse": round(floor_lmk, 3)
           if floor_lmk is not None else None,
           "floor_gate_1.1x": bool(gate),
           "run_dir": run_dir}
    print(json.dumps(res), flush=True)
    with open("/tmp/manhattan_plaza_results.json", "w") as f:
        json.dump(res, f)
    if not gate:
        print(f"# FLOOR GATE FAILED: trans RMSE {trans_rmse:.2f} > "
              f"1.1 x MAP floor {floor_rmse:.2f}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
