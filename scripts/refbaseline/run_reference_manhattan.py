"""Run the REFERENCE NF-iSAM (torch/numpy, CPU) on the Manhattan-world
lawnmower_4x4 benchmark to record the true baseline wall-clock for
BENCHMARKS.md.  Mirrors the reference runner
``example/slam/manhattan_world_with_range/lawnmower_4x4/run_nfisam.py:7-27``
(knots 9, hidden 8, <=2000 iters, 2000 train samples, lr .02,
incremental_step=1, pose_first, 1000 posterior samples) with
cuda_training=False (no CUDA here; the paper baseline is CPU+consumer GPU).

Uses the TransportMaps shim in this directory (the real pip package is not
installed).  Writes per-step timing JSON to /tmp/ref_manhattan_baseline.json.
"""
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)                      # TransportMaps shim
sys.path.insert(0, "/root/reference/src")     # reference code (read-only)

import numpy as np  # noqa: E402

CASE_DIR = ("/root/reference/example/slam/manhattan_world_with_range/"
            "lawnmower_4x4/res/seed1/pada0.4_r2_odom0.01_mada3")
# --seed N: seed the reference's GLOBAL torch/numpy RNGs (the reference has
# no explicit key plumbing — SURVEY §7.3 item 8) so its run-to-run accuracy
# spread can be measured; output lands in a per-seed file.
SEED = None
if "--seed" in sys.argv:
    SEED = int(sys.argv[sys.argv.index("--seed") + 1])
OUT = ("/tmp/ref_manhattan_baseline.json" if SEED is None
       else f"/tmp/ref_manhattan_seed{SEED}.json")


def main():
    if SEED is not None:
        import torch
        np.random.seed(SEED)
        torch.manual_seed(SEED)
    from slam.NFiSAM import NFiSAM, NFiSAMArgs
    from slam.RunBatch import graph_file_parser, \
        group_nodes_factors_incrementally

    nodes, truth, factors = graph_file_parser(
        data_file=os.path.join(CASE_DIR, "factor_graph.fg"),
        data_format="fg", prior_cov_scale=1)
    batches = group_nodes_factors_incrementally(
        nodes=nodes, factors=factors, incremental_step=1)

    args = NFiSAMArgs(
        elimination_method="pose_first",
        posterior_sample_num=1000,
        local_sample_num=2000,
        store_clique_samples=False,
        local_sampling_method="direct",
        cuda_training=False,
        num_knots=9,
        hidden_dim=8,
        flow_iterations=2000,
        learning_rate=0.02,
        training_set_frac=1.0,
        loss_delta_tol=0.01,
        average_window=50,
    )
    model = NFiSAM(args)

    step_times = []
    last_samples = None
    t_all = time.time()
    for i, batch in enumerate(batches):
        new_nodes, new_factors = batch
        for node in new_nodes:
            model.add_node(node)
        for factor in new_factors:
            model.add_factor(factor)
        t0 = time.time()
        model.update_physical_and_working_graphs()
        last_samples = model.incremental_inference()
        step_times.append(time.time() - t0)
        print(f"step {i}/{len(batches)}: {step_times[-1]:.1f}s "
              f"(total {time.time() - t_all:.0f}s)", flush=True)
    total = time.time() - t_all

    # landmark RMSE of posterior means, same metric as our runner
    errs = []
    for var, arr in last_samples.items():
        name = getattr(var, "name", str(var))
        if var in truth:
            mean = np.asarray(arr).mean(axis=0)
            errs.append((name, float(np.linalg.norm(
                mean[:2] - np.asarray(truth[var])[:2]))))
    trans_rmse = float(np.sqrt(np.mean([e * e for _, e in errs])))
    res = {
        "total_s": round(total, 1),
        "n_steps": len(batches),
        "step_times": [round(t, 2) for t in step_times],
        "mean_step_s": round(float(np.mean(step_times)), 2),
        "trans_rmse": round(trans_rmse, 3),
        "per_var_err": {n: round(e, 3) for n, e in errs},
    }
    print(json.dumps({k: v for k, v in res.items() if k != "per_var_err"}),
          flush=True)
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
