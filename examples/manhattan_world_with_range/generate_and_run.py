"""Generate a lawnmower Manhattan-world range-SLAM dataset and solve it
incrementally (the reference's ``lawnmower_4x4`` benchmark family:
``example/slam/manhattan_world_with_range/``)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import argparse

import numpy as np

from nfisam_tpu.io import group_nodes_factors_incrementally
from nfisam_tpu.io.fg_io import write_factor_graph_to_file
from nfisam_tpu.sim import (GridBeacon, GridRobot, ManhattanGrid,
                            ManhattanSimulator, SimulationArgs)
from nfisam_tpu.solver import NFiSAM, NFiSAMArgs, run_incrementally

HERE = os.path.dirname(os.path.abspath(__file__))


def generate(seed=1, grid=(4, 4), cell=20.0, n_landmarks=3,
             range_std=2.0, odom_std=0.01, ada_prob=0.0, outlier_prob=0.0):
    env = ManhattanGrid((grid[0] + 2, grid[1] + 2), cell,
                        robot_area=[(1, 1), (grid[0], grid[1])])
    rng = np.random.default_rng(seed)
    cand = np.argwhere(env.landmark_feasibility)
    for k in range(n_landmarks):
        i, j = cand[rng.integers(len(cand))]
        env.add_landmark(GridBeacon(f"L{k + 1}"), int(i), int(j))
    rbt = GridRobot("X", step_scale=cell, range_std=range_std,
                    odom_cov=np.diag([odom_std, odom_std, odom_std / 10]))
    env.add_robot(rbt, 1, 1)
    sim = ManhattanSimulator(env, SimulationArgs(
        range_sensing_prob=0.5, seed=seed, range_std=range_std,
        ambiguous_data_association_prob=ada_prob,
        outlier_prob=outlier_prob))
    wps = env.lawnmower_path()[1:]
    return sim.waypoint_slam(rbt, wps)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--ada-prob", type=float, default=0.0)
    ap.add_argument("--outlier-prob", type=float, default=0.0)
    ap.add_argument("--incremental-step", type=int, default=5)
    args = ap.parse_args()

    rbt_vars, lmk_vars, factors, truth = generate(
        seed=args.seed, ada_prob=args.ada_prob,
        outlier_prob=args.outlier_prob)
    case_dir = os.path.join(HERE, f"lawnmower_seed{args.seed}")
    os.makedirs(case_dir, exist_ok=True)
    write_factor_graph_to_file(rbt_vars + lmk_vars, factors, truth,
                               os.path.join(case_dir, "factor_graph.fg"))

    batches = group_nodes_factors_incrementally(
        rbt_vars + lmk_vars, factors,
        incremental_step=args.incremental_step)
    solver_args = NFiSAMArgs(posterior_sample_num=500,
                             local_sample_num=2000, flow_iterations=2000,
                             num_knots=9, learning_rate=0.02, hidden_dim=8,
                             elimination_method="pose_first",
                             seed=args.seed)
    run_dir = run_incrementally(case_dir, NFiSAM(solver_args), batches,
                                truth, plot_args={})
    print("artifacts:", run_dir)
