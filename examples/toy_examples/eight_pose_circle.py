"""Eight SE(2) poses on a circle with a loop closure — the classic
Pose2SLAM loop (reference
``example/slam/toy_examples/SE2RelativeGaussian_example/eight_pose_circle.py``).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import numpy as np

from nfisam_tpu.core import SE2Variable
from nfisam_tpu.factors import (SE2RelativeGaussianLikelihoodFactor,
                                UnarySE2ApproximateGaussianPriorFactor)
from nfisam_tpu.solver import NFiSAM, NFiSAMArgs

if __name__ == "__main__":
    n = 8
    move = 4.0
    prior_noise = np.diag([0.3 ** 2, 0.3 ** 2, 0.1 ** 2])
    odometry_noise = np.diag([0.2 ** 2, 0.2 ** 2, 0.1 ** 2])
    xs = [SE2Variable(f"x{i + 1}") for i in range(n)]

    solver = NFiSAM(NFiSAMArgs(posterior_sample_num=500,
                               local_sample_num=1000,
                               flow_iterations=1000, num_knots=9,
                               learning_rate=0.02,
                               elimination_method="natural"))
    for x in xs:
        solver.add_node(x)
    solver.add_factor(UnarySE2ApproximateGaussianPriorFactor(
        xs[0], np.array([0.0, 0.0, np.pi / 8]), prior_noise))
    turn = 2 * np.pi / n
    for i in range(n - 1):
        solver.add_factor(SE2RelativeGaussianLikelihoodFactor(
            xs[i], xs[i + 1], np.array([move, 0.0, turn]), odometry_noise))
    # loop closure
    solver.add_factor(SE2RelativeGaussianLikelihoodFactor(
        xs[-1], xs[0], np.array([move, 0.0, turn]), odometry_noise))

    solver.update_physical_and_working_graphs()
    samples = solver.incremental_inference()
    for v in xs:
        s = np.asarray(samples[v])
        print(f"{v.name}: mean {np.round(s.mean(0), 2)} "
              f"std {np.round(s.std(0), 2)}")
