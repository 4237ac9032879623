"""Eight R(2) nodes chained by linear-Gaussian displacement factors
(the reference's
``example/slam/toy_examples/R2RelativeGaussian_example/eight_nodes``);
the posterior is exactly Gaussian, so the solver's moments are checked
against the closed form."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import numpy as np

from nfisam_tpu.core import R2Variable
from nfisam_tpu.eval.metrics import gaussian_displacement_graph_moments
from nfisam_tpu.factors import (R2RelativeGaussianLikelihoodFactor,
                                UnaryR2GaussianPriorFactor)
from nfisam_tpu.solver import NFiSAM, NFiSAMArgs

if __name__ == "__main__":
    n = 8
    xs = [R2Variable(f"X{i}") for i in range(n)]
    prior_cov = np.diag([0.09, 0.09])
    odom_cov = np.diag([0.04, 0.04])
    moves = [np.array([3.0, 0.0]) if i % 2 == 0 else np.array([0.0, 3.0])
             for i in range(n - 1)]

    solver = NFiSAM(NFiSAMArgs(posterior_sample_num=1000,
                               local_sample_num=1500,
                               flow_iterations=800, num_knots=8,
                               learning_rate=0.03,
                               elimination_method="natural"))
    for x in xs:
        solver.add_node(x)
    solver.add_factor(UnaryR2GaussianPriorFactor(xs[0], np.zeros(2),
                                                 prior_cov))
    for i, mv in enumerate(moves):
        solver.add_factor(R2RelativeGaussianLikelihoodFactor(
            xs[i], xs[i + 1], mv, odom_cov))
    solver.update_physical_and_working_graphs()
    samples = solver.incremental_inference()

    mean, cov = gaussian_displacement_graph_moments(
        variables=xs,
        displacements={(xs[i], xs[i + 1]): (mv, odom_cov)
                       for i, mv in enumerate(moves)},
        priors={xs[0]: (np.zeros(2), prior_cov)})
    for i, v in enumerate(xs):
        s = np.asarray(samples[v])
        exact = mean[2 * i:2 * i + 2]
        print(f"{v.name}: sample mean {np.round(s.mean(0), 2)} "
              f"closed form {np.round(exact, 2)} "
              f"err {np.linalg.norm(s.mean(0) - exact):.3f}")
