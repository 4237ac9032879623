"""Five R(2) nodes with range measurements, incremental (the reference's
``example/slam/toy_examples/R2RangeGaussian_example/``) — the posterior of
a landmark constrained only by ranges is ring-shaped / multi-modal, the
canonical non-Gaussian SLAM example."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import numpy as np

from nfisam_tpu.core import R2Variable, VariableType
from nfisam_tpu.factors import (R2RangeGaussianLikelihoodFactor,
                                R2RelativeGaussianLikelihoodFactor,
                                UnaryR2GaussianPriorFactor)
from nfisam_tpu.solver import NFiSAM, NFiSAMArgs

if __name__ == "__main__":
    xs = [R2Variable(f"X{i}") for i in range(4)]
    lm = R2Variable("L1", VariableType.Landmark)
    cov2 = np.diag([0.04, 0.04])
    steps = [
        ([xs[0], lm], [
            UnaryR2GaussianPriorFactor(xs[0], np.zeros(2), cov2),
            R2RangeGaussianLikelihoodFactor(xs[0], lm, 5.0, 0.3)]),
        ([xs[1]], [R2RelativeGaussianLikelihoodFactor(
            xs[0], xs[1], np.array([4.0, 0.0]), cov2)]),
        ([xs[2]], [R2RelativeGaussianLikelihoodFactor(
            xs[1], xs[2], np.array([4.0, 0.0]), cov2),
            R2RangeGaussianLikelihoodFactor(xs[2], lm, 4.0, 0.3)]),
        ([xs[3]], [R2RelativeGaussianLikelihoodFactor(
            xs[2], xs[3], np.array([0.0, 4.0]), cov2),
            R2RangeGaussianLikelihoodFactor(xs[3], lm, 5.0, 0.3)]),
    ]
    solver = NFiSAM(NFiSAMArgs(posterior_sample_num=500,
                               local_sample_num=1000,
                               flow_iterations=800, num_knots=8,
                               learning_rate=0.03,
                               elimination_method="pose_first"))
    for i, (ns, fs) in enumerate(steps):
        for node in ns:
            solver.add_node(node)
        for f in fs:
            solver.add_factor(f)
        solver.update_physical_and_working_graphs()
        samples = solver.incremental_inference()
        print(f"step {i}:")
        for v in sorted(samples, key=lambda v: str(v.name)):
            s = np.asarray(samples[v])
            print(f"  {v.name}: mean {np.round(s.mean(0), 2)} "
                  f"std {np.round(s.std(0), 2)}")
