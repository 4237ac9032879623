"""Five-node SE(2) + range toy graph, batch and incremental (the
reference's ``example/slam/toy_examples/SE2RangeGaussian_example/``)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import numpy as np

from nfisam_tpu.core import R2Variable, SE2Variable, VariableType
from nfisam_tpu.factors import (SE2R2RangeGaussianLikelihoodFactor,
                                SE2RelativeGaussianLikelihoodFactor,
                                UnarySE2ApproximateGaussianPriorFactor)
from nfisam_tpu.solver import NFiSAM, NFiSAMArgs

if __name__ == "__main__":
    xs = [SE2Variable(f"X{i}") for i in range(4)]
    lm = R2Variable("L1", VariableType.Landmark)
    cov3 = np.diag([0.01, 0.01, 0.001])
    steps = [
        ([xs[0], lm], [
            UnarySE2ApproximateGaussianPriorFactor(xs[0], np.zeros(3),
                                                   cov3),
            SE2R2RangeGaussianLikelihoodFactor(xs[0], lm, 7.0, 0.3)]),
        ([xs[1]], [SE2RelativeGaussianLikelihoodFactor(
            xs[0], xs[1], np.array([5.0, 0, 0]), cov3)]),
        ([xs[2]], [SE2RelativeGaussianLikelihoodFactor(
            xs[1], xs[2], np.array([5.0, 0, 0]), cov3),
            SE2R2RangeGaussianLikelihoodFactor(xs[2], lm, 5.0, 0.3)]),
        ([xs[3]], [SE2RelativeGaussianLikelihoodFactor(
            xs[2], xs[3], np.array([5.0, 0, 0]), cov3),
            SE2R2RangeGaussianLikelihoodFactor(xs[3], lm, 7.0, 0.3)]),
    ]
    solver = NFiSAM(NFiSAMArgs(posterior_sample_num=500,
                               local_sample_num=1000,
                               flow_iterations=800, num_knots=8,
                               learning_rate=0.03,
                               elimination_method="pose_first"))
    for i, (ns, fs) in enumerate(steps):
        for n in ns:
            solver.add_node(n)
        for f in fs:
            solver.add_factor(f)
        solver.update_physical_and_working_graphs()
        samples = solver.incremental_inference()
        print(f"step {i}:")
        for v in sorted(samples, key=lambda v: str(v.name)):
            s = np.asarray(samples[v])
            print(f"  {v.name}: mean {np.round(s.mean(0), 2)} "
                  f"std {np.round(s.std(0), 2)}")
