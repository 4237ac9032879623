"""Checkpoint-store unit tests + warm-start solver behavior."""
import tempfile
import time

import jax
import numpy as np

from nfisam_tpu.core import R2Variable, SE2Variable, VariableType
from nfisam_tpu.factors import (SE2R2RangeGaussianLikelihoodFactor,
                                SE2RelativeGaussianLikelihoodFactor,
                                UnarySE2ApproximateGaussianPriorFactor)
from nfisam_tpu.flows import CliqueFlowModel, NSFConfig, init_flow_params
from nfisam_tpu.solver import NFiSAM, NFiSAMArgs
from nfisam_tpu.solver.checkpoint import CliqueModelStore


def test_store_round_trip():
    cfg = NSFConfig(dim=5, num_knots=6, hidden_dim=4)
    params = init_flow_params(jax.random.PRNGKey(0), cfg)
    model = CliqueFlowModel(cfg, params, np.zeros(5, dtype=np.float32),
                            np.ones(5, dtype=np.float32),
                            [False] * 5, 2, pad_dims=1)
    with tempfile.TemporaryDirectory() as d:
        store = CliqueModelStore(d)
        store.save("abc123", model)
        assert "abc123" in store
        loaded = store.load("abc123")
        assert loaded is not None
        assert loaded.cfg == cfg
        assert loaded.aug_sep_dim == 2
        np.testing.assert_allclose(np.asarray(loaded.mean),
                                   np.asarray(model.mean))
        for a, b in zip(model.flow_params, loaded.flow_params):
            for k in a:
                np.testing.assert_allclose(np.asarray(a[k]),
                                           np.asarray(b[k]), atol=1e-7)
        # pad_dims must survive (model recycling depends on it)
        assert loaded.pad_dims == 1
        assert store.load("missing") is None


def test_solver_warm_start_skips_training():
    xs = [SE2Variable(f"X{i}") for i in range(3)]
    lm = R2Variable("L1", VariableType.Landmark)
    cov3 = np.diag([0.01, 0.01, 0.001])
    factors = [UnarySE2ApproximateGaussianPriorFactor(
        xs[0], np.zeros(3), cov3)]
    factors += [SE2RelativeGaussianLikelihoodFactor(
        a, b, np.array([5.0, 0, 0]), cov3) for a, b in zip(xs, xs[1:])]
    factors.append(SE2R2RangeGaussianLikelihoodFactor(xs[2], lm, 4.0, 0.3))

    with tempfile.TemporaryDirectory() as ckpt:
        def run(seed):
            args = NFiSAMArgs(posterior_sample_num=200,
                              local_sample_num=400, flow_iterations=200,
                              num_knots=6, learning_rate=0.03,
                              elimination_method="pose_first", seed=seed,
                              checkpoint_dir=ckpt)
            s = NFiSAM(args)
            for v in xs + [lm]:
                s.add_node(v)
            for f in factors:
                s.add_factor(f)
            s.update_physical_and_working_graphs()
            t0 = time.time()
            samples = s.incremental_inference()
            return time.time() - t0, samples

        t_cold, s1 = run(0)
        t_warm, s2 = run(1)
        assert t_warm < t_cold / 2
        for v in s1:
            d = np.abs(np.asarray(s1[v]).mean(0) -
                       np.asarray(s2[v]).mean(0)).max()
            assert d < 1.0
