"""Fused root-to-leaf posterior pass (solver/posterior_pass.py) vs the
per-clique reference walk: same solver state, both passes must produce the
same posterior distribution (moments within MC tolerance) on a branching
tree, and the fused path must actually engage."""
import numpy as np
import pytest

from nfisam_tpu.factors.factors import (GaussianPriorFactor,
                                        R2RelativeGaussianLikelihoodFactor)
from nfisam_tpu.core.variables import R2Variable, VariableType
from nfisam_tpu.parallel.scheduler import ParallelNFiSAM
from nfisam_tpu.solver import NFiSAMArgs
from nfisam_tpu.solver.posterior_pass import fused_sample_posterior


@pytest.fixture(scope="module")
def solved():
    # star + chain: X0 - X1 - X2, X0 - L1, X1 - L2 -> branching Bayes tree
    x0, x1, x2 = (R2Variable(n) for n in ("X0", "X1", "X2"))
    l1 = R2Variable("L1", variable_type=VariableType.Landmark)
    l2 = R2Variable("L2", variable_type=VariableType.Landmark)
    s = ParallelNFiSAM(NFiSAMArgs(
        posterior_sample_num=4000, local_sample_num=800,
        flow_iterations=400, num_knots=7, hidden_dim=6,
        elimination_method="pose_first", seed=2))
    for v in (x0, x1, x2, l1, l2):
        s.add_node(v)
    s.add_factor(GaussianPriorFactor(x0, np.zeros(2), np.eye(2) * 0.04))
    for a, b, d in ((x0, x1, [1.0, 0.0]), (x1, x2, [1.0, 0.0]),
                    (x0, l1, [0.0, 1.0]), (x1, l2, [0.0, -1.0])):
        s.add_factor(R2RelativeGaussianLikelihoodFactor(
            a, b, np.array(d), np.eye(2) * 0.01))
    s.update_physical_and_working_graphs()
    s.incremental_inference()
    return s


def test_fused_pass_engages_and_matches_perclique(solved, monkeypatch):
    s = solved
    fused = fused_sample_posterior(s, 4000)
    assert fused is not None, "fused pass must engage on flow-backed trees"
    monkeypatch.setenv("NFISAM_FUSED_POSTERIOR", "0")
    ref = s.sample_posterior()
    names_f = {v.name for v in fused}
    names_r = {v.name for v in ref}
    assert names_f == names_r
    for v in fused:
        rv = [k for k in ref if k.name == v.name][0]
        a, b = np.asarray(fused[v]), np.asarray(ref[rv])
        assert a.shape == b.shape == (4000, v.dim)
        np.testing.assert_allclose(a.mean(0), b.mean(0), atol=0.05)
        np.testing.assert_allclose(a.std(0), b.std(0), atol=0.05)
        assert np.all(np.isfinite(a))


def test_fused_pass_is_default(solved, monkeypatch):
    from nfisam_tpu.solver.posterior_pass import LazySamples
    monkeypatch.delenv("NFISAM_FUSED_POSTERIOR", raising=False)
    s = solved
    out = s.sample_posterior()
    # the fused path must actually engage (not silently fall back)
    assert isinstance(out, LazySamples)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in out.values())


def test_fused_env_validation(monkeypatch):
    from nfisam_tpu.solver.posterior_pass import fused_posterior_enabled
    monkeypatch.setenv("NFISAM_FUSED_POSTERIOR", "disabled")
    with pytest.raises(ValueError):
        fused_posterior_enabled()
