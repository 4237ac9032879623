"""Cold-start prewarm (train/prewarm.py): the background warmers must
compile-and-cache the same programs the solver later dispatches, dedup
repeat requests, and stay disabled when NFISAM_PREWARM=0."""
import os

import numpy as np

from nfisam_tpu.solver import NFiSAMArgs
from nfisam_tpu.train import prewarm


def _args(**kw):
    return NFiSAMArgs(posterior_sample_num=64, local_sample_num=128,
                      flow_iterations=8, num_knots=5, hidden_dim=4,
                      **kw)


def test_prewarm_compiles_trainer_cache_entry():
    args = _args()
    threads = prewarm.prewarm_solver_programs(args, dims=(8,), block=True)
    assert threads, "expected warm threads for a fresh signature"
    # the cached trainer program must now serve a real fit without error
    from nfisam_tpu.train.trainer import fit_flow_raw
    from nfisam_tpu.flows.nsf import NSFConfig
    cfg = NSFConfig(dim=8, num_knots=5, hidden_dim=4, num_flows=1)
    x = np.random.default_rng(0).normal(size=(128, 8)).astype(np.float32)
    params, iter_loss, t, mean, std = fit_flow_raw(
        np.zeros(2, np.uint32), x, cfg, args.train_config(), [False] * 8)
    assert int(t) > 0 and np.all(np.isfinite(np.asarray(mean)))


def test_prewarm_dedups_same_signature():
    args = _args()
    first = prewarm.prewarm_solver_programs(args, dims=(4,), block=True)
    second = prewarm.prewarm_solver_programs(args, dims=(4,), block=True)
    assert first and second is None


def test_prewarm_respects_env_gate(monkeypatch):
    monkeypatch.setenv("NFISAM_PREWARM", "0")
    assert prewarm.prewarm_solver_programs(_args(), dims=(16,)) is None
    monkeypatch.setenv("NFISAM_PREWARM", "junk")
    try:
        prewarm.prewarm_enabled()
        assert False, "expected ValueError for junk gate value"
    except ValueError:
        pass


def test_prewarm_skips_unpredictable_configs():
    # circular-spline configs depend on per-clique masks: not prewarmable
    assert prewarm.prewarm_solver_programs(
        _args(flow_type="NSF_AR_CS"), dims=(8,)) is None
    # legacy multiple-of-k bucketing: many signatures, skipped
    assert prewarm.prewarm_solver_programs(
        _args(pad_dim_multiple=4)) is None
