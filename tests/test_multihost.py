"""≥2-host execution path (SURVEY §2.3, §7.2 stage 9).

Runs the 2-process ``jax.distributed`` dryrun end to end in subprocesses
(the in-process test session cannot host a distributed cluster itself):
a 4-robot graph is solved with the multi-host wavefront scheduler, each
process trains a disjoint chunk of every wave's clique bucket, trained
stacks are exchanged via ``process_allgather``, and the posterior must
match a single-process solve distributionally.  The launcher asserts all
of that and exits nonzero on any violation (see
``scripts/dryrun_multihost.py``).
"""
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(ROOT, "scripts", "dryrun_multihost.py")


def test_two_process_solve_matches_single_process():
    env = dict(os.environ, NFISAM_MH_FAST="1", NFISAM_MH_PORT="47321")
    # the launcher manages its own JAX env for workers
    env.pop("XLA_FLAGS", None)
    r = subprocess.run([sys.executable, SCRIPT], env=env,
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "dryrun_multihost OK" in r.stdout
    with open(os.path.join(ROOT, "MULTIHOST.json")) as fh:
        result = json.load(fh)
    assert result["ok"]
    assert result["n_processes"] == 2
    trained = [set(t) for t in result["trained_per_process"]]
    assert all(trained)                      # both processes did real work
    assert trained[0].isdisjoint(trained[1])
    assert result["replication_worst_translation_mmd"] < \
        result["replication_mmd_gate"]
    assert result["independent_worst_range_mmd"] < \
        result["independent_range_mmd_gate"]
    # signed MMD^2 recorded so a clamped-to-zero reading is auditable
    assert "replication_worst_mmd_sq_signed" in result
