#!/usr/bin/env python
"""≥2-host execution dryrun: a 2-process local cluster (4 virtual CPU
devices per process, ``jax.distributed``) solves a 4-robot range-SLAM
graph with the multi-host wavefront scheduler, and the result is checked
against a plain single-process solve.

What this proves (SURVEY §2.3 / §7.2 stage 9, BASELINE.md "≥2 hosts"):

* the Bayes tree of a multi-robot graph has real width (4 independent
  robot-chain subtrees meeting at the shared landmark), and the scheduler
  splits each wave's clique bucket into contiguous per-process chunks —
  each process trains ONLY its chunk (verified: both processes train a
  non-empty, disjoint set whose union is the full bucket);
* trained parameter stacks are exchanged with ``process_allgather`` over
  the distributed backend (the DCN analog), after which every process
  finishes the solve identically;
* posterior moments from the 2-process run match the single-process
  solve within a distributional bound (per-variable translation MMD
  against the single-process posterior, same gate style as bench.py).

Usage:  python scripts/dryrun_multihost.py            # launcher
        (workers are spawned internally with --worker)
"""
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

PORT = int(os.environ.get("NFISAM_MH_PORT", "47123"))
N_PROC = 2
N_ROBOTS = 4
T = 4
MMD_TOL = 0.05
# NFISAM_MH_FAST=1: smaller flows/samples for the pytest wrapper
FAST = os.environ.get("NFISAM_MH_FAST", "0") == "1"
ITERS = 120 if FAST else 300
N_LOCAL = 300 if FAST else 600
N_POST = 300 if FAST else 500


def build_graph():
    import numpy as np

    from nfisam_tpu.core import R2Variable, SE2Variable, VariableType
    from nfisam_tpu.factors import (SE2R2RangeGaussianLikelihoodFactor,
                                    SE2RelativeGaussianLikelihoodFactor,
                                    UnarySE2ApproximateGaussianPriorFactor)
    cov3 = np.diag([0.01, 0.01, 0.001])
    lm = R2Variable("L1", VariableType.Landmark)
    vars_, fs = [], []
    for r in range(N_ROBOTS):
        rid = chr(ord("A") + r)
        xs = [SE2Variable(f"{rid}{t}") for t in range(T)]
        vars_ += xs
        fs.append(UnarySE2ApproximateGaussianPriorFactor(
            xs[0], np.array([0.0, 10.0 * r, 0.0]), cov3))
        for a, b in zip(xs, xs[1:]):
            fs.append(SE2RelativeGaussianLikelihoodFactor(
                a, b, np.array([5.0, 0.0, 0.0]), cov3))
        fs.append(SE2R2RangeGaussianLikelihoodFactor(
            xs[-1], lm, 12.0 + 2.0 * r, 0.4))
    vars_.append(lm)
    return vars_, fs


def solve(tag: str):
    import numpy as np

    from nfisam_tpu.io import group_nodes_factors_incrementally
    from nfisam_tpu.parallel.scheduler import ParallelNFiSAM
    from nfisam_tpu.solver import NFiSAMArgs

    vars_, fs = build_graph()
    batches = group_nodes_factors_incrementally(vars_, fs,
                                                incremental_step=T)
    args = NFiSAMArgs(posterior_sample_num=N_POST, local_sample_num=N_LOCAL,
                      flow_iterations=ITERS, num_knots=6, learning_rate=0.03,
                      hidden_dim=8, elimination_method="pose_first", seed=3)
    solver = ParallelNFiSAM(args)
    for (ns, fbatch) in batches:
        for n in ns:
            solver.add_node(n)
        for f in fbatch:
            solver.add_factor(f)
        solver.update_physical_and_working_graphs()
        samples = solver.incremental_inference()
    out = {str(v.name): np.asarray(s) for v, s in samples.items()}
    return out, solver.host_trained_cliques


def worker(pid: int):
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("JAX_PLATFORM_NAME", None)
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{PORT}",
                               num_processes=N_PROC, process_id=pid)
    assert jax.process_count() == N_PROC
    samples, trained = solve(f"proc{pid}")
    payload = {
        "pid": pid,
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
        "trained": trained,
        "moments": {k: [list(map(float, v.mean(0))),
                        list(map(float, v.std(0)))]
                    for k, v in samples.items()},
        "samples_2d": {k: v[:, :2].tolist() for k, v in samples.items()},
    }
    with open(os.path.join(ROOT, f".mh_proc{pid}.json"), "w") as fh:
        json.dump(payload, fh)
    print(f"worker {pid}: trained {len(trained)} cliques: {trained}",
          flush=True)


def launcher():
    # single-process reference solve in a subprocess (clean jax state)
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=4",
               JAX_PLATFORMS="cpu")
    env.pop("JAX_PLATFORM_NAME", None)
    r = subprocess.run([sys.executable, __file__, "--single"], env=env,
                       capture_output=True, text=True, timeout=900)
    if r.returncode != 0:
        print(r.stdout + r.stderr)
        raise SystemExit("single-process reference solve failed")

    procs = [subprocess.Popen([sys.executable, __file__, "--worker",
                               str(pid)], env=env,
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for pid in range(N_PROC)]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, o in zip(procs, outs):
        if p.returncode != 0:
            print(o)
            raise SystemExit("worker failed")

    import numpy as np
    sys.path.insert(0, ROOT)
    from nfisam_tpu.eval import mmd

    with open(os.path.join(ROOT, ".mh_single.json")) as fh:
        single = json.load(fh)
    payloads = []
    for pid in range(N_PROC):
        with open(os.path.join(ROOT, f".mh_proc{pid}.json")) as fh:
            payloads.append(json.load(fh))

    # 1. both processes did real, disjoint training work
    trained = [set(p["trained"]) for p in payloads]
    assert all(len(t) > 0 for t in trained), \
        f"a process trained nothing: {[sorted(t) for t in trained]}"
    assert trained[0].isdisjoint(trained[1]), \
        f"chunks overlap: {trained[0] & trained[1]}"
    print(f"process 0 trained {sorted(trained[0])}")
    print(f"process 1 trained {sorted(trained[1])}")

    # 2. all processes agree with each other exactly-ish (replicated state)
    for k, (m0, s0) in payloads[0]["moments"].items():
        m1, s1 = payloads[1]["moments"][k]
        assert np.allclose(m0, m1, atol=1e-5), f"{k}: proc moments differ"

    # 3. distributional agreement with the single-process posterior:
    # per-variable translation MMD (bench-gate style, not a loose mean tol)
    worst = ("", 0.0)
    for k, pts in payloads[0]["samples_2d"].items():
        a = np.asarray(pts)
        b = np.asarray(single["samples_2d"][k])
        m = float(mmd(a, b))
        if m > worst[1]:
            worst = (k, m)
    print(f"worst per-variable translation MMD vs single-process: "
          f"{worst[1]:.4f} ({worst[0]}), gate {MMD_TOL}")
    assert worst[1] < MMD_TOL, "multi-host posterior diverges"

    result = {
        "n_processes": N_PROC,
        "devices_per_process": payloads[0]["local_devices"],
        "global_devices": payloads[0]["global_devices"],
        "trained_per_process": [sorted(t) for t in trained],
        "worst_translation_mmd_vs_single": worst[1],
        "mmd_gate": MMD_TOL,
        "ok": True,
    }
    with open(os.path.join(ROOT, "MULTIHOST.json"), "w") as fh:
        json.dump(result, fh, indent=1)
    for pid in range(N_PROC):
        os.remove(os.path.join(ROOT, f".mh_proc{pid}.json"))
    os.remove(os.path.join(ROOT, ".mh_single.json"))
    print("dryrun_multihost OK:", json.dumps(result))


def single():
    import jax
    jax.config.update("jax_platforms", "cpu")
    samples, trained = solve("single")
    assert trained == [], "single-process run must not chunk"
    payload = {
        "moments": {k: [list(map(float, v.mean(0))),
                        list(map(float, v.std(0)))]
                    for k, v in samples.items()},
        "samples_2d": {k: v[:, :2].tolist() for k, v in samples.items()},
    }
    with open(os.path.join(ROOT, ".mh_single.json"), "w") as fh:
        json.dump(payload, fh)


if __name__ == "__main__":
    if "--worker" in sys.argv:
        worker(int(sys.argv[sys.argv.index("--worker") + 1]))
    elif "--single" in sys.argv:
        single()
    else:
        launcher()
