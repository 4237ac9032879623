"""Incremental run harness: per-step solve + artifact writing.

Parity with reference ``run_incrementally`` (FactorGraphSolver.py:760-933):
creates ``run{N}`` directories and writes the same artifact set (step
samples, elimination ordering, split timing, training losses, step timing,
posterior-sampling/fitting timers, DA-hypothesis weights) so the
reference's analysis scripts keep working on our outputs.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional

import numpy as np

from ..core.variables import Variable
from ..factors.mixtures import BinaryFactorMixture
from .solver import FactorGraphSolver


def run_incrementally(case_dir: str, solver: FactorGraphSolver,
                      nodes_factors_by_step, truth: Optional[Dict] = None,
                      plot_args: Optional[dict] = None,
                      verbose: bool = True,
                      profile_steps: Optional[List[int]] = None) -> str:
    """``profile_steps``: step indices to capture ``jax.profiler`` device
    traces for (written to ``<run_dir>/trace_step{i}``) — the structured
    replacement for the reference's print-timestamp breadcrumbs
    (SURVEY §5)."""
    run_count = 1
    while os.path.exists(f"{case_dir}/run{run_count}"):
        run_count += 1
    run_dir = f"{case_dir}/run{run_count}"
    os.makedirs(run_dir)

    with open(f"{run_dir}/parameters", "w") as f:
        f.write(solver._args.json_str())

    num_batches = len(nodes_factors_by_step)
    step_timer: List[float] = []
    step_list: List[int] = []
    posterior_sampling_timer: List[float] = []
    fitting_timer: List[float] = []
    mixture_factor2weights: Dict = {}

    for i in range(num_batches):
        step_nodes, step_factors = nodes_factors_by_step[i]
        for node in step_nodes:
            solver.add_node(node)
        for factor in step_factors:
            solver.add_factor(factor)
            if isinstance(factor, BinaryFactorMixture):
                mixture_factor2weights[factor] = []

        step_list.append(i)
        prefix = f"{run_dir}/step{i}"
        detailed_timer: List[float] = []
        clique_dim_timer: List[List[float]] = []
        tracing = profile_steps is not None and i in profile_steps
        if tracing:
            import jax
            jax.profiler.start_trace(f"{run_dir}/trace_step{i}")
        start = time.time()
        solver.update_physical_and_working_graphs(timer=detailed_timer)
        cur_sample = solver.incremental_inference(
            timer=detailed_timer, clique_dim_timer=clique_dim_timer)
        step_timer.append(time.time() - start)
        if tracing:
            import jax
            jax.profiler.stop_trace()
        if verbose:
            print(f"step {i}/{num_batches} time: {step_timer[-1]:.3f} s, "
                  f"total: {sum(step_timer):.3f} s", flush=True)

        with open(f"{prefix}_ordering", "w") as f:
            f.write(" ".join(str(v.name)
                             for v in solver.elimination_ordering))
        with open(f"{prefix}_split_timing", "w") as f:
            f.write(" ".join(str(t) for t in detailed_timer))
        with open(f"{prefix}_step_training_loss", "w") as f:
            f.write(json.dumps(solver.training_losses()))

        if detailed_timer:
            posterior_sampling_timer.append(detailed_timer[-1])
            fitting_timer.append(sum(detailed_timer[1:-1]))

        X = np.hstack([np.asarray(cur_sample[var])
                       for var in solver.elimination_ordering])
        np.savetxt(fname=prefix, X=X)
        np.savetxt(fname=prefix + "_dim_time",
                   X=np.array(clique_dim_timer))

        for fname, data in (("step_timing", step_timer),
                            ("step_list", step_list),
                            ("posterior_sampling_timer",
                             posterior_sampling_timer),
                            ("fitting_timer", fitting_timer)):
            with open(f"{run_dir}/{fname}", "w") as f:
                f.write(" ".join(str(t) for t in data))

        if plot_args is not None:
            from ..eval.viz import plot_2d_samples
            plot_2d_samples(
                samples_mapping=cur_sample,
                equal_axis=True,
                truth=None if truth is None else {
                    v: p for v, p in truth.items()
                    if v in solver.physical_vars},
                truth_factors={f for f in solver.physical_factors
                               if set(f.vars).issubset(
                                   solver.physical_vars)},
                title=f"Step {i}", file_name=f"{prefix}.png", **plot_args)

        if mixture_factor2weights:
            with open(f"{prefix}.hypoweights", "w") as hf:
                for factor, weights in mixture_factor2weights.items():
                    hypo_weights = factor.posterior_weights(cur_sample)
                    line = " ".join(str(v.name) for v in factor.vars) + \
                        " : " + ",".join(str(w) for w in hypo_weights)
                    hf.write(line + "\n")
                    weights.append((i, hypo_weights))

    if mixture_factor2weights:
        # DA hypothesis-weight trajectories (reference logs these
        # numerically per step, FactorGraphSolver.py:913-933)
        from ..eval.viz import plot_hypothesis_weights
        step_weights: Dict[int, Dict[str, np.ndarray]] = {}
        for factor, hist in mixture_factor2weights.items():
            label = "->".join([str(factor.vars[0].name),
                               "|".join(str(v.name)
                                        for v in factor.vars[1:])])
            for step_i, w in hist:
                step_weights.setdefault(step_i, {})[label] = w
        if any(step_weights.values()):
            plot_hypothesis_weights(step_weights,
                                    file_name=f"{run_dir}/hypoweights.png")
    return run_dir


def nfisam_empirical_study(knots, iters, training_samples, learning_rates,
                           hidden_dims, case_dir: str, data_file: str,
                           data_format: str, incremental_step: int = 1,
                           prior_cov_scale: float = 0.1,
                           plot_args: Optional[dict] = None,
                           solver_class=None, **kwargs) -> List[str]:
    """Hyperparameter grid-search driver (reference
    ``NFiSAM_empirial_study`` NFiSAM.py:589-609): parse the dataset once,
    then run the full incremental solve for every combination of
    (num_knots, flow_iterations, local_sample_num, learning_rate,
    hidden_dim), each in its own ``run{N}`` directory.  Returns the run
    directories.  ``solver_class`` defaults to the wavefront-parallel
    solver; extra kwargs flow into ``NFiSAMArgs``."""
    import itertools

    from ..io import graph_file_parser, group_nodes_factors_incrementally
    from .nfisam import NFiSAMArgs

    if solver_class is None:
        from ..parallel.scheduler import ParallelNFiSAM as solver_class

    data_dir = os.path.join(case_dir, data_file)
    nodes, truth, factors = graph_file_parser(
        data_file=data_dir, data_format=data_format,
        prior_cov_scale=prior_cov_scale)
    nodes_factors_by_step = group_nodes_factors_incrementally(
        nodes=nodes, factors=factors, incremental_step=incremental_step)

    run_dirs: List[str] = []
    for knt, it, n_train, lr, hid in itertools.product(
            knots, iters, training_samples, learning_rates, hidden_dims):
        args = NFiSAMArgs(num_knots=knt, flow_iterations=it,
                          local_sample_num=n_train, learning_rate=lr,
                          hidden_dim=hid, **kwargs)
        solver = solver_class(args)
        run_dirs.append(run_incrementally(case_dir, solver,
                                          nodes_factors_by_step, truth,
                                          plot_args=plot_args))
    return run_dirs


NFiSAM_empirial_study = nfisam_empirical_study  # reference-spelling alias
