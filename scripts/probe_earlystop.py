#!/usr/bin/env python
"""Early-stop tuning experiment: case1 drain time vs accuracy for a grid of
(average_window, loss_delta_tol).  The steady-state headline is ~80%
device-side flow training (probe_fetch2), and fits run 300-500 of 2000 max
Adam iters under the default plateau rule (w=50, tol=1e-2) — this measures
what tightening buys and what it costs in joint MMD."""
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(HERE, ".jax_cache"))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import bench
from nfisam_tpu.io import graph_file_parser, group_nodes_factors_incrementally
from nfisam_tpu.parallel.scheduler import ParallelNFiSAM
from nfisam_tpu.solver import NFiSAMArgs

FG = os.path.join(HERE, "data", "case1_factor_graph.fg")
nodes, truth, factors = graph_file_parser(FG, "fg")

GRID = [(25, 4e-2)]

for (w, tol) in GRID:
    # warm the compile cache for this config
    for rep in range(4):
        batches = group_nodes_factors_incrementally(nodes, factors,
                                                    incremental_step=1)
        args = NFiSAMArgs(posterior_sample_num=1000, local_sample_num=2000,
                          flow_iterations=2000, num_knots=9,
                          learning_rate=0.025, hidden_dim=8,
                          elimination_method="pose_first", seed=rep,
                          average_window=w, loss_delta_tol=tol)
        solver = ParallelNFiSAM(args)
        t0 = time.time()
        per_step = []
        for (ns, fs) in batches:
            for n in ns:
                solver.add_node(n)
            for f in fs:
                solver.add_factor(f)
            solver.update_physical_and_working_graphs()
            solver.fit_tree_density_models()
            samples = solver._samples = solver.sample_posterior()
            if rep == 3:
                per_step.append(samples.materialize())
        t_loop = time.time() - t0
        t1 = time.time()
        jax.block_until_ready(samples._buffer)
        t_drain = time.time() - t1
        buf = np.asarray(samples._buffer)
        total = time.time() - t0
        if rep == 0:
            continue                      # compile warmup
        line = (f"w={w} tol={tol}: loop {t_loop:.3f}s drain {t_drain:.3f}s "
                f"total {total:.3f}s")
        if rep == 3:
            mj, rj, per_o, per_r = bench.accuracy_gate(per_step, nodes)
            line += f"  mmd {mj:.4f} (ref {rj:.4f}) per-step {per_o}"
        print(line, flush=True)
