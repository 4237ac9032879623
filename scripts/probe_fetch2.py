#!/usr/bin/env python
"""Attribute the 0.27 s case1 device-compute drain between clique fits and
posterior passes by blocking after each phase (serializes the queue, so
totals slightly exceed the async headline — that's fine for attribution)."""
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

from nfisam_tpu.io import graph_file_parser, group_nodes_factors_incrementally
from nfisam_tpu.parallel.scheduler import ParallelNFiSAM
from nfisam_tpu.solver import NFiSAMArgs

FG = os.path.join(HERE, "data", "case1_factor_graph.fg")
nodes, truth, factors = graph_file_parser(FG, "fg")


def block_tree(x):
    jax.tree_util.tree_map(
        lambda a: jax.block_until_ready(a) if hasattr(a, "block_until_ready")
        else a, x)


for rep in range(3):
    batches = group_nodes_factors_incrementally(nodes, factors,
                                                incremental_step=1)
    args = NFiSAMArgs(posterior_sample_num=1000, local_sample_num=2000,
                      flow_iterations=2000, num_knots=9,
                      learning_rate=0.025, hidden_dim=8,
                      elimination_method="pose_first", seed=rep)
    solver = ParallelNFiSAM(args)
    t_fit = t_post = 0.0
    iters = []
    t0 = time.time()
    for (ns, fs) in batches:
        for n in ns:
            solver.add_node(n)
        for f in fs:
            solver.add_factor(f)
        solver.update_physical_and_working_graphs()
        t1 = time.time()
        solver.fit_tree_density_models()
        # block on every trained model's params
        for m in solver._clique_density_model.values():
            mm = getattr(m, "model", m)
            if hasattr(mm, "flow_params"):
                block_tree(mm.flow_params)
        t2 = time.time()
        samples = solver._samples = solver.sample_posterior()
        jax.block_until_ready(samples._buffer)
        t3 = time.time()
        t_fit += t2 - t1
        t_post += t3 - t2
    # training iteration counts actually used
    for nm, v in solver._temp_training_loss.items():
        if isinstance(v, tuple):
            iters.append(int(np.asarray(v[1])))
    print(f"run {rep}: fit(blocked) {t_fit:.3f}s post(blocked) {t_post:.3f}s"
          f" total {time.time() - t0:.3f}s  iters={iters}", flush=True)
