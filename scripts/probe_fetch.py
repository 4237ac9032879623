#!/usr/bin/env python
"""Decompose the case1 final-fetch phase (VERDICT r4 weak #7): how much of
the 0.24-0.27 s is (a) tunnel round-trip latency, (b) device-queue drain,
(c) the host copy itself.  Informs whether the fix is transfer packing,
earlier async copy, or nothing (environmental RTT floor)."""
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

t0 = time.time()
x = jax.jit(lambda x: x + 1)(np.zeros(8, np.float32))
np.asarray(x)
print(f"init+first contact: {time.time() - t0:.2f}s", flush=True)

# trivial round-trip latency, repeated
f = jax.jit(lambda x: x + 1)
for _ in range(2):
    np.asarray(f(np.zeros(8, np.float32)))
rtts = []
for _ in range(10):
    t = time.time()
    np.asarray(f(np.zeros(8, np.float32)))
    rtts.append(time.time() - t)
print(f"trivial dispatch+fetch roundtrip: median {np.median(rtts)*1e3:.1f}ms"
      f" min {min(rtts)*1e3:.1f}ms", flush=True)

# pure fetch of an already-ready array of case1 posterior-buffer size
big = jax.device_put(np.zeros((1000, 64), np.float32))
jax.block_until_ready(big)
ts = []
for _ in range(5):
    t = time.time()
    np.asarray(jax.device_put(np.zeros((1000, 64), np.float32)) + 0)
    ts.append(time.time() - t)
print(f"1000x64 put+add+fetch: median {np.median(ts)*1e3:.1f}ms", flush=True)

# now the real case1 run with decomposed final fetch
from nfisam_tpu.io import graph_file_parser, group_nodes_factors_incrementally
from nfisam_tpu.parallel.scheduler import ParallelNFiSAM
from nfisam_tpu.solver import NFiSAMArgs

FG = os.path.join(HERE, "data", "case1_factor_graph.fg")
nodes, truth, factors = graph_file_parser(FG, "fg")

for rep in range(3):
    batches = group_nodes_factors_incrementally(nodes, factors,
                                                incremental_step=1)
    args = NFiSAMArgs(posterior_sample_num=1000, local_sample_num=2000,
                      flow_iterations=2000, num_knots=9,
                      learning_rate=0.025, hidden_dim=8,
                      elimination_method="pose_first", seed=rep)
    solver = ParallelNFiSAM(args)
    t0 = time.time()
    for (ns, fs) in batches:
        for n in ns:
            solver.add_node(n)
        for f in fs:
            solver.add_factor(f)
        solver.update_physical_and_working_graphs()
        solver.fit_tree_density_models()
        samples = solver._samples = solver.sample_posterior()
    t_loop = time.time() - t0
    t1 = time.time()
    jax.block_until_ready(samples._buffer)
    t_drain = time.time() - t1
    t2 = time.time()
    buf = np.asarray(samples._buffer)
    t_copy = time.time() - t2
    print(f"run {rep}: loop {t_loop:.3f}s drain {t_drain:.3f}s "
          f"copy {t_copy:.3f}s total {time.time() - t0:.3f}s", flush=True)
