"""Clique training samples via nested sampling (the reference's
``local_sampling_method='nested'`` path, FactorGraphSolver.py:488-492)."""
from __future__ import annotations

import numpy as np

from ..samplers.nested import GlobalNestedSampler


def nested_clique_samples(key, variable_pattern, factors, num_samples,
                          dynamic: bool = False) -> np.ndarray:
    sampler = GlobalNestedSampler(nodes=variable_pattern, factors=factors)
    samples = sampler.sample(key=key, live_points=num_samples,
                             downsampling=True)
    if samples.shape[0] > num_samples:
        rng = np.random.default_rng(int(np.asarray(key)[1]))
        samples = samples[rng.choice(len(samples), num_samples,
                                     replace=False)]
    elif samples.shape[0] < num_samples:
        rng = np.random.default_rng(int(np.asarray(key)[1]))
        samples = samples[rng.choice(len(samples), num_samples,
                                     replace=True)]
    return samples
