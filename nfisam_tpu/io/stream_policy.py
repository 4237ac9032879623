"""Stream-level measurement policies for incremental solves.

``defer_ambiguous`` — delayed hypothesis commitment: hold each
ambiguous-data-association mixture factor out of the stream until every
candidate landmark has accumulated ``min_plain`` committed unambiguous
factors (bounded delay ``max_steps``).  Commit-as-you-go solvers resolve
a DA mixture with whatever beliefs exist at arrival; deferring the
mixture until its candidates are localized turns a wrong-mode commitment
into a correctly-weighted one.  Measured on plaza1_ada0.6 (round 5):
trans RMSE 4.91 -> 1.25 m, diverged streams 1/3 -> 0/3 (BENCHMARKS.md).

This is a *stream policy*, not a solver change: it reorders the factor
stream the same way a front-end could (the reference's analogous lever
is its per-factor hypothesis pruning, ``src/factors/Factors.py:3146-3180``).
"""
from typing import List, Tuple

__all__ = ["defer_ambiguous"]


def defer_ambiguous(batches: List[Tuple[list, list]], max_steps: int = 6,
                    min_plain: int = 2) -> List[Tuple[list, list]]:
    """Reorder an incremental batch stream so ambiguous mixture factors
    arrive only after their candidate landmarks are localized.

    ``batches`` — [(new_nodes, new_factors), ...] as produced by
    ``group_nodes_factors_incrementally``.  Returns a new list with the
    same nodes and the same factor multiset; only arrival steps of
    k-way mixtures (``BinaryFactorMixture`` with >2 vars) change, each
    by at most ``max_steps``.
    """
    from ..factors.mixtures import BinaryFactorMixture

    plain_count: dict = {}
    deferred: list = []     # (release_step, factor, candidate landmarks)
    out: List[Tuple[list, list]] = []
    for i, (ns, fs) in enumerate(batches):
        keep, held = [], []
        for f in fs:
            if isinstance(f, BinaryFactorMixture) and len(f.vars) > 2:
                held.append(f)
            else:
                keep.append(f)
                for v in f.vars:
                    if str(v.name).startswith("L"):
                        plain_count[v] = plain_count.get(v, 0) + 1
        release, still = [], []
        for (rel, f, lmks) in deferred:
            if i >= rel or all(plain_count.get(v, 0) >= min_plain
                               for v in lmks):
                release.append(f)
            else:
                still.append((rel, f, lmks))
        deferred = still
        for f in held:
            lmks = list(f.vars[1:])
            if all(plain_count.get(v, 0) >= min_plain for v in lmks):
                release.append(f)
            else:
                deferred.append((i + max_steps, f, lmks))
        out.append((ns, keep + release))
    if deferred:    # release anything left at the final step
        out[-1] = (out[-1][0], out[-1][1] + [f for _, f, _ in deferred])
    return out
