"""Fill-reducing elimination orderings.

The reference binds SuiteSparse CCOLAMD through Cython
(``src/external/suitesparse/ccolamd.pyx``) but ships it broken — the
computed permutation is discarded (``ccolamd.pyx:55``) and the import is
commented out (``FactorGraph.py:8``), so only ``natural``/``pose_first``
ever ran.  Here the ccolamd-class ordering actually works:

* a native C++ constrained approximate-minimum-degree implementation
  (``native/ordering.cc``, loaded via ctypes) for large graphs;
* a pure-Python constrained minimum-degree fallback with identical
  semantics (graphs on the main path are tiny, so this is never a
  bottleneck).

The constraint mirrors CCOLAMD's ``cmember``: variables in the
last-constraint group are always eliminated after all unconstrained ones
(used to keep the most recent pose at the Bayes-tree root).
"""
from __future__ import annotations

import ctypes
import os
from typing import Dict, List, Optional, Sequence, Set

import numpy as np

from ..core.variables import Variable

_NATIVE = None
_NATIVE_TRIED = False


def _load_native():
    """Load the C++ ordering library if it has been built."""
    global _NATIVE, _NATIVE_TRIED
    if _NATIVE_TRIED:
        return _NATIVE
    _NATIVE_TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    path = os.path.join(here, "native", "libnfisam_ordering.so")
    if os.path.exists(path):
        try:
            lib = ctypes.CDLL(path)
            lib.nfisam_constrained_min_degree.argtypes = [
                ctypes.c_int,                      # n
                ctypes.POINTER(ctypes.c_int),      # adj indptr
                ctypes.POINTER(ctypes.c_int),      # adj indices
                ctypes.POINTER(ctypes.c_int),      # cmember
                ctypes.POINTER(ctypes.c_int),      # out permutation
            ]
            lib.nfisam_constrained_min_degree.restype = ctypes.c_int
            _NATIVE = lib
        except OSError:
            _NATIVE = None
    return _NATIVE


def _min_degree_python(n: int, adj: List[Set[int]],
                       cmember: np.ndarray) -> List[int]:
    """Constrained minimum-degree on the variable graph: within each
    constraint group (ascending), repeatedly eliminate the minimum-degree
    vertex (ties -> lowest index), connecting its remaining neighbors."""
    adj = [set(a) for a in adj]
    remaining = set(range(n))
    order: List[int] = []
    for group in sorted(set(int(c) for c in cmember)):
        members = {i for i in remaining if cmember[i] == group}
        while members:
            v = min(members, key=lambda i: (len(adj[i] & remaining), i))
            nbrs = adj[v] & remaining
            for a in nbrs:
                adj[a] |= nbrs - {a}
                adj[a].discard(v)
            order.append(v)
            remaining.discard(v)
            members.discard(v)
    return order


def constrained_min_degree_indices(n: int, adj: List[Set[int]],
                                   cmember: np.ndarray) -> List[int]:
    lib = _load_native()
    if lib is not None and n > 0:
        indptr = np.zeros(n + 1, dtype=np.int32)
        for i in range(n):
            indptr[i + 1] = indptr[i] + len(adj[i])
        indices = np.zeros(max(int(indptr[-1]), 1), dtype=np.int32)
        for i in range(n):
            s = sorted(adj[i])
            indices[indptr[i]:indptr[i + 1]] = s
        cm = np.ascontiguousarray(cmember, dtype=np.int32)
        out = np.zeros(n, dtype=np.int32)
        rc = lib.nfisam_constrained_min_degree(
            n,
            indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            cm.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
        if rc == 0:
            return [int(i) for i in out]
    return _min_degree_python(n, adj, cmember)


def constrained_min_degree_ordering(
        variables: Sequence[Variable],
        var_neighbors: Dict[Variable, Set[Variable]],
        last_vars: Optional[Sequence[Variable]] = None) -> List[Variable]:
    """Order ``variables`` for elimination; ``last_vars`` are forced last
    (reference semantics: ``FactorGraph.analyze_elimination_ordering``
    FactorGraph.py:119-150 with cmember)."""
    n = len(variables)
    index = {v: i for i, v in enumerate(variables)}
    adj: List[Set[int]] = [set() for _ in range(n)]
    for v, nbs in var_neighbors.items():
        if v not in index:
            continue
        for nb in nbs:
            if nb in index and nb != v:
                adj[index[v]].add(index[nb])
                adj[index[nb]].add(index[v])
    cmember = np.zeros(n, dtype=np.int32)
    for v in (last_vars or []):
        cmember[index[v]] = 1
    if cmember.all():
        cmember[:] = 0
    order_idx = constrained_min_degree_indices(n, adj, cmember)
    return [variables[i] for i in order_idx]
