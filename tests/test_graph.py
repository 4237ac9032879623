"""Graph-layer structural tests (reference models:
``tests/test_bayes_tree_structure.py`` and
``tests/test_factor_bayesian_network_structure.py``)."""
import numpy as np
import pytest

from nfisam_tpu.core import R2Variable, SE2Variable, VariableType
from nfisam_tpu.factors import SE2RelativeGaussianLikelihoodFactor, \
    SE2R2RangeGaussianLikelihoodFactor, UnarySE2ApproximateGaussianPriorFactor
from nfisam_tpu.graph import (BayesTree, CliqueNode, FactorGraph,
                              constrained_min_degree_ordering,
                              pose_first_ordering)


def _chain_graph(n=4):
    """X0 - X1 - ... - X{n-1} chain with a prior on X0."""
    xs = [SE2Variable(f"X{i}") for i in range(n)]
    g = FactorGraph()
    for x in xs:
        g.add_node(x)
    cov3 = np.eye(3) * 0.01
    g.add_factor(UnarySE2ApproximateGaussianPriorFactor(
        xs[0], np.zeros(3), cov3))
    for a, b in zip(xs, xs[1:]):
        g.add_factor(SE2RelativeGaussianLikelihoodFactor(
            a, b, np.array([1.0, 0, 0]), cov3))
    return g, xs


def _case1_like_graph():
    """6 poses + 2 landmarks with ranges, like case1."""
    xs = [SE2Variable(f"X{i}") for i in range(6)]
    ls = [R2Variable(f"L{i}", VariableType.Landmark) for i in (1, 2)]
    g = FactorGraph()
    for v in xs + ls:
        g.add_node(v)
    cov3 = np.eye(3) * 0.01
    g.add_factor(UnarySE2ApproximateGaussianPriorFactor(
        xs[0], np.zeros(3), cov3))
    for a, b in zip(xs, xs[1:]):
        g.add_factor(SE2RelativeGaussianLikelihoodFactor(
            a, b, np.array([1.0, 0, 0]), cov3))
    for (xi, li) in [(0, 0), (0, 1), (1, 0), (2, 0), (3, 1), (4, 1),
                     (5, 0), (5, 1)]:
        g.add_factor(SE2R2RangeGaussianLikelihoodFactor(
            xs[xi], ls[li], 5.0, 1.0))
    return g, xs, ls


def test_chain_elimination_parents():
    g, xs = _chain_graph(4)
    order = list(xs)
    g.build_bayes_tree(ordering=order)  # must not throw
    scratch = FactorGraph()
    scratch._vars = list(g.vars)
    scratch._var_neighbors = {v: set(nb) for v, nb
                              in g._var_neighbors.items()}
    scratch._var_factors = {v: set() for v in g.vars}
    scratch.eliminate_to_bayes_net(order)
    # chain: parent of X_i is {X_{i+1}}, root has none
    assert scratch.bayes_net_parents(xs[0]) == {xs[1]}
    assert scratch.bayes_net_parents(xs[1]) == {xs[2]}
    assert scratch.bayes_net_parents(xs[3]) == set()


def test_chain_bayes_tree_structure():
    g, xs = _chain_graph(4)
    tree = g.build_bayes_tree(ordering=list(xs))
    cliques = tree.clique_nodes
    # chain gives cliques {X3,X2},{X2,X1},{X1,X0} rooted at X3
    assert tree.root.frontal == {xs[3], xs[2]} or xs[3] in tree.root.frontal
    for c in cliques:
        assert len(c.vars) <= 2 or c is tree.root


def test_case1_pose_first_tree():
    g, xs, ls = _case1_like_graph()
    order = pose_first_ordering(g.vars)
    assert order[-2:] == ls  # landmarks eliminated last
    tree = g.build_bayes_tree(ordering=order)
    # every variable appears as a frontal in exactly one clique
    seen = {}
    for c in tree.clique_nodes:
        for v in c.frontal:
            assert v not in seen
            seen[v] = c
    assert set(seen) == set(g.vars)
    # root contains the landmarks (eliminated last)
    assert ls[0] in tree.root.frontal or ls[1] in tree.root.frontal


def test_clique_variable_pattern_order():
    g, xs, ls = _case1_like_graph()
    order = pose_first_ordering(g.vars)
    tree = g.build_bayes_tree(ordering=order)
    rank = {v: i for i, v in enumerate(tree.reverse_elimination_order)}
    for c in tree.clique_nodes:
        pattern = tree.clique_variable_pattern(c)
        ns, nf = len(c.separator), len(c.frontal)
        assert set(pattern[:ns]) == c.separator
        assert set(pattern[ns:]) == c.frontal
        # each block ascending in reverse-elimination rank
        for block in (pattern[:ns], pattern[ns:]):
            rks = [rank[v] for v in block]
            assert rks == sorted(rks)


def test_prune_affected_detaches_subtrees():
    # hand-built tree:  root{f:C s:}, children A{f:A s:C}, B{f:B s:C}
    A, B, C = (SE2Variable(n) for n in "ABC")
    root = CliqueNode(frontal={C})
    ca = CliqueNode(frontal={A}, separator={C})
    cb = CliqueNode(frontal={B}, separator={C})
    root.attach_child(ca)
    root.attach_child(cb)
    tree = BayesTree(root=root)
    affected, detached = tree.prune_affected({A})
    assert affected == {A, C}
    assert len(detached) == 1
    (sub,) = detached
    assert sub.root.frontal == {B}


def test_prune_affected_climbs_to_root():
    # chain tree: root{D} <- {C|D} <- {B|C} <- {A|B}
    A, B, C, D = (SE2Variable(n) for n in "ABCD")
    root = CliqueNode(frontal={D})
    cc = CliqueNode(frontal={C}, separator={D})
    cb = CliqueNode(frontal={B}, separator={C})
    ca = CliqueNode(frontal={A}, separator={B})
    root.attach_child(cc)
    cc.attach_child(cb)
    cb.attach_child(ca)
    tree = BayesTree(root=root)
    affected, detached = tree.prune_affected({B})
    # B affected -> B, C, D (ancestors); A's subtree detaches
    assert affected == {B, C, D}
    assert len(detached) == 1
    assert next(iter(detached)).root.frontal == {A}


def test_graft_subtree_reattaches():
    A, B, C = (SE2Variable(n) for n in "ABC")
    root = CliqueNode(frontal={C, B})
    tree = BayesTree(root=root)
    sub = BayesTree(root=CliqueNode(frontal={A}, separator={B}))
    tree.graft_subtree(sub)
    assert sub.root in tree.root.children
    assert sub.root.parent is tree.root


def test_constrained_ordering_properties():
    g, xs, ls = _case1_like_graph()
    order = g.analyze_elimination_ordering("ccolamd", last_vars=[xs[5]])
    assert sorted(order) == sorted(g.vars)
    assert order[-1] == xs[5]  # constrained variable eliminated last


def test_ccolamd_reduces_fill_vs_natural():
    """On a loopy graph the min-degree ordering should produce no more
    fill-in than the natural ordering."""
    g, xs, ls = _case1_like_graph()

    def fill_count(order):
        scratch = FactorGraph()
        scratch._vars = list(g.vars)
        scratch._var_neighbors = {v: set(nb) for v, nb
                                  in g._var_neighbors.items()}
        scratch._var_factors = {v: set() for v in g.vars}
        before = sum(len(s) for s in scratch._var_neighbors.values())
        scratch.eliminate_to_bayes_net(order)
        return sum(len(p) for p in scratch._bayes_net_parents.values())

    natural = fill_count(sorted(g.vars))
    cmd = fill_count(g.analyze_elimination_ordering("ccolamd"))
    assert cmd <= natural


def test_incremental_tree_update_cycle():
    """Detach + re-eliminate + graft reproduces a consistent tree."""
    g, xs, ls = _case1_like_graph()
    order = pose_first_ordering(g.vars)
    tree = g.build_bayes_tree(ordering=order)
    x6 = SE2Variable("X6")
    affected, detached = tree.prune_affected({xs[5]})
    # working graph over affected vars + new var
    work_vars = affected | {x6}
    wg = FactorGraph()
    for v in order + [x6]:
        if v in work_vars:
            wg.add_node(v)
    cov3 = np.eye(3) * 0.01
    for f in g.factors:
        if set(f.vars).issubset(work_vars):
            wg.add_factor(f)
    wg.add_factor(SE2RelativeGaussianLikelihoodFactor(
        xs[5], x6, np.array([1.0, 0, 0]), cov3))
    # the solver always injects a separator-marginal prior for each detached
    # subtree root (FactorGraph.subgraph_with_separator_priors) — that factor
    # guarantees the graft point exists in the new working tree
    from nfisam_tpu.factors import UndefinedFactor
    for sub in detached:
        wg.add_factor(UndefinedFactor(sorted(sub.root.separator)))
    sub_order = [v for v in pose_first_ordering(wg.vars)]
    new_tree = wg.build_bayes_tree(ordering=sub_order)
    new_tree.graft_subtrees(detached)
    # all 9 variables present exactly once as frontal
    seen = set()
    for c in new_tree.clique_nodes:
        for v in c.frontal:
            assert v not in seen
            seen.add(v)
    assert seen == set(g.vars) | {x6}


def test_deep_chain_tree_copy_and_prune():
    """pose_first trees of long trajectories are chains (depth == clique
    count); deep_copy/prune must not recurse — the recursive form blew
    the Python stack at ~1000 poses (found by the 1024-pose scale run)."""
    from nfisam_tpu.core import SE2Variable
    from nfisam_tpu.graph.bayes_tree import BayesTree, CliqueNode

    n = 1500
    vs = [SE2Variable(f"X{i}") for i in range(n)]
    root = CliqueNode(frontal=vs[0])
    tree = BayesTree(root=root)
    cur = root
    for i in range(1, n):
        child = CliqueNode(frontal=vs[i], separator={vs[i - 1]})
        cur.attach_child(child)
        cur = child
    copied = tree.copy()
    assert len(copied.clique_nodes) == n
    affected, detached = tree.prune_affected({vs[0]})
    assert vs[0] in affected
    assert len(detached) == 1   # the long unaffected chain detaches
