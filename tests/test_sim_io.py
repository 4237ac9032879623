"""Simulator / IO tests (reference models: ``tests/test_environments.py``
and ``tests/test_pose_graph_reader.py``)."""
import os
import tempfile

import numpy as np
import pytest

from nfisam_tpu.factors import (AmbiguousDataAssociationFactor,
                                BinaryFactorWithNullHypo,
                                SE2R2RangeGaussianLikelihoodFactor,
                                SE2RelativeGaussianLikelihoodFactor,
                                UnarySE2ApproximateGaussianPriorFactor)
from nfisam_tpu.io import (graph_file_parser,
                           group_nodes_factors_incrementally,
                           read_factor_graph_from_file,
                           write_factor_graph_to_file)
from nfisam_tpu.io.g2o import G2oToroPoseGraphReader
from nfisam_tpu.sim.manhattan import (GridBeacon, GridRobot, ManhattanGrid,
                                      ManhattanSimulator, SimulationArgs)


# ----------------------------------------------------------- environment
def test_feasibility_masks():
    env = ManhattanGrid((5, 5), 10.0, robot_area=[(1, 1), (3, 3)])
    assert env.robot_feasibility[1, 1] and env.robot_feasibility[3, 3]
    assert not env.robot_feasibility[0, 0]
    assert env.landmark_feasibility[0, 0]
    assert not env.landmark_feasibility[2, 2]


def test_add_agents_respect_feasibility():
    env = ManhattanGrid((5, 5), 10.0, robot_area=[(1, 1), (3, 3)])
    rbt = GridRobot("A", step_scale=10.0)
    assert env.add_robot(rbt, 1, 1)
    assert not env.add_robot(GridRobot("B"), 0, 0)   # infeasible cell
    lmk = GridBeacon("L1")
    assert env.add_landmark(lmk, 0, 0)
    assert not env.add_landmark(GridBeacon("L2"), 2, 2)


def test_lawnmower_path_covers_area():
    env = ManhattanGrid((4, 4), 1.0, robot_area=[(0, 0), (3, 3)])
    path = env.lawnmower_path()
    assert len(path) == 16
    assert len(set(path)) == 16
    # consecutive waypoints are grid neighbors
    for a, b in zip(path, path[1:]):
        assert abs(a[0] - b[0]) + abs(a[1] - b[1]) == 1


def test_edge_path_is_boundary_loop():
    env = ManhattanGrid((4, 4), 1.0, robot_area=[(0, 0), (3, 3)])
    path = env.edge_path()
    inner = {(1, 1), (1, 2), (2, 1), (2, 2)}
    assert not (set(path) & inner)
    assert len(set(path)) == 12


# -------------------------------------------------------------- simulator
def test_simulator_emits_consistent_graph():
    env = ManhattanGrid((4, 4), 20.0, robot_area=[(0, 0), (3, 3)])
    rbt = GridRobot("A", step_scale=20.0, range_std=2.0,
                    odom_cov=np.diag([0.01, 0.01, 0.001]))
    env.add_robot(rbt, 0, 0)
    # landmarks off-grid for robots are infeasible here; use full grid env
    env.landmark_feasibility[:] = True
    env.add_landmark(GridBeacon("L1"), 1, 1)
    env.add_landmark(GridBeacon("L2"), 2, 2)
    args = SimulationArgs(range_sensing_prob=1.0, seed=3, range_std=2.0)
    sim = ManhattanSimulator(env, args)
    wps = env.lawnmower_path()[1:6]
    rbt_vars, lmk_vars, factors, truth = sim.waypoint_slam(rbt, wps)
    assert len(rbt_vars) >= len(wps)
    assert 1 <= len(lmk_vars) <= 2
    odos = [f for f in factors
            if isinstance(f, SE2RelativeGaussianLikelihoodFactor)]
    assert len(odos) == len(rbt_vars) - 1
    # odometry observations near ground-truth relative moves
    for f in odos:
        rel = truth[f.var2][:2] - truth[f.var1][:2]
        assert abs(np.linalg.norm(rel) - np.linalg.norm(f.obs[:2])) < 2.0
    # range observations near true ranges
    ranges = [f for f in factors
              if isinstance(f, SE2R2RangeGaussianLikelihoodFactor)]
    assert ranges
    for f in ranges:
        d = np.linalg.norm(truth[f.var1][:2] - truth[f.var2][:2])
        assert abs(d - float(f.obs[0])) < 10.0


def test_simulator_injects_ada_and_outliers():
    env = ManhattanGrid((4, 4), 20.0, robot_area=[(0, 0), (3, 3)])
    rbt = GridRobot("A", step_scale=20.0, range_std=2.0)
    env.add_robot(rbt, 0, 0)
    env.landmark_feasibility[:] = True
    for k, (i, j) in enumerate([(1, 1), (2, 2), (3, 1)]):
        env.add_landmark(GridBeacon(f"L{k+1}"), i, j)
    args = SimulationArgs(range_sensing_prob=1.0,
                          ambiguous_data_association_prob=0.5,
                          outlier_prob=0.2, seed=5, range_std=2.0)
    sim = ManhattanSimulator(env, args)
    _, _, factors, _ = sim.waypoint_slam(rbt, env.lawnmower_path()[1:])
    kinds = {type(f).__name__ for f in factors}
    assert "BinaryFactorWithNullHypo" in kinds
    assert "AmbiguousDataAssociationFactor" in kinds


def test_simulated_graph_round_trips_and_groups():
    env = ManhattanGrid((3, 3), 10.0, robot_area=[(0, 0), (2, 2)])
    rbt = GridRobot("X", step_scale=10.0, range_std=1.0)
    env.add_robot(rbt, 0, 0)
    env.landmark_feasibility[:] = True
    env.add_landmark(GridBeacon("L1"), 1, 1)
    sim = ManhattanSimulator(env, SimulationArgs(range_sensing_prob=1.0,
                                                 seed=1, range_std=1.0))
    rbt_vars, lmk_vars, factors, truth = sim.waypoint_slam(
        rbt, env.lawnmower_path()[1:4])
    all_vars = rbt_vars + lmk_vars
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "sim.fg")
        write_factor_graph_to_file(all_vars, factors, truth, path)
        nodes2, truth2, factors2 = read_factor_graph_from_file(path)
        assert len(nodes2) == len(all_vars)
        assert len(factors2) == len(factors)
    batches = group_nodes_factors_incrementally(all_vars, factors,
                                                incremental_step=2)
    grouped_vars = [v for b in batches for v in b[0]]
    grouped_factors = [f for b in batches for f in b[1]]
    assert set(grouped_vars) == set(all_vars)
    assert len(grouped_factors) == len(factors)


# ------------------------------------------------------------------- g2o
def test_g2o_reader(tmp_path):
    content = """VERTEX_SE2 0 0.0 0.0 0.0
VERTEX_SE2 1 1.0 0.0 0.0
EDGE_SE2 0 1 1.0 0.0 0.0 100.0 0.0 0.0 100.0 0.0 400.0
"""
    p = tmp_path / "toy.g2o"
    p.write_text(content)
    reader = G2oToroPoseGraphReader(str(p))
    nodes, factors, truth = reader.data_for_solver(prior_cov_scale=0.1)
    assert len(nodes) == 2
    assert len(factors) == 2  # anchor prior + edge
    f = factors[1]
    np.testing.assert_allclose(f.obs, [1.0, 0.0, 0.0])
    np.testing.assert_allclose(f.covariance,
                               np.linalg.inv(np.diag([100., 100., 400.])),
                               atol=1e-9)


def test_toro_reader(tmp_path):
    content = """VERTEX2 0 0.0 0.0 0.0
VERTEX2 1 2.0 0.0 0.0
EDGE2 0 1 2.0 0.0 0.0 25.0 0.0 25.0 100.0 0.0 0.0
"""
    p = tmp_path / "toy.graph"
    p.write_text(content)
    reader = G2oToroPoseGraphReader(str(p))
    nodes, factors, truth = reader.data_for_solver()
    f = factors[1]
    # toro ordering: xx xy yy tt xt yt
    info = np.array([[25.0, 0.0, 0.0], [0.0, 25.0, 0.0], [0.0, 0.0, 100.0]])
    np.testing.assert_allclose(f.covariance, np.linalg.inv(info), atol=1e-9)


def test_dead_reckoning_extraction():
    """inc_var_factor_to_dead_reckoning chains prior + odometry means
    (reference incVarFactor2DRp RunBatch.py:349)."""
    from nfisam_tpu.io import (graph_file_parser,
                               group_nodes_factors_incrementally,
                               inc_var_factor_to_dead_reckoning)
    nodes, truth, factors = graph_file_parser(
        "data/case1_factor_graph.fg", "fg")
    batches = group_nodes_factors_incrementally(nodes, factors,
                                                incremental_step=1)
    xy = inc_var_factor_to_dead_reckoning(batches)
    poses = sorted((str(v.name), truth[v]) for v in nodes
                   if str(v.name).startswith("X"))
    assert xy.shape == (len(poses), 2)
    # noiseless odometry means should track the ground-truth path closely
    gt = np.stack([p[1][:2] for p in poses])
    assert np.linalg.norm(xy - gt, axis=1).max() < 1.0


def test_caesar_export():
    """Caesar.jl bridge emits one addVariable!/addFactor! per element and
    per-step solveTree! calls (role of fg2caesar.jl)."""
    from nfisam_tpu.io import (export_caesar_script, graph_file_parser,
                               group_nodes_factors_incrementally)
    nodes, truth, factors = graph_file_parser(
        "data/case1_factor_graph.fg", "fg")
    batches = group_nodes_factors_incrementally(nodes, factors,
                                                incremental_step=1)
    script = export_caesar_script(batches, truth=truth)
    assert script.count("addVariable!") == len(nodes)
    assert script.count("addFactor!") == len(factors)
    assert script.count("solveTree!") == len(batches)
    assert "Pose2Pose2" in script and "Pose2Point2Range" in script \
        and "PriorPose2" in script
    # every SE2 pose maps to Pose2, every landmark to Point2
    assert script.count(", Pose2)") == sum(
        1 for v in nodes if v.dim == 3)
    assert script.count(", Point2)") == sum(
        1 for v in nodes if v.dim == 2)


def test_caesar_export_ada_multihypo():
    from nfisam_tpu.core.variables import (R2Variable, SE2Variable,
                                           VariableType)
    from nfisam_tpu.factors.factors import (
        SE2R2RangeGaussianLikelihoodFactor,
        UnarySE2ApproximateGaussianPriorFactor)
    from nfisam_tpu.factors.mixtures import AmbiguousDataAssociationFactor
    from nfisam_tpu.io import export_caesar_script
    x0 = SE2Variable("X0")
    l1 = R2Variable("L1", variable_type=VariableType.Landmark)
    l2 = R2Variable("L2", variable_type=VariableType.Landmark)
    prior = UnarySE2ApproximateGaussianPriorFactor(
        x0, [0., 0., 0.], np.diag([.1, .1, .01]))
    ada = AmbiguousDataAssociationFactor(
        observer_var=x0, observed_vars=[l1, l2], weights=[0.6, 0.4],
        binary_factor_class=SE2R2RangeGaussianLikelihoodFactor,
        observation=[5.0], sigma=0.3)
    script = export_caesar_script([([x0, l1, l2], [prior, ada])])
    assert "multihypo=[1; 0.6; 0.4]" in script
    assert "Pose2Point2Range(Normal(5, 0.3))" in script
