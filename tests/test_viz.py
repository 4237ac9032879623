"""Visualization-layer tests: every public plot function renders to a file
from realistic inputs (reference ``Visualization.py`` has no tests at all;
we at least prove the full option surface executes and the credible-region
math is right)."""
import os

import numpy as np
import pytest

from nfisam_tpu.core.variables import (R2Variable, SE2Variable,
                                       VariableType)
from nfisam_tpu.eval.viz import (confidence_ellipse, kde_contour,
                                 plot_2d_clutter_trajectories,
                                 plot_2d_mean_trajectory, plot_2d_samples,
                                 plot_hypothesis_weights,
                                 plot_marginal_kde_grid)
from nfisam_tpu.factors.factors import (SE2RelativeGaussianLikelihoodFactor,
                                        SE2R2RangeGaussianLikelihoodFactor)
from nfisam_tpu.factors.mixtures import AmbiguousDataAssociationFactor


@pytest.fixture
def small_scene():
    rng = np.random.default_rng(0)
    x0, x1 = SE2Variable("X0"), SE2Variable("X1")
    l1, l2 = R2Variable("L1", variable_type=VariableType.Landmark), \
        R2Variable("L2", variable_type=VariableType.Landmark)
    samples = {
        x0: rng.normal([0, 0, 0], 0.3, (400, 3)),
        x1: rng.normal([1, 0, 0], 0.3, (400, 3)),
        l1: rng.normal([2, 1], 0.4, (400, 2)),
        l2: rng.normal([2, -1], 0.4, (400, 2)),
    }
    truth = {x0: np.array([0.0, 0, 0]), x1: np.array([1.0, 0, 0]),
             l1: np.array([2.0, 1]), l2: np.array([2.0, -1])}
    odom = SE2RelativeGaussianLikelihoodFactor(
        x0, x1, np.array([1.0, 0, 0]), covariance=np.eye(3) * 0.01)
    rng_f = SE2R2RangeGaussianLikelihoodFactor(x1, l1, 1.4, 0.1)
    ada = AmbiguousDataAssociationFactor(
        observer_var=x1, observed_vars=[l1, l2], weights=[0.5, 0.5],
        binary_factor_class=SE2R2RangeGaussianLikelihoodFactor,
        observation=np.array([1.4]), sigma=0.1)
    return samples, truth, [odom, rng_f, ada]


def test_plot_2d_samples_full_surface(tmp_path, small_scene):
    samples, truth, factors = small_scene
    out = str(tmp_path / "full.png")
    plot_2d_samples(samples_mapping=samples, truth=truth,
                    truth_factors=factors, has_orientation=True,
                    if_legend=True, equal_axis=True,
                    title="t", file_name=out,
                    contour_vars=[v for v in samples if v.name == "L1"])
    assert os.path.getsize(out) > 1000


def test_plot_2d_samples_array_form(tmp_path, small_scene):
    samples, truth, _ = small_scene
    order = list(samples.keys())
    arr = np.concatenate([samples[v] for v in order], axis=1)
    out = str(tmp_path / "arr.png")
    plot_2d_samples(samples_array=arr, variable_ordering=order,
                    colors=["r", "g", "b", "k"], file_name=out,
                    rbt_traj_no_samples=True, truth=truth)
    assert os.path.getsize(out) > 1000
    with pytest.raises(ValueError):
        plot_2d_samples(samples_array=arr)


def test_kde_contour_credible_mass():
    # standard normal cloud: the 68% credible contour threshold must
    # enclose ~68% of fresh samples
    rng = np.random.default_rng(1)
    xy = rng.normal(size=(1500, 2))
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots()
    cs = kde_contour(ax, xy, levels=(0.68,))
    # the 68% mass contour of N(0,I) is the circle r ~ 1.51
    paths = cs.get_paths() if hasattr(cs, "get_paths") else [
        p for c in cs.collections for p in c.get_paths()]
    assert len(paths) >= 1
    vertices = np.concatenate([p.vertices for p in paths], axis=0)
    radii = np.linalg.norm(vertices, axis=1)
    assert 1.2 < np.median(radii) < 1.9
    plt.close(fig)


def test_mean_and_clutter_trajectories(tmp_path, small_scene):
    samples, _, _ = small_scene
    order = list(samples.keys())
    f1 = str(tmp_path / "mean.png")
    plot_2d_mean_trajectory(samples, order, file_name=f1, if_legend=True)
    f2 = str(tmp_path / "clutter.png")
    plot_2d_clutter_trajectories(samples, order, traj_num=10,
                                 draw_ellipse=True, ellipse_itv=1,
                                 draw_samples=20, file_name=f2)
    assert os.path.getsize(f1) > 1000 and os.path.getsize(f2) > 1000


def test_plot_hypothesis_weights(tmp_path):
    steps = {
        1: {"X1->L1|L2": np.array([0.5, 0.5])},
        2: {"X1->L1|L2": np.array([0.7, 0.3]),
            "X2->L1|L2": np.array([0.4, 0.6])},
        3: {"X1->L1|L2": np.array([0.9, 0.1]),
            "X2->L1|L2": np.array([0.2, 0.8])},
    }
    out = str(tmp_path / "hypo.png")
    plot_hypothesis_weights(steps, file_name=out,
                            true_assoc={"X1->L1|L2": "L1"})
    assert os.path.getsize(out) > 1000
    with pytest.raises(ValueError):
        plot_hypothesis_weights({1: {}})


def test_marginal_kde_grid(tmp_path, small_scene):
    samples, _, _ = small_scene
    out = str(tmp_path / "kde.png")
    plot_marginal_kde_grid(samples, list(samples.keys()), file_name=out)
    assert os.path.getsize(out) > 1000


def test_confidence_ellipse_runs():
    import matplotlib.pyplot as plt
    rng = np.random.default_rng(2)
    fig, ax = plt.subplots()
    confidence_ellipse(rng.normal(size=300), rng.normal(size=300), ax,
                       edgecolor="b")
    with pytest.raises(ValueError):
        confidence_ellipse(np.zeros(3), np.zeros(4), ax)
    plt.close(fig)
