"""Posterior visualization (host-side matplotlib).

Parity with reference ``src/utils/Visualization.py`` (``plot_2d_samples:51``,
``plot2d_mean_rbt_only:381``, ``confidence_ellipse:516``, pose/point/factor
glyphs used by the simulator).
"""
from __future__ import annotations

from typing import Dict, Iterable, List, Optional

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import matplotlib.transforms as transforms
import numpy as np
from matplotlib.patches import Ellipse

from ..core.variables import Variable, VariableType
from ..factors.factors import LikelihoodFactor


def confidence_ellipse(x: np.ndarray, y: np.ndarray, ax, n_std: float = 3.0,
                       facecolor="none", **kwargs):
    """Covariance confidence ellipse of paired samples (reference
    ``confidence_ellipse`` Visualization.py:516)."""
    if x.size != y.size:
        raise ValueError("x and y must be the same size")
    cov = np.cov(x, y)
    pearson = cov[0, 1] / np.sqrt(cov[0, 0] * cov[1, 1])
    rx = np.sqrt(1 + pearson)
    ry = np.sqrt(1 - pearson)
    ellipse = Ellipse((0, 0), width=2 * rx, height=2 * ry,
                      facecolor=facecolor, **kwargs)
    sx = np.sqrt(cov[0, 0]) * n_std
    sy = np.sqrt(cov[1, 1]) * n_std
    transf = (transforms.Affine2D()
              .rotate_deg(45)
              .scale(sx, sy)
              .translate(np.mean(x), np.mean(y)))
    ellipse.set_transform(transf + ax.transData)
    return ax.add_patch(ellipse)


def plot_pose(ax, pose, marker_size: float = 40, color: str = "red",
              arrow_scale: float = 1.0):
    pose = np.asarray(pose).reshape(-1)
    ax.scatter([pose[0]], [pose[1]], s=marker_size, color=color, marker="o")
    if pose.shape[0] >= 3:
        ax.arrow(pose[0], pose[1], arrow_scale * np.cos(pose[2]),
                 arrow_scale * np.sin(pose[2]), color=color,
                 head_width=0.3 * arrow_scale)


def plot_point(ax, point, marker_size: float = 40, color: str = "blue",
               label: Optional[str] = None, label_offset=(0, 0)):
    point = np.asarray(point).reshape(-1)
    ax.scatter([point[0]], [point[1]], s=marker_size, color=color,
               marker="x")
    if label:
        ax.annotate(label, (point[0] + label_offset[0],
                            point[1] + label_offset[1]))


def plot_likelihood_factor(ax, factor, var2truth: Dict, color="gray",
                           alpha=0.5):
    pts = [np.asarray(var2truth[v]).reshape(-1)[:2] for v in factor.vars
           if v in var2truth]
    for a, b in zip(pts, pts[1:]):
        ax.plot([a[0], b[0]], [a[1], b[1]], color=color, alpha=alpha,
                linewidth=0.8)


def plot_2d_samples(samples_mapping: Dict[Variable, np.ndarray] = None,
                    truth: Dict[Variable, np.ndarray] = None,
                    truth_factors: Iterable = None,
                    title: str = None, equal_axis: bool = False,
                    marker_size: float = 1.0, file_name: str = None,
                    xlim=None, ylim=None, if_legend: bool = False,
                    show_plot: bool = False, ax=None, **kwargs):
    """Posterior scatter with ground-truth overlays (reference
    ``plot_2d_samples`` Visualization.py:51; plotting-only kwargs from the
    reference API are accepted and ignored)."""
    if ax is None:
        fig, ax = plt.subplots()
    else:
        fig = ax.figure
    if samples_mapping:
        for var, s in samples_mapping.items():
            s = np.asarray(s)
            ax.scatter(s[:, 0], s[:, 1], marker=".", s=marker_size,
                       label=str(var.name))
    if truth_factors and truth:
        for factor in truth_factors:
            if isinstance(factor, LikelihoodFactor) or \
                    hasattr(factor, "vars"):
                plot_likelihood_factor(ax, factor, truth)
    if truth:
        for var, val in truth.items():
            val = np.asarray(val).reshape(-1)
            if var.type == VariableType.Landmark:
                plot_point(ax, val, color="black", marker_size=30,
                           label=str(var.name))
            else:
                plot_pose(ax, val, color="black", marker_size=10)
    if equal_axis:
        ax.set_aspect("equal", adjustable="datalim")
    if xlim is not None:
        ax.set_xlim(xlim)
    if ylim is not None:
        ax.set_ylim(ylim)
    if if_legend:
        ax.legend(markerscale=6, fontsize=6)
    ax.set_xlabel("x (m)")
    ax.set_ylabel("y (m)")
    if title:
        ax.set_title(title)
    if file_name:
        fig.savefig(file_name, dpi=150, bbox_inches="tight")
    if show_plot:  # pragma: no cover
        plt.show()
    plt.close(fig)
    return fig


def plot_2d_mean_trajectory(samples_mapping: Dict[Variable, np.ndarray],
                            ordering: List[Variable], title: str = None,
                            file_name: str = None, if_legend: bool = False):
    """Mean robot trajectory + landmark scatter (reference
    ``plot2d_mean_rbt_only`` Visualization.py:381)."""
    fig, ax = plt.subplots()
    xs, ys = [], []
    for var in ordering:
        s = np.asarray(samples_mapping[var])
        if var.type == VariableType.Landmark:
            ax.scatter(s[:, 0], s[:, 1], s=1, label=str(var.name))
        else:
            xs.append(s[:, 0].mean())
            ys.append(s[:, 1].mean())
    ax.plot(xs, ys, "-o", markersize=2)
    if if_legend:
        ax.legend()
    ax.set_xlabel("x (m)")
    ax.set_ylabel("y (m)")
    if title:
        ax.set_title(title)
    if file_name:
        fig.savefig(file_name, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return fig
