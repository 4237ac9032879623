from .metrics import (mmd, mmd_sq_signed, mmd_unbiased_sq, mmd_biased, rmse, sample_mean,
                      geodesic_distance, translation_distance,
                      kabsch_umeyama, rigid_gauge_transform,
                      anchor_samples, gaussian_kernel_stein_discrepancy,
                      gaussian_displacement_graph_moments,
                      sample_dict_to_array, array_order_to_dict)
from .viz import (plot_2d_samples, plot_2d_mean_trajectory,
                  confidence_ellipse, plot_pose, plot_point,
                  plot_likelihood_factor)
