from .rqs import unconstrained_rqs, rqs
from .base_dist import BaseDistribution, von_mises_sample, von_mises_log_prob
from .nsf import (NSFConfig, init_flow_params, flow_forward, flow_inverse,
                  stack_forward, stack_inverse, conditioner_all_dims)
from .model import (CliqueFlowModel, compute_normalizer, normalize,
                    unnormalize, circular_mean, model_forward,
                    negative_log_likelihood)
