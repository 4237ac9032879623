from . import geometry
from .variables import (Variable, VariableType, R1Variable, R2Variable,
                        SE2Variable, Bearing2DVariable, circular_dim_list,
                        file2vars)
from .distributions import (GaussianDistribution, GaussianRangeDistribution,
                            GaussianMixtureDistribution)
from .likelihoods import (LogLikelihood, GaussianRangeLogLikelihood,
                          GaussianMixtureLogLikelihood,
                          GaussianDisplacementDistribution)
