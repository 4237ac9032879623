from .factors import *  # noqa: F401,F403
from .factors import (Factor, PriorFactor, LikelihoodFactor, BinaryFactor,
                      UnaryFactor, UndefinedFactor, ImplicitPriorFactor,
                      FACTOR_REGISTRY)
from .mixtures import (KWayFactor, BinaryFactorMixture,
                       BinaryMixtureWithSameData,
                       AmbiguousDataAssociationFactor,
                       BinaryFactorWithNullHypo)
from .utils import classify_factors, unpack_prior_binary_nh_da_factors
