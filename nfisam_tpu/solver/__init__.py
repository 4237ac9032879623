from .solver import SolverArgs, FactorGraphSolver, CliqueSeparatorFactor, \
    ConditionalSampler
from .nfisam import NFiSAMArgs, NFiSAM, FlowsPriorFactor, FlowModelAdapter
from .run import (run_incrementally, nfisam_empirical_study,
                  NFiSAM_empirial_study)
from .map_solver import GaussNewtonMAP, MAPConfig
