from .solver import SolverArgs, FactorGraphSolver, CliqueSeparatorFactor, \
    ConditionalSampler
from .nfisam import NFiSAMArgs, NFiSAM, FlowsPriorFactor, FlowModelAdapter
from .run import run_incrementally
from .map_solver import GaussNewtonMAP, MAPConfig
