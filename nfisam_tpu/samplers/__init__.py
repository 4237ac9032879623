from .simulation import (SimulationBasedSampler, compile_schedule,
                         execute_schedule, SimulationSchedule)
from .joint import JointFactor, StructuredJointFactor
from .nested import GlobalNestedSampler, NestedConfig, nested_sample
from .nuts import GlobalMCMCSampler, NUTSConfig, nuts_sample
from .smc import GlobalSMCSampler, SMCConfig, smc_sample
