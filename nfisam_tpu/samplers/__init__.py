from .simulation import (SimulationBasedSampler, compile_schedule,
                         execute_schedule, SimulationSchedule)
from .joint import JointFactor, StructuredJointFactor
from .nested import GlobalNestedSampler, NestedConfig, nested_sample
from .nuts import GlobalMCMCSampler, NUTSConfig, nuts_sample
from .smc import GlobalSMCSampler, SMCConfig, smc_sample
from .run_batch import (sampler_run_batch, nested_run_batch,
                        dynesty_run_batch, nuts_run_batch, smc_run_batch)
