from .simulation import (SimulationBasedSampler, compile_schedule,
                         execute_schedule, SimulationSchedule)
