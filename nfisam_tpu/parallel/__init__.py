from .mesh import (make_mesh, data_parallel_mesh, build_sharded_train_step,
                   build_sharded_conditional_sampler, shard_samples)
from .scheduler import ParallelNFiSAM, wavefronts
