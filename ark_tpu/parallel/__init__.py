from ark_tpu.parallel.mesh import (
    make_mesh,
    param_shardings,
    opt_state_shardings,
    batch_sharding,
    place_state,
    place_batch,
    replicate,
    make_parallel_train_step,
    make_parallel_sampler,
)

from ark_tpu.parallel import multihost

__all__ = ["make_mesh", "param_shardings", "opt_state_shardings",
           "batch_sharding", "place_state", "place_batch", "replicate",
           "make_parallel_train_step", "make_parallel_sampler", "multihost"]
