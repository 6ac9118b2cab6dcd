from ark_tpu.parallel.mesh import (
    make_mesh,
    param_shardings,
    batch_sharding,
    make_parallel_train_step,
)

__all__ = ["make_mesh", "param_shardings", "batch_sharding",
           "make_parallel_train_step"]
