from air_tpu.parallel.mesh import make_mesh, batch_sharding, replicated
from air_tpu.parallel.train_parallel import (
    make_parallel_train_step, shard_batch, make_parallel_eval_step,
)

__all__ = [
    "make_mesh", "batch_sharding", "replicated",
    "make_parallel_train_step", "shard_batch", "make_parallel_eval_step",
]
