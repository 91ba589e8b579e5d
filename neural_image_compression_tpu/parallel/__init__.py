from neural_image_compression_tpu.parallel.mesh import (
    batch_sharding, init_distributed, make_mesh, replicated, spatial_sharding,
)
from neural_image_compression_tpu.parallel.tp import shard_params, tp_shardings
from neural_image_compression_tpu.parallel.train_step import (
    make_eval_step, make_train_step, replicate, shard_batch,
)

__all__ = [
    "make_mesh", "init_distributed", "batch_sharding", "spatial_sharding", "replicated",
    "make_train_step", "make_eval_step", "shard_batch", "replicate",
    "shard_params", "tp_shardings",
]
