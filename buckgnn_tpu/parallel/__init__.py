from buckgnn_tpu.parallel.mesh import make_mesh  # noqa: F401
from buckgnn_tpu.parallel.dp import (  # noqa: F401
    stack_batches,
    shard_stacked_batch,
    make_parallel_train_step,
)
