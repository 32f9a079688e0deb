from buckgnn_tpu.parallel.mesh import make_mesh  # noqa: F401
from buckgnn_tpu.parallel.dp import (  # noqa: F401
    stack_batches,
    shard_stacked_batch,
    make_parallel_train_step,
)
from buckgnn_tpu.parallel.ea_shard import (  # noqa: F401
    EAShards,
    ea_tp_stack,
    pad_ea_shards,
    shard_caps,
    shard_ea_batch,
)
from buckgnn_tpu.parallel.partitioned import (  # noqa: F401
    PartitionedBatch,
    pad_partitioned,
    partition_batch,
    partitioned_sage_aggregate,
)
