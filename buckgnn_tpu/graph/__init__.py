from buckgnn_tpu.graph.batch import (  # noqa: F401
    GraphBatch,
    GraphData,
    pack_graphs,
    capacity_for,
    batch_iterator,
)
