"""buckgnn_tpu — a TPU-native GNN message-passing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
omerkurt-okt/buck-gnn reference (GraphSAGE-family surrogate models for
linear-buckling / static FE analysis of thin-walled structures):

- Fixed-capacity, statically-shaped graph batches (`buckgnn_tpu.graph.batch`)
  replacing PyG's dynamic block-diagonal DataLoader collation.
- Segment-reduction compute kernels (XLA segment ops + Pallas CSR kernels)
  replacing torch_scatter / PyG SAGEConv CUDA internals.
- One `BuckGNN` flax module covering every `model_name` variant of the
  reference (`Models/BuckGNN.py`), with masked BatchNorm / pooling so that
  padding never biases statistics.
- A host-side NumPy data pipeline with bit-compatible PCA canonicalization,
  Mohr's-circle stress rotation, stiffener binning, virtual edges/super node
  and Robust/Standard/range normalizers.
- Data-parallel + edge-partitioned execution over `jax.sharding.Mesh`.

Reference files are cited as `<file>:<line>` into /root/reference throughout.
"""

__version__ = "0.1.0"

from buckgnn_tpu.graph.batch import GraphBatch, GraphData, pack_graphs  # noqa: F401
