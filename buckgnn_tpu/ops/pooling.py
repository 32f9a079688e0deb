"""Graph readout (pooling) ops over the `GraphBatch` segment layout.

Replaces PyG ``global_mean_pool/global_max_pool/global_add_pool``
(reference: Models/BuckGNN.py:3,273-293) and the supernode-index Python loop
(Models/BuckGNN.py:255-271) with segment reductions / gathers: no host syncs,
fully jit-compatible.

Padding nodes belong to the padding graph slot, so plain segment ops already
exclude them from real graphs' statistics.
"""

from __future__ import annotations

import jax.numpy as jnp

from buckgnn_tpu.graph.batch import GraphBatch
from buckgnn_tpu.ops import segment


def global_add_pool(x: jnp.ndarray, batch: GraphBatch) -> jnp.ndarray:
    return segment.segment_sum(x, batch.node_graph, batch.n_graph_cap)


def global_mean_pool(
    x: jnp.ndarray, batch: GraphBatch, exclude_supernode: bool = False
) -> jnp.ndarray:
    """Mean pool per graph; optionally over real (non-super) nodes only
    (the reference's 'mean_no_super' / supernode_with_pooling pooled part,
    Models/BuckGNN.py:277-293)."""
    if not exclude_supernode:
        return segment.segment_mean(x, batch.node_graph, batch.n_graph_cap)
    # Zero out supernode rows and reduce counts by one for graphs that have one.
    is_super = jnp.zeros((batch.n_node_cap,), dtype=bool)
    has_super = batch.supernode_index < batch.dead_node_index
    # Scatter True at supernode indices of graphs that have one. Graphs
    # without supernode point at the dead node, which is not a real node.
    is_super = is_super.at[batch.supernode_index].set(has_super)
    keep = jnp.logical_and(batch.node_mask, jnp.logical_not(is_super))
    total = segment.segment_sum(
        x * keep.astype(x.dtype)[:, None], batch.node_graph, batch.n_graph_cap
    )
    count = segment.segment_count(batch.node_graph, batch.n_graph_cap, mask=keep)
    return total / jnp.maximum(count, 1.0)[:, None]


def global_max_pool(x: jnp.ndarray, batch: GraphBatch) -> jnp.ndarray:
    return segment.segment_max(x, batch.node_graph, batch.n_graph_cap)


def supernode_features(x: jnp.ndarray, batch: GraphBatch) -> jnp.ndarray:
    """x at each graph's supernode (Models/BuckGNN.py:283-284 'supernode_only')."""
    return x[batch.supernode_index]


def is_supernode_flat(batch: GraphBatch) -> jnp.ndarray:
    """[N_cap] bool marking supernode rows (input-feature convention: last
    node-feature == 1 on supernodes, Models/BuckGNN.py:315-316)."""
    flags = jnp.zeros((batch.n_node_cap,), dtype=bool)
    has_super = batch.supernode_index < batch.dead_node_index
    return flags.at[batch.supernode_index].set(has_super)
