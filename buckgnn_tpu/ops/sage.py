"""Neighbor aggregation for SAGE-style convolutions.

Replaces the gather -> scatter core of PyG ``SAGEConv``
(reference: Models/BuckGNN.py:113-180 uses SAGEConv(aggr in
{add,sum,mean,max}, normalize=True)). Aggregation direction matches PyG:
messages flow ``senders -> receivers`` and are reduced at the receiver.

The padding convention of `GraphBatch` (pad edges connect the dead node to
itself) means no edge masking is needed here — padding contributions land
only in the dead node row.
"""

from __future__ import annotations

import jax.numpy as jnp

from buckgnn_tpu.ops import segment


def sage_aggregate(
    x: jnp.ndarray,
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
    num_nodes: int,
    aggr: str = "add",
    indices_are_sorted: bool = True,
    impl: str = "xla",
) -> jnp.ndarray:
    """aggr_{j in N(i)} x_j  for every node i.

    Args:
      x: [N, F] node features.
      senders/receivers: [E] int32, receiver-sorted when
        ``indices_are_sorted`` (the `GraphBatch` layout).
      aggr: 'add' | 'sum' | 'mean' | 'max'.
      impl: 'xla' (segment ops) or 'pallas' (CSR kernel, TPU only).
    """
    if impl == "pallas":
        from buckgnn_tpu.ops import pallas_segment

        return pallas_segment.gather_segment_reduce(
            x, senders, receivers, num_nodes, aggr=aggr
        )

    messages = x[senders]
    if aggr in ("add", "sum"):
        return segment.segment_sum(
            messages, receivers, num_nodes, indices_are_sorted=indices_are_sorted
        )
    if aggr == "mean":
        return segment.segment_mean(
            messages, receivers, num_nodes, indices_are_sorted=indices_are_sorted
        )
    if aggr == "max":
        return segment.segment_max(
            messages, receivers, num_nodes, indices_are_sorted=indices_are_sorted
        )
    raise ValueError(f"Unknown aggregation: {aggr}")
