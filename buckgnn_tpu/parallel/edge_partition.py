"""Edge-partitioned neighbor aggregation over the 'model' mesh axis.

The scaling feature the reference lacks (SURVEY §5 long-context): each
batch's block-diagonal edge set is split across devices; every device
gather-scatters its local edges into a full-size node accumulator and the
partial aggregations are psum'd over ICI — the scatter-gather analog of
context/sequence parallelism. Super-node updates and graph readout become
part of the same psum.

This is the explicit `shard_map` path (collectives visible); the DP layer
composes with it by stacking batches on the 'data' axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from buckgnn_tpu.parallel.mesh import MODEL_AXIS


def partition_edges(senders, receivers, edges, n_shards: int):
    """Host-side: round-robin-contiguous split of the (receiver-sorted) edge
    arrays into `n_shards` equal chunks (already padded to a multiple)."""
    e = senders.shape[0]
    if e % n_shards:
        raise ValueError(f"edge capacity {e} not divisible by {n_shards}")
    k = e // n_shards
    return (
        senders.reshape(n_shards, k),
        receivers.reshape(n_shards, k),
        edges.reshape(n_shards, k, -1),
    )


def edge_partitioned_aggregate(
    x: jnp.ndarray,
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
    mesh: Mesh,
    aggr: str = "add",
):
    """aggr over all edges with edges sharded on MODEL_AXIS, x replicated.

    x: [N, F] (replicated); senders/receivers: [E] sharded along MODEL_AXIS.
    Returns [N, F] replicated aggregation identical to the single-device op.
    """
    num_nodes = x.shape[0]

    def local(xs, s, r):
        # each device owns one contiguous chunk of the receiver-sorted edges
        if aggr == "max":
            partial = jax.ops.segment_max(xs[s], r, num_nodes)
            partial = jnp.where(jnp.isfinite(partial), partial, -jnp.inf)
            out = jax.lax.pmax(partial, MODEL_AXIS)
            return jnp.where(jnp.isfinite(out), out, 0.0)
        partial = jax.ops.segment_sum(xs[s], r, num_nodes)
        if aggr in ("add", "sum"):
            return jax.lax.psum(partial, MODEL_AXIS)
        if aggr == "mean":
            cnt = jax.ops.segment_sum(
                jnp.ones_like(r, dtype=xs.dtype), r, num_nodes
            )
            total = jax.lax.psum(partial, MODEL_AXIS)
            count = jax.lax.psum(cnt, MODEL_AXIS)
            return total / jnp.maximum(count, 1.0)[:, None]
        raise ValueError(aggr)

    shard = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(MODEL_AXIS), P(MODEL_AXIS)),
        out_specs=P(),
    )
    return shard(x, senders, receivers)


def shard_edge_arrays(mesh: Mesh, senders, receivers, edges):
    """Place edge arrays with MODEL_AXIS sharding (for jit donation)."""
    s = NamedSharding(mesh, P(MODEL_AXIS))
    return (
        jax.device_put(senders, s),
        jax.device_put(receivers, s),
        jax.device_put(edges, s),
    )
