"""Block-banded SAGE aggregation — the MXU-native hot path.

Replaces gather + scatter-add (the torch_scatter/SAGEConv core the reference
leans on, SURVEY §2.1) with dense linear algebra:

Under a locality-preserving node ordering, FE-mesh edges concentrate near
the adjacency diagonal. Packing assigns each in-band edge (s -> r) to a
[T, S] block (T = receiver tile, S = T + W slab of candidate senders), so

    agg = blockdiag(Band_t) @ x        (one batched matmul on the MXU)

with three exact correction terms:
- *spill*: out-of-band edges via the ordinary gather + segment-sum (a few
  percent of edges: virtual edges + rare long-range mesh edges),
- *supernode stars*: each supernode's 2(n-1) edges computed analytically
  with per-graph segment ops (sum over the graph to the supernode; the
  supernode's features broadcast to its graph),
- padding: dead-node self-loops only ever touch the dead row.

The band matrix is built ON DEVICE once per forward pass from the compact
in-band edge lists (a cheap scalar scatter) and shared by all layers, so
batches stay small on host and in transfers.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from buckgnn_tpu.graph.batch import GraphBatch
from buckgnn_tpu.ops import segment


@dataclasses.dataclass(frozen=True)
class AggContext:
    """Per-forward aggregation context: build once, reuse across layers."""

    batch: GraphBatch
    band: jnp.ndarray | None            # [n_tiles, T, S]
    slab_index: jnp.ndarray | None      # [n_tiles, S] source row ids
    degree: jnp.ndarray | None          # [N] in-degree (for mean)
    super_gather_mask: jnp.ndarray | None  # [N] 1.0 where node receives super
    band_dtype: jnp.dtype | None = None


def build_band_matrix(batch: GraphBatch, dtype=jnp.float32):
    """[n_tiles, T, S] adjacency counts from the in-band edge lists."""
    n = batch.n_node_cap
    tile = batch.band_tile
    width = batch.band_width
    slab = tile + width
    n_tiles = n // tile
    r = batch.band_receivers
    s = batch.band_senders
    t = r // tile
    start = jnp.clip(t * tile - width // 2, 0, max(n - slab, 0))
    k = s - start
    flat = r * slab + k
    ones = jnp.ones_like(r, dtype=dtype)
    band = jax.ops.segment_sum(ones, flat, n * slab)
    return band.reshape(n_tiles, tile, slab)


def make_agg_context(batch: GraphBatch, band_dtype=jnp.float32) -> AggContext:
    if batch.band_senders is None:
        return AggContext(batch=batch, band=None, slab_index=None,
                          degree=None, super_gather_mask=None)
    n = batch.n_node_cap
    tile = batch.band_tile
    width = batch.band_width
    slab = tile + width
    n_tiles = n // tile
    band = build_band_matrix(batch, dtype=band_dtype)
    t = jnp.arange(n_tiles)
    starts = jnp.clip(t * tile - width // 2, 0, max(n - slab, 0))
    slab_index = starts[:, None] + jnp.arange(slab)[None, :]
    # true in-degree over ALL original edges (band+spill+super+pad self-loops
    # on the dead row) — used by mean aggregation
    degree = segment.segment_count(
        batch.receivers, n, indices_are_sorted=True, mask=batch.edge_mask
    )
    if batch.has_supernode_edges:
        # nodes that receive the supernode broadcast: real nodes of graphs
        # with a supernode, except the supernode itself
        has_super = batch.supernode_index < batch.dead_node_index  # [G]
        node_has = has_super[batch.node_graph]
        is_super = jnp.zeros(n, bool).at[batch.supernode_index].set(has_super)
        mask = node_has & batch.node_mask & ~is_super
        super_gather_mask = mask.astype(jnp.float32)
    else:
        super_gather_mask = None
    return AggContext(batch=batch, band=band, slab_index=slab_index,
                      degree=degree, super_gather_mask=super_gather_mask,
                      band_dtype=band_dtype)


def banded_sage_aggregate(x: jnp.ndarray, ctx: AggContext,
                          aggr: str = "add") -> jnp.ndarray:
    """Neighbor aggregation equal to `sage_aggregate` over the full edge set."""
    batch = ctx.batch
    if ctx.band is None or aggr == "max":
        # no banded data (or unsupported aggr): plain gather path
        from buckgnn_tpu.ops.sage import sage_aggregate

        return sage_aggregate(x, batch.senders, batch.receivers,
                              batch.n_node_cap, aggr=aggr)
    n = batch.n_node_cap
    h = x.shape[1]
    tile = batch.band_tile

    # banded part: slab gather (near-contiguous) + batched MXU matmul
    xs = x[ctx.slab_index]  # [n_tiles, S, H]
    band = ctx.band.astype(ctx.band_dtype)
    agg = jax.lax.dot_general(
        band, xs.astype(ctx.band_dtype),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).reshape(n, h)

    # spill part
    if batch.spill_senders is not None:
        agg = agg + segment.segment_sum(
            x[batch.spill_senders], batch.spill_receivers, n,
            indices_are_sorted=True,
        )

    # supernode stars
    if ctx.super_gather_mask is not None:
        sn = batch.supernode_index  # [G]
        # broadcast supernode features to its graph's real nodes
        agg = agg + x[sn][batch.node_graph] * ctx.super_gather_mask[:, None]
        # supernode receives the sum of its graph's real nodes (minus itself)
        graph_sum = segment.segment_sum(
            x * batch.node_mask.astype(x.dtype)[:, None],
            batch.node_graph, batch.n_graph_cap,
        )
        has_super = sn < batch.dead_node_index
        contrib = (graph_sum - x[sn]) * has_super[:, None].astype(x.dtype)
        agg = agg.at[sn].add(contrib)

    if aggr in ("add", "sum"):
        return agg
    if aggr == "mean":
        return agg / jnp.maximum(ctx.degree, 1.0)[:, None]
    raise ValueError(f"Unsupported banded aggregation: {aggr}")
