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
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import dtypes

from buckgnn_tpu.graph.batch import SPILL_ALIGN, SPILL_CHUNK, GraphBatch
from buckgnn_tpu.ops import segment


@dataclasses.dataclass(frozen=True)
class AggContext:
    """Per-forward aggregation context: build once, reuse across layers."""

    batch: GraphBatch
    band: jnp.ndarray | None            # [n_tiles, T, S]
    degree: jnp.ndarray | None          # [N] in-degree (for mean)
    super_gather_mask: jnp.ndarray | None  # [N] 1.0 where node receives super
    band_dtype: jnp.dtype | None = None
    use_pallas: bool = False
    # edge-partitioned multi-device path (parallel/partitioned.py): node
    # rows sharded over the 'model' mesh axis, halo exchange over ICI
    part: object | None = None          # PartitionedBatch | None


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
    # band edges are (r, k)-lexsorted on host (batch.py::_band_split), so
    # flat is fully sorted — the scatter compiles to a cheap sorted
    # segment reduction instead of a random scatter.
    band = jax.ops.segment_sum(ones, flat, n * slab,
                               indices_are_sorted=True)
    return band.reshape(n_tiles, tile, slab)


def make_agg_context(batch: GraphBatch, band_dtype=jnp.float32,
                     use_pallas: bool = False,
                     need_degree: bool = False,
                     partitioned: bool = False) -> AggContext:
    """``need_degree`` avoids a per-step edge-count scatter for the add/sum
    aggregations (the flagship path); mean aggregation requires it.
    ``partitioned`` routes aggregation through the edge-partitioned
    multi-device operator (requires ``batch.part``, set via
    `parallel.partitioned.partition_batch` + ``batch.replace``)."""
    if partitioned:
        if batch.part is None:
            raise ValueError(
                "partitioned aggregation needs batch.part "
                "(parallel.partitioned.partition_batch)"
            )
        return AggContext(batch=batch, band=None, degree=None,
                          super_gather_mask=None, part=batch.part)
    if batch.band_senders is None:
        return AggContext(batch=batch, band=None,
                          degree=None, super_gather_mask=None)
    n = batch.n_node_cap
    if batch.band is not None:
        # pack-time-materialized int8 counts. The Pallas kernel consumes
        # int8 directly (halves band HBM traffic; the XLA u8->bf16 convert
        # measured 6.4 ms/step on a v5e); the XLA slab path casts per call.
        band = batch.band if use_pallas else batch.band.astype(band_dtype)
        if band.ndim == 2:
            # stored 2D for a row-major device layout (graph/batch.py);
            # splitting the major dim back to [n_tiles, T, S] is a free
            # bitcast
            band = band.reshape(
                n // batch.band_tile, batch.band_tile, -1
            )
    else:
        band = build_band_matrix(batch, dtype=band_dtype)
    degree = None
    if need_degree:
        # true in-degree over ALL original edges (band+spill+super+pad
        # self-loops on the dead row) — used by mean aggregation
        degree = segment.segment_count(
            batch.receivers, n, indices_are_sorted=True, mask=batch.edge_mask
        )
    if batch.has_supernode_edges:
        # nodes that receive the supernode broadcast: real nodes of graphs
        # with a supernode, except the supernode itself. Host-precomputed
        # at pack time (batch.super_mask); the scatter build remains for
        # legacy batches.
        if batch.super_mask is not None:
            super_gather_mask = batch.super_mask
        else:
            has_super = batch.supernode_index < batch.dead_node_index  # [G]
            node_has = has_super[batch.node_graph]
            is_super = jnp.zeros(n, bool).at[batch.supernode_index].set(
                has_super
            )
            mask = node_has & batch.node_mask & ~is_super
            super_gather_mask = mask.astype(jnp.float32)
    else:
        super_gather_mask = None
    return AggContext(batch=batch, band=band,
                      degree=degree, super_gather_mask=super_gather_mask,
                      band_dtype=band_dtype, use_pallas=use_pallas)


class _Static(NamedTuple):
    tile: int
    width: int
    n_graph_cap: int
    has_super: bool
    has_spill: bool
    has_spill2: bool
    use_pallas: bool
    interpret: bool
    x_dtype: str


def _sym_sum_impl(static: _Static, x, band, spill_s, spill_r, spill2_s,
                  spill2_r, spill_off, spill_lo, spill_hi, node_graph,
                  node_mask_f, supernode_index, super_mask_f):
    """Sum-aggregation over band + spill + supernode stars.

    The band matmul accumulates in f32 on the MXU but emits ``x.dtype``
    (the consumer is a Dense layer that casts to the compute dtype anyway).
    On the Pallas path the main spill list is FUSED into the kernel as
    per-tile one-hot matmuls (XLA's scatter-add for it lowers to a
    row-sequential loop costing ~2x the band matmul itself); only the rare
    per-tile-cap overflow list (`spill2`) scatter-adds here."""
    n, h = x.shape
    tile, width = static.tile, static.width
    if static.use_pallas:
        from buckgnn_tpu.ops.pallas_banded import pallas_banded_matmul

        # spill_off/lo/hi are precomputed on host at pack time
        # (graph/batch.py::_host_spill_ranges — jnp.searchsorted lowers to
        # a ~12 ms sequential while-loop on TPU); an all-padding spill list
        # skips the fused-spill machinery entirely (static flag)
        spill_kw = dict(spill_offsets=spill_off, spill_lo=spill_lo,
                        spill_hi=spill_hi, spill_messages=x[spill_s])
        agg = pallas_banded_matmul(band, x, tile, width,
                                   interpret=static.interpret,
                                   out_dtype=x.dtype,
                                   **(spill_kw if static.has_spill else {}))
    else:
        if jnp.issubdtype(band.dtype, jnp.integer):
            # narrow-feature fallback inside a Pallas-configured context
            band = band.astype(x.dtype)
        slab = tile + width
        n_tiles = n // tile
        starts = jnp.clip(
            jnp.arange(n_tiles) * tile - width // 2, 0, max(n - slab, 0)
        )
        slab_index = starts[:, None] + jnp.arange(slab)[None, :]
        xs = x[slab_index]
        agg = jax.lax.dot_general(
            band, xs.astype(band.dtype),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(n, h).astype(x.dtype)

    if not static.use_pallas and static.has_spill:
        # main spill handled inside the kernel on the Pallas path
        agg = agg.at[spill_r].add(x[spill_s], indices_are_sorted=True,
                                  unique_indices=False)
    if static.has_spill2:
        # per-tile-cap overflow
        agg = agg.at[spill2_r].add(x[spill2_s], indices_are_sorted=True,
                                   unique_indices=False)

    if static.has_super:
        sn = supernode_index  # [G]
        agg = agg + x[sn][node_graph] * super_mask_f[:, None]
        # per-graph sums ride the MXU via the one-hot matmul (segment.py)
        graph_sum = segment.segment_sum_dense(
            x, node_graph, static.n_graph_cap, keep=node_mask_f > 0
        )
        has_super = (sn < n - 1).astype(x.dtype)
        contrib = (graph_sum - x[sn]) * has_super[:, None]
        agg = agg.at[sn].add(contrib)
    return agg


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _sym_sum(static, x, band, spill_s, spill_r, spill2_s, spill2_r,
             spill_off, spill_lo, spill_hi, node_graph, node_mask_f,
             supernode_index, super_mask_f):
    """Sum-aggregation with a symmetry-based VJP.

    Every edge source in this framework materializes both directions
    (GraphCreate.py:417-422 parity), the supernode star is symmetric and
    dead-node padding self-loops are trivially symmetric — so the total
    adjacency A is symmetric and d/dx (A x)^T g = A g: the backward pass is
    the SAME kernel applied to the cotangent. This sidesteps a transposed
    Pallas kernel entirely. (Only the TOTAL A is symmetric; the individual
    band/spill/spill2/star pieces need not be.)
    """
    return _sym_sum_impl(static, x, band, spill_s, spill_r, spill2_s,
                         spill2_r, spill_off, spill_lo, spill_hi, node_graph,
                         node_mask_f, supernode_index, super_mask_f)


def _sym_sum_fwd(static, x, band, spill_s, spill_r, spill2_s, spill2_r,
                 spill_off, spill_lo, spill_hi, node_graph, node_mask_f,
                 supernode_index, super_mask_f):
    out = _sym_sum_impl(static, x, band, spill_s, spill_r, spill2_s,
                        spill2_r, spill_off, spill_lo, spill_hi, node_graph,
                        node_mask_f, supernode_index, super_mask_f)
    return out, (band, spill_s, spill_r, spill2_s, spill2_r, spill_off,
                 spill_lo, spill_hi, node_graph, node_mask_f,
                 supernode_index, super_mask_f)


def _zero_tangent(v):
    if jnp.issubdtype(v.dtype, jnp.integer) or v.dtype == jnp.bool_:
        return np.zeros(v.shape, dtypes.float0)
    return jnp.zeros_like(v)


def _sym_sum_bwd(static, res, g):
    (band, spill_s, spill_r, spill2_s, spill2_r, spill_off, spill_lo,
     spill_hi, node_graph, node_mask_f, sn, super_mask_f) = res
    dx = _sym_sum_impl(static, g.astype(static.x_dtype), band, spill_s,
                       spill_r, spill2_s, spill2_r, spill_off, spill_lo,
                       spill_hi, node_graph,
                       node_mask_f.astype(static.x_dtype),
                       sn, super_mask_f.astype(static.x_dtype))
    dx = dx.astype(static.x_dtype)
    return (dx, _zero_tangent(band), _zero_tangent(spill_s),
            _zero_tangent(spill_r), _zero_tangent(spill2_s),
            _zero_tangent(spill2_r), _zero_tangent(spill_off),
            _zero_tangent(spill_lo), _zero_tangent(spill_hi),
            _zero_tangent(node_graph),
            jnp.zeros_like(node_mask_f), _zero_tangent(sn),
            jnp.zeros_like(super_mask_f))


_sym_sum.defvjp(_sym_sum_fwd, _sym_sum_bwd)


def banded_sage_aggregate(x: jnp.ndarray, ctx: AggContext,
                          aggr: str = "add") -> jnp.ndarray:
    """Neighbor aggregation equal to `sage_aggregate` over the full edge set.

    Requires a symmetric edge set (both directions materialized) — the
    invariant of every graph source in this framework.
    """
    batch = ctx.batch
    if ctx.part is not None:
        # edge-partitioned multi-device path: node rows sharded over the
        # 'model' axis, halo exchange + spill all_to_all over ICI
        from buckgnn_tpu.parallel.partitioned import (
            partitioned_sage_aggregate,
        )

        return partitioned_sage_aggregate(x, ctx.part, aggr=aggr)
    if ctx.band is None or aggr == "max":
        # no banded data (or unsupported aggr): plain gather path
        from buckgnn_tpu.ops.sage import sage_aggregate

        return sage_aggregate(x, batch.senders, batch.receivers,
                              batch.n_node_cap, aggr=aggr)
    static = _Static(
        tile=batch.band_tile,
        width=batch.band_width,
        n_graph_cap=batch.n_graph_cap,
        has_super=batch.has_supernode_edges,
        has_spill=batch.has_spill_edges,
        has_spill2=batch.has_spill2_edges,
        # Mosaic requires the feature dim aligned to the 128-lane tiling;
        # narrow models (SAG score convs, tiny test nets) use the XLA slab
        # matmul instead
        use_pallas=ctx.use_pallas and x.shape[1] % 128 == 0,
        interpret=jax.default_backend() == "cpu",
        x_dtype=str(x.dtype),
    )
    node_mask_f = batch.node_mask.astype(x.dtype)
    # keep the broadcast mask in the compute dtype: a f32 mask silently
    # promotes the [N, H] supernode-broadcast product (and everything
    # downstream of it) to f32 — measured ~0.7 ms/layer extra on a v5e
    super_mask_f = (
        ctx.super_gather_mask.astype(x.dtype)
        if ctx.super_gather_mask is not None
        else jnp.zeros((batch.n_node_cap,), x.dtype)
    )
    agg = _sym_sum(static, x, ctx.band, batch.spill_senders,
                   batch.spill_receivers, batch.spill2_senders,
                   batch.spill2_receivers, batch.spill_offsets,
                   batch.spill_lo, batch.spill_hi, batch.node_graph,
                   node_mask_f, batch.supernode_index, super_mask_f)
    if aggr in ("add", "sum"):
        return agg
    if aggr == "mean":
        degree = ctx.degree
        if degree is None:  # context built with need_degree=False
            degree = segment.segment_count(
                batch.receivers, batch.n_node_cap,
                indices_are_sorted=True, mask=batch.edge_mask,
            )
        return agg / jnp.maximum(degree, 1.0)[:, None]
    raise ValueError(f"Unsupported banded aggregation: {aggr}")
