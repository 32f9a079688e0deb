"""Fixed-capacity, statically-shaped graph batching.

TPU-native replacement for the reference's PyG ``DataLoader`` block-diagonal
collation (reference: TRAIN_FINAL.py:1298-1299, torch_geometric.loader).
XLA compiles one program per tensor shape, so variable-size FE-mesh graphs are
packed into *fixed-capacity* buffers chosen from a small bucket table; padding
is organised so the hot compute path needs **no masking at all**:

- The last graph slot (``G_cap - 1``) is a reserved *padding graph*.
- The last node slot (``N_cap - 1``) is a reserved *dead node* that belongs to
  the padding graph. Padding edges have ``senders == receivers == N_cap - 1``,
  so scatter/segment aggregation over padding edges only ever touches the dead
  node, and graph pooling over padding nodes only ever lands in the padding
  graph slot. Real rows are untouched without a single ``where``.
- Masks (`node_mask`/`edge_mask`/`graph_mask`) are still carried for the few
  ops that need true statistics (masked BatchNorm, losses, metrics).

Edges are stored *receiver-sorted* with CSR ``row_offsets`` so segment
reductions can use ``indices_are_sorted=True`` and Pallas kernels can tile
rows directly.

The supernode convention matches the reference: the supernode is the last
real node of each graph's segment and its last feature equals 1
(reference: Models/BuckGNN.py:255-271,315-320; VirtualEdgeCreate.py:81-113).
`supernode_index` additionally records the flat index per graph so pooling is
a gather instead of the reference's Python loop over ``batch``.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Sequence

import numpy as np
import jax.numpy as jnp
from flax import struct


@dataclasses.dataclass
class GraphData:
    """One host-side graph (NumPy). The unit produced by the data pipeline.

    ``senders``/``receivers`` already contain both directions of each
    undirected edge (the reference emits both directions,
    GraphCreate.py:417-422).
    """

    x: np.ndarray          # [n, F] float32 node features
    senders: np.ndarray    # [e] int32
    receivers: np.ndarray  # [e] int32
    edge_attr: np.ndarray  # [e, Fe] float32
    y: np.ndarray          # [Ty] graph target or [n, Ty] node target
    # Flat local index of the supernode (== n-1 when present), else -1.
    supernode: int = -1
    # Optional extras mirroring PyG Data attributes used by the reference.
    eigenvalue: float | None = None      # mode_shape runs keep it (GraphCreate.py:548-549)
    mode_shapes: np.ndarray | None = None  # buckling runs keep it (GraphCreate.py:551-552)
    file_path: str | None = None

    @property
    def n_node(self) -> int:
        return int(self.x.shape[0])

    @property
    def n_edge(self) -> int:
        return int(self.senders.shape[0])


@struct.dataclass
class GraphBatch:
    """Device-side fixed-capacity batch; a pytree of statically-shaped arrays.

    The optional *banded* fields hold a block-banded adjacency decomposition
    for the SAGE hot path (see `ops.banded`): under a locality-preserving
    node order, nearly all mesh edges fall inside a band of width W around
    the diagonal, so neighbor aggregation becomes dense [T, T+W] x [T+W, H]
    slab matmuls on the MXU with no gather/scatter; out-of-band edges spill
    to a small gather list, and supernode star edges are handled exactly via
    per-graph segment ops.
    """

    nodes: jnp.ndarray            # [N_cap, F]  float
    edges: jnp.ndarray            # [E_cap, Fe] float
    senders: jnp.ndarray          # [E_cap] int32 (message source)
    receivers: jnp.ndarray        # [E_cap] int32 (message target; ascending)
    node_graph: jnp.ndarray       # [N_cap] int32 (pad nodes -> G_cap-1)
    node_mask: jnp.ndarray        # [N_cap] bool
    edge_mask: jnp.ndarray        # [E_cap] bool
    graph_mask: jnp.ndarray       # [G_cap] bool (pad graph slot always False)
    y: jnp.ndarray                # [G_cap, Ty] graph- or [N_cap, Ty] node-level
    supernode_index: jnp.ndarray  # [G_cap] int32 (dead node for absent)
    row_offsets: jnp.ndarray      # [N_cap+1] int32 CSR offsets (receiver-sorted)
    n_real_node: jnp.ndarray      # [G_cap] int32 per-graph real node counts
    # ---- optional banded decomposition (None unless band_width was set) ----
    band_senders: jnp.ndarray | None = None     # [Eb] in-band edges
    band_receivers: jnp.ndarray | None = None   # [Eb]
    spill_senders: jnp.ndarray | None = None    # [Es] out-of-band edges
    spill_receivers: jnp.ndarray | None = None  # [Es] (receiver-sorted,
    #   <= SPILL_CHUNK-7 per receiver tile: kernel-fused as one-hot matmuls)
    spill2_senders: jnp.ndarray | None = None   # [E2] per-tile cap overflow
    spill2_receivers: jnp.ndarray | None = None  # [E2] (scatter-add path)
    # host-precomputed fused-spill geometry (see _host_spill_ranges)
    spill_offsets: jnp.ndarray | None = None    # [n_tiles+1] int32
    spill_lo: jnp.ndarray | None = None         # [n_tiles, T, 1] int32
    spill_hi: jnp.ndarray | None = None         # [n_tiles, T, 1] int32
    # [n_tiles, T, S] int8 adjacency counts, materialized at pack time on
    # host so the hot path never scatter-builds it; the Pallas kernel reads
    # the int8 directly (the XLA slab path casts in make_agg_context)
    band: jnp.ndarray | None = None
    # host-precomputed supernode-star code vectors (analytic supernode
    # only; XLA scatter-built equivalents cost ~0.9 ms/step on a v5e):
    # gcode[r]  — APPLY code: which correction-table row node r selects
    #             (g for star-broadcast receivers, G+g for the supernode,
    #             sentinel tg otherwise);
    # gacc[r]   — ACCUMULATE code: which table row node r's features sum
    #             into when building the NEXT layer's table (g for
    #             supernode rows -> t1, G+g for real non-super rows -> t2,
    #             sentinel otherwise);
    # super_mask — 1.0 on star-broadcast receivers (make_agg_context's
    #             super_gather_mask, host-built).
    gcode: jnp.ndarray | None = None        # [n_tiles, T, 1] int32
    gacc: jnp.ndarray | None = None         # [n_tiles, 1, T] int32
    super_mask: jnp.ndarray | None = None   # [N] float32
    # per-tile LOCAL star-table windows: graphs pack contiguously, so a
    # node tile intersects only a few graphs — the fused kernels select
    # against a [2*LOCAL_STAR_ROWS, H] slice of the correction table
    # (K=32 matmul) instead of the full [tg, H] (K~tg, measured
    # 0.23 ms/layer at flagship shape). gwin[t] is the 8-aligned window
    # base (codes [wb, wb+GW) in the broadcast half and [T0+wb, ..) in
    # the star half); lcode/lacc are gcode/gacc re-encoded relative to
    # the window (member -> g-wb, star row -> GW+(g-wb), sentinel 2GW).
    # None when any tile's graph span exceeds LOCAL_STAR_ROWS (tiny
    # graphs) — kernels then use the full-table path.
    gwin: jnp.ndarray | None = None         # [n_tiles] int32
    lcode: jnp.ndarray | None = None        # [n_tiles, T, 1] int32
    lacc: jnp.ndarray | None = None         # [n_tiles, 1, T] int32
    # optional edge-partitioned shards for the multi-device 'model' path
    # (parallel/partitioned.py::PartitionedBatch, attached via
    # `batch.replace(part=partition_batch(batch, D))`)
    part: object | None = None
    # optional tile-sharded EA window shards for the edge-dense family's
    # 'model' path (parallel/ea_shard.py::EAShards, attached via
    # `batch.replace(ea_part=shard_ea_batch(batch, D))`)
    ea_part: object | None = None
    # ---- per-receiver-tile edge WINDOWS (edge-dense models) ----
    # Edges are receiver-sorted, so each node tile owns one contiguous
    # edge range; host-reshaping them into fixed [n_tiles, W] windows lets
    # edge-augmented models (EA_GNN) replace XLA row gathers/scatters
    # (~40 ns/row) with dense batched one-hot matmuls (ops/ea_windowed.py):
    # win_edges — windowed raw edge features (pad rows zero);
    # win_sidx  — sender offset inside the tile's x-slab (sentinel `slab`
    #             for out-of-band senders and pads);
    # win_ridx  — receiver offset inside the tile (sentinel `tile` for
    #             pads);
    # win_far_pos/send — flat [t*W+w] positions and global senders of the
    #             out-of-band edges (scatter-corrected; pads point at the
    #             dead node whose features are zero).
    win_edges: jnp.ndarray | None = None     # [n_tiles, W, Fe]
    win_sidx: jnp.ndarray | None = None      # [n_tiles, W] int32
    win_ridx: jnp.ndarray | None = None      # [n_tiles, W] int32
    win_far_pos: jnp.ndarray | None = None   # [F_cap] int32
    win_far_send: jnp.ndarray | None = None  # [F_cap] int32
    # TILED far layout for the fused EA block kernel
    # (ops/pallas_ea_block.py): the same out-of-band edges regrouped per
    # receiver tile with a uniform per-tile cap Ct. win_far_tsend[t, j]
    # is far row j's global sender id (dead node for pads); its window
    # slot is encoded in win_sidx as the EXTENDED-slab code slab + j, so
    # the kernel's single [W, slab + Ct] selection matmul covers in-band
    # and far senders alike (win pads carry FAR_SLOT_SENTINEL — a code no
    # slab extension can reach, so cap widening never aliases a row).
    win_far_tsend: jnp.ndarray | None = None  # [n_tiles, Ct] int32
    # sender-sorted view of the SAME far rows for the fused-EA backward's
    # dx fold: win_fs_src[ts, c] is the flat tiled-far index (t*Ct + j)
    # of the c-th far row whose SENDER lies in tile ts, win_fs_lidx its
    # sender's tile-local row (sentinel band_tile for pads). Replaces an
    # XLA row scatter-add (~40 ns/row) with a gather + per-sender-tile
    # one-hot matmul.
    win_fs_src: jnp.ndarray | None = None    # [n_tiles, Cs] int32
    win_fs_lidx: jnp.ndarray | None = None   # [n_tiles, Cs] int32
    # static metadata (not traced)
    band_tile: int | None = struct.field(pytree_node=False, default=None)
    band_width: int | None = struct.field(pytree_node=False, default=None)
    has_supernode_edges: bool = struct.field(pytree_node=False, default=False)
    # static emptiness flags: spill lists that contain only dead-node
    # padding let the compute path skip the spill machinery entirely
    has_spill_edges: bool = struct.field(pytree_node=False, default=True)
    has_spill2_edges: bool = struct.field(pytree_node=False, default=True)

    @property
    def n_node_cap(self) -> int:
        return self.nodes.shape[0]

    @property
    def n_edge_cap(self) -> int:
        return self.senders.shape[0]

    @property
    def n_graph_cap(self) -> int:
        return self.graph_mask.shape[0]

    @property
    def dead_node_index(self) -> int:
        return self.nodes.shape[0] - 1

    def num_graphs(self) -> jnp.ndarray:
        return jnp.sum(self.graph_mask.astype(jnp.int32))


def _round_up(x: int, multiple: int) -> int:
    return ((x + multiple - 1) // multiple) * multiple


def capacity_for(
    graphs: Sequence[GraphData],
    node_multiple: int = 8,
    edge_multiple: int = 128,
) -> tuple[int, int, int]:
    """Pick (N_cap, E_cap, G_cap) for a list of graphs.

    +1 node for the dead-node slot, +1 graph for the padding graph; rounded up
    to TPU-friendly multiples (sublane 8 for nodes; lane 128 for the edge
    dimension that Pallas kernels tile over).
    """
    n = sum(g.n_node for g in graphs) + 1
    e = sum(g.n_edge for g in graphs)
    return (
        _round_up(n, node_multiple),
        max(_round_up(e, edge_multiple), edge_multiple),
        len(graphs) + 1,
    )


# Fused-spill geometry (ops/pallas_banded.py): per node tile the kernel
# DMAs one contiguous SPILL_CHUNK-row window of receiver-sorted spill
# messages (window start aligned down to SPILL_ALIGN rows — the bf16
# sublane tile, so the DMA never pays a re-tiling copy) and applies it as
# a one-hot matmul on the MXU. A tile can therefore absorb at most
# SPILL_CHUNK - SPILL_ALIGN + 1 spill edges; the excess goes to the
# `spill2` residual list handled by a plain scatter-add (normally empty).
# The last tile also hosts the dead-node padding entries (up to
# SPILL_CHUNK - 10 of them when the real spill count is small; coverage is
# guaranteed by the window-invariant assert in _host_spill_ranges).
SPILL_CHUNK = 256
SPILL_ALIGN = 16

# Pad sentinel for GraphBatch.win_far_slot: a window-slot value no real
# window can reach, and NOT tied to the window cap W so widening windows
# (batch_iterator run-uniform caps) never turns a pad into a real slot.
FAR_SLOT_SENTINEL = np.int32(1 << 30)

# Rows per half of the per-tile local star-table window (GraphBatch.gwin
# / lcode / lacc). Fixed (not data-derived) so every batch of a run
# shares one treedef; batches whose tiles span more graphs than this
# fall back to the full-table selection path.
LOCAL_STAR_ROWS = 16


def star_table_geometry(g_cap: int) -> tuple[int, int]:
    """(T0, tg) for the supernode star correction table.

    Broadcast rows (each graph's supernode features) live at [0, g_cap);
    star-sum rows (graph_sum - supernode) at [T0, T0 + g_cap). T0 is
    8-row aligned so per-tile local windows (gwin) slice BOTH halves at
    sublane-aligned offsets; total rows tg = 2*T0 doubles as the
    sentinel code that selects nothing.
    """
    t0 = ((g_cap + 7) // 8) * 8
    return t0, 2 * t0
_SPILL_TILE_CAP = SPILL_CHUNK - SPILL_ALIGN + 1
_SPILL_TILE_CAP_LAST = _SPILL_TILE_CAP - 127


def _band_split(
    senders: np.ndarray,
    receivers: np.ndarray,
    edge_valid: np.ndarray,
    supernode_index: np.ndarray,
    n_real_node: np.ndarray,
    node_graph: np.ndarray,
    n_node_cap: int,
    tile: int,
    width: int,
    analytic_supernode: bool = True,
):
    """Split edges into (band, spill, spill-overflow, supernode-star)
    classes for the banded SAGE path. Returns (band_s, band_r, spill_s,
    spill_r, spill2_s, spill2_r, has_super_edges) with all lists padded to
    a multiple of 128 with dead-node self-loops (the main spill list to at
    least SPILL_CHUNK so the kernel's DMA window always fits).

    ``analytic_supernode=False`` leaves supernode star edges in the normal
    band/spill classes (functionally identical, skips the per-graph
    analytic aggregation path).
    """
    dead = n_node_cap - 1
    slab = tile + width
    is_super = np.zeros(n_node_cap, dtype=bool)
    real_super = supernode_index < dead
    is_super[supernode_index[real_super]] = True

    touches_super = is_super[senders] | is_super[receivers]
    has_super_edges = False
    super_edge = np.zeros_like(touches_super)
    if analytic_supernode and touches_super.any():
        # Only special-case when every supernode forms a FULL star
        # (2*(n_g - 1) directed edges), which the builders guarantee; the
        # analytic aggregation path assumes exactly that pattern.
        count = np.zeros(len(supernode_index), dtype=np.int64)
        gids = node_graph[
            np.where(is_super[senders], receivers, senders)
        ]
        np.add.at(count, gids[touches_super & edge_valid], 1)
        expected = np.where(real_super, 2 * (n_real_node - 1), 0)
        if np.array_equal(count, expected):
            has_super_edges = True
            super_edge = touches_super & edge_valid

    cand = edge_valid & ~super_edge
    t = receivers // tile
    start = np.clip(t * tile - width // 2, 0, max(n_node_cap - slab, 0))
    k = senders - start
    inband = cand & (k >= 0) & (k < slab)
    spill = cand & ~inband

    def pad_sorted(s, r, k=None, min_len=128):
        # sort by r (and slab offset k when given, so the device-side band
        # scatter sees fully sorted flat indices — ops/banded.py)
        order = (np.argsort(r, kind="stable") if k is None
                 else np.lexsort((k, r)))
        s, r = s[order], r[order]
        n = len(s)
        m = max(_round_up(n, 128), min_len)
        ps = np.full(m, dead, np.int32)
        pr = np.full(m, dead, np.int32)
        ps[:n], pr[:n] = s, r
        return ps, pr

    band_s, band_r = pad_sorted(senders[inband], receivers[inband],
                                k[inband])

    # Per-tile spill cap: the first cap entries of each receiver tile stay
    # in the kernel-fused main list, the rest overflow to the scatter list.
    sp_s, sp_r = senders[spill], receivers[spill]
    order = np.argsort(sp_r, kind="stable")
    sp_s, sp_r = sp_s[order], sp_r[order]
    tiles = sp_r // tile
    n_tiles = n_node_cap // tile
    caps = np.full(n_tiles, _SPILL_TILE_CAP, np.int64)
    caps[n_tiles - 1] = _SPILL_TILE_CAP_LAST
    first = np.searchsorted(tiles, np.arange(n_tiles))
    rank = np.arange(len(sp_r)) - first[tiles]
    main = rank < caps[tiles]
    spill_s, spill_r = pad_sorted(sp_s[main], sp_r[main],
                                  min_len=SPILL_CHUNK)
    spill2_s, spill2_r = pad_sorted(sp_s[~main], sp_r[~main])
    return (band_s, band_r, spill_s, spill_r, spill2_s, spill2_r,
            has_super_edges)


def _host_spill_ranges(spill_r: np.ndarray, n_node_cap: int, tile: int):
    """Window offsets + per-node [lo, hi) column ranges for the kernel-fused
    spill (ops/pallas_banded.py). Host-side: jnp.searchsorted lowers to a
    sequential while-loop on TPU (~12 ms per call at flagship shape)."""
    n_tiles = n_node_cap // tile
    es = len(spill_r)
    off = np.searchsorted(
        spill_r, np.arange(n_tiles + 1) * tile
    ).astype(np.int32)
    win = np.clip((off[:-1] // SPILL_ALIGN) * SPILL_ALIGN,
                  0, es - SPILL_CHUNK)
    # Window-coverage invariant (checked, not implied): every tile's REAL
    # spill rows must fit its SPILL_CHUNK window. _band_split's per-tile
    # caps guarantee this; fail loudly if the padding rule or SPILL_CHUNK
    # ever changes. Dead-node padding rows (receiver == dead, sorted last)
    # are exempt: run-uniform spill caps (_pad_spill_to) can append far
    # more than one window of them, and rows outside every window are
    # simply never applied — inert by construction.
    real_stop = np.searchsorted(spill_r, n_node_cap - 1, "left")
    assert np.all(np.minimum(off[1:], real_stop) - win <= SPILL_CHUNK), (
        "spill window overflow: a tile's spill rows exceed its DMA window"
    )
    ids = np.arange(n_node_cap)
    lo = np.searchsorted(spill_r, ids, "left").reshape(n_tiles, tile)
    hi = np.searchsorted(spill_r, ids, "right").reshape(n_tiles, tile)
    lo = np.clip(lo - win[:, None], 0, SPILL_CHUNK)
    hi = np.clip(hi - win[:, None], 0, SPILL_CHUNK)
    # [n_tiles, T, 1] column vectors: broadcast against the kernel's
    # [T, chunk] column iota with no relayout; the trailing singleton
    # satisfies Mosaic's last-two-dims block tiling rule
    return (off, lo.astype(np.int32)[..., None],
            hi.astype(np.int32)[..., None])


def _host_band_matrix(band_s: np.ndarray, band_r: np.ndarray,
                      n_node_cap: int, tile: int, width: int) -> np.ndarray:
    """[n_tiles, T, S] int8 adjacency counts, built once per batch on host
    (ops/banded.py::build_band_matrix is the device-side equivalent, kept
    for batches packed without materialization). int8 so the Pallas kernel
    reads it directly (half the HBM traffic of bf16, no per-step convert).
    Pad self-loops all stack on one dead-node cell and are clipped to 127 —
    harmless, the dead row is never read back."""
    slab = tile + width
    n_tiles = n_node_cap // tile
    t = band_r // tile
    start = np.clip(t * tile - width // 2, 0, max(n_node_cap - slab, 0))
    k = band_s - start
    band = np.zeros(n_node_cap * slab, dtype=np.int32)
    np.add.at(band, band_r.astype(np.int64) * slab + k, 1)
    # Only the dead-node cell (where ALL pad self-loops stack) may exceed
    # the int8 range; a real (sender, receiver) pair with >127 parallel
    # duplicate edges would silently lose aggregation weight — fail loudly.
    dead_cell = (n_node_cap - 1) * slab + ((n_node_cap - 1) - np.clip(
        ((n_node_cap - 1) // tile) * tile - width // 2,
        0, max(n_node_cap - slab, 0)))
    live = band > 127
    live[dead_cell] = False
    assert not live.any(), (
        "band overflow: >127 duplicate edges between one (sender, receiver) "
        "pair cannot be represented in the int8 band"
    )
    return np.minimum(band, 127).astype(np.int8).reshape(n_tiles, tile, slab)


def pack_graphs(
    graphs: Sequence[GraphData],
    n_node_cap: int,
    n_edge_cap: int,
    n_graph_cap: int,
    np_dtype=np.float32,
    band_width: int | None = None,
    band_tile: int = 256,
    materialize_band: bool = True,
    analytic_supernode: bool = True,
) -> GraphBatch:
    """Pack host graphs into one fixed-capacity `GraphBatch`.

    Pure NumPy (host-side ETL); the result converts lazily to device arrays
    when first used under jit.
    """
    n_real = sum(g.n_node for g in graphs)
    e_real = sum(g.n_edge for g in graphs)
    if n_real + 1 > n_node_cap:
        raise ValueError(
            f"node overflow: {n_real} real nodes + dead node > cap {n_node_cap}"
        )
    if e_real > n_edge_cap:
        raise ValueError(f"edge overflow: {e_real} > cap {n_edge_cap}")
    if len(graphs) + 1 > n_graph_cap:
        raise ValueError(f"graph overflow: {len(graphs)} + pad > cap {n_graph_cap}")

    f_dim = graphs[0].x.shape[1]
    fe_dim = graphs[0].edge_attr.shape[1] if graphs[0].edge_attr.ndim == 2 else 0
    node_level_y = graphs[0].y.ndim == 2

    dead = n_node_cap - 1
    pad_graph = n_graph_cap - 1

    nodes = np.zeros((n_node_cap, f_dim), dtype=np_dtype)
    edges = np.zeros((n_edge_cap, fe_dim), dtype=np_dtype)
    senders = np.full((n_edge_cap,), dead, dtype=np.int32)
    receivers = np.full((n_edge_cap,), dead, dtype=np.int32)
    node_graph = np.full((n_node_cap,), pad_graph, dtype=np.int32)
    node_mask = np.zeros((n_node_cap,), dtype=bool)
    edge_mask = np.zeros((n_edge_cap,), dtype=bool)
    graph_mask = np.zeros((n_graph_cap,), dtype=bool)
    supernode_index = np.full((n_graph_cap,), dead, dtype=np.int32)
    n_real_node = np.zeros((n_graph_cap,), dtype=np.int32)

    ty = graphs[0].y.shape[-1] if graphs[0].y.ndim >= 1 else 1
    if node_level_y:
        y = np.zeros((n_node_cap, ty), dtype=np_dtype)
    else:
        y = np.zeros((n_graph_cap, ty), dtype=np_dtype)

    node_off = 0
    edge_off = 0
    for gi, g in enumerate(graphs):
        n, e = g.n_node, g.n_edge
        nodes[node_off : node_off + n] = g.x
        node_graph[node_off : node_off + n] = gi
        node_mask[node_off : node_off + n] = True
        graph_mask[gi] = True
        n_real_node[gi] = n
        if g.supernode >= 0:
            supernode_index[gi] = node_off + g.supernode
        if e:
            senders[edge_off : edge_off + e] = g.senders + node_off
            receivers[edge_off : edge_off + e] = g.receivers + node_off
            if fe_dim:
                edges[edge_off : edge_off + e] = g.edge_attr
            edge_mask[edge_off : edge_off + e] = True
        if node_level_y:
            y[node_off : node_off + n] = np.reshape(g.y, (n, ty))
        else:
            y[gi] = np.reshape(np.asarray(g.y, dtype=np_dtype), (ty,))
        node_off += n
        edge_off += e

    # Receiver-sort all edges (padding edges target the dead node == N_cap-1,
    # so a stable sort keeps them at the tail) and build CSR row offsets.
    order = np.argsort(receivers, kind="stable")
    senders = senders[order]
    receivers = receivers[order]
    edges = edges[order]
    edge_mask = edge_mask[order]
    row_offsets = np.zeros((n_node_cap + 1,), dtype=np.int32)
    np.cumsum(np.bincount(receivers, minlength=n_node_cap), out=row_offsets[1:])

    band_kw: dict = {}
    if band_width is not None:
        if n_node_cap % band_tile:
            raise ValueError(
                f"banded packing needs n_node_cap % {band_tile} == 0"
            )
        if n_node_cap < band_tile + band_width:
            raise ValueError("n_node_cap smaller than one slab")
        bs, br, ss, sr, ss2, sr2, has_super = _band_split(
            senders, receivers, edge_mask, supernode_index, n_real_node,
            node_graph, n_node_cap, band_tile, band_width,
            analytic_supernode=analytic_supernode,
        )
        s_off, s_lo, s_hi = _host_spill_ranges(sr, n_node_cap, band_tile)
        super_kw: dict = {}
        if has_super:
            g_cap = n_graph_cap
            t0, tg = star_table_geometry(g_cap)
            is_super = np.zeros(n_node_cap, dtype=bool)
            real_super = supernode_index < dead
            is_super[supernode_index[real_super]] = True
            graph_has = np.zeros(n_graph_cap, dtype=bool)
            graph_has[np.nonzero(real_super)[0]] = True
            member = graph_has[node_graph] & node_mask & ~is_super
            g = node_graph.astype(np.int64)
            gcode_host = np.where(member, g,
                                  np.where(is_super, t0 + g, tg))
            gacc_host = np.where(is_super, g,
                                 np.where(node_mask, t0 + g, tg))
            # pre-shaped for the kernels' BlockSpecs (a per-step reshape
            # from [N] re-tiles the array: ~0.17 ms on a v5e). gcode is a
            # [T, 1] column (selects table rows per node); gacc is a
            # [1, T] row (builds the one-hot already transposed so the
            # accumulation matmul needs no in-kernel relayout).
            n_tiles_b = n_node_cap // band_tile
            super_kw = dict(
                gcode=jnp.asarray(
                    gcode_host.astype(np.int32).reshape(
                        n_tiles_b, band_tile, 1
                    )
                ),
                gacc=jnp.asarray(
                    gacc_host.astype(np.int32).reshape(
                        n_tiles_b, 1, band_tile
                    )
                ),
                super_mask=jnp.asarray(member.astype(np.float32)),
            )
            # per-tile local star-table windows (see GraphBatch.gwin):
            # graphs pack contiguously, so the non-sentinel codes of one
            # tile span a short contiguous graph range
            # gw depends only on g_cap (uniform across a run's batches);
            # the kernels derive the same value from tg
            gw = min(LOCAL_STAR_ROWS, t0)
            coded = (gcode_host != tg) | (gacc_host != tg)
            gv = np.where(coded, g, np.iinfo(np.int64).max).reshape(
                n_tiles_b, band_tile)
            gx = np.where(coded, g, -1).reshape(n_tiles_b, band_tile)
            gmin, gmax = gv.min(axis=1), gx.max(axis=1)
            nonempty = gmax >= 0
            base = np.where(nonempty, (np.minimum(gmin, gmax) // 8) * 8, 0)
            span = np.where(nonempty, gmax - base + 1, 0)
            if int(span.max(initial=0)) <= gw:
                # clamped windows still cover: base > t0-gw implies
                # gmin > t0-gw, and gmax <= g_cap-1 <= t0-1 < wb+gw
                wb = np.clip(base, 0, t0 - gw).astype(np.int64)
                rel = g - np.repeat(wb, band_tile)
                lcode_host = np.where(
                    member, rel, np.where(is_super, gw + rel, 2 * gw))
                lacc_host = np.where(
                    is_super, rel,
                    np.where(node_mask, gw + rel, 2 * gw))
                super_kw.update(
                    gwin=jnp.asarray(wb.astype(np.int32)),
                    lcode=jnp.asarray(lcode_host.astype(np.int32).reshape(
                        n_tiles_b, band_tile, 1)),
                    lacc=jnp.asarray(lacc_host.astype(np.int32).reshape(
                        n_tiles_b, 1, band_tile)),
                )
        win_kw: dict = {}
        if fe_dim:
            # per-receiver-tile edge windows for edge-dense models
            # (ops/ea_windowed.py). batch_iterator pads every batch to
            # the run-wide W/F maxima, so fine-grained rounding here is
            # safe and trims window padding (every pad slot pays full
            # edge-MLP work: the old 128-multiple rounding cost ~9% of
            # the EA step at flagship shape).
            n_tiles_b = n_node_cap // band_tile
            slab = band_tile + band_width
            valid = edge_mask
            tile_of = receivers // band_tile
            counts = np.bincount(tile_of[valid], minlength=n_tiles_b)
            w_cap = ((max(int(counts.max(initial=0)), 8) + 7) // 8) * 8
            w_edges = np.zeros((n_tiles_b, w_cap, fe_dim), dtype=np_dtype)
            # pad slots carry FAR_SLOT_SENTINEL (not `slab`): any code
            # >= slab is inert for the one-hot gathers, but extended-slab
            # far codes occupy [slab, slab + Ct) and Ct can widen across
            # runs — the sentinel must stay unreachable
            w_sidx = np.full((n_tiles_b, w_cap), FAR_SLOT_SENTINEL,
                             dtype=np.int32)
            w_ridx = np.full((n_tiles_b, w_cap), band_tile, dtype=np.int32)
            starts = np.clip(
                np.arange(n_tiles_b) * band_tile - band_width // 2,
                0, max(n_node_cap - slab, 0),
            )
            idx_v = np.nonzero(valid)[0]  # receiver-ascending by packing
            t_val = tile_of[idx_v]
            off = np.zeros(n_tiles_b + 1, dtype=np.int64)
            off[1:] = np.cumsum(counts)
            pos = np.arange(len(idx_v)) - off[t_val]
            w_edges[t_val, pos] = edges[idx_v]
            loc = senders[idx_v].astype(np.int64) - starts[t_val]
            inb = (loc >= 0) & (loc < slab)
            w_sidx[t_val, pos] = np.where(inb, loc, slab).astype(np.int32)
            w_ridx[t_val, pos] = (
                receivers[idx_v] - t_val * band_tile
            ).astype(np.int32)
            far = ~inb
            f_cnt = int(far.sum())
            f_cap = ((max(f_cnt, 8) + 511) // 512) * 512
            # pad positions are OUT OF BOUNDS on purpose: the scatter-add
            # runs with mode="drop", which zeroes them in the FORWARD and
            # the BACKWARD (an in-bounds dummy would leak that position's
            # cotangent into d x[dead] -> wrong encoder grads)
            far_pos = np.full((f_cap,), n_tiles_b * w_cap, dtype=np.int32)
            far_send = np.full((f_cap,), dead, dtype=np.int32)
            far_pos[:f_cnt] = (t_val[far] * w_cap + pos[far]).astype(
                np.int32
            )
            far_send[:f_cnt] = senders[idx_v][far]
            # tiled far layout (fused EA block kernel): the same far rows
            # regrouped per receiver tile under a uniform per-tile cap,
            # with each far slot's win_sidx re-coded to the EXTENDED-slab
            # index slab + rank (kernels then cover in-band and far
            # senders with ONE selection matmul). t_val[far] is ascending
            # (idx_v is receiver-ascending), so within-tile ranks come
            # from subtracting first occurrences.
            t_far = t_val[far]
            per_tile = np.bincount(t_far, minlength=n_tiles_b)
            ct_cap = ((max(int(per_tile.max(initial=0)), 8) + 7) // 8) * 8
            far_tsend = np.full((n_tiles_b, ct_cap), dead, np.int32)
            cs_cap = 8
            fs_src = np.zeros((n_tiles_b, cs_cap), np.int32)
            fs_lidx = np.full((n_tiles_b, cs_cap), band_tile, np.int32)
            if f_cnt:
                ranks = np.arange(f_cnt) - np.searchsorted(t_far, t_far)
                far_tsend[t_far, ranks] = senders[idx_v][far]
                w_sidx[t_far, pos[far]] = (slab + ranks).astype(np.int32)
                # sender-sorted view (win_fs_*): group the same far rows
                # by SENDER tile with tile-local rows
                f_send = senders[idx_v][far]
                k_flat = (t_far * ct_cap + ranks).astype(np.int64)
                s_tile_of = f_send // band_tile
                order = np.argsort(s_tile_of, kind="stable")
                fs_k = k_flat[order]
                fs_t = s_tile_of[order]
                fs_l = f_send[order] - fs_t * band_tile
                cnt_s = np.bincount(fs_t, minlength=n_tiles_b)
                cs_cap = ((max(int(cnt_s.max(initial=0)), 8) + 7) // 8) * 8
                fs_src = np.zeros((n_tiles_b, cs_cap), np.int32)
                fs_lidx = np.full((n_tiles_b, cs_cap), band_tile,
                                  np.int32)
                ranks_s = np.arange(len(fs_t)) - np.searchsorted(fs_t,
                                                                 fs_t)
                fs_src[fs_t, ranks_s] = fs_k.astype(np.int32)
                fs_lidx[fs_t, ranks_s] = fs_l.astype(np.int32)
            win_kw = dict(
                win_fs_src=jnp.asarray(fs_src),
                win_fs_lidx=jnp.asarray(fs_lidx),
                win_edges=jnp.asarray(w_edges),
                win_sidx=jnp.asarray(w_sidx),
                win_ridx=jnp.asarray(w_ridx),
                win_far_pos=jnp.asarray(far_pos),
                win_far_send=jnp.asarray(far_send),
                win_far_tsend=jnp.asarray(far_tsend),
            )
        super_kw.update(win_kw)
        band_kw = dict(
            **super_kw,
            band_senders=jnp.asarray(bs),
            band_receivers=jnp.asarray(br),
            spill_senders=jnp.asarray(ss),
            spill_receivers=jnp.asarray(sr),
            spill2_senders=jnp.asarray(ss2),
            spill2_receivers=jnp.asarray(sr2),
            spill_offsets=jnp.asarray(s_off),
            spill_lo=jnp.asarray(s_lo),
            spill_hi=jnp.asarray(s_hi),
            has_spill_edges=bool(np.any(sr != n_node_cap - 1)),
            has_spill2_edges=bool(np.any(sr2 != n_node_cap - 1)),
            # stored 2D [n_tiles*T, S]: jnp.asarray of 3D int8 picks a
            # non-row-major device layout (major_to_minor (0,2,1)) and
            # every step then pays a ~0.126 ms relayout copy to the
            # kernels' row-major constraint. A 2D array is always
            # row-major and the consumer's 2D->3D reshape (splitting the
            # MAJOR dim) is a free bitcast (ops/banded.py).
            band=(
                jnp.asarray(
                    _host_band_matrix(bs, br, n_node_cap, band_tile,
                                      band_width).reshape(
                        n_node_cap, band_tile + band_width)
                )
                if materialize_band else None
            ),
            band_tile=band_tile,
            band_width=band_width,
            has_supernode_edges=has_super,
        )

    return GraphBatch(
        nodes=jnp.asarray(nodes),
        edges=jnp.asarray(edges),
        senders=jnp.asarray(senders),
        receivers=jnp.asarray(receivers),
        node_graph=jnp.asarray(node_graph),
        node_mask=jnp.asarray(node_mask),
        edge_mask=jnp.asarray(edge_mask),
        graph_mask=jnp.asarray(graph_mask),
        y=jnp.asarray(y),
        supernode_index=jnp.asarray(supernode_index),
        row_offsets=jnp.asarray(row_offsets),
        n_real_node=jnp.asarray(n_real_node),
        **band_kw,
    )


def _pad_spill_to(b: GraphBatch, es_cap: int, e2_cap: int,
                  eb_cap: int = 0) -> GraphBatch:
    """Grow a batch's band / spill / spill2 edge lists to run-uniform
    capacities by appending dead-node self-loop rows (receiver == dead
    sorts last, so the (r, k)-lexsorted / receiver-sorted orders are
    preserved) and recomputing the fused-spill window geometry. Padding
    rows are inert: band-matrix counts land on the dead row, and spill
    rows beyond the last tile's DMA window are never applied — see the
    coverage invariant in _host_spill_ranges."""
    kw = {}
    dead = b.n_node_cap - 1
    eb = int(b.band_senders.shape[0])
    if eb_cap > eb:
        bs_ = np.full(eb_cap, dead, np.int32)
        br_ = np.full(eb_cap, dead, np.int32)
        bs_[:eb] = np.asarray(b.band_senders)
        br_[:eb] = np.asarray(b.band_receivers)
        kw.update(band_senders=jnp.asarray(bs_),
                  band_receivers=jnp.asarray(br_))
    es = int(b.spill_senders.shape[0])
    if es_cap > es:
        ss = np.full(es_cap, dead, np.int32)
        sr = np.full(es_cap, dead, np.int32)
        ss[:es] = np.asarray(b.spill_senders)
        sr[:es] = np.asarray(b.spill_receivers)
        off, lo, hi = _host_spill_ranges(sr, b.n_node_cap, b.band_tile)
        kw.update(spill_senders=jnp.asarray(ss),
                  spill_receivers=jnp.asarray(sr),
                  spill_offsets=jnp.asarray(off),
                  spill_lo=jnp.asarray(lo),
                  spill_hi=jnp.asarray(hi))
    e2 = int(b.spill2_senders.shape[0])
    if e2_cap > e2:
        s2 = np.full(e2_cap, dead, np.int32)
        r2 = np.full(e2_cap, dead, np.int32)
        s2[:e2] = np.asarray(b.spill2_senders)
        r2[:e2] = np.asarray(b.spill2_receivers)
        kw.update(spill2_senders=jnp.asarray(s2),
                  spill2_receivers=jnp.asarray(r2))
    return b.replace(**kw) if kw else b


def batch_iterator(
    dataset: Sequence[GraphData],
    batch_size: int,
    n_node_cap: int,
    n_edge_cap: int,
    shuffle: bool = False,
    seed: int = 0,
    drop_remainder: bool = False,
    band_width: int | None = None,
    band_tile: int = 256,
    rcm: bool = False,
    materialize_band: bool = True,
    analytic_supernode: bool = True,
    min_win_cap: int = 0,
    min_far_cap: int = 0,
    min_far_tile_cap: int = 0,
    min_fs_cap: int = 0,
    min_spill_cap: int = 0,
    min_spill2_cap: int = 0,
    min_band_cap: int = 0,
    local_star_windows: bool = True,
) -> Iterator[GraphBatch]:
    """Yield fixed-shape GraphBatches (the DataLoader role, TRAIN_FINAL.py:1298).

    Every batch uses the SAME (N_cap, E_cap, G_cap=batch_size+1) so the
    training step compiles exactly once. Graphs that would overflow a batch's
    capacity spill to the next batch.

    ``rcm=True`` relabels each graph's nodes with a reverse Cuthill-McKee
    permutation before packing (C++ kernel when available) — required for
    good in-band fractions on arbitrary-order real meshes when band_width
    is set.

    NOTE: with ``band_width`` set this packs the ENTIRE dataset before
    yielding (run-uniform spill flags and edge-window caps need the full
    set) — the training loop keeps every batch resident anyway (one
    compiled shape, data reused each epoch), but callers that only want
    the first batch of a huge dataset should slice the dataset first.
    """
    if rcm:
        from buckgnn_tpu.graph.build import rcm_reorder

        dataset = [rcm_reorder(g) for g in dataset]
    idx = np.arange(len(dataset))
    if shuffle:
        np.random.default_rng(seed).shuffle(idx)

    def packed():
        cur: list[GraphData] = []
        cur_nodes = 0
        cur_edges = 0
        for i in idx:
            g = dataset[int(i)]
            if g.n_node + 1 > n_node_cap or g.n_edge > n_edge_cap:
                raise ValueError(
                    f"graph with {g.n_node} nodes / {g.n_edge} edges exceeds "
                    f"capacity ({n_node_cap}, {n_edge_cap})"
                )
            would_overflow = (
                len(cur) == batch_size
                or cur_nodes + g.n_node + 1 > n_node_cap
                or cur_edges + g.n_edge > n_edge_cap
            )
            if cur and would_overflow:
                yield pack_graphs(cur, n_node_cap, n_edge_cap, batch_size + 1,
                                  band_width=band_width, band_tile=band_tile,
                                  materialize_band=materialize_band,
                                  analytic_supernode=analytic_supernode)
                cur, cur_nodes, cur_edges = [], 0, 0
            cur.append(g)
            cur_nodes += g.n_node
            cur_edges += g.n_edge
        if cur and not drop_remainder:
            yield pack_graphs(cur, n_node_cap, n_edge_cap, batch_size + 1,
                              band_width=band_width, band_tile=band_tile,
                              materialize_band=materialize_band,
                              analytic_supernode=analytic_supernode)

    if band_width is None:
        yield from packed()
        return
    # Uniform treedef across the run: has_spill{,2}_edges are STATIC pytree
    # fields, so batches that differ would (a) recompile the train step per
    # flag combination and (b) break jax.tree.map stacking in the DP path.
    # OR the flags dataset-wide (a forced-on flag over an all-dead-padding
    # spill list is a no-op — dead-node rows absorb everything).
    batches = list(packed())
    any_spill = any(b.has_spill_edges for b in batches)
    any_spill2 = any(b.has_spill2_edges for b in batches)
    # band/spill edge-list capacities must also be run-uniform (one
    # compiled shape, DP stackability) — pad every batch to the run
    # maxima. The floors play the same role as min_win_cap for per-epoch
    # repacking.
    es_cap = max(max(int(b.spill_senders.shape[0]) for b in batches),
                 min_spill_cap)
    e2_cap = max(max(int(b.spill2_senders.shape[0]) for b in batches),
                 min_spill2_cap)
    eb_cap = max(max(int(b.band_senders.shape[0]) for b in batches),
                 min_band_cap)
    batches = [_pad_spill_to(b, es_cap, e2_cap, eb_cap) for b in batches]
    # local star-table windows are all-or-nothing across the run (same
    # treedef): if any batch's tiles span too many graphs, strip them all.
    # local_star_windows=False forces the global path up front — the
    # trainer feeds a fallback observed on an earlier repack back in so a
    # borderline dataset can't flip treedefs (and recompile) mid-training.
    if not local_star_windows or any(
        b.gcode is not None and b.gwin is None for b in batches
    ):
        batches = [
            b.replace(gwin=None, lcode=None, lacc=None) for b in batches
        ]
    # edge-window caps (W, F) must also match across batches for one
    # compiled shape / DP stacking — pad every batch to the run maxima
    # (pads carry sentinel indices / out-of-bounds positions, so they are
    # inert in both directions; see pack_graphs)
    # min_win_cap/min_far_cap: floors for the run-wide window caps, so a
    # caller that repacks per epoch (trainer repack_every_epoch) can keep
    # ONE compiled shape across shuffles by feeding back the largest caps
    # seen so far instead of recompiling whenever a shuffle shifts the max
    w_max = f_max = ft_max = cs_max = 0
    if batches and batches[0].win_edges is not None:
        w_max = max(max(b.win_edges.shape[1] for b in batches),
                    min_win_cap)
        f_max = max(max(b.win_far_pos.shape[0] for b in batches),
                    min_far_cap)
        ft_max = max(max(b.win_far_tsend.shape[1] for b in batches),
                     min_far_tile_cap)
        cs_max = max(max(b.win_fs_src.shape[1] for b in batches),
                     min_fs_cap)
    for b in batches:
        win_kw = {}
        if ft_max and b.win_far_tsend.shape[1] < ft_max:
            ct_old = b.win_far_tsend.shape[1]
            dft = ft_max - ct_old
            nt = b.win_far_tsend.shape[0]
            win_kw["win_far_tsend"] = jnp.concatenate(
                [b.win_far_tsend,
                 jnp.full((nt, dft), b.n_node_cap - 1, jnp.int32)],
                axis=1)
            # fs_src flat indices stride by Ct — re-map to the widened
            # stride (pads are 0 -> stay 0; lidx sentinel guards them)
            win_kw["win_fs_src"] = (
                (b.win_fs_src // ct_old) * ft_max + b.win_fs_src % ct_old
            ).astype(jnp.int32)
        if cs_max and b.win_fs_src.shape[1] < cs_max:
            dcs = cs_max - b.win_fs_src.shape[1]
            nt = b.win_fs_src.shape[0]
            src = win_kw.get("win_fs_src", b.win_fs_src)
            win_kw["win_fs_src"] = jnp.concatenate(
                [src, jnp.zeros((nt, dcs), jnp.int32)], axis=1)
            win_kw["win_fs_lidx"] = jnp.concatenate(
                [b.win_fs_lidx,
                 jnp.full((nt, dcs), b.band_tile, jnp.int32)], axis=1)
        if w_max and b.win_edges.shape[1] < w_max:
            dw = w_max - b.win_edges.shape[1]
            nt = b.win_edges.shape[0]
            slab = b.band_tile + b.band_width
            win_kw.update(
                win_edges=jnp.concatenate(
                    [b.win_edges,
                     jnp.zeros((nt, dw, b.win_edges.shape[2]),
                               b.win_edges.dtype)], axis=1),
                win_sidx=jnp.concatenate(
                    [b.win_sidx,
                     jnp.full((nt, dw), int(FAR_SLOT_SENTINEL),
                              jnp.int32)], axis=1),
                win_ridx=jnp.concatenate(
                    [b.win_ridx,
                     jnp.full((nt, dw), b.band_tile, jnp.int32)], axis=1),
            )
            # far positions index the flat [nt * W] buffer; re-derive for
            # the widened W (t = pos // W_old, w = pos % W_old)
            t_idx = b.win_far_pos // b.win_edges.shape[1]
            w_idx = b.win_far_pos % b.win_edges.shape[1]
            sent = b.win_far_send == (b.n_node_cap - 1)
            win_kw["win_far_pos"] = jnp.where(
                sent, nt * w_max, t_idx * w_max + w_idx
            ).astype(jnp.int32)
        if f_max and b.win_far_pos.shape[0] < f_max:
            df = f_max - b.win_far_pos.shape[0]
            nt = b.win_edges.shape[0]
            fp = win_kw.get("win_far_pos", b.win_far_pos)
            win_kw["win_far_pos"] = jnp.concatenate(
                [fp, jnp.full((df,), nt * w_max if w_max else 0,
                              jnp.int32)])
            win_kw["win_far_send"] = jnp.concatenate(
                [b.win_far_send,
                 jnp.full((df,), b.n_node_cap - 1, jnp.int32)])
        yield b.replace(has_spill_edges=any_spill,
                        has_spill2_edges=any_spill2, **win_kw)


def select_band_geometry(
    dataset: Sequence[GraphData],
    tile: int = 256,
    widths: Sequence[int] = (64, 128, 256),
    target_spill: float = 0.05,
    sample: int = 64,
    seed: int = 0,
    rcm: bool = True,
    analytic_supernode: bool = True,
) -> tuple[int, int]:
    """Pick (band_tile, band_width) for a dataset — the ONE source of truth
    for band geometry (trainer / inference / timer all call this instead of
    hardcoding 256/128).

    Probes a sample of (RCM-reordered, matching `batch_iterator(rcm=True)`)
    graphs with the C++ ``bg_band_count`` kernel (NumPy fallback,
    utils/native.py::band_fraction) and returns the SMALLEST width whose
    edge spill fraction stays <= ``target_spill`` — smaller widths mean less
    band-matrix HBM traffic; meshes whose RCM bandwidth exceeds every
    candidate get the largest width instead of silently degrading into the
    scatter spill path. Per-graph windows approximate the packed layout
    (graphs pack contiguously, so intra-graph offsets dominate).
    """
    from buckgnn_tpu.utils import native

    if not len(dataset):
        return tile, widths[-1]
    rng_ = np.random.default_rng(seed)
    idx = rng_.permutation(len(dataset))[: min(sample, len(dataset))]
    graphs = [dataset[int(i)] for i in idx]
    if rcm:
        from buckgnn_tpu.graph.build import rcm_reorder

        graphs = [rcm_reorder(g) for g in graphs]
    for width in widths:
        total = in_band = 0
        for g in graphs:
            s = np.asarray(g.senders, dtype=np.int64)
            r = np.asarray(g.receivers, dtype=np.int64)
            # virtual edges are uniform-random global shortcuts: excluded
            # from the RCM ordering (build.py::rcm_reorder) and
            # unavoidable spill at ANY width — width selection must size
            # the band for the MESH edges, not chase randomness into the
            # widest band (which costs (tile+width) HBM/flops per slab
            # while the virtual edges spill anyway)
            from buckgnn_tpu.graph.build import _virtual_edge_mask

            mesh_only = ~_virtual_edge_mask(g)
            s, r = s[mesh_only], r[mesh_only]
            if analytic_supernode and g.supernode >= 0:
                # supernode star edges never enter the band — pack_graphs
                # handles full stars analytically (per-graph correction
                # tables, _band_split analytic_supernode=True). Counting
                # them here made every supernode dataset look ~25%
                # out-of-band and forced the widest band for nothing.
                # Mirror _band_split's guard: only a FULL star
                # (2*(n-1) directed edges touching the supernode) takes
                # the analytic path; partial stars land in band/spill
                # and must count toward width selection.
                touches = (s == g.supernode) | (r == g.supernode)
                if int(touches.sum()) == 2 * (g.n_node - 1):
                    s, r = s[~touches], r[~touches]
            if not len(s):
                continue
            pos = np.arange(g.n_node, dtype=np.int64)
            frac = native.band_fraction(s, r, pos, g.n_node, tile, width)
            in_band += frac * len(s)
            total += len(s)
        if total == 0 or in_band / total >= 1.0 - target_spill:
            return tile, int(width)
    return tile, int(widths[-1])


def suggest_capacities(
    dataset: Sequence[GraphData], batch_size: int, slack: float = 1.05
) -> tuple[int, int]:
    """Choose (N_cap, E_cap) so that a typical batch of `batch_size` fits.

    Sized from mean per-graph counts with `slack`; `batch_iterator` spills
    oversize batches, so this trades padding waste against batch shortfall.
    """
    mean_nodes = float(np.mean([g.n_node for g in dataset]))
    mean_edges = float(np.mean([g.n_edge for g in dataset]))
    max_nodes = max(g.n_node for g in dataset)
    max_edges = max(g.n_edge for g in dataset)
    n_cap = max(int(mean_nodes * batch_size * slack) + 1, max_nodes + 1)
    e_cap = max(int(mean_edges * batch_size * slack), max_edges)
    return _round_up(n_cap, 8), _round_up(e_cap, 128)
