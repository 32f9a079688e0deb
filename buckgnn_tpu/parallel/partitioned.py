"""Node/edge-partitioned banded aggregation with boundary halo exchange.

The SURVEY §2.2 framework mandate (the GNN analog of context/sequence
parallelism the reference lacks — it trains single-GPU,
TRAIN_FINAL.py:96,172): partition each batch's block-diagonal graph across
the 'model' mesh axis so that NO device ever holds the full node state.

Design (TPU-first, rides RCM band locality):

- Node rows are split into D contiguous ranges (RCM order keeps edge
  endpoints close, so ranges have thin boundaries). Device d owns rows
  [d*Nl, (d+1)*Nl) of every [N, H] activation; everything elementwise and
  every dense layer in the model is row-parallel under GSPMD for free.
- **In-band edges** stay entirely local except for a width/2-row *halo* at
  each range boundary: each device `ppermute`s its first/last width/2 rows
  to its neighbors over ICI and runs the banded slab matmuls against the
  halo-extended local block. The band matrices are re-packed with
  UNCLAMPED slab starts (tile t reads x_ext[t*tile : t*tile+slab]), so the
  zero-filled global edges never carry coefficients. XLA's latency-hiding
  scheduler overlaps the two ppermutes with the local (interior) matmuls —
  the "boundary exchange overlapped with local aggregation" of the
  mandate.
- **Out-of-band (spill) edges** route sender features point-to-point: a
  host-precomputed routing table says which local rows each device must
  send to each other device; one `all_to_all` moves the fixed-capacity
  [D, S_cap, H] message blocks over ICI, a precomputed permutation restores
  receiver order, and a local sorted segment-sum applies them.
- **Supernode stars** stay analytic: per-device partial graph sums are
  `psum`'d into the [2G, H] correction table (tiny), then applied locally.
- The backward pass is the SAME operator applied to the cotangent: the
  total adjacency is symmetric (both edge directions materialized,
  GraphCreate.py:417-422 parity), and the partitioned operator computes
  exactly the local rows of A @ x — so d/dx (A x)^T g = A g holds shard by
  shard (custom VJP below; no transposed collectives needed).

Reference has no counterpart — this is the scaling feature BASELINE.json's
north_star mandates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax import dtypes

from buckgnn_tpu.graph.batch import GraphBatch


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@struct.dataclass
class PartitionedBatch:
    """Per-device arrays for the partitioned aggregation (leading axis D,
    sharded on the 'model' mesh axis inside shard_map)."""

    band: jnp.ndarray           # [D, nt_l, T, S] int8, unclamped starts
    send_idx: jnp.ndarray       # [D, D, S_cap] int32 local sender rows
    recv_perm: jnp.ndarray      # [D, E_cap] int32 into the flat [D*S_cap]
    recv_receivers: jnp.ndarray  # [D, E_cap] int32 local receiver (pad: Nl)
    node_graph: jnp.ndarray     # [D, Nl] int32
    node_mask: jnp.ndarray      # [D, Nl] float32
    is_super: jnp.ndarray       # [D, Nl] float32
    gcode: jnp.ndarray          # [D, Nl] int32 apply codes (sentinel tg)
    # static geometry
    tile: int = struct.field(pytree_node=False, default=256)
    width: int = struct.field(pytree_node=False, default=128)
    n_shards: int = struct.field(pytree_node=False, default=1)
    g_cap: int = struct.field(pytree_node=False, default=1)
    tg: int = struct.field(pytree_node=False, default=8)
    has_super: bool = struct.field(pytree_node=False, default=False)
    has_spill: bool = struct.field(pytree_node=False, default=False)


def partition_batch(
    batch: GraphBatch,
    n_shards: int,
    spill_cap: int | None = None,
    recv_cap: int | None = None,
    force_spill: bool | None = None,
) -> PartitionedBatch:
    """Host-side: split a banded GraphBatch into per-device shards.

    ``spill_cap``/``recv_cap`` fix the all_to_all block / received-list
    capacities so every batch of a run shares one compiled shape (pass the
    dataset-wide maxima); defaults size them for this batch alone.
    ``force_spill`` pins the static has_spill flag (OR it across a run's
    batches so stacked batches share one treedef, like
    graph/batch.py::batch_iterator does for its spill flags).
    """
    if batch.band_tile is None:
        raise ValueError("partition_batch needs a banded GraphBatch")
    tile, width = batch.band_tile, batch.band_width
    n = batch.n_node_cap
    if n % (n_shards * tile):
        raise ValueError(
            f"n_node_cap {n} must divide into {n_shards} tile-aligned shards"
        )
    nl = n // n_shards
    slab = tile + width
    if width // 2 > nl:
        raise ValueError("halo width exceeds shard size")

    senders = np.asarray(batch.senders)
    receivers = np.asarray(batch.receivers)
    valid = np.asarray(batch.edge_mask)
    node_graph = np.asarray(batch.node_graph)
    node_mask = np.asarray(batch.node_mask)
    sn = np.asarray(batch.supernode_index)
    g_cap = batch.n_graph_cap
    tg = _round_up(2 * g_cap, 8)
    dead = n - 1

    is_super = np.zeros(n, dtype=bool)
    real_super = sn < dead
    is_super[sn[real_super]] = True
    star = np.zeros_like(valid)
    if batch.has_supernode_edges:
        star = valid & (is_super[senders] | is_super[receivers])

    cand = valid & ~star
    t = receivers // tile
    k = senders - (t * tile - width // 2)  # UNCLAMPED slab offset
    inband = cand & (k >= 0) & (k < slab)
    spill = cand & ~inband

    # unclamped band matrix, then shard the tile axis
    flat = np.zeros(n * slab, dtype=np.int32)
    np.add.at(
        flat,
        receivers[inband].astype(np.int64) * slab + k[inband],
        1,
    )
    assert flat.max(initial=0) <= 127, "band overflow (>127 duplicate edges)"
    band = flat.astype(np.int8).reshape(n_shards, nl // tile, tile, slab)

    # ---- spill routing tables ----
    sp_s, sp_r = senders[spill], receivers[spill]
    src_dev = sp_s // nl
    dst_dev = sp_r // nl
    counts = np.zeros((n_shards, n_shards), dtype=np.int64)
    np.add.at(counts, (src_dev, dst_dev), 1)
    s_cap = spill_cap or max(int(counts.max(initial=0)), 1)
    s_cap = _round_up(s_cap, 8)
    if counts.max(initial=0) > s_cap:
        raise ValueError(
            f"spill_cap {s_cap} < max per-device-pair count {counts.max()}"
        )
    recv_counts = counts.sum(axis=0)
    e_cap = recv_cap or max(int(recv_counts.max(initial=0)), 1)
    e_cap = _round_up(e_cap, 8)
    if recv_counts.max(initial=0) > e_cap:
        raise ValueError(
            f"recv_cap {e_cap} < max per-device received count"
        )

    send_idx = np.zeros((n_shards, n_shards, s_cap), dtype=np.int32)
    recv_perm = np.zeros((n_shards, e_cap), dtype=np.int32)
    recv_receivers = np.full((n_shards, e_cap), nl, dtype=np.int32)
    slot = np.zeros(len(sp_s), dtype=np.int64)  # position in flat recv buf
    fill = np.zeros((n_shards, n_shards), dtype=np.int64)
    order = np.lexsort((sp_r, dst_dev, src_dev))
    for e in order:
        sd, dd = src_dev[e], dst_dev[e]
        p = fill[sd, dd]
        send_idx[sd, dd, p] = sp_s[e] - sd * nl
        slot[e] = sd * s_cap + p
        fill[sd, dd] += 1
    for d in range(n_shards):
        mine = np.nonzero(dst_dev == d)[0]
        mine = mine[np.argsort(sp_r[mine], kind="stable")]
        recv_perm[d, : len(mine)] = slot[mine]
        recv_receivers[d, : len(mine)] = sp_r[mine] - d * nl

    # ---- per-device supernode metadata ----
    graph_has = np.zeros(g_cap, dtype=bool)
    graph_has[np.nonzero(real_super)[0]] = True
    member = graph_has[node_graph] & node_mask & ~is_super
    g = node_graph.astype(np.int64)
    gcode = np.where(member, g, np.where(is_super, g_cap + g, tg))

    return PartitionedBatch(
        band=jnp.asarray(band),
        send_idx=jnp.asarray(send_idx),
        recv_perm=jnp.asarray(recv_perm),
        recv_receivers=jnp.asarray(recv_receivers),
        node_graph=jnp.asarray(node_graph.reshape(n_shards, nl)),
        node_mask=jnp.asarray(node_mask.reshape(n_shards, nl).astype(np.float32)),
        is_super=jnp.asarray(is_super.reshape(n_shards, nl).astype(np.float32)),
        gcode=jnp.asarray(gcode.astype(np.int32).reshape(n_shards, nl)),
        tile=tile,
        width=width,
        n_shards=n_shards,
        g_cap=g_cap,
        tg=tg,
        has_super=bool(batch.has_supernode_edges),
        has_spill=(bool(np.any(spill)) if force_spill is None
                   else bool(force_spill)),
    )


def pad_partitioned(
    pb: PartitionedBatch,
    spill_cap: int,
    recv_cap: int,
    force_spill: bool | None = None,
) -> PartitionedBatch:
    """Widen a PartitionedBatch's spill capacities to run-uniform values
    (cheap array padding — avoids re-running partition_batch's host loop).
    Pad send slots gather arbitrary rows that no recv_perm entry selects;
    pad recv slots keep the receiver sentinel nl."""
    d, _, s0 = pb.send_idx.shape
    e0 = pb.recv_perm.shape[1]
    send_idx, recv_perm, recv_recv = pb.send_idx, pb.recv_perm, \
        pb.recv_receivers
    if spill_cap > s0:
        send_idx = jnp.concatenate(
            [send_idx, jnp.zeros((d, d, spill_cap - s0), jnp.int32)],
            axis=2,
        )
        # recv_perm indexes the flat [D * S_cap] received buffer —
        # re-derive for the widened capacity
        src = pb.recv_perm // s0
        off = pb.recv_perm % s0
        recv_perm = (src * spill_cap + off).astype(jnp.int32)
    if recv_cap > e0:
        recv_perm = jnp.concatenate(
            [recv_perm, jnp.zeros((d, recv_cap - e0), jnp.int32)], axis=1
        )
        nl = pb.node_graph.shape[1]
        recv_recv = jnp.concatenate(
            [recv_recv, jnp.full((d, recv_cap - e0), nl, jnp.int32)],
            axis=1,
        )
    return PartitionedBatch(
        band=pb.band, send_idx=send_idx, recv_perm=recv_perm,
        recv_receivers=recv_recv, node_graph=pb.node_graph,
        node_mask=pb.node_mask, is_super=pb.is_super, gcode=pb.gcode,
        tile=pb.tile, width=pb.width, n_shards=pb.n_shards,
        g_cap=pb.g_cap, tg=pb.tg, has_super=pb.has_super,
        has_spill=(pb.has_spill if force_spill is None
                   else bool(force_spill)),
    )


# --------------------------------------------------------------------- #
# the shard_map'd local operator
# --------------------------------------------------------------------- #


def _local_agg(x, band, send_idx, recv_perm, recv_r, node_graph, node_mask,
               is_super, gcode, *, static):
    """Per-device rows of A @ x (band + spill + supernode stars)."""
    (tile, width, n_shards, g_cap, tg, has_super, has_spill, axis) = static
    from buckgnn_tpu.ops import segment

    nl, h = x.shape
    w2 = width // 2
    band = band[0]
    nt_l = band.shape[0]
    slab = tile + width

    # ---- halo exchange over ICI (edge devices receive zeros) ----
    if n_shards > 1:
        lo = jax.lax.ppermute(
            x[-w2:], axis, [(i, i + 1) for i in range(n_shards - 1)]
        )
        hi = jax.lax.ppermute(
            x[:w2], axis, [(i, i - 1) for i in range(1, n_shards)]
        )
    else:
        lo = jnp.zeros((w2, h), x.dtype)
        hi = jnp.zeros((w2, h), x.dtype)
    x_ext = jnp.concatenate([lo, x, hi], axis=0)  # [Nl + width, H]

    # ---- local banded slab matmuls (issued after the ppermutes so XLA
    # overlaps the collective with this compute) ----
    starts = jnp.arange(nt_l) * tile
    idx = starts[:, None] + jnp.arange(slab)[None, :]
    xs = x_ext[idx]  # [nt_l, slab, H]
    b = band.astype(jnp.float32).astype(x.dtype)
    agg = jax.lax.dot_general(
        b, xs.astype(b.dtype),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).reshape(nl, h)

    # ---- spill: fixed-capacity sender-feature all_to_all ----
    if has_spill:
        msgs_out = x[send_idx[0]]  # [D, S_cap, H]
        if n_shards > 1:
            msgs_out = jax.lax.all_to_all(msgs_out, axis, 0, 0)
        msgs = msgs_out.reshape(-1, h)[recv_perm[0]]
        agg = agg + jax.ops.segment_sum(
            msgs.astype(jnp.float32), recv_r[0], nl + 1,
            indices_are_sorted=True,
        )[:nl]

    # ---- supernode stars: psum'd per-graph correction table ----
    if has_super:
        t1p = segment.segment_sum_dense(
            x, node_graph[0], g_cap, keep=is_super[0] > 0
        )
        gsp = segment.segment_sum_dense(
            x, node_graph[0], g_cap, keep=node_mask[0] > 0
        )
        if n_shards > 1:
            t1 = jax.lax.psum(t1p, axis)
            gsum = jax.lax.psum(gsp, axis)
        else:
            t1, gsum = t1p, gsp
        table = jnp.concatenate([t1, gsum - t1], axis=0)  # [2G, H]
        gc = gcode[0]
        sel = (gc < 2 * g_cap)[:, None]
        corr = jnp.where(
            sel,
            table[jnp.clip(gc, 0, 2 * g_cap - 1)].astype(jnp.float32),
            jnp.float32(0.0),
        )
        agg = agg + corr
    return agg.astype(x.dtype)


def _psym_impl(static, mesh, x, pb: PartitionedBatch):
    from jax.sharding import Mesh, PartitionSpec as P

    axis = static[-1]
    if mesh is None:
        # no explicit mesh: use the ambient one when it carries the axis,
        # otherwise build a local mesh over n_shards devices so the
        # single-host / single-chip path (e.g. the CLI's
        # --segment-impl banded_partitioned without jax.set_mesh) works
        amesh = jax.sharding.get_abstract_mesh()
        if axis not in getattr(amesh, "axis_names", ()):
            n_shards = static[2]
            devs = jax.devices()
            if len(devs) < n_shards:
                raise ValueError(
                    f"partitioned aggregation over {n_shards} shards "
                    f"needs >= {n_shards} devices (have {len(devs)}) or "
                    f"an ambient mesh with a '{axis}' axis"
                )
            mesh = Mesh(np.asarray(devs[:n_shards]), (axis,))
    fn = functools.partial(_local_agg, static=static)
    return jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(axis, None),) + (P(axis),) * 8,
        out_specs=P(axis, None),
        check_vma=False,
    )(x, pb.band, pb.send_idx, pb.recv_perm, pb.recv_receivers,
      pb.node_graph, pb.node_mask, pb.is_super, pb.gcode)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _psym_sum(static, mesh, x, band, send_idx, recv_perm, recv_r,
              node_graph, node_mask, is_super, gcode):
    pb = _rebuild(static, band, send_idx, recv_perm, recv_r, node_graph,
                  node_mask, is_super, gcode)
    return _psym_impl(static, mesh, x, pb)


def _rebuild(static, band, send_idx, recv_perm, recv_r, node_graph,
             node_mask, is_super, gcode) -> PartitionedBatch:
    (tile, width, n_shards, g_cap, tg, has_super, has_spill, _axis) = static
    return PartitionedBatch(
        band=band, send_idx=send_idx, recv_perm=recv_perm,
        recv_receivers=recv_r, node_graph=node_graph, node_mask=node_mask,
        is_super=is_super, gcode=gcode, tile=tile, width=width,
        n_shards=n_shards, g_cap=g_cap, tg=tg, has_super=has_super,
        has_spill=has_spill,
    )


def _psym_fwd(static, mesh, x, *arrs):
    return _psym_sum(static, mesh, x, *arrs), arrs


def _zero_tangent(v):
    if jnp.issubdtype(v.dtype, jnp.integer) or v.dtype == jnp.bool_:
        return np.zeros(v.shape, dtypes.float0)
    return jnp.zeros_like(v)


def _psym_bwd(static, mesh, arrs, g):
    # total A symmetric -> backward = same partitioned operator on the
    # cotangent (see module docstring / ops/banded.py::_sym_sum)
    dx = _psym_sum(static, mesh, g, *arrs)
    return (dx,) + tuple(_zero_tangent(a) for a in arrs)


_psym_sum.defvjp(_psym_fwd, _psym_bwd)


def partitioned_sage_aggregate(
    x: jnp.ndarray,
    pb: PartitionedBatch,
    mesh=None,
    axis: str = "model",
    aggr: str = "add",
) -> jnp.ndarray:
    """Sum-aggregation over the full edge set with node rows sharded on
    ``axis``. Equal to `banded_sage_aggregate`/`sage_aggregate` on the same
    batch (multi-device CPU parity tested in tests/test_partitioned.py).

    ``mesh=None`` uses the ambient mesh (``jax.set_mesh``). Differentiable
    via the symmetric-adjacency custom VJP.
    """
    if aggr not in ("add", "sum"):
        raise ValueError(
            f"partitioned aggregation supports add/sum only, got {aggr}"
        )
    static = (pb.tile, pb.width, pb.n_shards, pb.g_cap, pb.tg,
              pb.has_super, pb.has_spill, axis)
    return _psym_sum(static, mesh, x, pb.band, pb.send_idx, pb.recv_perm,
                     pb.recv_receivers, pb.node_graph, pb.node_mask,
                     pb.is_super, pb.gcode)
