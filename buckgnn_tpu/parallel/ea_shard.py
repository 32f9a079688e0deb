"""Tile-sharded model parallelism for the fused EA GraphNetBlock stack.

The EA counterpart of `parallel/partitioned.py` (SURVEY §2.2 mandate —
the reference trains single-GPU, TRAIN_FINAL.py:96,172): the edge
WINDOWS — the dominant memory term of the edge-dense family, [T, W, h]
per layer vs [N, h] node state — are partitioned by receiver tile over
the 'model' mesh axis, and each device runs the fused whole-block
Pallas kernel (ops/pallas_ea_block.py) UNMODIFIED on its tile range.

Design (TPU-first):

- Receiver tiles are split into D contiguous ranges (RCM packing keeps
  senders near receivers, so nearly all slab senders stay local). Each
  device holds the raw edge windows, sender/receiver codes and the
  [T_l, W, h] edge activations of its range ONLY — edge state is fully
  sharded; each block's ze output stays on-shard and feeds the next
  block without any collective.
- Node activations are REPLICATED: after each block, the per-shard
  [Nl, h] node outputs ride one `all_gather` (tiled, over ICI) — the
  Megatron-style row-parallel exchange. Sender slabs at shard-interior
  tiles read the device's own rows; the handful of senders that cross a
  shard boundary (within width/2 of it) and every out-of-band sender
  resolve through the kernel's existing FAR machinery against the
  replicated x (`shard_ea_batch` re-codes them host-side).
- Backward: the kernel's custom VJP runs per shard in
  ``far_grad='hybrid'`` mode — the far zone is laid out [shard-local
  senders | remote senders] (``cf_local`` splits it); the LOCAL zone's
  gradients fold in-shard through the per-shard fs tables exactly like
  the single-device path (no scatter), and only the true cross-shard
  rows transpose through the x_full take() into a scatter-add on the
  replicated x. The all_gather transposes to a reduce_scatter and the
  weight grads psum across shards — those collectives come from
  shard_map's autodiff, no hand-written transposed collectives. The
  all-autodiff cut (every far row scattering) measured +2.0 ms
  single-chip; hybrid measures ±0.0 (RESULTS.md round-5).

Composes with data parallelism exactly like the SAGE partitioned path:
the DP step vmaps over stacked batches, this op shard_maps over
'model' (tests/test_ea_shard.py; dryrun_multichip certifies the
composition with loss + update-fingerprint parity).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from buckgnn_tpu.graph.batch import FAR_SLOT_SENTINEL, GraphBatch


@struct.dataclass
class EAShards:
    """Per-device windowed-EA geometry (leading axis D, sharded on the
    'model' mesh axis inside shard_map)."""

    sidx: jnp.ndarray      # [D, T_l, W] int32 re-coded slab/far codes
    ridx: jnp.ndarray      # [D, T_l, W] int32 tile-local receivers
    # GLOBAL sender rows (pad: dead), zone layout [local 0..Cl | remote
    # Cl..Cl+Cr): local-sender rows fold in-shard (fs tables), remote
    # rows ride the autodiff scatter
    far: jnp.ndarray       # [D, T_l, Cl + Cr] int32
    row_off: jnp.ndarray   # [D, Nl + 1] int32 (absolute; differenced)
    edges: jnp.ndarray     # [D, T_l, W, Fe] raw edge-feature windows
    # sender-sorted view of the LOCAL far zone (per SENDER tile):
    # fs_src = flat t_recv*Cf + rank, fs_lidx = sender's tile-local row
    # (sentinel tile for pads) — same contract as GraphBatch.win_fs_*
    fs_src: jnp.ndarray    # [D, T_l, Cs] int32
    fs_lidx: jnp.ndarray   # [D, T_l, Cs] int32
    tile: int = struct.field(pytree_node=False, default=128)
    width: int = struct.field(pytree_node=False, default=64)
    n_shards: int = struct.field(pytree_node=False, default=1)
    cf_local: int = struct.field(pytree_node=False, default=0)


class _ShardView:
    """Duck-typed stand-in for GraphBatch inside the shard body — exactly
    the attributes fused_ea_block reads."""

    def __init__(self, shards: EAShards, sidx, ridx, far, row_off,
                 fs_src, fs_lidx):
        self.band_tile = shards.tile
        self.band_width = shards.width
        self.win_sidx = sidx
        self.win_ridx = ridx
        self.win_far_tsend = far
        self.row_offsets = row_off
        # LOCAL far zone fold tables (far_grad='hybrid')
        self.win_fs_src = fs_src
        self.win_fs_lidx = fs_lidx


def shard_ea_batch(batch: GraphBatch, n_shards: int,
                   local_cap: int | None = None,
                   remote_cap: int | None = None,
                   fs_cap: int | None = None) -> EAShards:
    """Host-side: split a windowed banded batch into D tile ranges.

    In-slab sender codes are re-based onto each shard's LOCAL slab-start
    formula (the kernel clamps slabs at [0, Nl] exactly as it clamps at
    [0, N] globally — shard-interior tiles keep their codes verbatim);
    senders that fall outside a shard's local slab (boundary crossers)
    join the out-of-band rows in the per-tile FAR list, which keeps
    GLOBAL row ids (gathered from the replicated x). The cap arguments
    pin the local/remote far-zone and fs-table capacities so every
    batch of a run (and every DP stack member) shares one compiled
    shape — feed back the run maxima from ``shard_caps``.
    """
    tile, width = batch.band_tile, batch.band_width
    assert batch.win_sidx is not None and batch.win_far_tsend is not None
    n = batch.n_node_cap
    assert n % (n_shards * tile) == 0, (n, n_shards, tile)
    nl = n // n_shards
    assert nl >= tile + width, (
        f"tile sharding needs >= {tile + width} rows (one slab) per "
        f"shard; got {nl} — grow n_node_cap or lower n_shards")
    t_l = nl // tile
    t_total = n // tile
    slab = tile + width
    w2 = width // 2
    dead = n - 1
    sent = int(FAR_SLOT_SENTINEL)

    sidx = np.asarray(batch.win_sidx)
    ridx = np.asarray(batch.win_ridx)
    far_g = np.asarray(batch.win_far_tsend)
    ro = np.asarray(batch.row_offsets)
    edges = np.asarray(batch.win_edges)
    w_cap = sidx.shape[1]

    s_glob = np.clip(np.arange(t_total) * tile - w2, 0, max(n - slab, 0))
    s_loc = np.clip((np.arange(t_total) % t_l) * tile - w2, 0,
                    max(nl - slab, 0))

    # ---- phase 1: classify every window slot, collect per-tile far
    # rows split into LOCAL-sender (within this shard's row range, their
    # gradient folds in-shard via the fs tables — no scatter) and
    # REMOTE-sender (true cross-shard; their gradient rides the
    # autodiff scatter against the replicated x) ----
    new_sidx = np.full_like(sidx, sent)
    tile_slots: list = []
    far_loc: list[np.ndarray] = []
    far_rem: list[np.ndarray] = []
    for t in range(t_total):
        d = t // t_l
        codes = sidx[t]
        in_slab = codes < slab
        g_rows = s_glob[t] + np.where(in_slab, codes, 0)
        l_rows = g_rows - d * nl
        ok = in_slab & (l_rows >= s_loc[t]) & (l_rows < s_loc[t] + slab)
        new_sidx[t, ok] = (l_rows[ok] - s_loc[t]).astype(np.int32)
        # boundary crossers keep their global row; existing far codes
        # dereference win_far_tsend
        crossers = in_slab & ~ok
        was_far = (codes >= slab) & (codes != sent)
        rows = np.concatenate([
            g_rows[crossers],
            far_g[t, codes[was_far] - slab],
        ])
        slots = np.concatenate([np.nonzero(crossers)[0],
                                np.nonzero(was_far)[0]])
        uniq = np.unique(rows)
        is_loc = (uniq >= d * nl) & (uniq < (d + 1) * nl)
        far_loc.append(uniq[is_loc])
        far_rem.append(uniq[~is_loc])
        tile_slots.append((slots, rows))

    cl = max((len(u) for u in far_loc), default=0)
    cr = max((len(u) for u in far_rem), default=0)
    cl = ((max(cl, 8) + 7) // 8) * 8
    cr = ((max(cr, 0) + 7) // 8) * 8  # 0 allowed (single shard)
    if local_cap is not None:
        assert local_cap >= cl, (local_cap, cl)
        cl = local_cap
    if remote_cap is not None:
        assert remote_cap >= cr, (remote_cap, cr)
        cr = remote_cap
    cf = cl + cr

    # ---- phase 2: assign extended-slab codes against the uniform
    # [local 0..cl) | remote cl..cl+cr) zone layout; build the
    # sender-sorted fs tables over the LOCAL zone ----
    far = np.full((t_total, cf), dead, np.int32)
    fs_entries: list[list] = [[] for _ in range(t_total)]  # per SENDER tile
    for t in range(t_total):
        d = t // t_l
        loc, rem = far_loc[t], far_rem[t]
        far[t, : len(loc)] = loc
        far[t, cl: cl + len(rem)] = rem
        slots, rows = tile_slots[t]
        if len(slots):
            in_l = np.isin(rows, loc)
            pos_l = np.searchsorted(loc, rows)
            pos_r = np.searchsorted(rem, rows)
            code = np.where(in_l, pos_l, cl + pos_r)
            new_sidx[t, slots] = (slab + code).astype(np.int32)
        # fs entries: one per local far row, grouped by SENDER tile
        t_loc = t % t_l
        for rank, g in enumerate(loc):
            lrow = int(g) - d * nl
            ts = d * t_l + lrow // tile
            fs_entries[ts].append((t_loc * cf + rank, lrow % tile))

    cs = max((len(e) for e in fs_entries), default=0)
    cs = ((max(cs, 8) + 7) // 8) * 8
    if fs_cap is not None:
        assert fs_cap >= cs, (fs_cap, cs)
        cs = fs_cap
    fs_src = np.zeros((t_total, cs), np.int32)
    fs_lidx = np.full((t_total, cs), tile, np.int32)
    for ts, entries in enumerate(fs_entries):
        for c, (src, lidx) in enumerate(entries):
            fs_src[ts, c] = src
            fs_lidx[ts, c] = lidx

    fe = edges.shape[2]
    row_off = np.stack([ro[d * nl: (d + 1) * nl + 1]
                        for d in range(n_shards)])
    return EAShards(
        sidx=jnp.asarray(new_sidx.reshape(n_shards, t_l, w_cap)),
        ridx=jnp.asarray(ridx.reshape(n_shards, t_l, w_cap)),
        far=jnp.asarray(far.reshape(n_shards, t_l, cf)),
        row_off=jnp.asarray(row_off.astype(np.int32)),
        edges=jnp.asarray(edges.reshape(n_shards, t_l, w_cap, fe)),
        fs_src=jnp.asarray(fs_src.reshape(n_shards, t_l, cs)),
        fs_lidx=jnp.asarray(fs_lidx.reshape(n_shards, t_l, cs)),
        tile=tile, width=width, n_shards=n_shards, cf_local=cl,
    )


def shard_caps(s: EAShards) -> tuple[int, int, int]:
    """(local_cap, remote_cap, fs_cap) of a built EAShards — feed the
    run maxima back into shard_ea_batch so every batch of a run (and
    every DP stack member) shares one compiled shape."""
    cf = s.far.shape[-1]
    return s.cf_local, cf - s.cf_local, s.fs_src.shape[-1]


def pad_ea_shards(s: EAShards, local_cap: int, remote_cap: int,
                  fs_cap: int) -> EAShards:
    """Widen a built EAShards to run-unified caps WITHOUT re-running the
    host-side classification loops (shard_ea_batch is two per-tile
    Python passes — the trainer calls this instead of building every
    batch twice). Equivalent to ``shard_ea_batch(b, D, local_cap,
    remote_cap, fs_cap)`` on the same batch (tests/test_ea_shard.py):

    - the far table's [local | remote] zones pad independently with the
      dead row, the remote zone sliding out to start at ``local_cap``;
    - window codes pointing into the remote zone (``>= slab + cl_old``,
      sentinel excluded) shift by the local-zone growth;
    - fs_src entries re-base from ``t_loc*cf_old + rank`` to the new
      ``cf`` stride (ranks are local-zone positions, unchanged).
    """
    cl_old = s.cf_local
    cf_old = int(s.far.shape[-1])
    cr_old = cf_old - cl_old
    cs_old = int(s.fs_src.shape[-1])
    assert local_cap >= cl_old and remote_cap >= cr_old and \
        fs_cap >= cs_old, ((local_cap, remote_cap, fs_cap),
                           (cl_old, cr_old, cs_old))
    if (local_cap, remote_cap, fs_cap) == (cl_old, cr_old, cs_old):
        return s
    cf = local_cap + remote_cap
    d_sh, t_l = s.far.shape[0], s.far.shape[1]
    nl = int(s.row_off.shape[1]) - 1
    dead = nl * s.n_shards - 1
    slab = s.tile + s.width
    sent = int(FAR_SLOT_SENTINEL)

    sidx = np.asarray(s.sidx).copy()
    remote = (sidx != sent) & (sidx >= slab + cl_old)
    sidx[remote] += local_cap - cl_old

    far = np.full((d_sh, t_l, cf), dead, np.int32)
    far_old = np.asarray(s.far)
    far[:, :, :cl_old] = far_old[:, :, :cl_old]
    far[:, :, local_cap: local_cap + cr_old] = far_old[:, :, cl_old:]

    src_old = np.asarray(s.fs_src)
    fs_src = np.zeros((d_sh, t_l, fs_cap), np.int32)
    fs_src[:, :, :cs_old] = (src_old // cf_old) * cf + (src_old % cf_old)
    fs_lidx = np.full((d_sh, t_l, fs_cap), s.tile, np.int32)
    fs_lidx[:, :, :cs_old] = np.asarray(s.fs_lidx)

    return EAShards(
        sidx=jnp.asarray(sidx), ridx=s.ridx, far=jnp.asarray(far),
        row_off=s.row_off, edges=s.edges, fs_src=jnp.asarray(fs_src),
        fs_lidx=jnp.asarray(fs_lidx), tile=s.tile, width=s.width,
        n_shards=s.n_shards, cf_local=local_cap,
    )


def _encode_edges(edges, enc_params, dtype):
    """The reference's 3-layer edge encoder (Models/BuckGNN.py:67-82) as
    plain ops — runs per shard on the LOCAL raw windows."""
    e = edges.astype(dtype)
    names = sorted(enc_params)  # lin_0, lin_1, lin_2
    for i, k in enumerate(names):
        e = (e @ enc_params[k]["kernel"].astype(dtype)
             + enc_params[k]["bias"].astype(dtype))
        if i + 1 < len(names):
            e = jax.nn.relu(e)
    return e


def ea_tp_stack(
    x: jnp.ndarray,
    shards: EAShards,
    block_params: list,
    enc_params,
    *,
    rate: float,
    seed: jnp.ndarray | None,
    deterministic: bool,
    mesh=None,
    axis: str = "model",
) -> jnp.ndarray:
    """Run the full EA block stack tile-sharded over ``axis``.

    ``block_params``: one GraphNetBlock param subtree per layer (the
    same object L times for EA_GNN_Shared). Returns the final node
    state [N, h], replicated.
    """
    from buckgnn_tpu.ops.pallas_ea_block import fused_ea_block
    from jax.sharding import Mesh, PartitionSpec as P

    n_shards = shards.n_shards
    nl = x.shape[0] // n_shards
    n_layers = len(block_params)

    if mesh is None:
        amesh = jax.sharding.get_abstract_mesh()
        if axis in getattr(amesh, "axis_names", ()):
            mesh = amesh
        else:
            devs = jax.devices()
            if len(devs) < n_shards:
                raise ValueError(
                    f"EA tile sharding over {n_shards} shards needs "
                    f">= {n_shards} devices (have {len(devs)}) or an "
                    f"ambient mesh with a '{axis}' axis")
            mesh = Mesh(np.asarray(devs[:n_shards]), (axis,))

    if seed is None:
        seed = jnp.zeros((2,), jnp.int32)

    def body(x, sidx, ridx, far, row_off, edges, fs_src, fs_lidx, bp,
             ep, seed):
        d = jax.lax.axis_index(axis)
        view = _ShardView(shards, sidx[0], ridx[0], far[0], row_off[0],
                          fs_src[0], fs_lidx[0])
        x_loc = jax.lax.dynamic_slice_in_dim(x, d * nl, nl, 0)
        e = _encode_edges(edges[0], ep, x.dtype)
        for i in range(n_layers):
            # distinct dropout streams per (layer, shard): the kernel
            # seeds per tile from this [2] vector
            si = jnp.stack([seed[0] + jnp.int32(i),
                            seed[1] + d.astype(jnp.int32) * jnp.int32(7919)])
            zx, ze = fused_ea_block(
                x_loc, e, bp[i], view,
                skip=0 < i < n_layers - 1, rate=rate, seed=si,
                deterministic=deterministic, far_grad="hybrid",
                far_local=shards.cf_local, x_full=x,
            )
            e = ze
            x_loc = zx
            x = jax.lax.all_gather(zx, axis, axis=0, tiled=True)
        return x

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(axis), P(axis), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(x, shards.sidx, shards.ridx, shards.far, shards.row_off,
              shards.edges, shards.fs_src, shards.fs_lidx, block_params,
              enc_params, seed)
