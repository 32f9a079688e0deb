"""Fully-fused GraphSAGE layer (Pallas, TPU) — the flagship hot path.

One kernel invocation computes, per 256-row node tile, the ENTIRE layer
the reference runs as SAGEConv -> relu -> skip -> dropout
(Models/BuckGNN.py:113-119, 338-352):

    agg  = band_t @ x_slab  (+ spill selection matmuls)     [MXU, int8 band]
    out  = agg @ W_l + b_l + x_tile @ W_r                   [MXU]
    y    = out * rsqrt(max(rowsum(out^2), 1e-24))           [PyG normalize=True]
    z    = dropout(relu(y) + x_skip)                        [in-VMEM PRNG]

Rationale (measured on the v5e): the XLA step is bandwidth-bound — it
moves ~48 GB/step because every op boundary round-trips [N, 512]
activations through HBM. Fusing the layer touches each operand once:
x arrives in VMEM as the band slab (which CONTAINS the tile's own rows,
so the W_r input and the skip operand are free), and the
norm/epilogue never leave VMEM. Although Pallas DMA streams at only
~425-540 GB/s on this chip vs ~1060 GB/s for XLA fusions
(benchmarks/probe_epilogue.py, /tmp probes), the ~4x traffic reduction
dominates.

Backward: a tile-local kernel (dz -> dout, accumulating dW_l/dW_r/db_l in
f32 VMEM across the sequential grid, emitting dagg and the direct dx
part), then ONE symmetric band aggregation of dagg (total adjacency is
symmetric — both edge directions are materialized, ops/banded.py), added
to the direct part. Dropout bits are regenerated from the seed
(per-tile streams identical to the forward); residuals are y, inv and
agg only.

Supernode stars (the thesis flagship config) are exact: a per-graph
correction table ([2G, H], built per layer from the layer input by cheap
XLA segment ops) lives whole in VMEM, and each row's contribution is one
iota-compare selection matmul — broadcast rows pick table row g, the
supernode row picks G+g (graph_sum - own features), everyone else a
sentinel that matches nothing.

Scope guards (callers fall back to the unfused path otherwise):
aggr='add', normalize=True, H % 128 == 0, no spill2 overflow.

Reference parity anchor: SAGEConv(normalize=True, aggr='add') + the skip
placement 0 < i < L-1 (Models/BuckGNN.py:349-351) + F.dropout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import dtypes
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from buckgnn_tpu.graph.batch import SPILL_ALIGN, SPILL_CHUNK
from buckgnn_tpu.ops.dropout import dropout_scale, dropout_threshold

_NBUF = 6  # slab prefetch depth (matches ops/pallas_banded.py)


# --------------------------------------------------------------------- #
# forward kernel
# --------------------------------------------------------------------- #


def _slab_copy(x_hbm, slab_ref, sem, t, *, tile, width, n_nodes, slot):
    slab = tile + width
    start = jnp.clip(t * tile - width // 2, 0, max(n_nodes - slab, 0))
    start = pl.multiple_of(start, 8)
    return pltpu.make_async_copy(
        x_hbm.at[pl.ds(start, slab), :], slab_ref.at[slot], sem.at[slot]
    )


def _spill_copy(msgs_hbm, off_ref, msg_ref, msem, t, *, n_spill, slot):
    start = jnp.clip(
        (off_ref[t] // SPILL_ALIGN) * SPILL_ALIGN, 0, n_spill - SPILL_CHUNK
    )
    start = pl.multiple_of(start, SPILL_ALIGN)
    return pltpu.make_async_copy(
        msgs_hbm.at[pl.ds(start, SPILL_CHUNK), :], msg_ref.at[slot],
        msem.at[slot],
    )


def _seed_tile(seed_ref):
    # Mosaic's prng_seed takes at most 2 words; mix the tile index into the
    # first with a Weyl increment. The backward kernel repeats this exactly,
    # so both passes see the same bit stream.
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] ^ (i * jnp.int32(-1640531527)), seed_ref[1])


def _fwd_kernel(
    # scalar-prefetch / SMEM
    spill_off_ref, seed_ref,
    # VMEM blocks
    band_ref, lo_ref, hi_ref, wl_ref, bl_ref, wr_ref, gcode_ref, table_ref,
    # ANY (HBM)
    x_hbm, msgs_hbm,
    # outputs
    *outs,
    # scratch appended after outputs by pallas_call
    tile, width, n_nodes, n_tiles, x_dtype, has_spill, n_spill,
    skip, thr, scale, training, has_super, tg,
):
    if training:
        z_ref, y_ref, inv_ref, agg_ref = outs[:4]
        slab_ref, sem, msg_ref, msem = outs[4:]
    else:
        (z_ref,) = outs[:1]
        slab_ref, sem, msg_ref, msem = outs[1:]
    t = pl.program_id(0)
    copy = functools.partial(_slab_copy, x_hbm, slab_ref, sem,
                             tile=tile, width=width, n_nodes=n_nodes)
    if has_spill:
        scopy = functools.partial(_spill_copy, msgs_hbm, spill_off_ref,
                                  msg_ref, msem, n_spill=n_spill)

    def start_all(i, slot):
        copy(i, slot=slot).start()
        if has_spill:
            scopy(i, slot=slot).start()

    nbuf = slab_ref.shape[0]

    @pl.when(t == 0)
    def _():
        for j in range(min(nbuf, n_tiles)):
            start_all(j, j % nbuf)

    @pl.when(t > 0)
    def _():
        i = t + (nbuf - 1)

        @pl.when(i < n_tiles)
        def _():
            start_all(i, jax.lax.rem(i, nbuf))

    slot = jax.lax.rem(t, nbuf)
    copy(t, slot=slot).wait()

    b = band_ref[0]
    if jnp.issubdtype(b.dtype, jnp.integer):
        b = b.astype(jnp.float32).astype(x_dtype)
    acc = jnp.dot(b, slab_ref[slot].astype(b.dtype),
                  preferred_element_type=jnp.float32)
    if has_spill:
        scopy(t, slot=slot).wait()
        m_iota = jax.lax.broadcasted_iota(jnp.int32, (tile, SPILL_CHUNK), 1)
        sel = (m_iota >= lo_ref[0]) & (m_iota < hi_ref[0])
        sel = jnp.where(sel, jnp.float32(1), jnp.float32(0))
        acc = acc + jnp.dot(sel.astype(x_dtype), msg_ref[slot],
                            preferred_element_type=jnp.float32)

    if has_super:
        # per-row one-hot over the per-graph correction table: rows [0, G)
        # broadcast the graph's supernode features, rows [G, 2G) add the
        # star sum into the supernode row; sentinel tg selects nothing
        g_iota = jax.lax.broadcasted_iota(jnp.int32, (tile, tg), 1)
        selg = jnp.where(g_iota == gcode_ref[0], jnp.float32(1),
                         jnp.float32(0))
        acc = acc + jnp.dot(selg.astype(x_dtype), table_ref[...],
                            preferred_element_type=jnp.float32)

    agg = acc.astype(x_dtype)

    # the slab contains this tile's own rows at offset t*tile - start
    start = jnp.clip(t * tile - width // 2, 0, max(n_nodes - (tile + width), 0))
    loc = pl.multiple_of(t * tile - start, 8)
    x_tile = slab_ref[slot, pl.ds(loc, tile), :]

    out = (
        jnp.dot(agg, wl_ref[...], preferred_element_type=jnp.float32)
        + jnp.dot(x_tile, wr_ref[...], preferred_element_type=jnp.float32)
        + bl_ref[...].astype(jnp.float32)
    )

    sq = jnp.sum(out * out, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(jnp.maximum(sq, jnp.float32(1e-24)))
    y = out * inv

    r = jnp.maximum(y, jnp.float32(0.0))
    if skip:
        r = r + x_tile.astype(jnp.float32)
    if thr is not None:
        _seed_tile(seed_ref)
        bits = pltpu.bitcast(pltpu.prng_random_bits(r.shape), jnp.uint32)
        keep = bits < jnp.uint32(thr)
        r = jnp.where(keep, r * jnp.float32(scale), jnp.float32(0.0))

    z_ref[...] = r.astype(x_dtype)
    if training:
        y_ref[...] = y.astype(x_dtype)
        inv_ref[...] = inv
        agg_ref[...] = agg


def _call_fwd(x, w_l, b_l, w_r, band, spill_off, spill_lo, spill_hi,
              spill_messages, seed, gcode, table, *, tile, width, has_spill,
              skip, rate, training, interpret, has_super):
    n, h = x.shape
    n_tiles = n // tile
    slab = tile + width
    if not has_super:
        gcode = jnp.zeros((n_tiles, tile, 1), jnp.int32)
        table = jnp.zeros((8, h), x.dtype)
    tg = table.shape[0]
    n_spill = spill_messages.shape[0] if has_spill else SPILL_CHUNK
    if not has_spill:
        spill_off = jnp.zeros((n_tiles + 1,), jnp.int32)
        spill_lo = jnp.zeros((n_tiles, tile, 1), jnp.int32)
        spill_hi = jnp.zeros((n_tiles, tile, 1), jnp.int32)
        spill_messages = jnp.zeros((SPILL_CHUNK, h), x.dtype)
    thr = dropout_threshold(rate) if (training and rate > 0.0) else None
    scale = dropout_scale(rate) if thr is not None else None

    kern = functools.partial(
        _fwd_kernel, tile=tile, width=width, n_nodes=n, n_tiles=n_tiles,
        x_dtype=x.dtype, has_spill=has_spill, n_spill=n_spill, skip=skip,
        thr=thr, scale=scale, training=training, has_super=has_super, tg=tg,
    )
    out_block = pl.BlockSpec((tile, h), lambda t: (t, 0),
                             memory_space=pltpu.VMEM)
    out_shapes = [jax.ShapeDtypeStruct((n, h), x.dtype)]
    out_specs = [out_block]
    if training:
        out_shapes += [
            jax.ShapeDtypeStruct((n, h), x.dtype),      # y
            jax.ShapeDtypeStruct((n, 1), jnp.float32),  # inv
            jax.ShapeDtypeStruct((n, h), x.dtype),      # agg
        ]
        out_specs += [
            out_block,
            pl.BlockSpec((tile, 1), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            out_block,
        ]
    nbuf = _NBUF if n_tiles > 2 else 2
    outs = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # spill_off
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
            pl.BlockSpec((1, tile, slab), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),  # band
            pl.BlockSpec((1, tile, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),  # spill_lo
            pl.BlockSpec((1, tile, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),  # spill_hi
            pl.BlockSpec((h, h), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),  # w_l
            pl.BlockSpec((1, h), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),  # b_l
            pl.BlockSpec((h, h), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),  # w_r
            pl.BlockSpec((1, tile, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),  # gcode
            pl.BlockSpec((tg, h), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),  # table
            pl.BlockSpec(memory_space=pl.ANY),      # x
            pl.BlockSpec(memory_space=pl.ANY),      # spill_messages
        ],
        out_specs=out_specs if training else out_specs[0],
        out_shape=out_shapes if training else out_shapes[0],
        scratch_shapes=[
            pltpu.VMEM((nbuf, slab, h), x.dtype),
            pltpu.SemaphoreType.DMA((nbuf,)),
            pltpu.VMEM((nbuf, SPILL_CHUNK, h), x.dtype),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
        interpret=interpret,
    )(spill_off, seed, band, spill_lo, spill_hi, w_l, b_l, w_r, gcode,
      table, x, spill_messages)
    return outs


# --------------------------------------------------------------------- #
# backward tile kernel (dz -> dout; dW/db accumulation; dagg + direct dx)
# --------------------------------------------------------------------- #


def _bwd_kernel(
    seed_ref,
    dz_ref, y_ref, inv_ref, agg_ref, x_ref, wl_ref, wr_ref,
    dagg_ref, dxp_ref, dwl_ref, dwr_ref, dbl_ref,
    *, tile, x_dtype, skip, thr, scale, n_tiles,
):
    t = pl.program_id(0)
    dz = dz_ref[...].astype(jnp.float32)
    if thr is not None:
        _seed_tile(seed_ref)
        bits = pltpu.bitcast(pltpu.prng_random_bits(dz.shape), jnp.uint32)
        keep = bits < jnp.uint32(thr)
        dz = jnp.where(keep, dz * jnp.float32(scale), jnp.float32(0.0))
    y = y_ref[...].astype(jnp.float32)
    dy = jnp.where(y > 0.0, dz, jnp.float32(0.0))
    inv = inv_ref[...]
    s = jnp.sum(dy * y, axis=-1, keepdims=True)
    dout = (dy - y * s) * inv
    dout_c = dout.astype(x_dtype)

    # dagg = dout @ W_l^T ; direct dx = dout @ W_r^T (+ dz through the skip)
    dagg_ref[...] = jax.lax.dot_general(
        dout_c, wl_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x_dtype)
    dxp = jax.lax.dot_general(
        dout_c, wr_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if skip:
        dxp = dxp + dz
    dxp_ref[...] = dxp.astype(x_dtype)

    # weight/bias grads accumulate across the sequential grid in f32
    agg = agg_ref[...]
    x_t = x_ref[...]
    dwl_t = jax.lax.dot_general(
        agg, dout_c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dwr_t = jax.lax.dot_general(
        x_t, dout_c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbl_t = jnp.sum(dout, axis=0, keepdims=True)

    @pl.when(t == 0)
    def _():
        dwl_ref[...] = dwl_t
        dwr_ref[...] = dwr_t
        dbl_ref[...] = dbl_t

    @pl.when(t > 0)
    def _():
        dwl_ref[...] += dwl_t
        dwr_ref[...] += dwr_t
        dbl_ref[...] += dbl_t


def _call_bwd_tile(dz, y, inv, agg, x, w_l, w_r, seed, *, tile, skip, rate,
                   training_rate_active, interpret):
    n, h = dz.shape
    n_tiles = n // tile
    thr = dropout_threshold(rate) if training_rate_active else None
    scale = dropout_scale(rate) if thr is not None else None
    kern = functools.partial(
        _bwd_kernel, tile=tile, x_dtype=x.dtype, skip=skip, thr=thr,
        scale=scale, n_tiles=n_tiles,
    )
    blk = pl.BlockSpec((tile, h), lambda t: (t, 0), memory_space=pltpu.VMEM)
    blk1 = pl.BlockSpec((tile, 1), lambda t: (t, 0), memory_space=pltpu.VMEM)
    full = pl.BlockSpec((h, h), lambda t: (0, 0), memory_space=pltpu.VMEM)
    row = pl.BlockSpec((1, h), lambda t: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  blk, blk, blk1, blk, blk, full, full],
        out_specs=[blk, blk, full, full, row],
        out_shape=[
            jax.ShapeDtypeStruct((n, h), x.dtype),      # dagg
            jax.ShapeDtypeStruct((n, h), x.dtype),      # dxp
            jax.ShapeDtypeStruct((h, h), jnp.float32),  # dW_l
            jax.ShapeDtypeStruct((h, h), jnp.float32),  # dW_r
            jax.ShapeDtypeStruct((1, h), jnp.float32),  # db_l
        ],
        interpret=interpret,
    )(seed, dz, y, inv, agg, x, w_l, w_r)


# --------------------------------------------------------------------- #
# custom-vjp wrapper
# --------------------------------------------------------------------- #


def _zero_tangent(v):
    if jnp.issubdtype(v.dtype, jnp.integer) or v.dtype == jnp.bool_:
        return np.zeros(v.shape, dtypes.float0)
    return jnp.zeros_like(v)


def _super_tables(static, x, node_graph, node_mask_f, sn):
    """Per-graph correction table for the supernode star (ops/banded.py
    semantics): rows [0, G) = the graph's supernode features (broadcast to
    member nodes), rows [G, 2G) = graph_sum - supernode features (added
    into the supernode row). Zero rows for graphs without a supernode;
    padded to the sublane multiple."""
    from buckgnn_tpu.ops import segment

    g_cap = static["n_graph_cap"]
    gsum = segment.segment_sum_dense(x, node_graph, g_cap,
                                     keep=node_mask_f > 0)
    xsn = x[sn]
    has_super = (sn < x.shape[0] - 1).astype(x.dtype)[:, None]
    t1 = xsn * has_super
    t2 = (gsum - xsn) * has_super
    table = jnp.concatenate([t1, t2], axis=0)
    pad = static["tg"] - table.shape[0]
    if pad:
        table = jnp.concatenate(
            [table, jnp.zeros((pad, x.shape[1]), x.dtype)], axis=0
        )
    return table


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_layer(static, x, w_l, b_l, w_r, band, spill_off, spill_lo,
                 spill_hi, spill_s, seed, gcode, node_graph, node_mask_f,
                 sn, super_mask_f):
    z, *_ = _fused_layer_fwd(static, x, w_l, b_l, w_r, band, spill_off,
                             spill_lo, spill_hi, spill_s, seed, gcode,
                             node_graph, node_mask_f, sn, super_mask_f)
    return z


def _fused_layer_fwd(static, x, w_l, b_l, w_r, band, spill_off, spill_lo,
                     spill_hi, spill_s, seed, gcode, node_graph,
                     node_mask_f, sn, super_mask_f):
    msgs = x[spill_s] if static["has_spill"] else jnp.zeros((0, 0), x.dtype)
    table = (
        _super_tables(static, x, node_graph, node_mask_f, sn)
        if static["has_super"]
        else jnp.zeros((0, 0), x.dtype)
    )
    outs = _call_fwd(
        x, w_l, b_l, w_r, band, spill_off, spill_lo, spill_hi, msgs, seed,
        gcode, table,
        tile=static["tile"], width=static["width"],
        has_spill=static["has_spill"], skip=static["skip"],
        rate=static["rate"], training=static["training"],
        interpret=static["interpret"], has_super=static["has_super"],
    )
    if not static["training"]:
        return outs, None
    z, y, inv, agg = outs
    return z, (x, w_l, w_r, y, inv, agg, band, spill_off, spill_lo,
               spill_hi, spill_s, seed, b_l, gcode, node_graph,
               node_mask_f, sn, super_mask_f)


def _fused_layer_bwd(static, res, dz):
    from buckgnn_tpu.ops.pallas_banded import pallas_banded_matmul

    (x, w_l, w_r, y, inv, agg, band, spill_off, spill_lo, spill_hi,
     spill_s, seed, b_l, gcode, node_graph, node_mask_f, sn,
     super_mask_f) = res
    dagg, dxp, dwl, dwr, dbl = _call_bwd_tile(
        dz, y, inv, agg, x, w_l, w_r, seed,
        tile=static["tile"], skip=static["skip"], rate=static["rate"],
        training_rate_active=static["training"] and static["rate"] > 0.0,
        interpret=static["interpret"],
    )
    # dx = dxp + A @ dagg — the TOTAL adjacency (band + spill + supernode
    # stars) is symmetric (both edge directions materialized), so the
    # backward band/spill/star aggregation is the same operator applied to
    # the cotangent (ops/banded.py). The dxp accumulator and the supernode
    # tables (built from dagg) ride inside the band kernel, so backward
    # touches each [N, H] operand exactly once.
    spill_kw = (
        dict(spill_offsets=spill_off, spill_lo=spill_lo, spill_hi=spill_hi,
             spill_messages=dagg[spill_s])
        if static["has_spill"]
        else {}
    )
    super_kw = (
        dict(gcode=gcode,
             table=_super_tables(static, dagg, node_graph, node_mask_f, sn))
        if static["has_super"]
        else {}
    )
    dx = pallas_banded_matmul(
        band, dagg, static["tile"], static["width"],
        interpret=static["interpret"], out_dtype=x.dtype, acc=dxp,
        **spill_kw, **super_kw,
    )
    return (dx, dwl.astype(w_l.dtype), dbl.astype(b_l.dtype),
            dwr.astype(w_r.dtype), _zero_tangent(band),
            _zero_tangent(spill_off), _zero_tangent(spill_lo),
            _zero_tangent(spill_hi), _zero_tangent(spill_s),
            _zero_tangent(seed), _zero_tangent(gcode),
            _zero_tangent(node_graph), jnp.zeros_like(node_mask_f),
            _zero_tangent(sn), jnp.zeros_like(super_mask_f))


_fused_layer.defvjp(_fused_layer_fwd, _fused_layer_bwd)


def _round8(v: int) -> int:
    return ((v + 7) // 8) * 8


def supports_fused_layer(ctx, x, aggr: str, normalize: bool) -> bool:
    """Static eligibility of the fused layer for this batch/config."""
    if ctx is None or ctx.band is None or not ctx.use_pallas:
        return False
    batch = ctx.batch
    return (
        aggr in ("add", "sum")
        and normalize
        and x.shape[-1] % 128 == 0
        and not batch.has_spill2_edges
    )


def fused_sage_layer(
    x: jnp.ndarray,
    w_l: jnp.ndarray,
    b_l: jnp.ndarray,
    w_r: jnp.ndarray,
    ctx,
    *,
    skip: bool,
    rate: float,
    seed: jnp.ndarray | None,
    deterministic: bool,
) -> jnp.ndarray:
    """One full shared-SAGE layer: conv + normalize + relu (+skip) + dropout.

    ``seed``: two int32 words (ops/pallas_epilogue.seed_from_key); may be
    None when deterministic. Requires ``supports_fused_layer(...)``.
    """
    batch = ctx.batch
    training = not deterministic
    has_super = batch.has_supernode_edges
    g_cap = batch.n_graph_cap
    tg = _round8(2 * g_cap)
    static = dict(
        tile=batch.band_tile,
        width=batch.band_width,
        has_spill=batch.has_spill_edges,
        has_super=has_super,
        n_graph_cap=g_cap,
        tg=tg,
        skip=bool(skip),
        rate=float(rate) if training else 0.0,
        training=training,
        interpret=jax.default_backend() == "cpu",
    )
    # dict isn't hashable for nondiff_argnums — freeze it
    static = tuple(sorted(static.items()))
    if seed is None:
        seed = jnp.zeros((2,), jnp.int32)
    n_tiles = batch.n_node_cap // batch.band_tile
    if has_super:
        # per-row selector into the correction table (same trace across
        # layers -> CSE'd by XLA): broadcast-receivers pick row g, the
        # supernode row picks G+g, everyone else the sentinel tg
        g = batch.node_graph
        sn = batch.supernode_index
        m = ctx.super_gather_mask > 0
        is_super = jnp.zeros((batch.n_node_cap,), bool).at[sn].set(
            sn < batch.dead_node_index
        )
        gcode = jnp.where(m, g, jnp.where(is_super, g_cap + g, tg))
        gcode = gcode.astype(jnp.int32).reshape(n_tiles, batch.band_tile, 1)
        node_mask_f = batch.node_mask.astype(x.dtype)
        super_mask_f = ctx.super_gather_mask.astype(x.dtype)
    else:
        gcode = jnp.zeros((0,), jnp.int32)
        node_mask_f = jnp.zeros((0,), x.dtype)
        super_mask_f = jnp.zeros((0,), x.dtype)
    return _fused_layer(
        _StaticDict(static), x, w_l, b_l.reshape(1, -1), w_r, ctx.band,
        batch.spill_offsets, batch.spill_lo, batch.spill_hi,
        batch.spill_senders, seed, gcode, batch.node_graph, node_mask_f,
        batch.supernode_index, super_mask_f,
    )


class _StaticDict(dict):
    """Hashable static-config dict for custom_vjp nondiff args."""

    def __init__(self, items):
        super().__init__(items)
        self._items = items

    def __hash__(self):
        return hash(self._items)

    def __eq__(self, other):
        return isinstance(other, _StaticDict) and self._items == other._items
