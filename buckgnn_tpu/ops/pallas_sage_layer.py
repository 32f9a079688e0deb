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
correction table ([tg, H], star_table_geometry layout — broadcast rows
at [0, G), star sums at [T0, T0+G) with T0 = round8(G) — built per
layer from the layer input by cheap XLA segment ops) lives whole in
VMEM, and each row's contribution is one iota-compare selection matmul:
broadcast rows pick table row g, the supernode row picks T0+g
(graph_sum - own features), everyone else a sentinel that matches
nothing. Because graphs pack contiguously, a node tile intersects only
a few graphs: with batch.gwin/lcode/lacc present the kernels slice a
[2*GW, H] per-tile window out of the table (8-aligned dynamic slices)
and select with a K=2*GW matmul instead of K=tg — the full-table
selection measured 0.23 ms/layer at flagship shape (tg~264).

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

from buckgnn_tpu.graph.batch import (
    LOCAL_STAR_ROWS, SPILL_ALIGN, SPILL_CHUNK, star_table_geometry,
)
from buckgnn_tpu.ops.dropout import dropout_scale, dropout_threshold

# Slab-buffer depth and node tiles per grid step (matches
# ops/pallas_banded.py: unroll 2 with a 6-deep buffer amortizes the
# per-iteration DMA issue/wait overhead over two matmul chains and the
# deeper prefetch hides latency behind the epilogue math).
_NBUF = 8
_UNROLL_FWD = 4
# the merged backward holds 5 unroll-sized input blocks (double-buffered)
# plus the dagg ring / dxp hold in scoped VMEM; unroll 4 needs ~18 MB —
# over the 16 MB COMPILER-DEFAULT scoped-vmem limit but nowhere near the
# 128 MB physical VMEM, so the kernel raises vmem_limit_bytes and takes
# the deeper unroll (measured: 19.7 -> 19.2 ms/step at flagship shape)
_UNROLL_BWD = 4

# Per-kernel scoped-VMEM ceiling (pltpu.CompilerParams.vmem_limit_bytes).
# The 16 MB default is a compiler heuristic, not hardware: raising it
# admits deeper unrolls/buffers; the kernels above stay well under the
# 128 MB physical VMEM.
_VMEM_LIMIT = 64 * 1024 * 1024


def _pick_unroll(n_tiles: int, top: int) -> int:
    u = top
    while u > 1:
        if n_tiles % u == 0 and n_tiles > u:
            return u
        u //= 2
    return 1


# Route in-kernel row-sums (L2-norm forward, norm-backward s) through an
# MXU ones-matvec instead of a VPU lane reduce. Trace-time switch so
# benchmarks/probe_kernels.py can A/B it per kernel. Measured (v5e,
# flagship shape, benchmarks/probe_kernels.py): the MXU route LOSES —
# fwd 4.01 vs 3.12 ms, bwd tile 3.79 vs 3.53 ms — the [T, H] @ [H, 8]
# matvec's relayout + issue overhead exceeds the VPU lane-reduce cost.
ROWSUM_MXU = False

# Forward-kernel spill scheduling experiment (benchmarks/
# probe_spill_sched.py). The in-kernel spill costs 0.48 ms/layer vs the
# 0.14 ms MXU floor of its selection matmul (2026-08-20 probe; the bwd
# band kernel's identical code costs 0.13). Variants:
#   "inline"   — sel built in f32 + convert, matmul inline (delta 0.526)
#   "staged"   — all band matmuls first, spill matmuls in a second loop
#                (0.500 — within noise of inline)
#   "dma2"     — window fetched as two half-window DMAs, the second gated
#                on the tile needing rows beyond CHUNK/2 — NEGATIVE
#                (0.665): the split matmul + scalar select cost more than
#                the saved window traffic; the delta is MXU/scheduling-
#                inherent, not DMA-bound
# ("bf16sel" — building sel directly in bf16 — does NOT compile: Mosaic
#  can't relayout the i1 mask from the i32-compare (8,128) layout to the
#  16-bit (16,128) layout; the f32 where + convert is the working form.)
# Measured 2026-08-20, benchmarks/probe_spill_sched.py, virtual-edge
# flagship shape (404 tiles, 34k spill rows); spill-off anchor 1.69 ms.
SPILL_SCHED = "inline"

# PROBE-ONLY (benchmarks/probe_epilogue_cost.py): attribute the forward
# kernel's time above its MXU floor. "full" = production. "nonorm" skips
# the L2-norm row-sum/rsqrt (inv := 1). "bare" additionally skips
# relu/skip/dropout (z := out). Both produce WRONG values — never set
# outside a probe.
PROBE_EPILOGUE = "full"

# Width of the dropout threshold compare. 32 = one hardware-PRNG word per
# element; 16/8 slice 2/4 thresholds out of each word, quartering/halving
# the in-kernel PRNG generation in BOTH passes at the cost of a few
# quarter-size shift/mask/compare ops and a lane concat. The keep
# probability quantizes to thr/2^bits with the scale tracking it exactly
# (ops/dropout.py). Trace-time switch; forward and backward read it at
# the same trace so the regenerated masks always agree.
DROPOUT_BITS = 32


def _keep_mask(shape: tuple, thr: int) -> jnp.ndarray:
    """[T, H] bool keep mask from the seeded in-kernel PRNG.

    thr is dropout_threshold(rate, DROPOUT_BITS). For sub-word widths the
    H axis is covered by k = 32/bits slices of a [T, H/k] word array;
    element (i, j) takes byte/halfword j // (H/k) of word (i, j % (H/k)).
    The assignment of PRNG bits to elements is an arbitrary bijection —
    only fwd/bwd agreement matters, and both run this exact code.
    """
    bits = DROPOUT_BITS
    if bits == 32:
        w = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        return w < jnp.uint32(thr)
    k = 32 // bits
    t, h = shape
    assert h % k == 0, "feature dim must divide the PRNG word slicing"
    words = pltpu.bitcast(pltpu.prng_random_bits((t, h // k)), jnp.uint32)
    mask = jnp.uint32(2**bits - 1)
    parts = [
        ((words >> jnp.uint32(bits * i)) & mask) < jnp.uint32(thr)
        for i in range(k)
    ]
    return jnp.concatenate(parts, axis=1)


def _rowsum(v: jnp.ndarray) -> jnp.ndarray:
    """[T, H] f32 -> [T, 1] row sums."""
    if ROWSUM_MXU:
        ones = jnp.ones((v.shape[-1], 8), jnp.float32)
        return jnp.dot(v, ones, preferred_element_type=jnp.float32)[:, :1]
    return jnp.sum(v, axis=-1, keepdims=True)


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


def _spill_win_start(off_ref, t, n_spill):
    start = jnp.clip(
        (off_ref[t] // SPILL_ALIGN) * SPILL_ALIGN, 0, n_spill - SPILL_CHUNK
    )
    return pl.multiple_of(start, SPILL_ALIGN)


def _spill_copy(msgs_hbm, off_ref, msg_ref, msem, t, *, n_spill, slot):
    start = _spill_win_start(off_ref, t, n_spill)
    return pltpu.make_async_copy(
        msgs_hbm.at[pl.ds(start, SPILL_CHUNK), :], msg_ref.at[slot],
        msem.at[slot],
    )


def _spill_copy_half(msgs_hbm, off_ref, msg_ref, msem, t, *, n_spill,
                     slot, part):
    """Half-window copy for SPILL_SCHED == 'dma2'. ``msem`` is [nbuf, 2].
    The second half (part=1) is started/waited only under
    ``_spill_need2``; rows beyond a tile's hi are never selected, so a
    stale upper half is inert when skipped."""
    half = SPILL_CHUNK // 2
    start = _spill_win_start(off_ref, t, n_spill) + part * half
    start = pl.multiple_of(start, SPILL_ALIGN)
    return pltpu.make_async_copy(
        msgs_hbm.at[pl.ds(start, half), :],
        msg_ref.at[slot, pl.ds(part * half, half)],
        msem.at[slot, part],
    )


def _spill_need2(off_ref, t, n_spill):
    # does this tile's spill range extend past the first half-window?
    start = _spill_win_start(off_ref, t, n_spill)
    return off_ref[t + 1] - start > SPILL_CHUNK // 2


def _seed_tile(seed_ref, t):
    # Mosaic's prng_seed takes at most 2 words; mix the NODE-TILE index into
    # the first with a Weyl increment. The forward (unrolled grid) and the
    # backward (one tile per grid step) both key on the tile index, so both
    # passes see the same bit stream regardless of their grid shapes.
    pltpu.prng_seed(seed_ref[0] ^ (t * jnp.int32(-1640531527)), seed_ref[1])


def _fwd_kernel(
    # scalar-prefetch / SMEM
    spill_off_ref, seed_ref, wbase_ref,
    # VMEM blocks
    band_ref, lo_ref, hi_ref, wl_ref, bl_ref, wr_ref, gcode_ref,
    lcode_ref, table_ref, gacc_ref, lacc_ref,
    # ANY (HBM)
    x_hbm, msgs_hbm,
    # outputs
    *outs,
    # scratch appended after outputs by pallas_call
    tile, width, n_nodes, n_tiles, x_dtype, has_spill, n_spill,
    skip, thr, scale, save_res, has_super, tg, unroll, emit_table,
    local_star,
):
    outs = list(outs)
    z_ref = outs.pop(0)
    if save_res:
        y_ref, inv_ref, agg_ref = outs.pop(0), outs.pop(0), outs.pop(0)
    if emit_table:
        ftab_ref = outs.pop(0)
        facc_ref = outs.pop()  # scratch accumulator (appended last)
    slab_ref, sem, msg_ref, msem = outs
    p = pl.program_id(0)
    copy = functools.partial(_slab_copy, x_hbm, slab_ref, sem,
                             tile=tile, width=width, n_nodes=n_nodes)
    if has_spill:
        scopy = functools.partial(_spill_copy, msgs_hbm, spill_off_ref,
                                  msg_ref, msem, n_spill=n_spill)
        shalf = functools.partial(_spill_copy_half, msgs_hbm, spill_off_ref,
                                  msg_ref, msem, n_spill=n_spill)
        sneed2 = functools.partial(_spill_need2, spill_off_ref,
                                   n_spill=n_spill)

    def spill_start(i, slot):
        if SPILL_SCHED == "dma2":
            shalf(i, slot=slot, part=0).start()

            @pl.when(sneed2(i))
            def _():
                shalf(i, slot=slot, part=1).start()
        else:
            scopy(i, slot=slot).start()

    def spill_wait(i, slot):
        if SPILL_SCHED == "dma2":
            shalf(i, slot=slot, part=0).wait()

            @pl.when(sneed2(i))
            def _():
                shalf(i, slot=slot, part=1).wait()
        else:
            scopy(i, slot=slot).wait()

    def start_all(i, slot):
        copy(i, slot=slot).start()
        if has_spill:
            spill_start(i, slot)

    nbuf = slab_ref.shape[0]
    base = p * unroll

    @pl.when(p == 0)
    def _():
        for j in range(min(nbuf, n_tiles)):
            start_all(j, j % nbuf)

    @pl.when(p > 0)
    def _():
        # keep the buffer nbuf tiles ahead: previous steps already started
        # tiles [0, base + (nbuf - unroll)); start the next `unroll`
        for j in range(unroll):
            i = base + (nbuf - unroll) + j

            @pl.when(i < n_tiles)
            def _():
                start_all(i, jax.lax.rem(i, nbuf))

    # two passes over the unrolled tiles: all MXU work first, then the
    # VPU epilogues — gives Mosaic's scheduler independent matmul and
    # vector chains to interleave instead of a strict
    # matmul->epilogue->matmul sequence per tile
    def spill_term(j, t, slot):
        m_iota = jax.lax.broadcasted_iota(jnp.int32,
                                          (tile, SPILL_CHUNK), 1)
        mask = (m_iota >= lo_ref[j]) & (m_iota < hi_ref[j])
        # sel must be built in f32 then converted: Mosaic cannot relayout
        # the i1 mask from the i32-compare (8,128) layout straight to a
        # 16-bit (16,128) layout
        sel = jnp.where(mask, jnp.float32(1),
                        jnp.float32(0)).astype(x_dtype)
        if SPILL_SCHED == "dma2":
            # the upper half-window may hold stale/uninitialized rows when
            # its DMA was skipped; sel is zero there, but 0 * NaN = NaN —
            # discard with a SELECT on the same scalar that gated the DMA
            half = SPILL_CHUNK // 2
            t1 = jnp.dot(sel[:, :half], msg_ref[slot, :half],
                         preferred_element_type=jnp.float32)
            t2 = jnp.dot(sel[:, half:], msg_ref[slot, half:],
                         preferred_element_type=jnp.float32)
            return t1 + jnp.where(sneed2(t), t2,
                                  jnp.zeros_like(t2))
        return jnp.dot(sel, msg_ref[slot],
                       preferred_element_type=jnp.float32)

    accs = []
    for j in range(unroll):
        t = base + j
        slot = jax.lax.rem(t, nbuf)
        copy(t, slot=slot).wait()

        b = band_ref[j]
        if jnp.issubdtype(b.dtype, jnp.integer):
            b = b.astype(jnp.float32).astype(x_dtype)
        acc = jnp.dot(b, slab_ref[slot].astype(b.dtype),
                      preferred_element_type=jnp.float32)
        if has_spill and SPILL_SCHED != "staged":
            spill_wait(t, slot)
            acc = acc + spill_term(j, t, slot)
        accs.append((t, slot, acc))
    if has_spill and SPILL_SCHED == "staged":
        accs = [(t, slot, acc + (spill_wait(t, slot)
                                 or spill_term(j, t, slot)))
                for j, (t, slot, acc) in enumerate(accs)]

    staged = []
    for j, (t, slot, acc) in enumerate(accs):

        if has_super:
            # per-row one-hot over the per-graph correction table: rows
            # [0, G) broadcast the graph's supernode features, rows
            # [T0, T0+G) add the star sum into the supernode row; the
            # sentinel code selects nothing
            if local_star:
                # graphs are contiguous, so this tile's codes live in a
                # [2*GW, H] window of the table: slice both halves at the
                # 8-aligned per-tile base and select with a K=2*GW matmul
                # instead of K=tg (measured 0.23 ms/layer at K~264)
                gw = min(LOCAL_STAR_ROWS, tg // 2)
                wb = pl.multiple_of(wbase_ref[t], 8)
                ltab = jnp.concatenate(
                    [table_ref[pl.ds(wb, gw), :],
                     table_ref[pl.ds(pl.multiple_of(tg // 2 + wb, 8),
                                     gw), :]], axis=0)
                g_iota = jax.lax.broadcasted_iota(
                    jnp.int32, (tile, 2 * gw), 1)
                selg = jnp.where(g_iota == lcode_ref[j], jnp.float32(1),
                                 jnp.float32(0))
                acc = acc + jnp.dot(selg.astype(x_dtype), ltab,
                                    preferred_element_type=jnp.float32)
            else:
                g_iota = jax.lax.broadcasted_iota(jnp.int32, (tile, tg), 1)
                selg = jnp.where(g_iota == gcode_ref[j], jnp.float32(1),
                                 jnp.float32(0))
                acc = acc + jnp.dot(selg.astype(x_dtype), table_ref[...],
                                    preferred_element_type=jnp.float32)

        agg = acc.astype(x_dtype)

        # the slab contains this tile's own rows at offset t*tile - start
        start = jnp.clip(t * tile - width // 2,
                         0, max(n_nodes - (tile + width), 0))
        loc = pl.multiple_of(t * tile - start, 8)
        x_tile = slab_ref[slot, pl.ds(loc, tile), :]

        out = (
            jnp.dot(agg, wl_ref[...], preferred_element_type=jnp.float32)
            + jnp.dot(x_tile, wr_ref[...], preferred_element_type=jnp.float32)
            + bl_ref[...].astype(jnp.float32)
        )
        staged.append((t, out, agg, x_tile))

    for j, (t, out, agg, x_tile) in enumerate(staged):
        if PROBE_EPILOGUE == "full":
            # row-sum stays on the VPU (the MXU ones-matvec variant
            # measured slower — see ROWSUM_MXU)
            sq = _rowsum(out * out)
            inv = jax.lax.rsqrt(jnp.maximum(sq, jnp.float32(1e-24)))
        else:  # probe: skip the norm reduce
            inv = jnp.ones((out.shape[0], 1), jnp.float32)
        y = out * inv

        if PROBE_EPILOGUE == "bare":  # probe: skip the whole epilogue
            r = y
        else:
            r = jnp.maximum(y, jnp.float32(0.0))
            if skip:
                r = r + x_tile.astype(jnp.float32)
            if thr is not None:
                _seed_tile(seed_ref, t)
                keep = _keep_mask(r.shape, thr)
                r = jnp.where(keep, r * jnp.float32(scale), jnp.float32(0.0))

        row = pl.ds(j * tile, tile)
        z = r.astype(x_dtype)
        z_ref[row, :] = z
        if save_res:
            y_ref[row, :] = y.astype(x_dtype)
            # store inv TRANSPOSED ([1, tile] rows): a [N, 1] f32 array
            # lane-pads 128x in HBM (~59 MB per layer each way); the row
            # layout costs one tiny in-kernel transpose instead
            inv_ref[j] = jnp.transpose(inv)
            agg_ref[row, :] = agg
        if emit_table:
            # accumulate the NEXT layer's star table from z on the fly
            # (_super_tables semantics: gacc codes put the supernode row
            # into [0, G) and real non-super rows into [T0, T0+G)) —
            # kills the per-layer XLA table build between kernels
            # (measured 0.146 ms/layer, an [N,H] re-read at the fusion
            # bandwidth floor)
            if local_star:
                gw = min(LOCAL_STAR_ROWS, tg // 2)
                wb = pl.multiple_of(wbase_ref[t], 8)
                a_iota = jax.lax.broadcasted_iota(
                    jnp.int32, (2 * gw, tile), 0)
                sela = jnp.where(a_iota == lacc_ref[j], jnp.float32(1),
                                 jnp.float32(0))
                tb = jnp.dot(sela.astype(x_dtype), z,
                             preferred_element_type=jnp.float32)

                @pl.when(t == 0)
                def _():
                    facc_ref[...] = jnp.zeros((tg, tb.shape[1]),
                                              jnp.float32)

                facc_ref[pl.ds(wb, gw), :] += tb[:gw]
                facc_ref[
                    pl.ds(pl.multiple_of(tg // 2 + wb, 8), gw), :
                ] += tb[gw:]
            else:
                a_iota = jax.lax.broadcasted_iota(jnp.int32, (tg, tile), 0)
                sela = jnp.where(a_iota == gacc_ref[j], jnp.float32(1),
                                 jnp.float32(0))
                tb = jnp.dot(sela.astype(x_dtype), z,
                             preferred_element_type=jnp.float32)

                @pl.when(t == 0)
                def _():
                    facc_ref[...] = tb

                @pl.when(t > 0)
                def _():
                    facc_ref[...] += tb

            @pl.when(t == n_tiles - 1)
            def _():
                ftab_ref[...] = facc_ref[...]


def _call_fwd(x, w_l, b_l, w_r, band, spill_off, spill_lo, spill_hi,
              spill_messages, seed, gcode, table, gacc, gwin, lcode, lacc,
              *, tile, width, has_spill, skip, rate, training, save_res,
              interpret, has_super, emit_table, local_star):
    n, h = x.shape
    n_tiles = n // tile
    slab = tile + width
    # Dummy operands REUSE live same-shaped arrays wherever possible: a
    # fresh jnp.zeros dummy materializes a broadcast + relayout copy in
    # every step (~0.08 ms each for the [n_tiles, T, 1] int32 shapes,
    # measured in the XLA op profile); the kernel never reads them.
    if not has_super:
        gcode = jnp.zeros((n_tiles, tile, 1), jnp.int32)
        table = jnp.zeros((8, h), x.dtype)
    if local_star:
        gcode = lcode  # global-selection path unread
    if not local_star:
        gwin = jnp.zeros((n_tiles,), jnp.int32)
        lcode = gcode if gcode.ndim == 3 else jnp.zeros(
            (n_tiles, tile, 1), jnp.int32)
    if not emit_table:
        gacc = jnp.zeros((n_tiles, 1, tile), jnp.int32)
    if not (emit_table and local_star):
        lacc = gacc  # same shape, unread
    tg = table.shape[0]
    n_spill = spill_messages.shape[0] if has_spill else SPILL_CHUNK
    if not has_spill:
        spill_off = jnp.zeros((n_tiles + 1,), jnp.int32)
        spill_lo = lcode   # same shape/dtype, unread without spill
        spill_hi = lcode
        spill_messages = jnp.zeros((SPILL_CHUNK, h), x.dtype)
    active = training and rate > 0.0
    thr = dropout_threshold(rate, DROPOUT_BITS) if active else None
    scale = dropout_scale(rate, DROPOUT_BITS) if thr is not None else None
    unroll = _pick_unroll(n_tiles, _UNROLL_FWD)

    kern = functools.partial(
        _fwd_kernel, tile=tile, width=width, n_nodes=n, n_tiles=n_tiles,
        x_dtype=x.dtype, has_spill=has_spill, n_spill=n_spill, skip=skip,
        thr=thr, scale=scale, save_res=save_res, has_super=has_super,
        tg=tg, unroll=unroll, emit_table=emit_table, local_star=local_star,
    )
    out_block = pl.BlockSpec((unroll * tile, h), lambda p: (p, 0),
                             memory_space=pltpu.VMEM)
    out_shapes = [jax.ShapeDtypeStruct((n, h), x.dtype)]
    out_specs = [out_block]
    if save_res:
        out_shapes += [
            jax.ShapeDtypeStruct((n, h), x.dtype),            # y
            jax.ShapeDtypeStruct((n_tiles, 1, tile),
                                 jnp.float32),                # inv (rows)
            jax.ShapeDtypeStruct((n, h), x.dtype),            # agg
        ]
        out_specs += [
            out_block,
            pl.BlockSpec((unroll, 1, tile), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            out_block,
        ]
    if emit_table:
        out_shapes.append(jax.ShapeDtypeStruct((tg, h), jnp.float32))
        out_specs.append(pl.BlockSpec((tg, h), lambda p: (0, 0),
                                      memory_space=pltpu.VMEM))
    nbuf = max(_NBUF, 2 * unroll) if n_tiles > 2 else 2
    scratch = [
        pltpu.VMEM((nbuf, slab, h), x.dtype),
        pltpu.SemaphoreType.DMA((nbuf,)),
        pltpu.VMEM((nbuf, SPILL_CHUNK, h), x.dtype),
        pltpu.SemaphoreType.DMA(
            (nbuf, 2) if SPILL_SCHED == "dma2" else (nbuf,)),
    ]
    if emit_table:
        scratch.append(pltpu.VMEM((tg, h), jnp.float32))
    outs = pl.pallas_call(
        kern,
        grid=(n_tiles // unroll,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # spill_off
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
            pl.BlockSpec(memory_space=pltpu.SMEM),  # wbase (gwin)
            pl.BlockSpec((unroll, tile, slab), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),  # band
            pl.BlockSpec((unroll, tile, 1), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),  # spill_lo
            pl.BlockSpec((unroll, tile, 1), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),  # spill_hi
            pl.BlockSpec((h, h), lambda p: (0, 0),
                         memory_space=pltpu.VMEM),  # w_l
            pl.BlockSpec((1, h), lambda p: (0, 0),
                         memory_space=pltpu.VMEM),  # b_l
            pl.BlockSpec((h, h), lambda p: (0, 0),
                         memory_space=pltpu.VMEM),  # w_r
            pl.BlockSpec((unroll, tile, 1), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),  # gcode
            pl.BlockSpec((unroll, tile, 1), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),  # lcode
            pl.BlockSpec((tg, h), lambda p: (0, 0),
                         memory_space=pltpu.VMEM),  # table
            pl.BlockSpec((unroll, 1, tile), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),  # gacc
            pl.BlockSpec((unroll, 1, tile), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),  # lacc
            pl.BlockSpec(memory_space=pl.ANY),      # x
            pl.BlockSpec(memory_space=pl.ANY),      # spill_messages
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(spill_off, seed, gwin, band, spill_lo, spill_hi, w_l, b_l, w_r,
      gcode, lcode, table, gacc, lacc, x, spill_messages)
    return outs


# --------------------------------------------------------------------- #
# backward tile kernel (dz -> dout; dW/db accumulation; dagg + direct dx)
# --------------------------------------------------------------------- #


def _bwd_kernel(
    seed_ref,
    dz_ref, y_ref, inv_ref, agg_ref, x_ref, wl_ref, wr_ref, gacc_ref,
    *outs,
    tile, x_dtype, skip, thr, scale, n_tiles, has_super, tg,
):
    outs = list(outs)
    dagg_ref, dxp_ref, dwl_ref, dwr_ref, dbl_ref = outs[:5]
    if has_super:
        tbwd_ref = outs[5]
        tacc_ref = outs[-1]  # VMEM scratch accumulator
    t = pl.program_id(0)
    dz = dz_ref[...].astype(jnp.float32)
    if thr is not None:
        _seed_tile(seed_ref, t)
        keep = _keep_mask(dz.shape, thr)
        dz = jnp.where(keep, dz * jnp.float32(scale), jnp.float32(0.0))
    y = y_ref[...].astype(jnp.float32)
    dy = jnp.where(y > 0.0, dz, jnp.float32(0.0))
    inv = jnp.transpose(inv_ref[0])  # [1, tile] row -> column
    # row-sum optionally via MXU — see the forward kernel's norm note
    s = _rowsum(dy * y)
    dout = (dy - y * s) * inv
    dout_c = dout.astype(x_dtype)

    # dagg = dout @ W_l^T ; direct dx = dout @ W_r^T (+ dz through the skip)
    dagg = jax.lax.dot_general(
        dout_c, wl_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x_dtype)
    dagg_ref[...] = dagg
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
    if has_super:
        # the backward band aggregation's supernode tables are
        # _super_tables(dagg) — accumulate them here so dagg is never
        # re-read for an XLA table build ([tg, T] one-hot, no relayout)
        a_iota = jax.lax.broadcasted_iota(jnp.int32, (tg, tile), 0)
        sela = jnp.where(a_iota == gacc_ref[0], jnp.float32(1),
                         jnp.float32(0))
        tb = jnp.dot(sela.astype(x_dtype), dagg,
                     preferred_element_type=jnp.float32)

    @pl.when(t == 0)
    def _():
        dwl_ref[...] = dwl_t
        dwr_ref[...] = dwr_t
        dbl_ref[...] = dbl_t
        if has_super:
            tacc_ref[...] = tb

    @pl.when(t > 0)
    def _():
        dwl_ref[...] += dwl_t
        dwr_ref[...] += dwr_t
        dbl_ref[...] += dbl_t
        if has_super:
            tacc_ref[...] += tb

    if has_super:
        @pl.when(t == n_tiles - 1)
        def _():
            tbwd_ref[...] = tacc_ref[...]


# --------------------------------------------------------------------- #
# merged backward kernel: tile math + band aggregation in ONE kernel.
#
# The split backward (tile kernel -> HBM dagg -> band kernel) round-trips
# the [N, H] dagg through HBM (~237 MB/step/layer) and pays a kernel
# boundary. Here dagg lives only in a 3-slot VMEM ring: grid step t runs
# the tile math for node tile t (producing ring[t % 3]) and the band
# aggregation for OUTPUT tile j = t-1, whose slab rows [start_j,
# start_j + slab) are covered by ring slots j-1, j, j+1 (clamped at the
# edges exactly like the forward slab DMA — graph/batch.py packs the band
# with clamped starts). Grid runs n_tiles + 1 steps; the +1 drains the
# last output tile.
#
# Supernode stars need GLOBAL dagg sums, which don't exist until the last
# grid step — so this layer's star contribution to dx is NOT applied here.
# Instead the kernel emits the star table (accumulated from dagg on the
# fly) and the NEXT layer's backward (or graph/banded.py::star_source for
# the first layer) adds table[gcode] to the cotangent it receives — see
# fused_sage_layer's star threading. Scope: has_spill batches keep the
# split backward (spill messages are gathered from a full dagg).
# --------------------------------------------------------------------- #


def _bwd_merged_kernel(
    seed_ref, wbase_ref,
    dz_ref, y_ref, inv_ref, agg_ref, x_ref, wlr_ref, gacc_ref, lacc_ref,
    gcode_ref, lcode_ref, tprev_ref, band_ref,
    *outs,
    tile, width, x_dtype, skip, thr, scale, n_tiles, has_super,
    apply_prev, tg, unroll, local_star,
):
    outs = list(outs)
    dx_ref, dwl_ref, dwr_ref, dbl_ref = outs[:4]
    rest = outs[4:]
    if has_super:
        town_ref = rest.pop(0)
    ring_ref, hold_ref, slab_ref = rest[:3]
    if has_super:
        tacc_ref = rest[3]
    p = pl.program_id(0)
    w2 = width // 2
    n_steps = n_tiles // unroll
    ring_n = 2 * unroll + 2
    hold_n = 2 * unroll

    def tile_sub(sub, first):
        """Tile math for node tile t = p*unroll + sub; ``first`` is
        statically True only in the p == 0 region's first sub (set
        accumulators instead of +=)."""
        t = p * unroll + sub
        row = pl.ds(sub * tile, tile)
        dz = dz_ref[row, :].astype(jnp.float32)
        if apply_prev:
            # pending star of the NEXT layer (threaded table_prev):
            # the cotangent this kernel received is missing
            # table_prev[gcode]
            if local_star:
                gw = min(LOCAL_STAR_ROWS, tg // 2)
                wb = pl.multiple_of(wbase_ref[t], 8)
                ltab = jnp.concatenate(
                    [tprev_ref[pl.ds(wb, gw), :],
                     tprev_ref[pl.ds(pl.multiple_of(tg // 2 + wb, 8),
                                     gw), :]], axis=0)
                g_iota = jax.lax.broadcasted_iota(
                    jnp.int32, (tile, 2 * gw), 1)
                selg = jnp.where(g_iota == lcode_ref[sub],
                                 jnp.float32(1), jnp.float32(0))
                dz_eff = dz + jnp.dot(
                    selg.astype(x_dtype), ltab,
                    preferred_element_type=jnp.float32)
            else:
                g_iota = jax.lax.broadcasted_iota(
                    jnp.int32, (tile, tg), 1)
                selg = jnp.where(g_iota == gcode_ref[sub],
                                 jnp.float32(1), jnp.float32(0))
                dz_eff = dz + jnp.dot(
                    selg.astype(x_dtype), tprev_ref[...],
                    preferred_element_type=jnp.float32)
        else:
            dz_eff = dz
        if thr is not None:
            _seed_tile(seed_ref, t)
            keep = _keep_mask(dz_eff.shape, thr)
            dz_eff = jnp.where(keep, dz_eff * jnp.float32(scale),
                               jnp.float32(0.0))
        y = y_ref[row, :].astype(jnp.float32)
        dy = jnp.where(y > 0.0, dz_eff, jnp.float32(0.0))
        inv = jnp.transpose(inv_ref[sub])  # [1, tile] row -> column
        s = _rowsum(dy * y)
        dout = (dy - y * s) * inv
        dout_c = dout.astype(x_dtype)

        # dagg | dxp as ONE [T, H] @ [H, 2H] matmul against the
        # pre-concatenated [W_l^T | W_r^T]
        h = dout_c.shape[1]
        both = jnp.dot(dout_c, wlr_ref[...],
                       preferred_element_type=jnp.float32)
        dagg = both[:, :h].astype(x_dtype)
        ring_ref[jax.lax.rem(t, ring_n)] = dagg
        dxp = both[:, h:]
        if skip:
            dxp = dxp + dz_eff
        hold_ref[jax.lax.rem(t, hold_n)] = dxp.astype(x_dtype)

        dwl_t = jax.lax.dot_general(
            agg_ref[row, :], dout_c, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dwr_t = jax.lax.dot_general(
            x_ref[row, :], dout_c, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dbl_t = jnp.sum(dout, axis=0, keepdims=True)
        if has_super:
            if local_star:
                # accumulate into a [2*GW, H] window slice of tacc
                # (K=tile matmul with M=2*GW instead of M=tg)
                gw = min(LOCAL_STAR_ROWS, tg // 2)
                wb = pl.multiple_of(wbase_ref[t], 8)
                a_iota = jax.lax.broadcasted_iota(
                    jnp.int32, (2 * gw, tile), 0)
                sela = jnp.where(a_iota == lacc_ref[sub],
                                 jnp.float32(1), jnp.float32(0))
                tb = jnp.dot(sela.astype(x_dtype), dagg,
                             preferred_element_type=jnp.float32)

                def store_tb(first):
                    if first:
                        # windows only touch their own rows — zero
                        # the whole accumulator before the first add
                        tacc_ref[...] = jnp.zeros(
                            (tg, tb.shape[1]), jnp.float32)
                    tacc_ref[pl.ds(wb, gw), :] += tb[:gw]
                    tacc_ref[
                        pl.ds(pl.multiple_of(tg // 2 + wb, 8), gw), :
                    ] += tb[gw:]
            else:
                a_iota = jax.lax.broadcasted_iota(
                    jnp.int32, (tg, tile), 0)
                sela = jnp.where(a_iota == gacc_ref[sub],
                                 jnp.float32(1), jnp.float32(0))
                tb = jnp.dot(sela.astype(x_dtype), dagg,
                             preferred_element_type=jnp.float32)

                def store_tb(first):
                    if first:
                        tacc_ref[...] = tb
                    else:
                        tacc_ref[...] += tb

        if first:
            dwl_ref[...] = dwl_t
            dwr_ref[...] = dwr_t
            dbl_ref[...] = dbl_t
            if has_super:
                store_tb(True)
        else:
            dwl_ref[...] += dwl_t
            dwr_ref[...] += dwr_t
            dbl_ref[...] += dbl_t
            if has_super:
                store_tb(False)

    def band_sub(sub):
        """dx for output tile j = (p-1)*unroll + sub (one-STEP lag: the
        highest ring tile needed, j+1 = p*unroll + sub, landed in this
        step's tile phase): band_j @ dagg_slab + dxp_j, slab assembled
        from the ring. Slab start = clip(j*tile - w2, 0, n - slab) (the
        forward's clamped windows): interior tiles read [j-1 tail w2 |
        j | j+1 head w2]; the first tile reads [0, slab), the last
        [n - slab, n). Each sub owns its own slab scratch slot so the
        four band matmuls carry no write-after-read hazard between
        them."""
        j = (p - 1) * unroll + sub
        row = pl.ds(sub * tile, tile)
        b = band_ref[sub]
        if jnp.issubdtype(b.dtype, jnp.integer):
            b = b.astype(jnp.float32).astype(x_dtype)
        base = hold_ref[jax.lax.rem(j, hold_n)].astype(jnp.float32)
        r_prev = ring_ref[jax.lax.rem(j + ring_n - 1, ring_n)]
        r_cur = ring_ref[jax.lax.rem(j, ring_n)]
        r_next = ring_ref[jax.lax.rem(j + 1, ring_n)]
        # assemble the dagg slab CONTIGUOUSLY (cheap VPU copies) so
        # the band application is ONE full-K matmul instead of three
        # partial-K ones (K=64 matmuls run well off MXU peak)
        @pl.when(j == 0)
        def _():
            slab_ref[sub, :tile] = r_cur
            slab_ref[sub, tile:] = r_next[:width]

        @pl.when((j > 0) & (j < n_tiles - 1))
        def _():
            slab_ref[sub, :w2] = r_prev[tile - w2:]
            slab_ref[sub, w2:w2 + tile] = r_cur
            slab_ref[sub, w2 + tile:] = r_next[:w2]

        @pl.when(j == n_tiles - 1)
        def _():
            slab_ref[sub, :width] = r_prev[tile - width:]
            slab_ref[sub, width:] = r_cur

        acc = base + jnp.dot(b, slab_ref[sub],
                             preferred_element_type=jnp.float32)
        dx_ref[row, :] = acc.astype(x_dtype)

    def emit_town():
        if has_super:
            @pl.when(p == n_steps - 1)
            def _():
                town_ref[...] = tacc_ref[...]

    # Three regions instead of two overlapping pl.when phases: interior
    # steps run tile AND band work in ONE conditional body, so the
    # scheduler can overlap the band subs' VPU slab assembly with the
    # tile subs' matmul chains (separate pl.when regions are control-flow
    # barriers that serialize the two phases).
    @pl.when(p == 0)
    def _first_step():
        for sub in range(unroll):
            tile_sub(sub, first=sub == 0)
        emit_town()  # n_steps == 1

    @pl.when((p > 0) & (p < n_steps))
    def _interior():
        for sub in range(unroll):
            tile_sub(sub, first=False)
        for sub in range(unroll):
            band_sub(sub)
        emit_town()

    @pl.when(p == n_steps)
    def _drain():
        for sub in range(unroll):
            band_sub(sub)


def _call_bwd_merged(dz, y, inv, agg, x, w_l, w_r, seed, gacc, gcode,
                     table_prev, band, gwin, lcode, lacc, *, tile, width,
                     skip, rate, training_rate_active, interpret,
                     has_super, apply_prev, tg, local_star):
    n, h = dz.shape
    n_tiles = n // tile
    assert n_tiles >= 2, "merged backward needs >= 2 node tiles"
    unroll = _pick_unroll(n_tiles, _UNROLL_BWD)
    n_steps = n_tiles // unroll
    ring_n, hold_n = 2 * unroll + 2, 2 * unroll
    thr = (dropout_threshold(rate, DROPOUT_BITS)
           if training_rate_active else None)
    scale = dropout_scale(rate, DROPOUT_BITS) if thr is not None else None
    # dummy operands reuse live same-shaped arrays (see _call_fwd)
    if not has_super:
        gacc = jnp.zeros((n_tiles, 1, tile), jnp.int32)
    if not apply_prev and not local_star:
        gcode = jnp.zeros((n_tiles, tile, 1), jnp.int32)
    if not apply_prev:
        table_prev = jnp.zeros((tg, h), x.dtype)
    if local_star:
        gcode = lcode  # global-selection path unread
    else:
        gwin = jnp.zeros((n_tiles,), jnp.int32)
        lcode = gcode
        lacc = gacc
    kern = functools.partial(
        _bwd_merged_kernel, tile=tile, width=width, x_dtype=x.dtype,
        skip=skip, thr=thr, scale=scale, n_tiles=n_tiles,
        has_super=has_super, apply_prev=apply_prev, tg=tg, unroll=unroll,
        local_star=local_star,
    )
    last = n_steps - 1
    in_blk = pl.BlockSpec((unroll * tile, h),
                          lambda t: (jnp.minimum(t, last), 0),
                          memory_space=pltpu.VMEM)
    in_blkv = pl.BlockSpec((unroll, 1, tile),
                           lambda t: (jnp.minimum(t, last), 0, 0),
                           memory_space=pltpu.VMEM)
    in_gacc = pl.BlockSpec((unroll, 1, tile),
                           lambda t: (jnp.minimum(t, last), 0, 0),
                           memory_space=pltpu.VMEM)
    in_gcode = pl.BlockSpec((unroll, tile, 1),
                            lambda t: (jnp.minimum(t, last), 0, 0),
                            memory_space=pltpu.VMEM)
    in_band = pl.BlockSpec((unroll, tile, tile + width),
                           lambda t: (jnp.maximum(t - 1, 0), 0, 0),
                           memory_space=pltpu.VMEM)
    full = pl.BlockSpec((h, h), lambda t: (0, 0), memory_space=pltpu.VMEM)
    wide = pl.BlockSpec((h, 2 * h), lambda t: (0, 0),
                        memory_space=pltpu.VMEM)
    row = pl.BlockSpec((1, h), lambda t: (0, 0), memory_space=pltpu.VMEM)
    tbl = pl.BlockSpec((tg, h), lambda t: (0, 0), memory_space=pltpu.VMEM)
    out_dx = pl.BlockSpec((unroll * tile, h),
                          lambda t: (jnp.maximum(t - 1, 0), 0),
                          memory_space=pltpu.VMEM)
    out_specs = [out_dx, full, full, row]
    out_shape = [
        jax.ShapeDtypeStruct((n, h), x.dtype),      # dx (band + direct)
        jax.ShapeDtypeStruct((h, h), jnp.float32),  # dW_l
        jax.ShapeDtypeStruct((h, h), jnp.float32),  # dW_r
        jax.ShapeDtypeStruct((1, h), jnp.float32),  # db_l
    ]
    if has_super:
        out_specs.append(tbl)
        out_shape.append(jax.ShapeDtypeStruct((tg, h), jnp.float32))
    scratch = [
        pltpu.VMEM((ring_n, tile, h), x.dtype),  # dagg ring
        pltpu.VMEM((hold_n, tile, h), x.dtype),  # dxp hold
        # one contiguous dagg slab per unrolled sub (no WAR hazard
        # between the band matmuls)
        pltpu.VMEM((unroll, tile + width, h), x.dtype),
    ]
    if has_super:
        scratch.append(pltpu.VMEM((tg, h), jnp.float32))
    # [W_l^T | W_r^T] pre-concatenated so dagg and dxp ride one matmul
    wlr = jnp.concatenate([w_l.T, w_r.T], axis=1)
    return pl.pallas_call(
        kern,
        grid=(n_steps + 1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),  # wbase (gwin)
                  in_blk, in_blk, in_blkv, in_blk, in_blk, wide,
                  in_gacc, in_gacc, in_gcode, in_gcode, tbl, in_band],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(seed, gwin, dz, y, inv, agg, x, wlr, gacc, lacc, gcode, lcode,
      table_prev, band)


def _call_bwd_tile(dz, y, inv, agg, x, w_l, w_r, seed, gacc, *, tile, skip,
                   rate, training_rate_active, interpret, has_super, tg):
    n, h = dz.shape
    n_tiles = n // tile
    thr = (dropout_threshold(rate, DROPOUT_BITS)
           if training_rate_active else None)
    scale = dropout_scale(rate, DROPOUT_BITS) if thr is not None else None
    if not has_super:
        gacc = jnp.zeros((n_tiles, 1, tile), jnp.int32)
    kern = functools.partial(
        _bwd_kernel, tile=tile, x_dtype=x.dtype, skip=skip, thr=thr,
        scale=scale, n_tiles=n_tiles, has_super=has_super, tg=tg,
    )
    blk = pl.BlockSpec((tile, h), lambda t: (t, 0), memory_space=pltpu.VMEM)
    blkv = pl.BlockSpec((1, 1, tile), lambda t: (t, 0, 0),
                        memory_space=pltpu.VMEM)
    blk1 = pl.BlockSpec((1, 1, tile), lambda t: (t, 0, 0),
                        memory_space=pltpu.VMEM)
    full = pl.BlockSpec((h, h), lambda t: (0, 0), memory_space=pltpu.VMEM)
    row = pl.BlockSpec((1, h), lambda t: (0, 0), memory_space=pltpu.VMEM)
    out_specs = [blk, blk, full, full, row]
    out_shape = [
        jax.ShapeDtypeStruct((n, h), x.dtype),      # dagg
        jax.ShapeDtypeStruct((n, h), x.dtype),      # dxp
        jax.ShapeDtypeStruct((h, h), jnp.float32),  # dW_l
        jax.ShapeDtypeStruct((h, h), jnp.float32),  # dW_r
        jax.ShapeDtypeStruct((1, h), jnp.float32),  # db_l
    ]
    if has_super:
        out_specs += [pl.BlockSpec((tg, h), lambda t: (0, 0),
                                   memory_space=pltpu.VMEM)]
        out_shape += [jax.ShapeDtypeStruct((tg, h), jnp.float32)]
    return pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  blk, blk, blkv, blk, blk, full, full, blk1],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=(
            [pltpu.VMEM((tg, h), jnp.float32)] if has_super else []
        ),
        interpret=interpret,
    )(seed, dz, y, inv, agg, x, w_l, w_r, gacc)


# --------------------------------------------------------------------- #
# custom-vjp wrapper
# --------------------------------------------------------------------- #


def _zero_tangent(v):
    if jnp.issubdtype(v.dtype, jnp.integer) or v.dtype == jnp.bool_:
        return np.zeros(v.shape, dtypes.float0)
    return jnp.zeros_like(v)


def _super_tables(x, node_graph, node_mask, sn, g_cap, tg):
    """Per-graph correction table for the supernode star (ops/banded.py
    semantics): rows [0, G) = the graph's supernode features (broadcast to
    member nodes), rows [T0, T0+G) = graph_sum - supernode features (added
    into the supernode row), with T0 = round8(G) (star_table_geometry) so
    per-tile local windows slice both halves at sublane-aligned offsets.
    Zero rows for graphs without a supernode and in the alignment gaps.
    Only needed for the FIRST layer — each fused layer accumulates the
    next layer's table in-kernel."""
    from buckgnn_tpu.ops import segment

    t0 = tg // 2
    gsum = segment.segment_sum_dense(x, node_graph, g_cap, keep=node_mask)
    xsn = x[sn]
    has_super = (sn < x.shape[0] - 1).astype(x.dtype)[:, None]
    t1 = xsn * has_super
    t2 = (gsum - xsn) * has_super
    gap = jnp.zeros((t0 - g_cap, x.shape[1]), x.dtype)
    return jnp.concatenate([t1, gap, t2, gap], axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_layer(static, x, w_l, b_l, w_r, band, spill_off, spill_lo,
                 spill_hi, spill_s, seed, gcode, gacc, gwin, lcode, lacc,
                 table, t_in):
    """Returns (z, t_out, ftab).

    ``ftab`` is the NEXT layer's forward star table, accumulated from z
    inside the kernel when static["emit_table"] (otherwise a dummy): the
    model threads it into the next layer's ``table`` instead of an XLA
    _super_tables build. Its cotangent is ignored — the consumer declares
    the table input's cotangent zero (see ``table`` below).

    ``table`` is the layer's supernode correction table — _super_tables(x),
    a pure linear function of x built OUTSIDE this boundary. It carries
    ZERO cotangent by declaration: the star operator is symmetric, so the
    full gradient of the star path is already delivered through the
    backward's total-A application to the cotangent.

    ``t_in``/``t_out`` are ghost edges carrying NO forward value (t_out is
    zeros): in reverse mode the cotangent of t_in is THIS layer's backward
    star table (the part of dx the merged backward defers — it needs
    global dagg sums that only exist after its last grid step), and the
    cotangent of t_out is the NEXT layer's deferred table, which this
    backward adds (as table_prev[gcode], one in-kernel selection matmul)
    to the cotangent it received before using it. The model threads t_out
    of layer i into t_in of layer i+1; star_source closes the chain at the
    encoder boundary. Split (has_spill) backward applies its own star
    inside the band kernel instead, so its t_in cotangent is zeros.
    """
    msgs = x[spill_s] if static["has_spill"] else jnp.zeros((0, 0), x.dtype)
    emit = static["emit_table"]
    outs = list(_call_fwd(
        x, w_l, b_l, w_r, band, spill_off, spill_lo, spill_hi, msgs, seed,
        gcode, table, gacc, gwin, lcode, lacc,
        tile=static["tile"], width=static["width"],
        has_spill=static["has_spill"], skip=static["skip"],
        rate=static["rate"], training=static["training"], save_res=False,
        interpret=static["interpret"], has_super=static["has_super"],
        emit_table=emit, local_star=static["local_star"],
    ))
    t_out = jnp.zeros_like(t_in)
    ftab = outs.pop() if emit else jnp.zeros((8, x.shape[1]), jnp.float32)
    return outs[0], t_out, ftab


def _fused_layer_fwd(static, x, w_l, b_l, w_r, band, spill_off, spill_lo,
                     spill_hi, spill_s, seed, gcode, gacc, gwin, lcode,
                     lacc, table, t_in):
    msgs = x[spill_s] if static["has_spill"] else jnp.zeros((0, 0), x.dtype)
    emit = static["emit_table"]
    outs = list(_call_fwd(
        x, w_l, b_l, w_r, band, spill_off, spill_lo, spill_hi, msgs, seed,
        gcode, table, gacc, gwin, lcode, lacc,
        tile=static["tile"], width=static["width"],
        has_spill=static["has_spill"], skip=static["skip"],
        rate=static["rate"], training=static["training"], save_res=True,
        interpret=static["interpret"], has_super=static["has_super"],
        emit_table=emit, local_star=static["local_star"],
    ))
    t_out = jnp.zeros_like(t_in)
    ftab = outs.pop() if emit else jnp.zeros((8, x.shape[1]), jnp.float32)
    z, y, inv, agg = outs
    return (z, t_out, ftab), (x, w_l, w_r, y, inv, agg, band, spill_off,
                              spill_lo, spill_hi, spill_s, seed, b_l,
                              gcode, gacc, gwin, lcode, lacc, table, t_in)


def _star_apply(ct, table, gcode_flat, tg):
    """XLA application of a deferred star table: ct + table[gcode] as a
    one-hot MATMUL — an [N, H] row gather runs ~0.45 ms on the v5e while
    the compare+dot fuses to ~0.19 (cf. ops/segment.py). Valid codes are
    < tg; the sentinel is exactly tg, so its one-hot row is all zeros."""
    t = table.astype(ct.dtype)
    onehot = (
        gcode_flat[:, None] == jnp.arange(tg, dtype=gcode_flat.dtype)[None]
    ).astype(ct.dtype)
    return ct + jnp.dot(onehot, t)


def _fused_layer_bwd(static, res, cts):
    from buckgnn_tpu.ops.pallas_banded import pallas_banded_matmul

    dz, dt_out, _dftab = cts  # ftab's consumer declares its cotangent zero
    (x, w_l, w_r, y, inv, agg, band, spill_off, spill_lo, spill_hi,
     spill_s, seed, b_l, gcode, gacc, gwin, lcode, lacc, table,
     t_in) = res
    tg = table.shape[0] if static["has_super"] else 8
    has_super = static["has_super"]
    apply_prev = has_super and static["apply_prev"]
    rate_active = static["training"] and static["rate"] > 0.0

    if not static["has_spill"]:
        # merged backward: dagg never leaves VMEM; own star deferred into
        # the t_in cotangent
        bwd_outs = _call_bwd_merged(
            dz, y, inv, agg, x, w_l, w_r, seed, gacc, gcode,
            dt_out.astype(x.dtype) if apply_prev else dt_out,
            band, gwin, lcode, lacc,
            tile=static["tile"], width=static["width"],
            skip=static["skip"], rate=static["rate"],
            training_rate_active=rate_active,
            interpret=static["interpret"], has_super=has_super,
            apply_prev=apply_prev, tg=tg,
            local_star=static["local_star"],
        )
        dx, dwl, dwr, dbl = bwd_outs[:4]
        dt_in = bwd_outs[4] if has_super else jnp.zeros_like(t_in)
        if has_super and not static["thread_star"]:
            # standalone use: nothing downstream consumes t_in's
            # cotangent, so fold the own star back into dx here
            dx = _star_apply(dx, dt_in,
                             gcode.reshape(-1), tg)
            dt_in = jnp.zeros_like(t_in)
    else:
        # split backward (spill messages need the full dagg in HBM); the
        # own star rides the band kernel as before, nothing is deferred
        if apply_prev:
            dz = _star_apply(dz, dt_out, gcode.reshape(-1), tg)
        bwd_outs = _call_bwd_tile(
            dz, y, inv, agg, x, w_l, w_r, seed, gacc,
            tile=static["tile"], skip=static["skip"], rate=static["rate"],
            training_rate_active=rate_active,
            interpret=static["interpret"], has_super=has_super, tg=tg,
        )
        dagg, dxp, dwl, dwr, dbl = bwd_outs[:5]
        spill_kw = dict(spill_offsets=spill_off, spill_lo=spill_lo,
                        spill_hi=spill_hi, spill_messages=dagg[spill_s])
        super_kw = (
            dict(gcode=gcode, table=bwd_outs[5].astype(x.dtype))
            if has_super
            else {}
        )
        dx = pallas_banded_matmul(
            band, dagg, static["tile"], static["width"],
            interpret=static["interpret"], out_dtype=x.dtype, acc=dxp,
            **spill_kw, **super_kw,
        )
        dt_in = jnp.zeros_like(t_in)
    return (dx, dwl.astype(w_l.dtype), dbl.astype(b_l.dtype),
            dwr.astype(w_r.dtype), _zero_tangent(band),
            _zero_tangent(spill_off), _zero_tangent(spill_lo),
            _zero_tangent(spill_hi), _zero_tangent(spill_s),
            _zero_tangent(seed), _zero_tangent(gcode),
            _zero_tangent(gacc), _zero_tangent(gwin),
            _zero_tangent(lcode), _zero_tangent(lacc),
            jnp.zeros_like(table), dt_in)


_fused_layer.defvjp(_fused_layer_fwd, _fused_layer_bwd)


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


def star_source(x: jnp.ndarray, ctx) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Open a star-threading chain at the encoder boundary: returns
    ``(x, t0)`` where t0 is a ghost [tg, H] zeros whose COTANGENT (the
    first fused layer's deferred backward star table) is folded into dx
    with one XLA gather-add — the only per-step XLA star application left
    when the whole stack threads its tables in-kernel."""
    batch = ctx.batch
    _, tg = star_table_geometry(batch.n_graph_cap)
    gcode_flat = batch.gcode.reshape(-1)
    return _star_source((tg,), x, gcode_flat)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _star_source(static, x, gcode_flat):
    return x, jnp.zeros((static[0], x.shape[1]), jnp.float32)


def _star_source_fwd(static, x, gcode_flat):
    return _star_source(static, x, gcode_flat), gcode_flat


def _star_source_bwd(static, gcode_flat, cts):
    dx, dt = cts
    return _star_apply(dx, dt, gcode_flat, static[0]), _zero_tangent(
        gcode_flat
    )


_star_source.defvjp(_star_source_fwd, _star_source_bwd)


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
    star_in: jnp.ndarray | None = None,
    star_next: bool = False,
    table_in: jnp.ndarray | None = None,
    emit_table: bool = False,
):
    """One full shared-SAGE layer: conv + normalize + relu (+skip) + dropout.

    ``seed``: two int32 words (ops/pallas_epilogue.seed_from_key); may be
    None when deterministic. Requires ``supports_fused_layer(...)``.

    Star threading (supernode batches, spill-free): pass ``star_in`` (the
    previous layer's star_out, or ``star_source(x0, ctx)[1]`` for the
    first layer) to get ``(z, star_out)`` back, and set ``star_next=True``
    on every layer whose star_out the NEXT layer consumes (i.e. all but
    the last). The backward then keeps dagg entirely in VMEM (merged
    kernel) and hands each layer's star correction to its neighbor as a
    threaded table instead of an XLA pass over [N, H]. Without
    ``star_in``, returns z alone with self-contained gradients.
    """
    batch = ctx.batch
    training = not deterministic
    has_super = batch.has_supernode_edges
    g_cap = batch.n_graph_cap
    t0, tg = star_table_geometry(g_cap)
    thread_star = star_in is not None
    local_star = has_super and batch.gwin is not None
    if thread_star and (not has_super or batch.has_spill_edges):
        raise ValueError(
            "star threading requires a supernode batch without spill edges"
        )
    if emit_table and not has_super:
        raise ValueError("emit_table requires a supernode batch")
    static = dict(
        tile=batch.band_tile,
        width=batch.band_width,
        has_spill=batch.has_spill_edges,
        has_super=has_super,
        skip=bool(skip),
        rate=float(rate) if training else 0.0,
        training=training,
        interpret=jax.default_backend() == "cpu",
        thread_star=thread_star,
        apply_prev=bool(star_next),
        emit_table=bool(emit_table),
        local_star=local_star,
    )
    # dict isn't hashable for nondiff_argnums — freeze it
    static = tuple(sorted(static.items()))
    if seed is None:
        seed = jnp.zeros((2,), jnp.int32)
    n_tiles = batch.n_node_cap // batch.band_tile
    if has_super:
        # per-row table selectors, host-precomputed at pack time
        # (batch.gcode/gacc) — the XLA scatter build cost ~0.9 ms/step on a
        # v5e; the scatter path remains for batches packed before the
        # fields existed.
        if batch.gcode is not None:
            gcode, gacc = batch.gcode, batch.gacc  # pre-shaped at pack time
        else:
            g = batch.node_graph
            sn = batch.supernode_index
            m = ctx.super_gather_mask > 0
            is_super = jnp.zeros((batch.n_node_cap,), bool).at[sn].set(
                sn < batch.dead_node_index
            )
            gcode = jnp.where(m, g, jnp.where(is_super, t0 + g, tg))
            gcode = gcode.astype(jnp.int32).reshape(
                n_tiles, batch.band_tile, 1
            )
            gacc = jnp.where(
                is_super, g, jnp.where(batch.node_mask, t0 + g, tg)
            ).astype(jnp.int32).reshape(n_tiles, 1, batch.band_tile)
        if table_in is not None:
            # threaded from the previous layer's kernel (its ftab output —
            # the same values _super_tables(x) would rebuild)
            table = table_in.astype(x.dtype)
        else:
            # stop_gradient: the custom VJP already delivers the ENTIRE
            # star gradient through the symmetric total-adjacency
            # application (the table arg's cotangent is zeros by
            # declaration). Without it the zero cotangent still flows
            # through this build's TRANSPOSE — XLA cannot fold
            # scatter(zeros)/dot(zeros) chains and materializes
            # ~4.7 ms/step of pure zero arithmetic (measured, 6L
            # flagship).
            table = _super_tables(jax.lax.stop_gradient(x),
                                  batch.node_graph, batch.node_mask,
                                  batch.supernode_index, g_cap, tg)
    else:
        gcode = jnp.zeros((0,), jnp.int32)
        gacc = jnp.zeros((0,), jnp.int32)
        table = jnp.zeros((8, x.shape[1]), x.dtype)
    t_in = star_in if thread_star else jnp.zeros((8, x.shape[1]),
                                                 jnp.float32)
    if local_star:
        gwin, lcode, lacc = batch.gwin, batch.lcode, batch.lacc
    else:
        gwin = jnp.zeros((0,), jnp.int32)
        lcode = jnp.zeros((0,), jnp.int32)
        lacc = jnp.zeros((0,), jnp.int32)
    z, t_out, ftab = _fused_layer(
        _StaticDict(static), x, w_l, b_l.reshape(1, -1), w_r, ctx.band,
        batch.spill_offsets, batch.spill_lo, batch.spill_hi,
        batch.spill_senders, seed, gcode, gacc, gwin, lcode, lacc, table,
        t_in,
    )
    return (z, t_out, ftab) if thread_star else z


class _StaticDict(dict):
    """Hashable static-config dict for custom_vjp nondiff args."""

    def __init__(self, items):
        super().__init__(items)
        self._items = items

    def __hash__(self):
        return hash(self._items)

    def __eq__(self, other):
        return isinstance(other, _StaticDict) and self._items == other._items
