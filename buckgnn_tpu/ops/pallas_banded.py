"""Pallas TPU kernel for the block-banded SpMM aggregation (+ fused spill).

The XLA banded path (ops/banded.py) materializes overlapping x-slabs through
a gather, paying ~2x the bandwidth floor. This kernel streams each tile's
slab straight from HBM with a CONTIGUOUS async DMA (slabs are consecutive
row ranges by construction) and feeds the MXU directly:

    out[t*T:(t+1)*T] = Band[t] (T x S) @ x[start_t : start_t+S] (S x H)

Grid: one program per UNROLL node tiles. `band` and `out` use the automatic
pipeline; the slab DMAs are issued inside the kernel (clamped start offsets
are data-dependent on program_id, which BlockSpec index maps cannot express)
into an NBUF-deep rotating buffer: TPU grid iterations run sequentially on
the core and scratch persists across them, so each iteration waits on a copy
prefetched NBUF tiles earlier and issues the next prefetches — overlapping
slab fetches with the matmuls.

**Fused spill.** Out-of-band edges are receiver-sorted, so the spill
messages destined for node tile t are one contiguous window of the
pre-gathered message array ([SPILL_CHUNK, H], start aligned down to 8 rows;
pack time caps per-tile counts so the window always covers the tile —
graph/batch.py, overflow goes to the batch's `spill2` scatter list). XLA's
scatter-add for these edges lowers to a row-sequential loop (~1.3 ms per
layer at 31k spill edges on a v5e — 2x the band matmul itself); instead the
kernel DMAs each tile's window and applies it on the MXU as a selection
matmul. Because the list is receiver-sorted, each local row's columns form
one contiguous [lo, hi) run — the caller hands per-row lo/hi (two
searchsorted's over node ids, CSE'd once per step) and the kernel builds
the [SPILL_CHUNK, T] selection mask from two iota compares; no index DMAs.

Measured on a v5e at [448x256x384]@[114688, 512] bf16: 0.70 ms for the band
alone (~540 GB/s effective; naive 2-slot single-tile version 0.79 ms, XLA
slab-gather path 1.07 ms).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from buckgnn_tpu.graph.batch import SPILL_ALIGN, SPILL_CHUNK

# Slab-buffer depth and node tiles per grid step (probe: unroll 2 with a
# 6-deep buffer beats 1/2-deep by ~10% — per-iteration DMA issue/wait
# overhead amortizes over two matmuls and deeper prefetch hides latency).
_NBUF = 6
_UNROLL = 2


def _slab_copy(x_hbm, slab_ref, sem, t, *, tile, width, n_nodes, slot):
    slab = tile + width
    start = jnp.clip(t * tile - width // 2, 0, max(n_nodes - slab, 0))
    # every branch of the clip is a multiple of the sublane tiling (tile,
    # width//2 and n_nodes are multiples of 8); Mosaic needs the hint
    start = pl.multiple_of(start, 8)
    return pltpu.make_async_copy(
        x_hbm.at[pl.ds(start, slab), :], slab_ref.at[slot], sem.at[slot]
    )


def _spill_copy(msgs_hbm, off_ref, msg_ref, msem, t, *, n_spill, slot):
    # window start: off[t] aligned down to SPILL_ALIGN (the bf16 sublane
    # tile — unaligned DMA starts pay a re-tiling copy), clamped so the
    # fixed-size window stays in bounds (n_spill and SPILL_CHUNK are
    # multiples of it); the caller's lo/hi column ranges use the same formula
    start = jnp.clip(
        (off_ref[t] // SPILL_ALIGN) * SPILL_ALIGN, 0, n_spill - SPILL_CHUNK
    )
    start = pl.multiple_of(start, SPILL_ALIGN)
    return pltpu.make_async_copy(
        msgs_hbm.at[pl.ds(start, SPILL_CHUNK), :], msg_ref.at[slot],
        msem.at[slot],
    )


def _kernel(off_ref, band_ref, lo_ref, hi_ref, gcode_ref, table_ref,
            x_hbm, msgs_hbm, acc_ref, out_ref,
            slab_ref, sem, msg_ref, msem, *,
            tile, width, n_nodes, n_tiles, out_dtype, nbuf, unroll,
            x_dtype, n_spill, has_spill, has_super, has_acc, tg):
    p = pl.program_id(0)
    copy = functools.partial(_slab_copy, x_hbm, slab_ref, sem,
                             tile=tile, width=width, n_nodes=n_nodes)
    if has_spill:
        scopy = functools.partial(_spill_copy, msgs_hbm, off_ref, msg_ref,
                                  msem, n_spill=n_spill)

    def start_all(t, slot):
        copy(t, slot=slot).start()
        if has_spill:
            scopy(t, slot=slot).start()

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
            t = base + (nbuf - unroll) + j

            @pl.when(t < n_tiles)
            def _():
                start_all(t, jax.lax.rem(t, nbuf))

    for j in range(unroll):
        t = base + j
        slot = jax.lax.rem(t, nbuf)
        copy(t, slot=slot).wait()
        b = band_ref[j]
        if jnp.issubdtype(b.dtype, jnp.integer):
            # int8 band straight from HBM; Mosaic can't cast int8->bf16
            # directly, bounce through f32 (cheap VPU op on one tile)
            b = b.astype(jnp.float32).astype(x_dtype)
        acc = jnp.dot(
            b,
            slab_ref[slot].astype(b.dtype),
            preferred_element_type=jnp.float32,  # MXU f32 accumulation
        )
        if has_spill:
            scopy(t, slot=slot).wait()
            # selection matrix: sel[r, m] = lo[r] <= m < hi[r]; lo/hi are
            # [tile, 1] column vectors so no relayout/transpose is needed
            m_iota = jax.lax.broadcasted_iota(
                jnp.int32, (tile, SPILL_CHUNK), 1
            )
            lo = lo_ref[j]  # [tile, 1]
            hi = hi_ref[j]
            sel = (m_iota >= lo) & (m_iota < hi)
            sel = jnp.where(sel, jnp.float32(1), jnp.float32(0))
            acc = acc + jnp.dot(
                sel.astype(x_dtype), msg_ref[slot],
                preferred_element_type=jnp.float32,
            )
        if has_super:
            # supernode star corrections as one selection matmul against
            # the per-graph table (see ops/pallas_sage_layer.py)
            g_iota = jax.lax.broadcasted_iota(jnp.int32, (tile, tg), 1)
            selg = jnp.where(g_iota == gcode_ref[j], jnp.float32(1),
                             jnp.float32(0))
            acc = acc + jnp.dot(selg.astype(x_dtype), table_ref[...],
                                preferred_element_type=jnp.float32)
        if has_acc:
            acc = acc + acc_ref[pl.ds(j * tile, tile), :].astype(jnp.float32)
        out_ref[pl.ds(j * tile, tile), :] = acc.astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("tile", "width", "interpret", "out_dtype")
)
def pallas_banded_matmul(
    band: jnp.ndarray,        # [n_tiles, T, S] (int8, bf16 or f32)
    x: jnp.ndarray,           # [N, H]
    tile: int,
    width: int,
    interpret: bool = False,
    out_dtype=jnp.float32,
    spill_offsets: jnp.ndarray | None = None,   # [n_tiles+1] int32
    spill_lo: jnp.ndarray | None = None,        # [n_tiles, T, 1] int32
    spill_hi: jnp.ndarray | None = None,        # [n_tiles, T, 1] int32
    spill_messages: jnp.ndarray | None = None,  # [Es, H] == x[spill_s]
    gcode: jnp.ndarray | None = None,           # [n_tiles, T, 1] int32
    table: jnp.ndarray | None = None,           # [TG, H] supernode tables
    acc: jnp.ndarray | None = None,             # [N, H] added to the result
) -> jnp.ndarray:
    """Band @ x (+ optional fused spill scatter, supernode star tables and
    a fused accumulator add) with multi-buffered contiguous streaming; f32
    MXU accumulation, ``out_dtype`` output.

    ``spill_lo``/``spill_hi`` are each node's [lo, hi) column range inside
    its tile's SPILL_CHUNK message window (window start = off[t] floored to
    8, clamped to Es - SPILL_CHUNK). ``gcode``/``table`` add per-row
    selections from a per-graph correction table (the supernode star; see
    ops/pallas_sage_layer.py). ``acc`` fuses ``+ acc`` into the output
    store (saves a full [N, H] round-trip for callers that would add).
    """
    n_tiles, t_, slab = band.shape
    n, h = x.shape
    assert t_ == tile and slab == tile + width and n == n_tiles * tile
    has_spill = spill_offsets is not None
    has_super = table is not None
    has_acc = acc is not None
    if not has_super:
        gcode = jnp.zeros((n_tiles, tile, 1), jnp.int32)
        table = jnp.zeros((8, h), x.dtype)
    if not has_acc:
        acc = jnp.zeros((8, h), x.dtype)
    tg = table.shape[0]
    if has_spill:
        n_spill = spill_messages.shape[0]
        assert n_spill >= SPILL_CHUNK and n_spill % 8 == 0
        assert spill_lo.shape == (n_tiles, tile, 1)
        assert spill_offsets.shape == (n_tiles + 1,)
    else:
        n_spill = SPILL_CHUNK
        spill_offsets = jnp.zeros((n_tiles + 1,), jnp.int32)
        spill_lo = jnp.zeros((n_tiles, tile, 1), jnp.int32)
        spill_hi = jnp.zeros((n_tiles, tile, 1), jnp.int32)
        spill_messages = jnp.zeros((SPILL_CHUNK, h), x.dtype)
    unroll = _UNROLL if n_tiles % _UNROLL == 0 else 1
    nbuf = max(_NBUF, 2 * unroll) if n_tiles > 2 else 2

    kernel = functools.partial(
        _kernel, tile=tile, width=width, n_nodes=n, n_tiles=n_tiles,
        out_dtype=out_dtype, nbuf=nbuf, unroll=unroll, x_dtype=x.dtype,
        n_spill=n_spill, has_spill=has_spill, has_super=has_super,
        has_acc=has_acc, tg=tg,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles // unroll,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # spill_offsets
            pl.BlockSpec(
                (unroll, tile, slab), lambda p: (p, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (unroll, tile, 1), lambda p: (p, 0, 0),
                memory_space=pltpu.VMEM,
            ),                                      # spill_lo
            pl.BlockSpec(
                (unroll, tile, 1), lambda p: (p, 0, 0),
                memory_space=pltpu.VMEM,
            ),                                      # spill_hi
            pl.BlockSpec(
                (unroll, tile, 1), lambda p: (p, 0, 0),
                memory_space=pltpu.VMEM,
            ) if has_super else pl.BlockSpec(
                (1, tile, 1), lambda p: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),                                      # gcode
            pl.BlockSpec((tg, h), lambda p: (0, 0),
                         memory_space=pltpu.VMEM),  # table
            pl.BlockSpec(memory_space=pl.ANY),      # x
            pl.BlockSpec(memory_space=pl.ANY),      # spill_messages
            pl.BlockSpec(
                (unroll * tile, h), lambda p: (p, 0),
                memory_space=pltpu.VMEM,
            ) if has_acc else pl.BlockSpec(
                (8, h), lambda p: (0, 0), memory_space=pltpu.VMEM,
            ),                                      # acc
        ],
        out_specs=pl.BlockSpec(
            (unroll * tile, h), lambda p: (p, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, h), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((nbuf, slab, h), x.dtype),
            pltpu.SemaphoreType.DMA((nbuf,)),
            pltpu.VMEM((nbuf, SPILL_CHUNK, h), x.dtype),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
        interpret=interpret,
    )(spill_offsets, band, spill_lo, spill_hi, gcode, table, x,
      spill_messages, acc)
    return out
