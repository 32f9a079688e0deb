"""Pallas CSR segment-reduce: gather + scatter-free neighbor aggregation.

The general-graph counterpart of the banded kernel (ops/pallas_banded.py)
for edge sets with NO locality assumption: XLA lowers scatter-add into a
row-sequential loop (~40 ns/row on a v5e), while this kernel exploits only
receiver-sortedness (the `GraphBatch` layout):

  per 256-row node tile, the incoming messages are ONE contiguous run of
  the gathered message array; stream it window by window ([WINDOW, H]
  blocks, double-buffered DMA) and reduce each window on the MXU with a
  [T, WINDOW] selection matmul built from two iota compares against the
  tile's CSR row offsets.

This is the `impl='pallas'` backend of ops/sage.py::sage_aggregate —
correct for any degree distribution (a tile's run may span any number of
windows; the loop bound is data-dependent). Measured on a v5e at 450k
fully-random edges, [115712, 512] bf16: 13.1 ms vs 15.5 ms for XLA
gather+scatter — per-window DMA latency dominates on random graphs. The
banded kernel remains the fast path for RCM-ordered meshes (it streams
x-slabs instead of pre-gathered messages and its windows are tiny).

'max' aggregation falls back to XLA's segment_max (a selection matmul
cannot express max).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WINDOW = 256
ALIGN = 16  # bf16 sublane tile: keep DMA starts aligned
TILE = 256


def _win_copy(msgs_hbm, buf_ref, sem, base, w, *, n_edges, slot):
    start = jnp.clip(base + w * WINDOW, 0, n_edges - WINDOW)
    start = pl.multiple_of(start, ALIGN)
    return pltpu.make_async_copy(
        msgs_hbm.at[pl.ds(start, WINDOW), :], buf_ref.at[slot], sem.at[slot]
    )


def _kernel(toff_ref, lo_ref, hi_ref, msgs_hbm, out_ref, buf_ref, sem, *,
            n_edges, h, out_dtype):
    t = pl.program_id(0)
    base = jnp.clip((toff_ref[t] // ALIGN) * ALIGN, 0, n_edges - WINDOW)
    base = pl.multiple_of(base, ALIGN)
    end = toff_ref[t + 1]
    n_win = jnp.maximum(pl.cdiv(end - base, WINDOW), 1)
    copy = functools.partial(_win_copy, msgs_hbm, buf_ref, sem, base,
                             n_edges=n_edges)

    copy(0, slot=0).start()
    lo = lo_ref[0]  # [TILE, 1], relative to base
    hi = hi_ref[0]

    def body(w, acc):
        @pl.when(w + 1 < n_win)
        def _():
            copy(w + 1, slot=jax.lax.rem(w + 1, 2)).start()

        copy(w, slot=jax.lax.rem(w, 2)).wait()
        m_iota = jax.lax.broadcasted_iota(
            jnp.int32, (TILE, WINDOW), 1
        ) + w * WINDOW
        sel = (m_iota >= lo) & (m_iota < hi)
        sel = jnp.where(sel, jnp.float32(1), jnp.float32(0))
        return acc + jnp.dot(
            sel.astype(msgs_hbm.dtype),
            buf_ref[jax.lax.rem(w, 2)],
            preferred_element_type=jnp.float32,
        )

    acc = jax.lax.fori_loop(
        0, n_win, body, jnp.zeros((TILE, h), jnp.float32)
    )
    out_ref[:] = acc.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("num_segments", "aggr",
                                             "interpret"))
def gather_segment_reduce(
    x: jnp.ndarray,          # [N, F] node features
    senders: jnp.ndarray,    # [E] int32
    receivers: jnp.ndarray,  # [E] int32, ascending (receiver-sorted)
    num_segments: int,
    aggr: str = "add",
    interpret: bool | None = None,
) -> jnp.ndarray:
    """aggr_{j in N(i)} x_j over a receiver-sorted edge list (CSR kernel)."""
    if aggr == "max" or x.shape[1] % 128 != 0 or num_segments % TILE != 0:
        from buckgnn_tpu.ops import segment

        msgs = x[senders]
        if aggr == "max":
            return segment.segment_max(msgs, receivers, num_segments,
                                       indices_are_sorted=True)
        out = segment.segment_sum(msgs, receivers, num_segments,
                                  indices_are_sorted=True)
        if aggr == "mean":
            cnt = segment.segment_count(receivers, num_segments,
                                        indices_are_sorted=True)
            out = out / jnp.maximum(cnt, 1.0)[:, None]
        return out

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n, h = num_segments, x.shape[1]
    e = receivers.shape[0]
    # always pad one full window past the (aligned) tail so no in-kernel
    # window DMA ever needs clipping (clipping would shift the data
    # relative to the selection columns)
    pad = (-e) % ALIGN + WINDOW
    msgs = jnp.pad(x[senders], ((0, pad), (0, 0)))
    receivers = jnp.pad(receivers, (0, pad), constant_values=num_segments)
    n_edges = msgs.shape[0]
    n_tiles = n // TILE

    # CSR row offsets from the sorted receivers (cheap sorted scatter +
    # cumsum — NOT jnp.searchsorted, which lowers to a sequential loop)
    ones = jnp.ones((n_edges,), jnp.int32)
    counts = jax.ops.segment_sum(ones, receivers, n + 1,
                                 indices_are_sorted=True)
    row_off = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(counts[:-1], dtype=jnp.int32)]
    )  # [n+1]
    toff = jnp.concatenate(
        [row_off[jnp.arange(n_tiles) * TILE], row_off[-1:]]
    ).astype(jnp.int32)
    base = jnp.clip((toff[:-1] // ALIGN) * ALIGN, 0, n_edges - WINDOW)
    lo = (row_off[:-1].reshape(n_tiles, TILE, 1)
          - base[:, None, None]).astype(jnp.int32)
    hi = (row_off[1:].reshape(n_tiles, TILE, 1)
          - base[:, None, None]).astype(jnp.int32)

    kernel = functools.partial(_kernel, n_edges=n_edges, h=h,
                               out_dtype=x.dtype)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),    # toff
            pl.BlockSpec((1, TILE, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),    # lo
            pl.BlockSpec((1, TILE, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),    # hi
            pl.BlockSpec(memory_space=pl.ANY),        # msgs
        ],
        out_specs=pl.BlockSpec((TILE, h), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, WINDOW, h), msgs.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(toff, lo, hi, msgs)

    if aggr == "mean":
        cnt = counts[:-1].astype(jnp.float32)
        out = out / jnp.maximum(cnt, 1.0)[:, None]
    return out
