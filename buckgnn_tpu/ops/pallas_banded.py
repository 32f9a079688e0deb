"""Pallas TPU kernel for the block-banded SpMM aggregation.

The XLA banded path (ops/banded.py) materializes overlapping x-slabs through
a gather, paying ~2x the bandwidth floor. This kernel streams each tile's
slab straight from HBM with a CONTIGUOUS async DMA (slabs are consecutive
row ranges by construction) and feeds the MXU directly:

    out[t*T:(t+1)*T] = Band[t] (T x S) @ x[start_t : start_t+S] (S x H)

Per layer it moves ~1.5x the node array + the (bf16) band — within ~2x of
the HBM bandwidth floor — versus gather+scatter's 2 full edge-array sweeps.

Grid: one program per UNROLL node tiles. `band` and `out` use the automatic
pipeline; the slab DMAs are issued inside the kernel (clamped start offsets
are data-dependent on program_id, which BlockSpec index maps cannot express)
into an NBUF-deep rotating buffer: TPU grid iterations run sequentially on
the core and scratch persists across them, so each iteration waits on a copy
prefetched NBUF tiles earlier and issues the next prefetches — overlapping
slab fetches with the matmuls. Measured on a v5e at [448x256x384]@[114688,
512] bf16: 0.70 ms (~540 GB/s effective; naive 2-slot single-tile version
0.79 ms, XLA slab-gather path 1.07 ms).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


def _kernel(band_ref, x_hbm, out_ref, slab_ref, sem, *, tile, width, n_nodes,
            n_tiles, out_dtype, nbuf, unroll, x_dtype):
    p = pl.program_id(0)
    copy = functools.partial(_slab_copy, x_hbm, slab_ref, sem,
                             tile=tile, width=width, n_nodes=n_nodes)
    base = p * unroll

    @pl.when(p == 0)
    def _():
        for j in range(min(nbuf, n_tiles)):
            copy(j, slot=j % nbuf).start()

    @pl.when(p > 0)
    def _():
        # keep the buffer nbuf tiles ahead: previous steps already started
        # tiles [0, base + (nbuf - unroll)); start the next `unroll`
        for j in range(unroll):
            t = base + (nbuf - unroll) + j

            @pl.when(t < n_tiles)
            def _():
                copy(t, slot=jax.lax.rem(t, nbuf)).start()

    for j in range(unroll):
        t = base + j
        copy(t, slot=jax.lax.rem(t, nbuf)).wait()
        b = band_ref[j]
        if jnp.issubdtype(b.dtype, jnp.integer):
            # int8 band straight from HBM; Mosaic can't cast int8->bf16
            # directly, bounce through f32 (cheap VPU op on one tile)
            b = b.astype(jnp.float32).astype(x_dtype)
        out_ref[pl.ds(j * tile, tile), :] = jnp.dot(
            b,
            slab_ref[jax.lax.rem(t, nbuf)].astype(b.dtype),
            preferred_element_type=jnp.float32,  # MXU f32 accumulation
        ).astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("tile", "width", "interpret", "out_dtype")
)
def pallas_banded_matmul(
    band: jnp.ndarray,   # [n_tiles, T, S] (int8, bf16 or f32)
    x: jnp.ndarray,      # [N, H]
    tile: int,
    width: int,
    interpret: bool = False,
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    """Band @ x with multi-buffered contiguous slab streaming; f32 MXU
    accumulation, ``out_dtype`` output."""
    n_tiles, t_, slab = band.shape
    n, h = x.shape
    assert t_ == tile and slab == tile + width and n == n_tiles * tile
    unroll = _UNROLL if n_tiles % _UNROLL == 0 else 1
    nbuf = max(_NBUF, 2 * unroll) if n_tiles > 2 else 2

    kernel = functools.partial(
        _kernel, tile=tile, width=width, n_nodes=n, n_tiles=n_tiles,
        out_dtype=out_dtype, nbuf=nbuf, unroll=unroll, x_dtype=x.dtype,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles // unroll,),
        in_specs=[
            pl.BlockSpec(
                (unroll, tile, slab), lambda p: (p, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (unroll * tile, h), lambda p: (p, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, h), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((nbuf, slab, h), x.dtype),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
        interpret=interpret,
    )(band, x)
    return out
