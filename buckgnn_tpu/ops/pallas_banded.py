"""Pallas TPU kernel for the block-banded SpMM aggregation.

The XLA banded path (ops/banded.py) materializes overlapping x-slabs through
a gather, paying ~2x the bandwidth floor. This kernel streams each tile's
slab straight from HBM with a CONTIGUOUS async DMA (slabs are consecutive
row ranges by construction) and feeds the MXU directly:

    out[t*T:(t+1)*T] = Band[t] (T x S) @ x[start_t : start_t+S] (S x H)

Per layer it moves ~1.5x the node array + the (bf16) band — within ~2x of
the HBM bandwidth floor — versus gather+scatter's 2 full edge-array sweeps.

Grid: one program per node tile. `band` and `out` use the automatic
pipeline; the slab DMA is issued inside the kernel (clamped start offsets
are data-dependent on program_id, which BlockSpec index maps cannot
express) and DOUBLE-BUFFERED: TPU grid iterations run sequentially on the
core and scratch persists across them, so iteration t waits on the copy
it prefetched at t-1 and immediately issues the prefetch for t+1 —
overlapping the slab fetch of the next tile with the matmul of the
current one.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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
            n_tiles, out_dtype):
    t = pl.program_id(0)
    cur = jax.lax.rem(t, 2)
    nxt = jax.lax.rem(t + 1, 2)
    copy = functools.partial(_slab_copy, x_hbm, slab_ref, sem,
                             tile=tile, width=width, n_nodes=n_nodes)

    @pl.when(t == 0)
    def _():
        copy(t, slot=cur).start()

    @pl.when(t + 1 < n_tiles)
    def _():
        copy(t + 1, slot=nxt).start()

    copy(t, slot=cur).wait()
    out_ref[:] = jnp.dot(
        band_ref[0],
        slab_ref[cur].astype(band_ref.dtype),
        preferred_element_type=jnp.float32,  # MXU f32 accumulation
    ).astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("tile", "width", "interpret", "out_dtype")
)
def pallas_banded_matmul(
    band: jnp.ndarray,   # [n_tiles, T, S] (bf16 or f32)
    x: jnp.ndarray,      # [N, H]
    tile: int,
    width: int,
    interpret: bool = False,
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    """Band @ x with double-buffered contiguous slab streaming; f32 MXU
    accumulation, ``out_dtype`` output."""
    n_tiles, t_, slab = band.shape
    n, h = x.shape
    assert t_ == tile and slab == tile + width and n == n_tiles * tile

    kernel = functools.partial(
        _kernel, tile=tile, width=width, n_nodes=n, n_tiles=n_tiles,
        out_dtype=out_dtype,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, tile, slab), lambda t: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (tile, h), lambda t: (t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, h), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, slab, h), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(band, x)
    return out
