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
are data-dependent on program_id, which BlockSpec index maps cannot express).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(band_ref, x_hbm, out_ref, slab_ref, sem, *, tile, width, n_nodes,
            out_dtype):
    slab = tile + width
    t = pl.program_id(0)
    start = jnp.clip(t * tile - width // 2, 0, max(n_nodes - slab, 0))
    # every branch of the clip is a multiple of the sublane tiling (tile,
    # width//2 and n_nodes are multiples of 8); Mosaic needs the hint
    start = pl.multiple_of(start, 8)
    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(start, slab), :], slab_ref, sem
    )
    dma.start()
    dma.wait()
    out_ref[:] = jnp.dot(
        band_ref[0],
        slab_ref[:].astype(band_ref.dtype),
        preferred_element_type=out_dtype,
    )


@functools.partial(
    jax.jit, static_argnames=("tile", "width", "interpret")
)
def pallas_banded_matmul(
    band: jnp.ndarray,   # [n_tiles, T, S] (bf16 or f32)
    x: jnp.ndarray,      # [N, H]
    tile: int,
    width: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Band @ x with contiguous slab streaming. Returns [N, H] float32."""
    n_tiles, t_, slab = band.shape
    n, h = x.shape
    assert t_ == tile and slab == tile + width and n == n_tiles * tile

    kernel = functools.partial(
        _kernel, tile=tile, width=width, n_nodes=n, out_dtype=jnp.float32
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
        out_shape=jax.ShapeDtypeStruct((n, h), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((slab, h), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(band, x)
    return out
