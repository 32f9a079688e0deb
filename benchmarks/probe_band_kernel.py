"""Probe: banded-SpMM Pallas kernel variants on the real chip.

The production kernel (ops/pallas_banded.py) measures ~1.9 ms per layer at
ncap=115456, h=512 — ~4.2 us per grid iteration where the FLOP+DMA floor is
~1 us/tile, i.e. overhead-bound. This probe times candidate fixes in ONE
process (the relay pays ~3 min warmup per process):

  base      current production kernel (bf16 band, 2-slot slab DMA)
  u8        band kept uint8 in HBM, cast in VMEM (halves band traffic and
            removes the per-step bf16 cast in make_agg_context)
  buf3      3-slot slab buffering (prefetch depth 2)
  unroll2   two node tiles per grid step (halves per-iteration overhead)
  u8+unroll2, u8+buf3+unroll2, tile512 variants

plus reference numbers: dense matmul roofline, HBM copy bandwidth, and the
XLA slab-gather path. All variants are allclose-checked against the XLA
reference before timing.

Usage (TPU): timeout 1200 python benchmarks/probe_band_kernel.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------- variants #


def _slab_copy(x_hbm, slab_ref, sem, t, *, tile, width, n_nodes, slot):
    slab = tile + width
    start = jnp.clip(t * tile - width // 2, 0, max(n_nodes - slab, 0))
    start = pl.multiple_of(start, 8)
    return pltpu.make_async_copy(
        x_hbm.at[pl.ds(start, slab), :], slab_ref.at[slot], sem.at[slot]
    )


def _kernel_v(band_ref, x_hbm, out_ref, slab_ref, sem, *, tile, width,
              n_nodes, n_tiles, out_dtype, nbuf, unroll, cast):
    """Parametrized kernel: nbuf-deep slab buffering, `unroll` tiles/step,
    optional in-VMEM band cast (uint8 band input)."""
    p = pl.program_id(0)
    copy = functools.partial(_slab_copy, x_hbm, slab_ref, sem,
                             tile=tile, width=width, n_nodes=n_nodes)
    total = n_tiles  # grid steps * unroll == node tiles
    base = p * unroll

    @pl.when(p == 0)
    def _():
        for j in range(min(nbuf, total)):
            copy(j, slot=j % nbuf).start()

    @pl.when(p > 0)
    def _():
        for j in range(unroll):
            t = base + (nbuf - unroll) + j
            # started nbuf-ahead relative to this step's first tile

            @pl.when(t < total)
            def _():
                copy(t, slot=jax.lax.rem(t, nbuf)).start()

    for j in range(unroll):
        t = base + j
        copy(t, slot=jax.lax.rem(t, nbuf)).wait()
        b = band_ref[j]
        if cast:
            # Mosaic can't cast int8->bf16 directly; bounce through f32
            b = b.astype(jnp.float32).astype(jnp.bfloat16)
        out_ref[pl.ds(j * tile, tile), :] = jnp.dot(
            b, slab_ref[jax.lax.rem(t, nbuf)].astype(b.dtype),
            preferred_element_type=jnp.float32,
        ).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=(
    "tile", "width", "nbuf", "unroll", "out_dtype"))
def banded_matmul_v(band, x, tile, width, nbuf=2, unroll=1,
                    out_dtype=jnp.bfloat16):
    n_tiles, t_, slab = band.shape
    n, h = x.shape
    assert t_ == tile and slab == tile + width and n == n_tiles * tile
    assert n_tiles % unroll == 0 and nbuf >= 2 * unroll
    cast = band.dtype == jnp.int8
    kernel = functools.partial(
        _kernel_v, tile=tile, width=width, n_nodes=n, n_tiles=n_tiles,
        out_dtype=out_dtype, nbuf=nbuf, unroll=unroll, cast=cast)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles // unroll,),
        in_specs=[
            pl.BlockSpec((unroll, tile, slab), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((unroll * tile, h), lambda p: (p, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((nbuf, slab, h), x.dtype),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
    )(band, x)


@functools.partial(jax.jit, static_argnames=("tile", "width"))
def xla_slab(band, x, tile, width):
    n, h = x.shape
    slab = tile + width
    n_tiles = n // tile
    starts = jnp.clip(jnp.arange(n_tiles) * tile - width // 2,
                      0, max(n - slab, 0))
    xs = x[starts[:, None] + jnp.arange(slab)[None, :]]
    return jax.lax.dot_general(
        band, xs.astype(band.dtype),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).reshape(n, h).astype(x.dtype)


# ---------------------------------------------------------------- helpers #


CHAIN = 20  # kernel applications per dispatch: amortize the ~1 ms
            # per-dispatch floor of the relayed chip


def bench_chained(fn, band, x, iters=10, warmup=2):
    """Time `fn(band, y)` CHAIN times per dispatch (y -> y chaining), so the
    per-call relay dispatch latency is amortized away."""

    @jax.jit
    def chained(band, y):
        def body(_, y):
            return fn(band, y)
        return jax.lax.fori_loop(0, CHAIN, body, y)

    for _ in range(warmup):
        out = chained(band, x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = chained(band, x)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (iters * CHAIN) * 1e3  # ms/call


def make_band(rng, n, tile, width, avg_deg=4.0, dtype=np.int8):
    """Synthetic band with mesh-like density."""
    n_tiles = n // tile
    slab = tile + width
    p = avg_deg / slab
    band = (rng.random((n_tiles, tile, slab)) < p).astype(dtype)
    return band


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)

    # 448 tiles of 256: divisible by the unroll factors and by tile=512
    N, H, TILE, W = 114688, 512, 256, 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, H)), jnp.bfloat16)
    band_u8 = jnp.asarray(make_band(rng, N, TILE, W))
    band_bf16 = band_u8.astype(jnp.bfloat16)

    # correctness on a small shape first
    ns, ts, ws = 2048, 256, 128
    xs = jnp.asarray(rng.standard_normal((ns, 256)), jnp.bfloat16)
    bs_u8 = jnp.asarray(make_band(rng, ns, ts, ws))
    ref = xla_slab(bs_u8.astype(jnp.bfloat16), xs, ts, ws)
    for name, (b, kw) in {
        "base": (bs_u8.astype(jnp.bfloat16), dict()),
        "u8": (bs_u8, dict()),
        "buf3": (bs_u8.astype(jnp.bfloat16), dict(nbuf=3)),
        "u8+buf3": (bs_u8, dict(nbuf=3)),
        "unroll2": (bs_u8.astype(jnp.bfloat16), dict(nbuf=4, unroll=2)),
        "u8+unroll2": (bs_u8, dict(nbuf=4, unroll=2)),
        "u8+unroll2+buf6": (bs_u8, dict(nbuf=6, unroll=2)),
        "u8+unroll4": (bs_u8, dict(nbuf=8, unroll=4)),
    }.items():
        got = banded_matmul_v(b, xs, ts, ws, **kw)
        ok = np.allclose(np.asarray(got, np.float32),
                         np.asarray(ref, np.float32), atol=1e-2, rtol=1e-2)
        print(f"correct[{name}]: {ok}", flush=True)
        assert ok, name

    # rooflines (chained: amortize the relay dispatch floor)
    w_d = jnp.asarray(rng.standard_normal((H, H)), jnp.bfloat16)
    t = bench_chained(lambda w, y: (y @ w).astype(y.dtype), w_d, x)
    fl = 2 * N * H * H
    print(f"dense [N,H]x[H,H]: {t:.3f} ms  ({fl/t/1e9:.1f} TFLOP/s)",
          flush=True)
    t = bench_chained(lambda _, y: y + 1.0, w_d, x)
    byts = 2 * N * H * 2
    print(f"HBM rw [N,H] bf16: {t:.3f} ms  ({byts/t/1e6:.0f} GB/s)",
          flush=True)

    # variants at production shape
    results = {}
    t = bench_chained(
        lambda b, y: xla_slab(b, y, TILE, W), band_bf16, x)
    results["xla_slab"] = t
    print(f"xla_slab: {t:.3f} ms", flush=True)

    def variant(tile, width, **kw):
        return lambda b, y: banded_matmul_v(b, y, tile, width, **kw)

    for name, (b, kw) in {
        "base(nbuf2)": (band_bf16, dict()),
        "u8": (band_u8, dict()),
        "buf3": (band_bf16, dict(nbuf=3)),
        "buf4": (band_bf16, dict(nbuf=4)),
        "unroll2": (band_bf16, dict(nbuf=4, unroll=2)),
        "unroll2+buf6": (band_bf16, dict(nbuf=6, unroll=2)),
        "unroll4": (band_bf16, dict(nbuf=8, unroll=4)),
    }.items():
        t = bench_chained(variant(TILE, W, **kw), b, x)
        results[name] = t
        print(f"{name}: {t:.3f} ms", flush=True)

    # other tile sizes (band repacked; N divisible by 512)
    band512 = jnp.asarray(make_band(rng, N, 512, W)).astype(jnp.bfloat16)
    for name, kw in {
        "t512": dict(),
        "t512/unroll2": dict(nbuf=4, unroll=2),
    }.items():
        t = bench_chained(variant(512, W, **kw), band512, x)
        results[name] = t
        print(f"{name}: {t:.3f} ms", flush=True)

    band128 = jnp.asarray(make_band(rng, N, 128, W)).astype(jnp.bfloat16)
    for name, kw in {
        "t128/unroll2": dict(nbuf=4, unroll=2),
        "t128/unroll4": dict(nbuf=8, unroll=4),
    }.items():
        t = bench_chained(variant(128, W, **kw), band128, x)
        results[name] = t
        print(f"{name}: {t:.3f} ms", flush=True)

    best = min(results, key=results.get)
    print(f"\nBEST: {best} = {results[best]:.3f} ms "
          f"(base {results['base(nbuf2)']:.3f} ms)", flush=True)


if __name__ == "__main__":
    main()
