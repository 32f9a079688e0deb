"""Forward fused-kernel traffic analysis on the real chip.

The train-forward (save_res=True) writes z + y + agg (+inv) back to HBM
(~352 MB/layer at flagship shape) on top of the slab reads; if the
kernel is DMA-bound the save_res delta gives the achieved store
bandwidth and tells us whether chasing the VPU epilogue is worth it.

Also A/Bs the band operand dtype (int8 packed + in-kernel convert vs
bf16 packed, 2x DMA but no convert) for the fwd and merged bwd kernels.

All timings CHAIN kernel calls through one jitted fori_loop with a
loop-carried data dependency — per-dispatch relay latency (~1-2 ms)
otherwise swamps sub-ms deltas.

Usage: timeout 1800 python benchmarks/probe_fwd_traffic.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from buckgnn_tpu.ops import pallas_sage_layer as fsl
from buckgnn_tpu.ops.banded import make_agg_context

CHAIN = 20


def timed_chain(step, x0, n=6):
    @jax.jit
    def chain(x):
        return jax.lax.fori_loop(0, CHAIN, lambda _, v: step(v), x)

    out = jax.block_until_ready(chain(x0))
    t0 = time.perf_counter()
    for _ in range(n):
        out = chain(out)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (n * CHAIN) * 1e3


def main():
    setup = bench.build_bench_setup(use_super_node=True)
    batch = setup["batch"]
    ctx = make_agg_context(batch, band_dtype=jnp.bfloat16, use_pallas=True)
    n, h = batch.n_node_cap, 512
    tile, width = batch.band_tile, batch.band_width
    n_tiles = n // tile
    from buckgnn_tpu.graph.batch import star_table_geometry
    _t0, tg = star_table_geometry(batch.n_graph_cap)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(n, h)) * 0.1, jnp.bfloat16)
    w_l = jnp.asarray(rng.normal(size=(h, h)) * 0.05, jnp.bfloat16)
    b_l = jnp.asarray(rng.normal(size=(1, h)) * 0.05, jnp.bfloat16)
    w_r = jnp.asarray(rng.normal(size=(h, h)) * 0.05, jnp.bfloat16)
    seed = jnp.asarray([1, 2], jnp.int32)
    table = jnp.asarray(rng.normal(size=(tg, h)) * 0.1, jnp.bfloat16)
    gcode, gacc = batch.gcode, batch.gacc
    print(f"n={n} tiles={n_tiles} spill={batch.has_spill_edges} "
          f"band dtype={ctx.band.dtype}", flush=True)

    bands = {"int8": ctx.band, "bf16": ctx.band.astype(jnp.bfloat16)}

    def fwd(x, band, save_res, rate, emit):
        outs = fsl._call_fwd(
            x, w_l, b_l, w_r, band, batch.spill_offsets, batch.spill_lo,
            batch.spill_hi, jnp.zeros((0, 0), x.dtype), seed, gcode, table,
            gacc, batch.gwin, batch.lcode, tile=tile, width=width,
            has_spill=False, skip=True,
            rate=rate, training=rate > 0.0, save_res=save_res,
            interpret=False, has_super=True, emit_table=emit,
            local_star=batch.gwin is not None,
        )
        return outs[0]

    for name, band in bands.items():
        for save_res in (False, True):
            for rate in (0.0, 0.1):
                t = timed_chain(
                    lambda v, _b=band, _s=save_res, _r=rate:
                    fwd(v, _b, _s, _r, False), x0)
                print(f"fwd band={name} save_res={save_res} rate={rate}: "
                      f"{t:.3f} ms", flush=True)
    # in-kernel next-layer table emission (the XLA build costs ~0.16 ms)
    t = timed_chain(lambda v: fwd(v, ctx.band, True, 0.1, True), x0)
    print(f"fwd band=int8 save_res=True rate=0.1 emit_table: {t:.3f} ms",
          flush=True)

    # merged backward with int8 vs bf16 band (chain dz through the dx out)
    y = jnp.asarray(rng.normal(size=(n, h)) * 0.1, jnp.bfloat16)
    inv = jnp.asarray(rng.uniform(0.5, 2.0, size=(n_tiles, 1, tile)),
                      jnp.float32)
    agg = jnp.asarray(rng.normal(size=(n, h)) * 0.1, jnp.bfloat16)
    tprev = jnp.asarray(rng.normal(size=(tg, h)) * 0.1, jnp.bfloat16)

    def bwd(dz, band):
        return fsl._call_bwd_merged(
            dz, y, inv, agg, x0, w_l, w_r, seed, gacc, gcode, tprev, band,
            batch.gwin, batch.lcode, batch.lacc,
            tile=tile, width=width, skip=True, rate=0.1,
            training_rate_active=True, interpret=False, has_super=True,
            apply_prev=True, tg=tg, local_star=batch.gwin is not None,
        )[0]

    for name, band in bands.items():
        t = timed_chain(lambda v, _b=band: bwd(v, _b), x0)
        print(f"bwd merged band={name}: {t:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
