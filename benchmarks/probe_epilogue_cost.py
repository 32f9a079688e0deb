"""Attribute the fused forward's time above its MXU floor (v5e).

Chained timings of the SAME kernel with the epilogue progressively
stripped (pallas_sage_layer.PROBE_EPILOGUE): full -> nonorm (no L2
row-sum/rsqrt) -> bare (no relu/skip/dropout either). The deltas say how
much of the kernel is the serialized VPU epilogue and whether a lagged
(cross-grid-step) epilogue pipeline is worth building.

Usage: timeout 1800 python benchmarks/probe_epilogue_cost.py
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
    print(f"n={n} tiles={n // tile} width={width}", flush=True)

    def fwd(x, save_res, rate, super_, local=False):
        outs = fsl._call_fwd(
            x, w_l, b_l, w_r, ctx.band, batch.spill_offsets, batch.spill_lo,
            batch.spill_hi, jnp.zeros((0, 0), x.dtype), seed, gcode, table,
            gacc, batch.gwin, batch.lcode, tile=tile, width=width,
            has_spill=False, skip=True,
            rate=rate, training=rate > 0.0, save_res=save_res,
            interpret=False, has_super=super_, emit_table=False,
            local_star=local and batch.gwin is not None,
        )
        return outs[0]

    for mode in ("full", "nonorm", "bare"):
        fsl.PROBE_EPILOGUE = mode
        t = timed_chain(lambda v: fwd(v, True, 0.1, True), x0)
        print(f"fwd train mode={mode}: {t:.3f} ms", flush=True)
    # star selection matmul cost (has_super off; bare mode)
    t = timed_chain(lambda v: fwd(v, True, 0.1, False), x0)
    print(f"fwd train mode=bare nosuper: {t:.3f} ms", flush=True)
    fsl.PROBE_EPILOGUE = "full"


if __name__ == "__main__":
    main()
