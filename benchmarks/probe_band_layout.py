"""Why does the step pay a 0.126 ms in-graph relayout copy of the int8
band ({1,2,0} -> the custom call's {2,1,0} row-major constraint)?

Times the fwd kernel with the band passed (a) as a plain jit arg,
(b) as a jit arg with an explicit row-major entry Format, and checks
the achieved layouts. If (b) removes the copy, make_train_step should
pin entry formats for the band/code arrays.

Usage: timeout 1800 python benchmarks/probe_band_layout.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import layout as jlayout

import bench
from buckgnn_tpu.ops import pallas_sage_layer as fsl
from buckgnn_tpu.ops.banded import make_agg_context

CHAIN = 20


def timed_chain(step, x0, *args, n=6):
    @jax.jit
    def chain(x, *a):
        return jax.lax.fori_loop(0, CHAIN, lambda _, v: step(v, *a), x)

    out = jax.block_until_ready(chain(x0, *args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = chain(out, *args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (n * CHAIN) * 1e3


def main():
    setup = bench.build_bench_setup(use_super_node=True)
    batch = setup["batch"]
    ctx = make_agg_context(batch, band_dtype=jnp.bfloat16, use_pallas=True)
    n, h = batch.n_node_cap, 512
    tile, width = batch.band_tile, batch.band_width
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(n, h)) * 0.1, jnp.bfloat16)
    w_l = jnp.asarray(rng.normal(size=(h, h)) * 0.05, jnp.bfloat16)
    b_l = jnp.asarray(rng.normal(size=(1, h)) * 0.05, jnp.bfloat16)
    w_r = jnp.asarray(rng.normal(size=(h, h)) * 0.05, jnp.bfloat16)
    seed = jnp.asarray([1, 2], jnp.int32)
    _, tg = __import__(
        "buckgnn_tpu.graph.batch", fromlist=["star_table_geometry"]
    ).star_table_geometry(batch.n_graph_cap)
    table = jnp.asarray(rng.normal(size=(tg, h)) * 0.1, jnp.bfloat16)

    print("band format at creation:", ctx.band.format.layout, flush=True)

    def fwd(x, band):
        outs = fsl._call_fwd(
            x, w_l, b_l, w_r, band, batch.spill_offsets, batch.spill_lo,
            batch.spill_hi, jnp.zeros((0, 0), x.dtype), seed, batch.gcode,
            table, batch.gacc, batch.gwin, batch.lcode, batch.lacc,
            tile=tile, width=width, has_spill=False, skip=True,
            rate=0.1, training=True, save_res=True,
            interpret=False, has_super=True, emit_table=True,
            local_star=True,
        )
        return outs[0]

    t = timed_chain(fwd, x0, ctx.band)
    print(f"fwd band=arg: {t:.3f} ms", flush=True)

    rm = jlayout.Format(
        jlayout.Layout(major_to_minor=(0, 1, 2)),
        jax.sharding.SingleDeviceSharding(jax.devices()[0]),
    )
    band_rm = jax.device_put(ctx.band, rm)
    print("band format after device_put:", band_rm.format.layout,
          flush=True)
    t = timed_chain(fwd, x0, band_rm)
    print(f"fwd band=row-major arg: {t:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
