"""Per-kernel isolation timings for the fused SAGE layer at flagship shape.

Times each kernel with chained calls (dispatch-amortized) across a small
variant matrix so whole-step A/B confounds don't mislead:
  - fwd kernel: eval vs train, rowsum VPU vs MXU
  - bwd tile kernel: rowsum VPU vs MXU, with/without the in-kernel
    supernode-table accumulation (has_super static flag)
  - bwd band kernel (pallas_banded_matmul with acc + tables)

Usage: timeout 1800 python benchmarks/probe_kernels.py
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
from buckgnn_tpu.ops.pallas_banded import pallas_banded_matmul


def timed(fn, *args, n=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    setup = bench.build_bench_setup(use_super_node=True)
    batch = setup["batch"]
    ctx = make_agg_context(batch, band_dtype=jnp.bfloat16, use_pallas=True)
    n, h = batch.n_node_cap, 512
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, h)) * 0.1, jnp.bfloat16)
    w_l = jnp.asarray(rng.normal(size=(h, h)) * 0.05, jnp.bfloat16)
    b_l = jnp.asarray(rng.normal(size=(h,)) * 0.05, jnp.bfloat16)
    w_r = jnp.asarray(rng.normal(size=(h, h)) * 0.05, jnp.bfloat16)
    seed = jnp.asarray([1, 2], jnp.int32)
    print(f"shape: n={n} h={h} tiles={n // batch.band_tile} "
          f"has_spill={batch.has_spill_edges} "
          f"has_super={batch.has_supernode_edges}", flush=True)

    for mxu in (True, False):
        fsl.ROWSUM_MXU = mxu
        ev = jax.jit(lambda *a: fsl.fused_sage_layer(
            *a, ctx, skip=True, rate=0.0, seed=None, deterministic=True))
        tr = jax.jit(lambda *a: fsl.fused_sage_layer(
            *a, ctx, skip=True, rate=0.1, seed=seed, deterministic=False))
        print(f"fwd eval  rowsum_mxu={mxu}: "
              f"{timed(ev, x, w_l, b_l, w_r):.3f} ms", flush=True)
        print(f"fwd train rowsum_mxu={mxu}: "
              f"{timed(tr, x, w_l, b_l, w_r):.3f} ms", flush=True)

    # bwd tile kernel in isolation
    tile = batch.band_tile
    n_tiles = n // tile
    from buckgnn_tpu.graph.batch import star_table_geometry
    _t0, tg = star_table_geometry(batch.n_graph_cap)
    dz = jnp.asarray(rng.normal(size=(n, h)) * 0.1, jnp.bfloat16)
    y = jnp.asarray(rng.normal(size=(n, h)) * 0.1, jnp.bfloat16)
    inv = jnp.asarray(rng.uniform(0.5, 2.0, size=(n, 1)), jnp.float32)
    agg = jnp.asarray(rng.normal(size=(n, h)) * 0.1, jnp.bfloat16)
    gacc = jnp.asarray(
        rng.integers(0, tg + 1, size=(n_tiles, 1, tile)), jnp.int32
    )
    for mxu in (True, False):
        fsl.ROWSUM_MXU = mxu
        for has_super in (True, False):
            f = jax.jit(lambda dz, y, inv, agg, x, _hs=has_super:
                        fsl._call_bwd_tile(
                            dz, y, inv, agg, x, w_l, w_r, seed, gacc,
                            tile=tile, skip=True, rate=0.1,
                            training_rate_active=True, interpret=False,
                            has_super=_hs, tg=tg)[0])
            print(f"bwd tile rowsum_mxu={mxu} table_acc={has_super}: "
                  f"{timed(f, dz, y, inv, agg, x):.3f} ms", flush=True)

    # bwd band kernel (with fused accumulator + supernode tables)
    table = jnp.asarray(rng.normal(size=(tg, h)) * 0.1, jnp.bfloat16)
    gcode = batch.gcode
    dxp = jnp.asarray(rng.normal(size=(n, h)) * 0.1, jnp.bfloat16)
    f = jax.jit(lambda dagg, acc: pallas_banded_matmul(
        ctx.band, dagg, tile, batch.band_width, out_dtype=jnp.bfloat16,
        acc=acc, gcode=gcode, table=table))
    print(f"bwd band (+acc +tables): {timed(f, dz, dxp):.3f} ms", flush=True)


if __name__ == "__main__":
    main()
