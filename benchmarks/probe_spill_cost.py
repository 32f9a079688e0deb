"""Isolate the in-kernel spill-window cost at the virtual-edge flagship
shape: time the fused fwd kernel and the bwd band kernel with the spill
machinery on vs off (same batch; the off variant reads zero messages).

Usage: timeout 1800 python benchmarks/probe_spill_cost.py
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


def timed(fn, *args, n=30):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    setup = bench.build_bench_setup(use_super_node=False)
    batch = setup["batch"]
    n, h = batch.n_node_cap, 512
    tile, width = batch.band_tile, batch.band_width
    n_tiles = n // tile
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, h)) * 0.1, jnp.bfloat16)
    w_l = jnp.asarray(rng.normal(size=(h, h)) * 0.05, jnp.bfloat16)
    b_l = jnp.asarray(rng.normal(size=(h,)) * 0.05, jnp.bfloat16)
    w_r = jnp.asarray(rng.normal(size=(h, h)) * 0.05, jnp.bfloat16)
    seed = jnp.asarray([1, 2], jnp.int32)
    band = batch.band
    if band.ndim == 2:
        band = band.reshape(n_tiles, tile, tile + width)
    ns = int(batch.spill_senders.shape[0])
    print(f"n={n} h={h} tiles={n_tiles} width={width} n_spill_cap={ns} "
          f"real_spill={int(np.sum(np.asarray(batch.spill_receivers) != n - 1))}",
          flush=True)

    from buckgnn_tpu.ops.banded import make_agg_context
    from buckgnn_tpu.ops.pallas_sage_layer import fused_sage_layer

    def fwd(has_spill, training=True):
        b = batch if has_spill else batch.replace(has_spill_edges=False)
        ctx = make_agg_context(b, band_dtype=jnp.bfloat16, use_pallas=True)

        def f(xx):
            return fused_sage_layer(xx, w_l, b_l, w_r, ctx, skip=True,
                                    rate=0.1, seed=seed,
                                    deterministic=not training)

        return timed(jax.jit(f), x)

    t_off = fwd(False)
    t_on = fwd(True)
    print(f"fwd train: spill OFF {t_off:.3f} ms  ON {t_on:.3f} ms  "
          f"delta {t_on - t_off:.3f}", flush=True)
    t_off = fwd(False, training=False)
    t_on = fwd(True, training=False)
    print(f"fwd eval:  spill OFF {t_off:.3f} ms  ON {t_on:.3f} ms  "
          f"delta {t_on - t_off:.3f}", flush=True)

    # XLA-side gather cost (msgs = x[spill_s])
    g = jax.jit(lambda xx: xx[batch.spill_senders])
    print(f"gather x[spill_s]: {timed(g, x):.3f} ms", flush=True)

    # bwd band kernel (dagg aggregation) with/without spill
    from buckgnn_tpu.ops.pallas_banded import pallas_banded_matmul

    def bwd_band(has_spill):
        msgs = x[batch.spill_senders] if has_spill else jnp.zeros(
            (0, 0), x.dtype)

        def f(xx, msgs):
            kw = {}
            if has_spill:
                kw = dict(spill_offsets=batch.spill_offsets,
                          spill_lo=batch.spill_lo,
                          spill_hi=batch.spill_hi, spill_messages=msgs)
            return pallas_banded_matmul(band, xx, tile=tile, width=width,
                                        **kw)

        return timed(jax.jit(f), x, msgs)

    try:
        t_off = bwd_band(False)
        t_on = bwd_band(True)
        print(f"bwd band:     spill OFF {t_off:.3f} ms  ON {t_on:.3f} ms  "
              f"delta {t_on - t_off:.3f}", flush=True)
    except Exception as e:
        print(f"bwd band probe failed: {e}", flush=True)


if __name__ == "__main__":
    main()
