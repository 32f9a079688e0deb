"""A/B the fwd-kernel spill scheduling variants (SPILL_SCHED) at the
virtual-edge flagship shape, plus the spill-off anchor.

Usage: timeout 1800 python benchmarks/probe_spill_sched.py
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
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, h)) * 0.1, jnp.bfloat16)
    w_l = jnp.asarray(rng.normal(size=(h, h)) * 0.05, jnp.bfloat16)
    b_l = jnp.asarray(rng.normal(size=(h,)) * 0.05, jnp.bfloat16)
    w_r = jnp.asarray(rng.normal(size=(h, h)) * 0.05, jnp.bfloat16)
    seed = jnp.asarray([1, 2], jnp.int32)

    def run(has_spill, sched):
        fsl.SPILL_SCHED = sched
        b = batch if has_spill else batch.replace(has_spill_edges=False)
        ctx = make_agg_context(b, band_dtype=jnp.bfloat16, use_pallas=True)

        def f(xx):
            return fsl.fused_sage_layer(xx, w_l, b_l, w_r, ctx, skip=True,
                                        rate=0.1, seed=seed,
                                        deterministic=False)

        return timed(jax.jit(f), x)

    base = run(False, "inline")
    print(f"spill OFF            : {base:.3f} ms", flush=True)
    for sched in ("inline", "staged", "dma2"):
        t = run(True, sched)
        print(f"spill ON  {sched:<10}: {t:.3f} ms  delta {t - base:.3f}",
              flush=True)


if __name__ == "__main__":
    main()
