"""A/B the dropout threshold width (pallas_sage_layer.DROPOUT_BITS) on
the real chip: 32 (one PRNG word per element) vs 16/8 (2/4 thresholds
sliced from each word -> half/quarter the in-kernel PRNG generation in
both passes).

One process: per-width mask-stream correctness (reuses
probe_dropout_stream's analytic-gradient check), fwd-kernel isolation
timing, then full-train-step chained timing at flagship shape.

Usage: timeout 2400 python benchmarks/probe_dropout_bits.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench
import probe_dropout_stream
from buckgnn_tpu.ops import pallas_sage_layer as fsl
from buckgnn_tpu.ops.banded import make_agg_context

CHAIN = 10


def timed(fn, *args, n=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def time_step(setup, label):
    state, batch = setup["state"], setup["batch"]
    train_step, key = setup["train_step"], setup["key"]
    lr = jnp.float32(1e-3)

    @functools.partial(jax.jit, donate_argnums=0)
    def train_chain(state, key):
        def body(_, carry):
            state, key = carry
            key, sub = jax.random.split(key)
            state, _ = train_step(state, batch, sub, lr)
            return state, key

        return jax.lax.fori_loop(0, CHAIN, body, (state, key))

    for _ in range(2):
        state, key = train_chain(state, key)
    jax.block_until_ready(key)
    t0 = time.perf_counter()
    for _ in range(6):
        state, key = train_chain(state, key)
    jax.block_until_ready(key)
    wall = (time.perf_counter() - t0) / (6 * CHAIN) * 1e3
    print(f"{label}: train {wall:.2f} ms/step "
          f"({setup['n_edges'] / wall * 1e3 / 1e6:.2f}M e/s)", flush=True)
    return wall


def main():
    # ---- correctness: the analytic-grad mask check at each width ----
    for bits in (16, 8):
        fsl.DROPOUT_BITS = bits
        print(f"--- mask-stream check, DROPOUT_BITS={bits} ---", flush=True)
        probe_dropout_stream.run_all()

    # ---- fwd kernel isolation (fresh outer jit retraces per width) ----
    fsl.DROPOUT_BITS = 32
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

    ev = jax.jit(lambda *a: fsl.fused_sage_layer(
        *a, ctx, skip=True, rate=0.0, seed=None, deterministic=True))
    print(f"fwd eval (no dropout): {timed(ev, x, w_l, b_l, w_r):.3f} ms",
          flush=True)
    for bits in (32, 16, 8):
        fsl.DROPOUT_BITS = bits
        tr = jax.jit(lambda *a, _b=bits: fsl.fused_sage_layer(
            *a, ctx, skip=True, rate=0.1, seed=seed, deterministic=False))
        print(f"fwd train bits={bits}: "
              f"{timed(tr, x, w_l, b_l, w_r):.3f} ms", flush=True)

    # ---- full train step (fresh setup per width => fresh jit traces) ----
    results = {}
    fsl.DROPOUT_BITS = 32
    results[32] = time_step(setup, "step bits=32")
    for bits in (16, 8):
        fsl.DROPOUT_BITS = bits
        results[bits] = time_step(
            bench.build_bench_setup(use_super_node=True),
            f"step bits={bits}")
    best = min(results, key=results.get)
    print(f"best width: {best} ({results[best]:.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
