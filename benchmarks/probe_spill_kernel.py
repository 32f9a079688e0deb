"""Isolate the fused-spill cost in pallas_banded_matmul on the real chip.

Times (chained, dispatch-amortized):
  nospill       band matmul only
  spill         band + fused spill (incl. the x[spill_s] gather, as in prod)
  spill-nogather band + fused spill with a FIXED message array
  gather-only   just the x[spill_s] gather

Usage: timeout 1200 python benchmarks/probe_spill_kernel.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from buckgnn_tpu.graph.batch import SPILL_ALIGN, SPILL_CHUNK
from buckgnn_tpu.ops.pallas_banded import pallas_banded_matmul

CHAIN = 20


def bench(fn, *args, iters=10, warmup=2):
    @jax.jit
    def chained(*a):
        y = a[-1]
        def body(_, y):
            return fn(*a[:-1], y)
        return jax.lax.fori_loop(0, CHAIN, body, y)

    for _ in range(warmup):
        out = chained(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = chained(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (iters * CHAIN) * 1e3


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    N, H, TILE, W = 114688, 512, 256, 128
    n_tiles = N // TILE
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, H)), jnp.bfloat16)
    band = jnp.asarray(
        (rng.random((n_tiles, TILE, TILE + W)) < 4.0 / (TILE + W)).astype(np.int8)
    )
    # synthetic sorted spill: ~31k random receivers, random senders
    Es = 31744
    sr = np.sort(rng.integers(0, N - 1, size=Es)).astype(np.int32)
    ss = rng.integers(0, N - 1, size=Es).astype(np.int32)
    sr_j, ss_j = jnp.asarray(sr), jnp.asarray(ss)

    def spill_args(y):
        off = jnp.searchsorted(
            sr_j, (jnp.arange(n_tiles + 1) * TILE).astype(jnp.int32)
        ).astype(jnp.int32)
        win = jnp.clip((off[:-1] // SPILL_ALIGN) * SPILL_ALIGN,
                       0, Es - SPILL_CHUNK)
        ids = jnp.arange(N, dtype=jnp.int32)
        lo = jnp.clip(jnp.searchsorted(sr_j, ids, side="left").astype(jnp.int32)
                      .reshape(n_tiles, TILE, 1) - win[:, None, None],
                      0, SPILL_CHUNK)
        hi = jnp.clip(jnp.searchsorted(sr_j, ids, side="right").astype(jnp.int32)
                      .reshape(n_tiles, TILE, 1) - win[:, None, None],
                      0, SPILL_CHUNK)
        return off, lo, hi

    t = bench(lambda b, y: pallas_banded_matmul(
        b, y, TILE, W, out_dtype=jnp.bfloat16), band, x)
    print(f"nospill: {t:.3f} ms", flush=True)

    def with_spill(b, y):
        off, lo, hi = spill_args(y)
        return pallas_banded_matmul(b, y, TILE, W, out_dtype=jnp.bfloat16,
                                    spill_offsets=off, spill_lo=lo,
                                    spill_hi=hi, spill_messages=y[ss_j])
    t = bench(with_spill, band, x)
    print(f"spill(+gather): {t:.3f} ms", flush=True)

    msgs_fixed = jnp.asarray(rng.standard_normal((Es, H)), jnp.bfloat16)

    def with_spill_ng(b, m, y):
        off, lo, hi = spill_args(y)
        return pallas_banded_matmul(b, y, TILE, W, out_dtype=jnp.bfloat16,
                                    spill_offsets=off, spill_lo=lo,
                                    spill_hi=hi, spill_messages=m)
    t = bench(with_spill_ng, band, msgs_fixed, x)
    print(f"spill(nogather): {t:.3f} ms", flush=True)

    def gather_only(_, y):
        return y.at[:Es].add(y[ss_j] * jnp.bfloat16(0.001))
    t = bench(gather_only, band, x)
    print(f"gather+slice-add only: {t:.3f} ms", flush=True)

    # the XLA scatter it replaces, for reference
    def scatter(b, y):
        agg = pallas_banded_matmul(b, y, TILE, W, out_dtype=jnp.bfloat16)
        return agg.at[sr_j].add(y[ss_j], indices_are_sorted=True)
    t = bench(scatter, band, x)
    print(f"band + XLA scatter: {t:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
