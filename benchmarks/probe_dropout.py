"""Microbenchmark dropout variants at the flagship shape, on the real chip.

Usage: timeout 900 python benchmarks/probe_dropout.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N, H = 115456, 512
RATE = 0.1


def bernoulli_drop(x, key):
    keep = jax.random.bernoulli(key, 1.0 - RATE, x.shape)
    return jnp.where(keep, x / (1.0 - RATE), jnp.zeros((), x.dtype))


def u8_flat(x, key):
    words = jax.random.bits(key, (x.size // 4,), dtype=jnp.uint32)
    bits = jax.lax.bitcast_convert_type(words, jnp.uint8).reshape(x.shape)
    return jnp.where(bits < jnp.uint8(230), x * jnp.asarray(256 / 230, x.dtype),
                     jnp.zeros((), x.dtype))


def u8_2d(x, key):
    words = jax.random.bits(key, (x.shape[0], x.shape[1] // 4), dtype=jnp.uint32)
    bits = jax.lax.bitcast_convert_type(words, jnp.uint8).reshape(x.shape)
    return jnp.where(bits < jnp.uint8(230), x * jnp.asarray(256 / 230, x.dtype),
                     jnp.zeros((), x.dtype))


def u32_mask(x, key):
    words = jax.random.bits(key, x.shape, dtype=jnp.uint32)
    thr = jnp.uint32(int((1.0 - RATE) * 2**32))
    return jnp.where(words < thr, x * jnp.asarray(1 / (1 - RATE), x.dtype),
                     jnp.zeros((), x.dtype))


def time_fn(fn, x, key, n=30):
    f = jax.jit(lambda v, k: fn(v, k).sum())
    g = jax.jit(jax.grad(lambda v, k: fn(v, k).sum()))
    f(x, key).block_until_ready()
    g(x, key).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(x, key)
    r.block_until_ready()
    fwd = (time.perf_counter() - t0) / n * 1e3
    t0 = time.perf_counter()
    for _ in range(n):
        r = g(x, key)
    r.block_until_ready()
    bwd = (time.perf_counter() - t0) / n * 1e3
    return fwd, bwd


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    x = jnp.ones((N, H), jnp.bfloat16)
    np.asarray(x[0, 0])  # relay warmup
    for impl in ("rbg", "threefry"):
        key = jax.random.key(0, impl=impl)
        for name, fn in [("bernoulli", bernoulli_drop), ("u8_flat", u8_flat),
                         ("u8_2d", u8_2d), ("u32_mask", u32_mask)]:
            fwd, bwd = time_fn(fn, x, key)
            print(f"{impl:9s} {name:10s} fwd {fwd:6.2f} ms   grad {bwd:6.2f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
