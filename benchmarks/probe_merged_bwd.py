"""Measure the merged backward + star threading on the real chip.

One process: correctness spot check at flagship shape, chained step
timing, then an XLA profile for per-kernel attribution.

Usage: timeout 1800 python benchmarks/probe_merged_bwd.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_bench_setup

CHAIN = 10


def main():
    setup = build_bench_setup(use_super_node=True)
    state, batch = setup["state"], setup["batch"]
    train_step = setup["train_step"]
    key = setup["key"]
    lr = jnp.float32(1e-3)
    print(f"has_spill={batch.has_spill_edges} "
          f"has_super={batch.has_supernode_edges}", flush=True)

    # quick finiteness + loss-decrease check of the new backward
    losses = []
    for i in range(20):
        key, sub = jax.random.split(key)
        state, m = train_step(state, batch, sub, lr)
        if i % 5 == 4:
            losses.append(float(m["loss"]))
    print("losses:", [f"{v:.4f}" for v in losses], flush=True)
    assert np.isfinite(losses).all() and losses[-1] < losses[0]

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
    n_edges = setup["n_edges"]
    print(f"chained wall: {wall:.2f} ms/step "
          f"({n_edges / wall * 1e3 / 1e6:.2f}M e/s)", flush=True)

    with jax.profiler.trace("/tmp/bgtpu_profiles/train_merged"):
        key, sub = jax.random.split(key)
        state, m = train_step(state, batch, sub, lr)
        for _ in range(4):
            key, sub = jax.random.split(key)
            state, m = train_step(state, batch, sub, lr)
        jax.block_until_ready(m["loss"])
    print("trace -> /tmp/bgtpu_profiles/train_merged", flush=True)


if __name__ == "__main__":
    main()
