"""Band width 128 vs 64 A/B at flagship shape (full train step).

The bench meshes (RCM order, side 24-32) stay fully in-band at width 64
(checked host-side: has_spill=False), so the slab/band minor dim shrinks
384 -> 320: -17% band-matmul FLOPs and slab DMA in BOTH passes.

Usage: timeout 2400 python benchmarks/probe_width.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench

CHAIN = 10


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
    for width in (128, 64, 96):
        setup = bench.build_bench_setup(use_super_node=True,
                                        band_width=width)
        b = setup["batch"]
        print(f"width={width}: spill={b.has_spill_edges} "
              f"ncap={b.n_node_cap}", flush=True)
        time_step(setup, f"step width={width}")


if __name__ == "__main__":
    main()
