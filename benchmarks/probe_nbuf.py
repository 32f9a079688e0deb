"""Forward slab-ring depth A/B (pallas_sage_layer._NBUF) on the full
train step: deeper prefetch hides more DMA latency at the cost of VMEM
(now plentiful under the raised vmem limit).

Usage: timeout 2400 python benchmarks/probe_nbuf.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench
from buckgnn_tpu.ops import pallas_sage_layer as fsl

CHAIN = 10


def time_step(setup, label):
    state = jax.tree.map(
        lambda a: jnp.copy(a) if isinstance(a, jax.Array) else a,
        setup["state"],
    )
    batch, train_step, key = setup["batch"], setup["train_step"], setup["key"]
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
    for nbuf in (8, 12, 16):
        fsl._NBUF = nbuf
        setup = bench.build_bench_setup(use_super_node=True)
        time_step(setup, f"step fwd _NBUF={nbuf}")


if __name__ == "__main__":
    main()
