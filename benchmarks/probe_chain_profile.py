"""Profile the chained (fori_loop) flagship train step: device ms/step vs
wall ms/step, to separate relay dispatch noise from real device time.

Usage: timeout 1200 python benchmarks/probe_chain_profile.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import build_bench_setup

CHAIN = 10


def main():
    setup = build_bench_setup(use_super_node=True)
    state, batch = setup["state"], setup["batch"]
    train_step = setup["train_step"]
    key = setup["key"]
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
    print(f"chained wall: {wall:.2f} ms/step", flush=True)

    with jax.profiler.trace("/tmp/bgtpu_profiles/train_chain"):
        state, key = train_chain(state, key)
        jax.block_until_ready(key)
    print("trace -> /tmp/bgtpu_profiles/train_chain", flush=True)

    # unchained comparison in the same process / relay session
    for _ in range(3):
        key, sub = jax.random.split(key)
        state, _ = train_step(state, batch, sub, lr)
    jax.block_until_ready(key)
    t0 = time.perf_counter()
    for _ in range(30):
        key, sub = jax.random.split(key)
        state, m = train_step(state, batch, sub, lr)
    jax.block_until_ready(m["loss"])
    wall = (time.perf_counter() - t0) / 30 * 1e3
    print(f"unchained wall: {wall:.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
