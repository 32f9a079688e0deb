"""Local vs global star-table selection A/B on the real chip.

Same flagship setup, same jitted step; the 'global' control strips
batch.gwin/lcode/lacc (different pytree => jax retraces with the
full-table selection path). Also correctness: one train step from the
same state on both batches must produce identical loss.

Usage: timeout 2400 python benchmarks/probe_local_star.py
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

CHAIN = 10


def time_step(setup, batch, label):
    # fresh buffers per run — train_chain donates its state argument
    state = jax.tree.map(
        lambda a: jnp.copy(a) if isinstance(a, jax.Array) else a,
        setup["state"],
    )
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
    setup = bench.build_bench_setup(use_super_node=True)
    b_local = setup["batch"]
    assert b_local.gwin is not None, "bench batch should carry windows"
    b_global = b_local.replace(gwin=None, lcode=None, lacc=None)

    # correctness: identical metrics from one step on the same state
    key = setup["key"]
    _, m_l = setup["train_step"](setup["state"], b_local, key,
                                 jnp.float32(1e-3))
    _, m_g = setup["train_step"](setup["state"], b_global, key,
                                 jnp.float32(1e-3))
    ll, lg = float(m_l["loss"]), float(m_g["loss"])
    print(f"loss local={ll:.6f} global={lg:.6f}", flush=True)
    assert np.isfinite(ll) and abs(ll - lg) <= 1e-6 * max(abs(lg), 1.0)

    time_step(setup, b_global, "step star=global")
    time_step(setup, b_local, "step star=local")
    time_step(setup, b_global, "step star=global (repeat)")
    time_step(setup, b_local, "step star=local  (repeat)")


if __name__ == "__main__":
    main()
