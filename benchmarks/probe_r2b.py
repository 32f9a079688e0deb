"""Measure fwd-table threading (flagship) + EA_GNN flagship step, one process.

Usage: timeout 2400 python benchmarks/probe_r2b.py
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


def chained(setup):
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
    return (time.perf_counter() - t0) / (6 * CHAIN) * 1e3


def main():
    setup = build_bench_setup(use_super_node=True)
    # correctness: loss decreases
    state, batch = setup["state"], setup["batch"]
    key, lr = setup["key"], jnp.float32(1e-3)
    losses = []
    for i in range(15):
        key, sub = jax.random.split(key)
        state, m = setup["train_step"](state, batch, sub, lr)
        if i % 7 == 6:
            losses.append(float(m["loss"]))
    assert np.isfinite(losses).all() and losses[-1] < losses[0], losses
    print(f"flagship losses ok: {losses}", flush=True)

    wall = chained(setup)
    e = setup["n_edges"]
    print(f"flagship chained: {wall:.2f} ms/step "
          f"({e / wall * 1e3 / 1e6:.2f}M e/s)", flush=True)

    with jax.profiler.trace("/tmp/bgtpu_profiles/train_r2b"):
        key, sub = jax.random.split(key)
        state, m = setup["train_step"](state, batch, sub, lr)
        for _ in range(4):
            key, sub = jax.random.split(key)
            state, m = setup["train_step"](state, batch, sub, lr)
        jax.block_until_ready(m["loss"])
    print("trace -> /tmp/bgtpu_profiles/train_r2b", flush=True)
    del setup, state

    # EA_GNN flagship-width: batch 128, h512, remat auto-on (VERDICT #9)
    import bench as bench_mod

    ea = build_bench_setup(use_super_node=False, impl="xla",
                           n_graphs=128)
    # rebuild with EA_GNN_Shared via config override
    from buckgnn_tpu.config import TrainConfig
    from buckgnn_tpu.graph.batch import batch_iterator, suggest_capacities
    from buckgnn_tpu.graph.normalizer import normalize_dataset
    from buckgnn_tpu.graph.synthetic import generate_dataset
    from buckgnn_tpu.train.losses import get_loss_function
    from buckgnn_tpu.train.trainer import (
        build_model, init_state, make_optimizer, make_train_step,
    )

    ds = generate_dataset(128, seed=0, min_side=24, max_side=32,
                          use_super_node=False, use_virtual_edges=True)
    normed, nz = normalize_dataset(ds)
    cfg = TrainConfig(hidden_channels=512, num_layers=6, batch_size=128,
                      segment_impl="xla", compute_dtype="bfloat16",
                      model_name="EA_GNN_Shared")
    ncap, ecap = suggest_capacities(normed, 128, slack=1.12)
    b = next(iter(batch_iterator(normed, 128, ncap, ecap)))
    model = build_model(cfg, normed[0].x.shape[1],
                        normed[0].edge_attr.shape[1])
    opt = make_optimizer(cfg)
    state = init_state(model, opt, b, seed=0)
    criterion = get_loss_function(cfg.loss_function)
    train_step, _ = make_train_step(model, opt, criterion, cfg, nz)
    n_edges = int(np.sum(np.asarray(b.edge_mask)))
    key = jax.random.key(0, impl=cfg.rng_impl)
    print(f"EA_GNN batch: {n_edges} edges, ncap {b.n_node_cap}", flush=True)
    t0 = time.time()
    key, sub = jax.random.split(key)
    state, m = train_step(state, b, sub, lr)
    jax.block_until_ready(m["loss"])
    print(f"EA_GNN first step (compile) {time.time() - t0:.0f}s "
          f"loss={float(m['loss']):.4f}", flush=True)
    for _ in range(3):
        key, sub = jax.random.split(key)
        state, m = train_step(state, b, sub, lr)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(10):
        key, sub = jax.random.split(key)
        state, m = train_step(state, b, sub, lr)
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / 10 * 1e3
    print(f"EA_GNN_Shared 6L h512 batch128 (remat): {dt:.2f} ms/step "
          f"({n_edges / dt * 1e3 / 1e6:.2f}M e/s), loss finite: "
          f"{np.isfinite(float(m['loss']))}", flush=True)


if __name__ == "__main__":
    main()
