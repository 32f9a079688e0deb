"""Fused EA kernel geometry sweep: selection-matmul flops scale with
(tile + slab + Ct), so smaller node tiles cut the per-slot selection
overhead (~35% of forward flops at tile 256 / slab 384). One process,
same dataset, A/B by wall (chained steps) — relay noise ~1 ms amortized
over 10-step timing.

Usage: timeout 3600 python benchmarks/probe_ea_tile.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from buckgnn_tpu.config import TrainConfig
from buckgnn_tpu.graph.batch import batch_iterator
from buckgnn_tpu.graph.normalizer import normalize_dataset
from buckgnn_tpu.graph.synthetic import generate_dataset
from buckgnn_tpu.train.losses import get_loss_function
from buckgnn_tpu.train.trainer import (
    build_model, init_state, make_optimizer, make_train_step,
)


def run(normed, nz, tile, width, batch_size=64, impl="banded_pallas"):
    take = normed[:batch_size]
    n_real = sum(g.n_node for g in take) + 1
    e_real = sum(g.n_edge for g in take)
    ncap = ((max(n_real, tile + width) + 4 * tile - 1)
            // (4 * tile)) * (4 * tile)
    ecap = ((e_real + 127) // 128) * 128
    b = next(iter(batch_iterator(take, batch_size, ncap, ecap,
                                 band_width=width, band_tile=tile)))
    if impl == "banded_partitioned":
        # single-shard TP (probe_ea_tp_overhead): attach the tile shards
        from buckgnn_tpu.parallel.ea_shard import shard_ea_batch

        b = b.replace(ea_part=shard_ea_batch(b, 1))
    n_edges = int(np.sum(np.asarray(b.edge_mask)))
    cfg = TrainConfig(hidden_channels=512, num_layers=6,
                      batch_size=batch_size, segment_impl=impl,
                      compute_dtype="bfloat16",
                      model_name="EA_GNN_Shared")
    model = build_model(cfg, normed[0].x.shape[1], 5)
    opt = make_optimizer(cfg)
    state = init_state(model, opt, b, seed=0)
    criterion = get_loss_function(cfg.loss_function)
    train_step, _ = make_train_step(model, opt, criterion, cfg, nz)
    key = jax.random.key(0, impl=cfg.rng_impl)
    lr = jnp.float32(1e-3)
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
    print(f"tile={tile} width={width}: ncap={b.n_node_cap} "
          f"W={b.win_edges.shape[1]} Ct={b.win_far_tsend.shape[1]} "
          f"edges={n_edges}  {dt:.2f} ms/step "
          f"({n_edges / dt * 1e3 / 1e6:.2f}M e/s)  loss={float(m['loss']):.4f}",
          flush=True)
    assert np.isfinite(float(m["loss"]))
    return dt


def main():
    ds = generate_dataset(64, seed=0, min_side=24, max_side=32,
                          use_super_node=False, use_virtual_edges=True)
    normed, nz = normalize_dataset(ds)
    run(normed, nz, 256, 128)   # control (151.8 ms on 2026-08-20)
    run(normed, nz, 128, 128)
    run(normed, nz, 128, 64)
    run(normed, nz, 192, 64)
    # round-5 small-tile close-out (2026-08-21): tile 64 is a measured
    # NEGATIVE — 64/64 = 120.9 ms, 64/32 = 126.1 ms vs 128/64 =
    # 106.5-107.4 ms in the same session. Below 128 rows the dense
    # matmuls half-idle the 128x128 MXU and the doubled grid overhead
    # swamps the slab-flop saving; 128 is the optimum from both sides.
    run(normed, nz, 64, 64)
    run(normed, nz, 64, 32)


if __name__ == "__main__":
    main()
