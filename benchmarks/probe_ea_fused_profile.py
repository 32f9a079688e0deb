"""XLA op profile of the FUSED EA step at its best geometry
(tile 128, width 64): kernel-vs-glue anatomy for the floor analysis.

Usage: timeout 2400 python benchmarks/probe_ea_fused_profile.py [out]
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


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bgtpu_profiles/ea_t128"
    tile, width = 128, 64
    ds = generate_dataset(64, seed=0, min_side=24, max_side=32,
                          use_super_node=False, use_virtual_edges=True)
    normed, nz = normalize_dataset(ds)
    n_real = sum(g.n_node for g in normed) + 1
    e_real = sum(g.n_edge for g in normed)
    ncap = ((max(n_real, tile + width) + 4 * tile - 1)
            // (4 * tile)) * (4 * tile)
    ecap = ((e_real + 127) // 128) * 128
    b = next(iter(batch_iterator(normed, 64, ncap, ecap,
                                 band_width=width, band_tile=tile)))
    n_edges = int(np.sum(np.asarray(b.edge_mask)))
    cfg = TrainConfig(hidden_channels=512, num_layers=6, batch_size=64,
                      segment_impl="banded_pallas",
                      compute_dtype="bfloat16", model_name="EA_GNN_Shared")
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
    print(f"tile{tile}w{width}: {dt:.2f} ms/step "
          f"({n_edges / dt * 1e3 / 1e6:.2f}M e/s)", flush=True)
    with jax.profiler.trace(out):
        for _ in range(3):
            key, sub = jax.random.split(key)
            state, m = train_step(state, b, sub, lr)
        jax.block_until_ready(m["loss"])
    print(f"trace -> {out}", flush=True)


if __name__ == "__main__":
    main()
