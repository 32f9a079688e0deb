"""SAGE flagship tile-size sweep (EA lesson applied): the band matmul
contracts over slab = tile + width, so smaller tiles cut its flops ~40%
(tile 256 w64 slab 320 -> tile 128 w64 slab 192) while the guaranteed
band margin (width/2) is tile-independent. Same process, chained walls.

Usage: timeout 3600 python benchmarks/probe_sage_tile.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

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


def run(normed, nz, tile, width):
    n_real = sum(g.n_node for g in normed) + 1
    e_real = sum(g.n_edge for g in normed)
    align = 4 * tile
    ncap = ((max(n_real, tile + width) + align - 1) // align) * align
    ecap = ((e_real + 255) // 128) * 128
    b = next(iter(batch_iterator(normed, 128, ncap, ecap,
                                 band_width=width, band_tile=tile,
                                 rcm=True)))
    n_edges = int(np.sum(np.asarray(b.edge_mask)))
    spill = int(np.sum(np.asarray(b.spill_receivers) != b.n_node_cap - 1))
    cfg = TrainConfig(hidden_channels=512, num_layers=6, batch_size=128,
                      segment_impl="banded_pallas",
                      compute_dtype="bfloat16",
                      pooling_layer="supernode_with_pooling")
    model = build_model(cfg, normed[0].x.shape[1], 5)
    opt = make_optimizer(cfg)
    state = init_state(model, opt, b, seed=0)
    criterion = get_loss_function(cfg.loss_function)
    train_step, _ = make_train_step(model, opt, criterion, cfg, nz)
    lr = jnp.float32(1e-3)

    @functools.partial(jax.jit, donate_argnums=0)
    def chain(state, key):
        def body(_, carry):
            st, key = carry
            key, sub = jax.random.split(key)
            st, _ = train_step(st, b, sub, lr)
            return st, key
        return jax.lax.fori_loop(0, 10, body, (state, key))

    key = jax.random.key(0, impl="rbg")
    for _ in range(3):
        state, key = chain(state, key)
    jax.block_until_ready(key)
    t0 = time.perf_counter()
    for _ in range(5):
        state, key = chain(state, key)
    jax.block_until_ready(key)
    dt = (time.perf_counter() - t0) / 50 * 1e3
    print(f"tile={tile} width={width}: ncap={b.n_node_cap} "
          f"spill={spill} edges={n_edges}  {dt:.2f} ms/step "
          f"({n_edges / dt * 1e3 / 1e6:.2f}M e/s)", flush=True)


def main():
    ds = generate_dataset(128, seed=0, min_side=16, max_side=24,
                          use_super_node=True, use_virtual_edges=False)
    normed, nz = normalize_dataset(ds)
    run(normed, nz, 256, 64)   # production control
    run(normed, nz, 128, 64)
    run(normed, nz, 192, 64)


if __name__ == "__main__":
    main()
