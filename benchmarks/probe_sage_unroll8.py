"""Flagship SAGE kernels at unroll 8 vs 4 (VERDICT r3 #9).

Unroll 8 needs 8-tile-aligned node capacity (the production paths align
to 4*tile); this probe packs its own 8-aligned batch and A/Bs the two
unroll depths in ONE process via chained-dispatch walls (the bench.py
protocol — per-dispatch relay noise would swamp an unchained A/B).

Usage: timeout 3600 python benchmarks/probe_sage_unroll8.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np

import buckgnn_tpu.ops.pallas_sage_layer as psl
from buckgnn_tpu.config import TrainConfig
from buckgnn_tpu.graph.batch import batch_iterator, select_band_geometry
from buckgnn_tpu.graph.normalizer import normalize_dataset
from buckgnn_tpu.graph.synthetic import generate_dataset
from buckgnn_tpu.train.losses import get_loss_function
from buckgnn_tpu.train.trainer import (
    build_model, init_state, make_optimizer, make_train_step,
)


def build(normed, nz, batch):
    cfg = TrainConfig(hidden_channels=512, num_layers=6, batch_size=128,
                      segment_impl="banded_pallas",
                      compute_dtype="bfloat16")
    model = build_model(cfg, normed[0].x.shape[1], 5)
    opt = make_optimizer(cfg)
    state = init_state(model, opt, batch, seed=0)
    criterion = get_loss_function(cfg.loss_function)
    train_step, _ = make_train_step(model, opt, criterion, cfg, nz)
    return state, train_step, cfg


def timed(state, train_step, batch, chain=10, n_chains=5):
    lr = jnp.float32(1e-3)

    @functools.partial(jax.jit, donate_argnums=0)
    def train_chain(state, key):
        def body(_, carry):
            st, key = carry
            key, sub = jax.random.split(key)
            st, _ = train_step(st, batch, sub, lr)
            return st, key
        return jax.lax.fori_loop(0, chain, body, (state, key))

    key = jax.random.key(0, impl="rbg")
    for _ in range(3):
        state, key = train_chain(state, key)
    jax.block_until_ready(key)
    t0 = time.perf_counter()
    for _ in range(n_chains):
        state, key = train_chain(state, key)
    jax.block_until_ready(key)
    return (time.perf_counter() - t0) / (n_chains * chain) * 1e3


def main():
    ds = generate_dataset(128, seed=0, min_side=16, max_side=24,
                          use_super_node=True, use_virtual_edges=False)
    normed, nz = normalize_dataset(ds)
    tile, width = select_band_geometry(normed)
    n_real = sum(g.n_node for g in normed) + 1
    e_real = sum(g.n_edge for g in normed)
    align = 8 * tile
    ncap = ((max(n_real, tile + width) + align - 1) // align) * align
    ecap = ((e_real + 255) // 128) * 128
    batch = next(iter(batch_iterator(normed, 128, ncap, ecap,
                                     band_width=width, band_tile=tile,
                                     rcm=True)))
    n_edges = int(np.sum(np.asarray(batch.edge_mask)))
    print(f"ncap={batch.n_node_cap} ({batch.n_node_cap // tile} tiles) "
          f"width={width} edges={n_edges}", flush=True)

    for uf, ub in ((4, 4), (8, 4), (4, 8), (8, 8)):
        psl._UNROLL_FWD, psl._UNROLL_BWD = uf, ub
        state, train_step, _ = build(normed, nz, batch)
        dt = timed(state, train_step, batch)
        print(f"unroll fwd={uf} bwd={ub}: {dt:.2f} ms/step "
              f"({n_edges / dt * 1e3 / 1e6:.2f}M e/s)", flush=True)


if __name__ == "__main__":
    main()
