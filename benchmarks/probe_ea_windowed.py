"""EA_GNN_Shared flagship-shape step time: windowed dense path vs the
gather/scatter XLA path (897 ms/step measured 2026-08-18).

Usage: timeout 2400 python benchmarks/probe_ea_windowed.py
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
    ds = generate_dataset(128, seed=0, min_side=24, max_side=32,
                          use_super_node=False, use_virtual_edges=True)
    normed, nz = normalize_dataset(ds)
    n_real = sum(g.n_node for g in normed) + 1
    e_real = sum(g.n_edge for g in normed)
    tile, width = 256, 128
    ncap = ((max(n_real, tile + width) + 4 * tile - 1)
            // (4 * tile)) * (4 * tile)
    ecap = ((e_real + 255) // 128) * 128
    cfg = TrainConfig(hidden_channels=512, num_layers=6, batch_size=128,
                      segment_impl="banded_pallas",
                      compute_dtype="bfloat16",
                      model_name="EA_GNN_Shared")
    b = next(iter(batch_iterator(normed, 128, ncap, ecap,
                                 band_width=width, band_tile=tile)))
    assert b.win_edges is not None
    w = b.win_edges.shape[1]
    far = int(np.sum(np.asarray(b.win_far_send) != b.n_node_cap - 1))
    n_edges = int(np.sum(np.asarray(b.edge_mask)))
    print(f"windows: W={w} tiles={b.n_node_cap // tile} far={far} "
          f"({far / n_edges:.1%} of {n_edges})", flush=True)

    model = build_model(cfg, normed[0].x.shape[1],
                        normed[0].edge_attr.shape[1])
    opt = make_optimizer(cfg)
    state = init_state(model, opt, b, seed=0)
    criterion = get_loss_function(cfg.loss_function)
    train_step, _ = make_train_step(model, opt, criterion, cfg, nz)
    key = jax.random.key(0, impl=cfg.rng_impl)
    lr = jnp.float32(1e-3)
    t0 = time.time()
    losses = []
    for i in range(15):
        key, sub = jax.random.split(key)
        state, m = train_step(state, b, sub, lr)
        losses.append(float(m["loss"]))
    print(f"first steps (compile {time.time() - t0:.0f}s) losses "
          + " ".join(f"{v:.4f}" for v in losses[::3]), flush=True)
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses

    t0 = time.perf_counter()
    for _ in range(10):
        key, sub = jax.random.split(key)
        state, m = train_step(state, b, sub, lr)
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / 10 * 1e3
    print(f"EA_GNN_Shared 6L h512 batch128 WINDOWED: {dt:.2f} ms/step "
          f"({n_edges / dt * 1e3 / 1e6:.2f}M e/s)", flush=True)
    del state, train_step

    # batch 64 WITHOUT remat (half the batch fits activations in HBM):
    # is recompute or batch size the better trade?
    ds64 = normed[:64]
    n_real = sum(g.n_node for g in ds64) + 1
    e_real = sum(g.n_edge for g in ds64)
    ncap = ((max(n_real, tile + width) + 4 * tile - 1)
            // (4 * tile)) * (4 * tile)
    ecap = ((e_real + 255) // 128) * 128
    cfg2 = TrainConfig(hidden_channels=512, num_layers=6, batch_size=64,
                       segment_impl="banded_pallas",
                       compute_dtype="bfloat16", remat=False,
                       model_name="EA_GNN_Shared")
    b2 = next(iter(batch_iterator(ds64, 64, ncap, ecap,
                                  band_width=width, band_tile=tile)))
    n_edges2 = int(np.sum(np.asarray(b2.edge_mask)))
    model2 = build_model(cfg2, normed[0].x.shape[1],
                         normed[0].edge_attr.shape[1])
    opt2 = make_optimizer(cfg2)
    try:
        state2 = init_state(model2, opt2, b2, seed=0)
        train_step2, _ = make_train_step(model2, opt2, criterion, cfg2, nz)
        for _ in range(3):
            key, sub = jax.random.split(key)
            state2, m2 = train_step2(state2, b2, sub, lr)
        jax.block_until_ready(m2["loss"])
        t0 = time.perf_counter()
        for _ in range(10):
            key, sub = jax.random.split(key)
            state2, m2 = train_step2(state2, b2, sub, lr)
        jax.block_until_ready(m2["loss"])
        dt2 = (time.perf_counter() - t0) / 10 * 1e3
        print(f"EA_GNN_Shared batch64 NO-remat: {dt2:.2f} ms/step "
              f"({n_edges2 / dt2 * 1e3 / 1e6:.2f}M e/s)", flush=True)
    except Exception as e:  # noqa: BLE001 - OOM probe
        print(f"batch64 no-remat failed: {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
