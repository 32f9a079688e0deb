"""Fused EA GraphNetBlock kernel on real TPU: step time at flagship
shape (6L h512, batch 64 and 128), bf16 grad parity vs the windowed XLA
path at rate 0, and a dropout-active convergence sanity step.

Usage: timeout 2400 python benchmarks/probe_fused_ea.py [trace_dir]
One process for everything (the axon relay charges ~3 min warmup per
process; single-op microbenches through the relay lie — only same-process
walls / in-step profiles are comparable, CLAUDE.md).
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


def _batch(normed, batch_size, tile, width):
    take = normed[:batch_size]
    n_real = sum(g.n_node for g in take) + 1
    e_real = sum(g.n_edge for g in take)
    ncap = ((max(n_real, tile + width) + 4 * tile - 1)
            // (4 * tile)) * (4 * tile)
    ecap = ((e_real + 127) // 128) * 128
    return next(iter(batch_iterator(take, batch_size, ncap, ecap,
                                    band_width=width, band_tile=tile)))


def _steps(cfg, b, normed, nz, n=10, warm=3, seed=0):
    model = build_model(cfg, normed[0].x.shape[1],
                       normed[0].edge_attr.shape[1])
    opt = make_optimizer(cfg)
    state = init_state(model, opt, b, seed=seed)
    criterion = get_loss_function(cfg.loss_function)
    train_step, _ = make_train_step(model, opt, criterion, cfg, nz)
    key = jax.random.key(0, impl=cfg.rng_impl)
    lr = jnp.float32(1e-3)
    for _ in range(warm):
        key, sub = jax.random.split(key)
        state, m = train_step(state, b, sub, lr)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    losses = []
    for _ in range(n):
        key, sub = jax.random.split(key)
        state, m = train_step(state, b, sub, lr)
        losses.append(m["loss"])
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / n * 1e3
    return dt, [float(v) for v in losses], (model, state, train_step)


def main():
    trace = sys.argv[1] if len(sys.argv) > 1 else None
    ds = generate_dataset(128, seed=0, min_side=24, max_side=32,
                          use_super_node=False, use_virtual_edges=True)
    normed, nz = normalize_dataset(ds)
    tile, width = 256, 128

    base = dict(hidden_channels=512, num_layers=6,
                segment_impl="banded_pallas", compute_dtype="bfloat16",
                model_name="EA_GNN_Shared")

    # --- batch 64, fused (dropout active: full production config) ---
    b64 = _batch(normed, 64, tile, width)
    n_edges = int(np.sum(np.asarray(b64.edge_mask)))
    print(f"b64: ncap={b64.n_node_cap} W={b64.win_edges.shape[1]} "
          f"Ct={b64.win_far_tsend.shape[1]} edges={n_edges}", flush=True)
    cfg = TrainConfig(batch_size=64, **base)
    dt, losses, handles = _steps(cfg, b64, normed, nz)
    print(f"FUSED b64 rate0.1: {dt:.2f} ms/step "
          f"({n_edges / dt * 1e3 / 1e6:.2f}M e/s) losses {losses[:3]} "
          f"-> {losses[-1]:.4f}", flush=True)
    assert all(np.isfinite(v) for v in losses)

    if trace:
        _, state, train_step = handles
        key = jax.random.key(7, impl=cfg.rng_impl)
        with jax.profiler.trace(trace):
            for _ in range(3):
                key, sub = jax.random.split(key)
                state, m = train_step(state, b64, sub, jnp.float32(1e-3))
            jax.block_until_ready(m["loss"])
        print(f"trace -> {trace}", flush=True)

    # --- batch 128, fused (no remat needed: O(1) block activations) ---
    b128 = _batch(normed, 128, tile, width)
    n_edges128 = int(np.sum(np.asarray(b128.edge_mask)))
    cfg128 = TrainConfig(batch_size=128, **base)
    dt128, losses128, _ = _steps(cfg128, b128, normed, nz)
    print(f"FUSED b128 rate0.1: {dt128:.2f} ms/step "
          f"({n_edges128 / dt128 * 1e3 / 1e6:.2f}M e/s)", flush=True)
    assert all(np.isfinite(v) for v in losses128)

    # --- bf16 grad parity vs windowed XLA path at rate 0 (small L) ---
    par = dict(base, num_layers=3)
    cfgf = TrainConfig(batch_size=16, dropout_rate=0.0, **par)
    cfgw = TrainConfig(batch_size=16, dropout_rate=0.0, remat=True, **par)
    bp = _batch(normed, 16, tile, width)
    model_f = build_model(cfgf, normed[0].x.shape[1], 5)
    model_w = build_model(cfgw, normed[0].x.shape[1], 5)
    state = init_state(model_f, make_optimizer(cfgf), bp, seed=1)

    def gradfn(model):
        def loss(p):
            pred, _ = model.apply({"params": p}, bp, deterministic=True)
            return jnp.sum(jnp.where(bp.graph_mask, pred, 0.0) ** 2)
        return jax.jit(jax.grad(loss))

    gf = gradfn(model_f)(state.params)
    gw = gradfn(model_w)(state.params)
    flat_f, _ = jax.tree_util.tree_flatten_with_path(gf)
    flat_w, _ = jax.tree_util.tree_flatten_with_path(gw)
    worst = 0.0
    for (kp, a), (_, bb) in zip(flat_f, flat_w):
        a, bb = np.asarray(a, np.float64), np.asarray(bb, np.float64)
        denom = max(np.abs(bb).max(), 1e-6)
        rel = np.abs(a - bb).max() / denom
        if rel > worst:
            worst, wkey = rel, jax.tree_util.keystr(kp)
    print(f"bf16 grad parity vs windowed (rate 0): worst rel "
          f"{worst:.3e} at {wkey}", flush=True)
    assert worst < 5e-2, (worst, wkey)  # bf16 accumulation-order noise

    print("PROBE OK", flush=True)


if __name__ == "__main__":
    main()
