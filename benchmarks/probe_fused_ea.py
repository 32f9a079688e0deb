"""Fused EA GraphNetBlock kernel on real TPU: step time at flagship
shape (6L h512, batch 64 and 128) at the production tile-128 geometry,
on-chip forward parity vs the windowed XLA path (grad deltas reported
as informational — TPU "f32" matmuls are bf16-mantissa MXU passes, so
cross-formulation grads only agree to accumulation noise; exact-math
parity is the CPU interpret test), a short production `train_gnn` run
(trainer-selected geometry), and the INFERENCE_TIMER row off that
checkpoint.

Usage: timeout 3600 python benchmarks/probe_fused_ea.py [trace_dir]
One process for everything (the axon relay charges ~3 min warmup per
process; single-op microbenches through the relay lie — only
same-process walls / in-step profiles are comparable, CLAUDE.md).
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

TILE, WIDTH = 128, 64


def _batch(normed, batch_size, tile=TILE, width=WIDTH):
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

    base = dict(hidden_channels=512, num_layers=6,
                segment_impl="banded_pallas", compute_dtype="bfloat16",
                model_name="EA_GNN_Shared")

    # --- batch 64, fused (dropout active: full production config) ---
    b64 = _batch(normed, 64)
    n_edges = int(np.sum(np.asarray(b64.edge_mask)))
    print(f"b64: ncap={b64.n_node_cap} W={b64.win_edges.shape[1]} "
          f"Ct={b64.win_far_tsend.shape[1]} edges={n_edges}", flush=True)
    cfg = TrainConfig(batch_size=64, **base)
    dt, losses, handles = _steps(cfg, b64, normed, nz)
    print(f"FUSED b64 rate0.1 tile{TILE}w{WIDTH}: {dt:.2f} ms/step "
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

    # --- batch 128, fused (no remat: e1/m1 residuals ride HBM) ---
    b128 = _batch(normed, 128)
    n_edges128 = int(np.sum(np.asarray(b128.edge_mask)))
    cfg128 = TrainConfig(batch_size=128, **base)
    dt128, losses128, _ = _steps(cfg128, b128, normed, nz)
    print(f"FUSED b128 rate0.1: {dt128:.2f} ms/step "
          f"({n_edges128 / dt128 * 1e3 / 1e6:.2f}M e/s)", flush=True)
    assert all(np.isfinite(v) for v in losses128)

    # --- f32 grad parity vs windowed XLA path at rate 0 (small L) ---
    # (bf16 A/B showed up to 14.5% rel diffs from accumulation-order
    # noise compounding over layers; f32 isolates kernel-math exactness)
    par = dict(base, num_layers=3, compute_dtype="float32")
    cfgf = TrainConfig(batch_size=16, dropout_rate=0.0, **par)
    cfgw = TrainConfig(batch_size=16, dropout_rate=0.0, remat=True, **par)
    bp = _batch(normed, 16)
    model_f = build_model(cfgf, normed[0].x.shape[1], 5)
    model_w = build_model(cfgw, normed[0].x.shape[1], 5)
    state = init_state(model_f, make_optimizer(cfgf), bp, seed=1)

    # FORWARD parity is the on-chip check (exact-math parity is proven
    # on CPU interpret at 5e-7, tests/test_fused_ea_block.py); on TPU
    # even "f32" matmuls run through MXU passes whose rounding differs
    # per formulation, and grad diffs compound over 3 edge-MLP layers —
    # report the grad delta as informational only
    pf = jax.jit(lambda p: model_f.apply({"params": p}, bp,
                                         deterministic=True)[0])
    pw = jax.jit(lambda p: model_w.apply({"params": p}, bp,
                                         deterministic=True)[0])
    a = np.asarray(pf(state.params), np.float64)
    bb = np.asarray(pw(state.params), np.float64)
    gm = np.asarray(bp.graph_mask)
    rel = np.abs(a - bb)[gm].max() / max(np.abs(bb)[gm].max(), 1e-9)
    # TPU "f32" matmuls run bf16-mantissa MXU passes by default, so two
    # formulations agree only to bf16 accumulation noise (measured
    # 1.9e-2 over 3 blocks); machine-precision parity is the CPU
    # interpret check in tests/test_fused_ea_block.py (5e-7)
    print(f"f32 FORWARD parity vs windowed: max rel {rel:.3e} "
          f"(bf16-mantissa MXU noise bound)", flush=True)
    assert rel < 5e-2, rel

    def gradfn(model):
        def loss(p):
            pred, _ = model.apply({"params": p}, bp, deterministic=True)
            return jnp.sum(jnp.where(bp.graph_mask, pred, 0.0) ** 2)
        return jax.jit(jax.grad(loss))

    gf = gradfn(model_f)(state.params)
    gw = gradfn(model_w)(state.params)
    flat_f, _ = jax.tree_util.tree_flatten_with_path(gf)
    flat_w, _ = jax.tree_util.tree_flatten_with_path(gw)
    worst, wkey = 0.0, "?"
    for (kp, a), (_, bb) in zip(flat_f, flat_w):
        a, bb = np.asarray(a, np.float64), np.asarray(bb, np.float64)
        denom = max(np.abs(bb).max(), 1e-6)
        r = np.abs(a - bb).max() / denom
        if r > worst:
            worst, wkey = r, jax.tree_util.keystr(kp)
    print(f"grad delta vs windowed on TPU (informational, MXU rounding "
          f"differs per formulation): worst rel {worst:.3e} at {wkey}",
          flush=True)

    # --- short production train_gnn (trainer geometry) + timer row ---
    from buckgnn_tpu.eval.timer import run_time_analysis
    from buckgnn_tpu.train.trainer import train_gnn

    cfg_t = TrainConfig(batch_size=64, num_epochs=3, lr=1e-3, t_0=10,
                        **base)
    out = "/tmp/ea_timer_ckpt"
    res = train_gnn(cfg_t, normed[:100], normed[100:], nz, out,
                    trial_id="ea_probe", verbose=False)
    print(f"train_gnn EA: best val MAPE {res.best_val_mape:.2f}% "
          f"(3 epochs, production geometry)", flush=True)
    last = os.path.join(res.log_dir, "weights", "last")
    rep = run_time_analysis(last, normed[0],
                            output_path="/tmp/ea_timer.txt",
                            batch_size=128)
    g = rep["gnn"]
    print(f"EA TIMER: {g['samples_per_s']:.0f} samples/s "
          f"({g['latency_per_sample_ms']:.4f} ms/sample, batch 128)",
          flush=True)
    print("PROBE OK", flush=True)


if __name__ == "__main__":
    main()
