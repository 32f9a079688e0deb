"""Scaling-efficiency harness: throughput at 1 device vs N devices.

The BASELINE north-star asks for >=80% scaling efficiency at 2+ hosts
(SURVEY §6). This harness measures data-parallel training throughput
(graphs/s, edges/s) on 1 device and on the full mesh with the SAME jitted
step (parallel/dp.py), and reports efficiency = throughput_N /
(N * throughput_1).

On real TPU pods the mesh axes ride ICI/DCN; in CI the same harness runs
on XLA's virtual CPU devices (--xla_force_host_platform_device_count), so
the *code path* is validated everywhere even though CPU efficiency numbers
are not meaningful hardware measurements.
"""

from __future__ import annotations

import time

import numpy as np

from buckgnn_tpu.config import TrainConfig

__all__ = ["scaling_bench"]


def _throughput(step, state, stacked, key, lr, n_steps: int,
                n_warmup: int = 2) -> float:
    import jax

    for _ in range(n_warmup):
        state, metrics = step(state, stacked, key, lr)
    jax.block_until_ready(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state, stacked, key, lr)
    jax.block_until_ready(metrics["loss"])
    return n_steps / (time.perf_counter() - t0)


def scaling_bench(
    n_devices: int | None = None,
    cfg: TrainConfig | None = None,
    graphs_per_device: int = 8,
    min_side: int = 8,
    max_side: int = 12,
    n_steps: int = 10,
    seed: int = 0,
) -> dict:
    """Measure DP throughput at 1 device and at ``n_devices``; returns
    steps/s, per-device-batch graphs/s + edges/s, and scaling efficiency."""
    import jax
    import jax.numpy as jnp

    from buckgnn_tpu.graph.batch import batch_iterator, suggest_capacities
    from buckgnn_tpu.graph.normalizer import normalize_dataset
    from buckgnn_tpu.graph.synthetic import generate_dataset
    from buckgnn_tpu.parallel.dp import (
        make_parallel_train_step, shard_stacked_batch, stack_batches,
    )
    from buckgnn_tpu.parallel.mesh import make_mesh
    from buckgnn_tpu.train.losses import get_loss_function
    from buckgnn_tpu.train.trainer import (
        build_model, init_state, make_optimizer,
    )

    n_devices = n_devices or len(jax.devices())
    cfg = cfg or TrainConfig(hidden_channels=64, num_layers=3,
                             batch_size=graphs_per_device, lr=1e-3)

    ds = generate_dataset(graphs_per_device * n_devices, seed=seed,
                          min_side=min_side, max_side=max_side)
    normed, nz = normalize_dataset(ds)
    ncap, ecap = suggest_capacities(normed, graphs_per_device, slack=1.3)
    ecap = ((ecap + 127) // 128) * 128
    batches = list(
        batch_iterator(normed, graphs_per_device, ncap, ecap)
    )[:n_devices]
    model = build_model(cfg, normed[0].x.shape[1],
                        normed[0].edge_attr.shape[1])
    opt = make_optimizer(cfg)
    criterion = get_loss_function(cfg.loss_function)
    key = jax.random.key(0)
    lr = jnp.float32(cfg.lr)
    edges_per_batch = int(np.mean([
        np.sum(np.asarray(b.edge_mask)) for b in batches
    ]))

    results = {}
    for n in sorted({1, n_devices}):
        mesh = make_mesh(n_data=n, n_model=1, devices=jax.devices()[:n])
        step = make_parallel_train_step(model, opt, criterion, cfg, nz, mesh)
        stacked = shard_stacked_batch(stack_batches(batches[:n]), mesh)
        state = init_state(model, opt, batches[0], cfg.seed)
        sps = _throughput(step, state, stacked, key, lr, n_steps)
        results[n] = dict(
            steps_per_s=sps,
            graphs_per_s=sps * graphs_per_device * n,
            edges_per_s=sps * edges_per_batch * n,
        )
    eff = (
        results[n_devices]["edges_per_s"]
        / (n_devices * results[1]["edges_per_s"])
        if n_devices > 1 else 1.0
    )
    return dict(
        n_devices=n_devices,
        per_count=results,
        scaling_efficiency=eff,
        edges_per_batch=edges_per_batch,
        backend=jax.default_backend(),
    )
