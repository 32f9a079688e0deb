"""Profiling utilities + trainer Perf metrics."""

import os

import numpy as np
import pytest

from buckgnn_tpu.config import TrainConfig
from buckgnn_tpu.graph.normalizer import normalize_dataset
from buckgnn_tpu.graph.synthetic import generate_dataset
from buckgnn_tpu.train.trainer import train_gnn
from buckgnn_tpu.utils.profiling import StepTimer, trace


def test_step_timer_rates():
    t = StepTimer()
    t.start()
    _ = sum(range(100_000))
    t.stop(10, 5000)
    assert t.n_steps == 10
    assert t.steps_per_s > 0
    assert t.edges_per_s == pytest.approx(t.steps_per_s * 500)
    assert t.step_ms > 0
    t.reset()
    assert t.steps_per_s == 0.0


def test_trace_writes_profile(tmp_path):
    import jax
    import jax.numpy as jnp

    d = str(tmp_path / "prof")
    with trace(d):
        jax.block_until_ready(jnp.ones((64, 64)) @ jnp.ones((64, 64)))
    found = []
    for root, _, files in os.walk(d):
        found += [f for f in files if "trace" in f or f.endswith(".pb")]
    assert found, "no trace artifacts written"


def test_trainer_emits_perf_metrics(tmp_path):
    ds = generate_dataset(6, seed=0, min_side=3, max_side=4)
    normed, nz = normalize_dataset(ds)
    cfg = TrainConfig(hidden_channels=8, num_layers=2, batch_size=3,
                      num_epochs=2, lr=1e-3, profile_epochs=1)
    res = train_gnn(cfg, normed[:4], normed[4:], nz, str(tmp_path),
                    verbose=False)
    assert np.isfinite(res.best_val_mape)
    # Perf scalars were recorded (metrics.csv fallback or tfevents)
    found_perf = False
    for root, _, files in os.walk(res.log_dir):
        for f in files:
            if f == "metrics.csv":
                found_perf |= "Perf/train_edges_per_s" in open(
                    os.path.join(root, f)
                ).read()
            elif f.startswith("events.out.tfevents"):
                found_perf = True
    assert found_perf
    assert os.path.isdir(os.path.join(res.log_dir, "profile"))
