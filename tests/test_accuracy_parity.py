"""Reduced proxy accuracy-parity run (VERDICT r1 #6; full-size numbers in
RESULTS.md): the independent torch re-implementation and this framework
train on the SAME synthetic dataset/split/hyperparameters and must reach
comparable validation MAPE. Marked slow (~90 s on CPU)."""

import numpy as np
import pytest


@pytest.mark.slow
def test_accuracy_parity_reduced(tmp_path):
    from benchmarks.accuracy_parity import train_torch
    from buckgnn_tpu.config import TrainConfig
    from buckgnn_tpu.graph.normalizer import normalize_dataset
    from buckgnn_tpu.graph.synthetic import generate_dataset
    from buckgnn_tpu.train.trainer import train_gnn

    ds = generate_dataset(120, seed=3, min_side=5, max_side=8,
                          use_virtual_edges=True)
    normed, nz = normalize_dataset(ds)
    rng = np.random.default_rng(0)
    order = rng.permutation(len(normed))
    val = [normed[i] for i in order[:24]]
    train = [normed[i] for i in order[24:]]

    epochs, hidden, bs, lr = 50, 64, 32, 1e-2
    cfg = TrainConfig(hidden_channels=hidden, num_layers=3, batch_size=bs,
                      lr=lr, num_epochs=epochs, dropout_rate=0.0,
                      scheduler="cosine",
                      model_name="GraphSage_addAggr_Shared",
                      pooling_layer="mean",
                      loss_function="relative_error", segment_impl="xla",
                      seed=0)
    res = train_gnn(cfg, train, val, nz, str(tmp_path),
                    trial_id="parity_jax", verbose=False)
    best_t, _ = train_torch(train, val, nz, hidden, epochs, bs, lr, seed=0)

    # both sides must actually learn, and neither may lag the other by
    # more than small-run noise allows
    assert res.best_val_mape < 25.0, res.best_val_mape
    assert best_t < 25.0, best_t
    ratio = res.best_val_mape / best_t
    assert 0.33 < ratio < 3.0, (res.best_val_mape, best_t)
