"""Training loop: schedules, optimizer parity, end-to-end convergence,
checkpoint resume."""

import dataclasses
import math

import numpy as np
import pytest

from buckgnn_tpu.config import TrainConfig
from buckgnn_tpu.graph.normalizer import normalize_dataset
from buckgnn_tpu.graph.synthetic import generate_dataset
from buckgnn_tpu.train import checkpoint as ckpt
from buckgnn_tpu.train.schedule import cosine_annealing, cosine_warm_restarts
from buckgnn_tpu.train.trainer import (
    build_model,
    init_state,
    make_optimizer,
    train_gnn,
)


def test_cosine_schedule_torch_parity():
    """Closed form of torch CosineAnnealingLR incl. periodicity beyond T_max."""
    base, t_max, eta_min = 1e-2, 500, 1e-4
    assert cosine_annealing(0, base, t_max, eta_min) == pytest.approx(base)
    assert cosine_annealing(500, base, t_max, eta_min) == pytest.approx(eta_min)
    # periodic: epoch 1000 back at base
    assert cosine_annealing(1000, base, t_max, eta_min) == pytest.approx(base)
    mid = cosine_annealing(250, base, t_max, eta_min)
    assert mid == pytest.approx(eta_min + (base - eta_min) / 2)


def test_warm_restarts_schedule():
    base, t0, tm, eta = 1e-2, 500, 2, 1e-4
    assert cosine_warm_restarts(0, base, t0, tm, eta) == pytest.approx(base)
    # just before first restart: near eta_min
    v = cosine_warm_restarts(499, base, t0, tm, eta)
    assert v < eta * 2
    # restart at 500 -> back to base, cycle length now 1000
    assert cosine_warm_restarts(500, base, t0, tm, eta) == pytest.approx(base)
    assert cosine_warm_restarts(1000, base, t0, tm, eta) == pytest.approx(
        eta + (base - eta) / 2
    )


def test_adam_matches_torch():
    """Our optax chain == torch.optim.Adam(lr, weight_decay) on a toy problem."""
    import torch
    import jax
    import jax.numpy as jnp
    import optax

    w0 = np.array([1.0, -2.0, 3.0], np.float32)
    lr, wd = 1e-2, 1e-2

    tw = torch.tensor(w0.copy(), requires_grad=True)
    topt = torch.optim.Adam([tw], lr=lr, weight_decay=wd)
    for _ in range(5):
        topt.zero_grad()
        loss = (tw**2).sum()
        loss.backward()
        topt.step()

    params = {"w": jnp.asarray(w0)}
    optimizer = optax.chain(
        optax.add_decayed_weights(wd), optax.scale_by_adam(eps=1e-8)
    )
    opt_state = optimizer.init(params)
    for _ in range(5):
        grads = jax.grad(lambda p: jnp.sum(p["w"] ** 2))(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(
        np.asarray(params["w"]), tw.detach().numpy(), rtol=1e-5, atol=1e-6
    )


@pytest.fixture(scope="module")
def tiny_dataset():
    ds = generate_dataset(24, seed=0, min_side=3, max_side=5)
    normed, nz = normalize_dataset(ds)
    return normed[:18], normed[18:], nz


def _tiny_cfg(**kw):
    base = dict(
        hidden_channels=16, num_layers=2, num_epochs=3, batch_size=6,
        lr=1e-3, t_0=10, seed=0,
    )
    base.update(kw)
    return TrainConfig(**base)


def test_train_loop_runs_and_logs(tiny_dataset, tmp_path):
    train, val, nz = tiny_dataset
    cfg = _tiny_cfg()
    res = train_gnn(cfg, train, val, nz, str(tmp_path), verbose=False)
    assert len(res.history) == 3
    assert all(np.isfinite(h["train_loss"]) for h in res.history)
    assert (tmp_path / "tensorboard_logs").exists()
    import os

    assert os.path.exists(os.path.join(res.log_dir, "results.txt"))
    assert os.path.exists(os.path.join(res.log_dir, "weights", "last",
                                       "state.msgpack"))


def test_train_decreases_loss(tiny_dataset, tmp_path):
    train, val, nz = tiny_dataset
    cfg = _tiny_cfg(num_epochs=25, lr=3e-3, hidden_channels=32)
    res = train_gnn(cfg, train, val, nz, str(tmp_path), verbose=False)
    first = np.mean([h["train_loss"] for h in res.history[:3]])
    last = np.mean([h["train_loss"] for h in res.history[-3:]])
    assert last < first * 0.9, (first, last)


def test_checkpoint_resume(tiny_dataset, tmp_path):
    train, val, nz = tiny_dataset
    cfg = _tiny_cfg(num_epochs=2)
    res = train_gnn(cfg, train, val, nz, str(tmp_path / "a"), verbose=False)
    last = f"{res.log_dir}/weights/last"

    cfg2 = dataclasses.replace(cfg, num_epochs=4)
    res2 = train_gnn(cfg2, train, val, nz, str(tmp_path / "b"),
                     resume_from=last, verbose=False)
    # resumed from epoch 2 -> only 2 more epochs
    assert [h["epoch"] for h in res2.history] == [2, 3]


def test_checkpoint_roundtrip_exact(tiny_dataset, tmp_path):
    import jax

    train, val, nz = tiny_dataset
    cfg = _tiny_cfg()
    from buckgnn_tpu.graph.batch import batch_iterator, suggest_capacities

    ncap, ecap = suggest_capacities(train, cfg.batch_size)
    b = next(iter(batch_iterator(train, cfg.batch_size, ncap, ecap)))
    model = build_model(cfg, train[0].x.shape[1], train[0].edge_attr.shape[1])
    opt = make_optimizer(cfg)
    state = init_state(model, opt, b)
    from buckgnn_tpu.config import checkpoint_config_dict

    ckpt.save_checkpoint(
        str(tmp_path / "c"), state, cfg,
        checkpoint_config_dict(cfg, 15, 5), nz,
    )
    state2, cfg_back, ccfg, nz2 = ckpt.load_checkpoint(str(tmp_path / "c"), state)
    assert cfg_back.hidden_channels == cfg.hidden_channels
    assert ccfg["model_name"] == cfg.model_name
    leaves1 = jax.tree.leaves(state.params)
    leaves2 = jax.tree.leaves(state2.params)
    for a, c in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_train_static_disp(tmp_path):
    ds = generate_dataset(12, seed=1, min_side=3, max_side=4,
                          prediction_type="static_disp")
    normed, nz = normalize_dataset(ds, prediction_type="static_disp")
    cfg = _tiny_cfg(prediction_type="static_disp", loss_function="graph_mae",
                    num_epochs=2, batch_size=4)
    res = train_gnn(cfg, normed[:8], normed[8:], nz, str(tmp_path),
                    verbose=False)
    assert all(np.isfinite(h["train_loss"]) for h in res.history)

def test_train_mode_shape(tmp_path):
    """End-to-end mode_shape training (TRAIN_FINAL.py:1268-1279 target
    slicing; Metrics.py:19-23 direction-normalized error): node-level
    [n, 3] targets flow through slice_static_targets -> masked loss ->
    finite history, and eval reports the mode-shape MAPE."""
    ds = generate_dataset(12, seed=2, min_side=3, max_side=4,
                          prediction_type="mode_shape")
    assert ds[0].y.ndim == 2 and ds[0].y.shape[1] >= 3
    normed, nz = normalize_dataset(ds, prediction_type="mode_shape")
    cfg = _tiny_cfg(prediction_type="mode_shape", loss_function="graph_mae",
                    num_epochs=3, batch_size=4)
    res = train_gnn(cfg, normed[:8], normed[8:], nz, str(tmp_path),
                    verbose=False)
    assert all(np.isfinite(h["train_loss"]) for h in res.history)
    assert all(np.isfinite(h["val_loss"]) for h in res.history)
    assert res.history[-1]["train_loss"] < res.history[0]["train_loss"]


def test_trainer_selects_ea_tile_geometry(tmp_path):
    """EA models must train on the tile-128 fused-kernel geometry
    (selection-matmul flops scale with tile + slab; RESULTS.md round 4)
    — the trainer picks it from model_name, and the batch it packs is
    fused-eligible."""
    from buckgnn_tpu.graph.normalizer import normalize_dataset
    from buckgnn_tpu.graph.synthetic import generate_dataset
    from buckgnn_tpu.ops.pallas_ea_block import supports_fused_ea

    ds = generate_dataset(10, seed=7, min_side=8, max_side=10,
                          use_virtual_edges=True)
    normed, nz = normalize_dataset(ds)
    seen = {}

    def report(h, _seen=seen):
        return True

    cfg = TrainConfig(hidden_channels=128, num_layers=2, num_epochs=1,
                      batch_size=4, lr=1e-3, t_0=10, dropout_rate=0.0,
                      segment_impl="banded_pallas",
                      model_name="EA_GNN_Shared")
    import buckgnn_tpu.train.trainer as tr

    orig = tr.batch_iterator

    def spy(*a, **k):
        batches = list(orig(*a, **k))
        seen["batch"] = batches[0]
        return iter(batches)

    import unittest.mock as mock

    with mock.patch.object(tr, "batch_iterator", spy):
        train_gnn(cfg, normed[:8], normed[8:], nz, str(tmp_path),
                  verbose=False, report_fn=report)
    b = seen["batch"]
    assert b.band_tile == 128, b.band_tile
    assert b.band_width <= 128
    assert supports_fused_ea(b, 128)
