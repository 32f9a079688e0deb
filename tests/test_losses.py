"""Loss registry vs numpy/torch-semantics oracles; padding invariance."""

import numpy as np
import jax.numpy as jnp
import pytest

from buckgnn_tpu.train.losses import (
    GRAPH_FAMILY,
    FocalLossRegression,
    get_loss_function,
)

ALL_FLAT = [
    "mse", "relative_error", "log_cosh", "eigenvalue", "order_preserving",
    "mape", "mae", "rrse", "rrse1", "msle", "rse", "focal", "focal_rrse",
    "focal_mape",
]
ALL_STATIC = ["static_mixed", "static_mse", "static_relative", "static_stress",
              "static_mae"]


@pytest.fixture
def flat_data(rng):
    pred = rng.normal(size=12).astype(np.float32) + 3
    target = rng.normal(size=12).astype(np.float32) + 3
    return jnp.asarray(pred), jnp.asarray(target)


@pytest.mark.parametrize("name", ALL_FLAT)
def test_flat_losses_finite_and_mask_invariant(flat_data, name):
    pred, target = flat_data
    values = np.linspace(0.5, 8.0, 100)
    loss = get_loss_function(name, values)
    full = loss(pred, target, jnp.ones(12, bool))
    assert np.isfinite(float(full))
    # padding two extra junk entries behind a mask must not change the value
    pred_p = jnp.concatenate([pred, jnp.array([99.0, -99.0])])
    targ_p = jnp.concatenate([target, jnp.array([1e-3, 1e3])])
    mask_p = jnp.concatenate([jnp.ones(12, bool), jnp.zeros(2, bool)])
    padded = loss(pred_p, targ_p, mask_p)
    np.testing.assert_allclose(float(full), float(padded), rtol=1e-5)


def test_relative_error_oracle(flat_data):
    pred, target = flat_data
    loss = get_loss_function("relative_error")
    want = np.mean(np.abs(np.asarray(pred) - np.asarray(target))
                   / (np.abs(np.asarray(target)) + 1e-8))
    np.testing.assert_allclose(float(loss(pred, target, jnp.ones(12, bool))),
                               want, rtol=1e-6)


def test_mse_oracle(flat_data):
    pred, target = flat_data
    loss = get_loss_function("mse")
    want = np.mean((np.asarray(pred) - np.asarray(target)) ** 2)
    np.testing.assert_allclose(float(loss(pred, target, jnp.ones(12, bool))),
                               want, rtol=1e-6)


def test_logcosh_oracle(flat_data):
    pred, target = flat_data
    loss = get_loss_function("log_cosh")
    want = np.mean(np.log(np.cosh(np.asarray(pred) - np.asarray(target))))
    np.testing.assert_allclose(float(loss(pred, target, jnp.ones(12, bool))),
                               want, rtol=1e-5)


def test_focal_weights_match_torch_semantics():
    """Bin weights: inverse frequency, zero-bin left-fill, normalized
    (Losses.py:793-824)."""
    rng = np.random.default_rng(0)
    values = np.concatenate([rng.normal(2, 0.1, 900), rng.normal(8, 0.1, 100)])
    f = FocalLossRegression(values, num_bins=10)
    w = np.asarray(f.weights)
    assert w.shape == (10,)
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-6)
    # rare-value bins get higher weight than the dense bin
    hist, edges = np.histogram(values, bins=10)
    assert w[np.argmin(np.where(hist > 0, hist, 1 << 30))] > w[np.argmax(hist)]
    # out-of-bounds predictions get the penalty weight
    pred = jnp.array([100.0, 2.0])
    targ = jnp.array([2.0, 2.0])
    w2 = np.asarray(f._weights_for(pred, targ))
    assert w2[0] == f.penalty_factor


def _graph_setup(rng, C=3):
    # 2 graphs (5 and 7 nodes) + padding
    node_graph = jnp.asarray(np.array([0] * 5 + [1] * 7 + [2] * 4, np.int32))
    node_mask = jnp.asarray(np.array([True] * 12 + [False] * 4))
    graph_mask = jnp.asarray(np.array([True, True, False]))
    pred = jnp.asarray(rng.normal(size=(16, C)).astype(np.float32))
    target = jnp.asarray(rng.normal(size=(16, C)).astype(np.float32) + 1)
    x = jnp.asarray(rng.normal(size=(16, 15)).astype(np.float32))
    return pred, target, node_graph, node_mask, graph_mask, x


@pytest.mark.parametrize("name", sorted(GRAPH_FAMILY))
def test_graph_losses_finite(rng, name):
    pred, target, ng, nm, gm, x = _graph_setup(rng)
    loss = get_loss_function(name)
    v = float(loss(pred, target, ng, nm, gm, x))
    assert np.isfinite(v)


def test_graph_mae_oracle(rng):
    """graph_mae == mean over graphs of per-graph MAE, x10000
    (Losses.py:477-507)."""
    pred, target, ng, nm, gm, x = _graph_setup(rng)
    loss = get_loss_function("graph_mae")
    got = float(loss(pred, target, ng, nm, gm, x))
    p, t = np.asarray(pred), np.asarray(target)
    want = np.mean([
        np.mean(np.abs(p[:5] - t[:5])),
        np.mean(np.abs(p[5:12] - t[5:12])),
    ]) * 10000
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_graph_max_rel_oracle(rng):
    pred, target, ng, nm, gm, x = _graph_setup(rng)
    loss = get_loss_function("graph_max_rel")
    got = float(loss(pred, target, ng, nm, gm, x))
    p, t = np.asarray(pred), np.asarray(target)
    per_graph = []
    for sl in (slice(0, 5), slice(5, 12)):
        gp, gt = p[sl], t[sl]
        idx = np.argmax(np.abs(gt), axis=0)
        mt = gt[idx, np.arange(gt.shape[1])]
        mp = gp[idx, np.arange(gp.shape[1])]
        per_graph.append(np.mean(np.abs(mp - mt) / (np.abs(mt) + 1e-8)))
    want = np.mean(per_graph) * 10000
    np.testing.assert_allclose(got, want, rtol=1e-4)


@pytest.mark.parametrize("name", ALL_STATIC)
def test_static_losses_finite(rng, name):
    pred = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
    target = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
    mask = jnp.asarray(np.array([True] * 12 + [False] * 4))
    loss = get_loss_function(name)
    assert np.isfinite(float(loss(pred, target, mask)))


def test_unknown_loss_raises():
    with pytest.raises(ValueError):
        get_loss_function("nope")
