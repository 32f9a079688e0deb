"""Metrics vs loop oracles (Metrics.py semantics)."""

import numpy as np
import jax.numpy as jnp

from buckgnn_tpu.train.metrics import MAPE_error, stress_errors


def test_buckling_mape_with_denorm():
    pred = jnp.array([0.5, 1.0, 0.0])
    targ = jnp.array([0.6, 1.1, 5.0])
    mask = jnp.array([True, True, False])
    scale, center = 2.0, 3.0
    got = float(MAPE_error(pred, targ, mask, "buckling", scale, center))
    p = np.array([0.5, 1.0]) * scale + center
    t = np.array([0.6, 1.1]) * scale + center
    want = np.mean(np.abs((t - p) / t)) * 100
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_static_mape_threshold():
    pred = jnp.array([[1.0], [1.0], [100.0]])
    targ = jnp.array([[2.0], [0.01], [1000.0]])
    mask = jnp.array([True, True, False])
    got = float(MAPE_error(pred, targ, mask, "static_disp", threshold=0.1))
    # only the first row passes the threshold+mask
    want = abs((2.0 - 1.0) / (2.0 + 1e-8)) * 100
    np.testing.assert_allclose(got, want, rtol=1e-5)


def _stress_oracle(p, t, sizes, threshold):
    """Literal per-graph loop re-statement of Metrics.py:47-110."""
    out = {}
    start = 0
    sums = {}
    for n in sizes:
        gp, gt = p[start : start + n], t[start : start + n]
        start += n
        ad = np.abs(gt - gp)
        rd = ad / (np.abs(gt) + 1e-8)
        m = {}
        for i, comp in enumerate(["x", "y", "xy"]):
            mi = np.argmax(np.abs(gt[:, i]))
            m[f"max_{comp}_val"] = abs(gt[mi, i])
            m[f"max_{comp}_mae"] = ad[mi, i]
            m[f"max_{comp}_rel"] = ad[mi, i] / (abs(gt[mi, i]) + 1e-8) * 100
        hi = np.abs(gt) >= threshold
        if hi.any():
            m["mape_high"] = np.mean(rd[hi]) * 100
            m["mae_high"] = np.mean(ad[hi])
        lo = np.abs(gt) < threshold
        if lo.any():
            m["mape_low"] = np.mean(rd[lo]) * 100
            m["mae_low"] = np.mean(ad[lo])
        m["mape"] = np.mean(rd) * 100
        m["mae"] = np.mean(ad)
        m["re"] = np.sum(np.abs(ad)) / np.sum(np.abs(gt)) * 100
        m["mse"] = np.mean(gt**2 - gp**2)
        m["max_mae"] = ad.max()
        for k, v in m.items():
            sums[k] = sums.get(k, 0.0) + v
    return sums


def test_stress_errors_against_loop_oracle(rng):
    sizes = [6, 9]
    n = sum(sizes)
    p = rng.normal(size=(n + 3, 3)).astype(np.float32)
    t = (rng.normal(size=(n + 3, 3)) + 0.5).astype(np.float32)
    node_graph = jnp.asarray(
        np.array([0] * 6 + [1] * 9 + [2] * 3, dtype=np.int32)
    )
    node_mask = jnp.asarray(np.array([True] * n + [False] * 3))
    graph_mask = jnp.asarray(np.array([True, True, False]))
    got = stress_errors(
        jnp.asarray(p), jnp.asarray(t), node_graph, node_mask, graph_mask,
        "static_stress", threshold=0.2,
    )
    want = _stress_oracle(p[:n], t[:n], sizes, 0.2)
    for k in ["max_x_val", "max_y_mae", "max_xy_rel", "mape", "mae", "re",
              "mse", "max_mae", "mape_high", "mae_high", "mape_low",
              "mae_low"]:
        np.testing.assert_allclose(
            float(got[k]), want[k], rtol=2e-3, atol=1e-4, err_msg=k
        )


def test_stress_errors_disp_keys(rng):
    n = 10
    p = jnp.asarray(rng.normal(size=(n, 2)).astype(np.float32))
    t = jnp.asarray((rng.normal(size=(n, 2)) + 0.3).astype(np.float32))
    node_graph = jnp.zeros(n, jnp.int32)
    got = stress_errors(
        p, t, node_graph, jnp.ones(n, bool), jnp.ones(1, bool),
        "static_disp", threshold=0.0001,
    )
    for k in ["max_disp_val", "max_disp_mae", "max_disp_rel", "max_x_val",
              "mape", "re", "mae", "mse", "p90", "std_mae", "p90_abs"]:
        assert k in got and np.isfinite(float(got[k])), k
