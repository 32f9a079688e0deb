"""Evaluation metrics — Dataset_Preparation/Metrics.py re-built on segment ops.

The reference computes ~28 per-graph aggregates in Python loops with
``.item()`` syncs per graph (Metrics.py:59-107); here every metric is a
masked segment reduction, jit-compatible, summed across graphs exactly like
the reference (callers divide by total graph count).
"""

from __future__ import annotations

import jax.numpy as jnp

from buckgnn_tpu.ops import segment

__all__ = ["MAPE_error", "stress_errors", "masked_mape"]


def _seg_sum(data, segment_ids, num_segments):
    """Sum into per-graph slots via the one-hot matmul (few segments ->
    scatter-lowered segment_sum is ~10x slower on TPU; ops/segment.py)."""
    return segment.segment_sum_dense(data, segment_ids, num_segments)


def masked_mape(pred, target, mask):
    """mean(|(t - p)/t|) * 100 over valid entries (Metrics.py:10-12)."""
    m = mask.astype(pred.dtype)
    rel = jnp.abs((target - pred) / target)
    return jnp.sum(rel * m) / jnp.maximum(jnp.sum(m), 1.0) * 100.0


def MAPE_error(
    predictions,
    targets,
    mask,
    prediction_type: str = "buckling",
    eigen_scale=None,
    eigen_center=None,
    threshold: float = 0.1,
):
    """Metrics.MAPE_error parity (Metrics.py:4-23).

    For buckling, pass the eigenvalue scaler stats to denormalize on device
    (the reference calls normalizer.denormalize_eigenvalue, Metrics.py:8-10).
    ``mask``: graph mask (buckling) or node mask (node-level types).
    """
    if prediction_type == "buckling":
        if eigen_scale is not None:
            predictions = predictions * eigen_scale + eigen_center
            targets = targets * eigen_scale + eigen_center
        return masked_mape(predictions, targets, mask)
    if prediction_type in ("static_disp", "static_stress"):
        m = (jnp.abs(targets) >= threshold) & mask[:, None]
        rel = jnp.abs((targets - predictions) / (targets + 1e-8))
        return (
            jnp.sum(rel * m) / jnp.maximum(jnp.sum(m), 1.0) * 100.0
        )
    if prediction_type == "mode_shape":
        pn = predictions / (
            jnp.linalg.norm(predictions, axis=1, keepdims=True) + 1e-8
        )
        tn = targets / (jnp.linalg.norm(targets, axis=1, keepdims=True) + 1e-8)
        m = mask.astype(pn.dtype)[:, None]
        return (
            jnp.sum(jnp.abs(pn - tn) * m)
            / jnp.maximum(jnp.sum(m) * pn.shape[1], 1.0)
            * 100.0
        )
    raise ValueError(prediction_type)


def _seg_mean(v, ids, n, mask):
    m = mask.astype(v.dtype)
    num = _seg_sum(v * m, ids, n)
    den = _seg_sum(m, ids, n)
    return num / jnp.maximum(den, 1.0), den


def _seg_masked_quantile(v, ids, n, mask, q):
    """Per-graph quantile via [G, N] masked matrix + nanquantile."""
    member = (ids[None, :] == jnp.arange(n)[:, None]) & mask[None, :]
    mat = jnp.where(member, v[None, :], jnp.nan)
    out = jnp.nanquantile(mat, q, axis=1)
    return jnp.where(jnp.isnan(out), 0.0, out)


def stress_errors(
    predictions,
    targets,
    node_graph,
    node_mask,
    graph_mask,
    prediction_type: str = "static_stress",
    threshold: float = 0.1,
):
    """Per-graph error aggregates, summed over graphs (Metrics.py:25-191).

    Returns a dict of scalars. Keys match the reference exactly so the
    TensorBoard/report surface is identical. Empty regions contribute 0
    (the reference simply skips graphs without such regions when summing).
    """
    n_graphs = graph_mask.shape[0]
    g = graph_mask.astype(predictions.dtype)
    abs_diff = jnp.abs(targets - predictions)
    rel_diff = abs_diff / (jnp.abs(targets) + 1e-8)
    valid = node_mask

    out = {}

    def add_region(suffix, region_mask):
        """mape/re/rmse/mae/p90 over a node-row region (component-wise
        region for stress, row region for disp handled by caller)."""
        rm = region_mask  # [N, C] boolean incl. validity
        rmf = rm.astype(predictions.dtype)
        cnt = _seg_sum(jnp.sum(rmf, axis=-1), node_graph, n_graphs)
        has = (cnt > 0).astype(predictions.dtype) * g

        def seg_region_mean(v):
            num = _seg_sum(
                jnp.sum(v * rmf, axis=-1), node_graph, n_graphs
            )
            return num / jnp.maximum(cnt, 1.0)

        mape = seg_region_mean(rel_diff) * 100.0
        re_num = _seg_sum(
            jnp.sum(abs_diff * rmf, axis=-1), node_graph, n_graphs
        )
        re_den = _seg_sum(
            jnp.sum(jnp.abs(targets) * rmf, axis=-1), node_graph, n_graphs
        )
        re = re_num / jnp.maximum(re_den, 1e-8) * 100.0
        # NOTE: reference computes sqrt(mean(t^2 - p^2)) — kept verbatim
        # (Metrics.py:81-82); negative means yield nan there, we clamp to 0.
        msq = seg_region_mean(targets**2 - predictions**2)
        rmse = jnp.sqrt(jnp.maximum(msq, 0.0))
        mae = seg_region_mean(abs_diff)
        # p90 of rel over the region (flattened over components like the
        # reference's boolean indexing)
        flat_rel = jnp.mean(
            jnp.where(rm, rel_diff, jnp.nan), axis=-1, where=rm.any(-1, keepdims=True)
        )
        row_has = rm.any(-1)
        p90 = _seg_masked_quantile(
            jnp.where(row_has, jnp.nan_to_num(flat_rel), 0.0),
            node_graph, n_graphs, valid & row_has, 0.9,
        ) * 100.0
        for k, v in [("mape", mape), ("re", re), ("rmse", rmse),
                     ("mae", mae), ("p90", p90)]:
            out[f"{k}{suffix}"] = jnp.sum(v * has)

    if prediction_type == "static_stress":
        comps = ["x", "y", "xy"]
        vmask = valid[:, None]
        # per-component max-|target| locations
        big_neg = -jnp.inf
        ta = jnp.where(vmask, jnp.abs(targets), big_neg)
        seg_max = segment.segment_max(ta, node_graph, n_graphs)
        at_max = (ta == seg_max[node_graph]) & vmask
        den = _seg_sum(at_max.astype(ta.dtype), node_graph, n_graphs)
        for i, comp in enumerate(comps):
            sel = at_max[:, i].astype(ta.dtype)
            d = jnp.maximum(den[:, i], 1.0)
            mx_val = _seg_sum(
                jnp.abs(targets[:, i]) * sel, node_graph, n_graphs
            ) / d
            mx_mae = _seg_sum(
                abs_diff[:, i] * sel, node_graph, n_graphs
            ) / d
            mx_rel = _seg_sum(
                (abs_diff[:, i] / (jnp.abs(targets[:, i]) + 1e-8)) * sel,
                node_graph, n_graphs,
            ) / d * 100.0
            out[f"max_{comp}_val"] = jnp.sum(mx_val * g)
            out[f"max_{comp}_mae"] = jnp.sum(mx_mae * g)
            out[f"max_{comp}_rel"] = jnp.sum(mx_rel * g)

        high = (jnp.abs(targets) >= threshold) & vmask
        low = (jnp.abs(targets) < threshold) & vmask
        add_region("_high", high)
        add_region("_low", low)
        add_region("", vmask & jnp.ones_like(targets, bool))

        # overall extras
        mse_pg, _ = _seg_mean(
            jnp.mean(targets**2 - predictions**2, axis=-1), node_graph,
            n_graphs, valid,
        )
        out["mse"] = jnp.sum(mse_pg * g)
        row_max = jnp.max(jnp.where(vmask, abs_diff, -jnp.inf), axis=-1)
        mx = segment.segment_max(
            jnp.where(valid, row_max, -jnp.inf), node_graph, n_graphs
        )
        out["max_mae"] = jnp.sum(jnp.where(jnp.isfinite(mx), mx, 0.0) * g)
        # std of abs_diff per graph
        mean_pg, cnt = _seg_mean(
            jnp.mean(abs_diff, axis=-1), node_graph, n_graphs, valid
        )
        sq_pg, _ = _seg_mean(
            jnp.mean(abs_diff**2, axis=-1), node_graph, n_graphs, valid
        )
        var = jnp.maximum(sq_pg - mean_pg**2, 0.0)
        unbias = cnt * targets.shape[1] / jnp.maximum(
            cnt * targets.shape[1] - 1.0, 1.0
        )
        out["std_mae"] = jnp.sum(jnp.sqrt(var * unbias) * g)
        out["p90_abs"] = jnp.sum(
            _seg_masked_quantile(
                jnp.mean(abs_diff, axis=-1), node_graph, n_graphs, valid, 0.9
            ) * g
        )
        return out

    if prediction_type == "static_disp":
        vmask = valid[:, None]
        target_mag = jnp.linalg.norm(
            jnp.where(vmask, targets, 0.0), axis=1
        )
        # max resultant displacement location
        big_neg = -jnp.inf
        tm = jnp.where(valid, target_mag, big_neg)
        seg_max = segment.segment_max(tm, node_graph, n_graphs)
        at_max = (tm == seg_max[node_graph]) & valid
        den = jnp.maximum(
            _seg_sum(at_max.astype(targets.dtype), node_graph, n_graphs),
            1.0,
        )
        err_mag = jnp.linalg.norm(abs_diff, axis=1)
        mx_val = _seg_sum(
            target_mag * at_max, node_graph, n_graphs
        ) / den
        mx_mae = _seg_sum(err_mag * at_max, node_graph, n_graphs) / den
        out["max_disp_val"] = jnp.sum(mx_val * g)
        out["max_disp_mae"] = jnp.sum(mx_mae * g)
        out["max_disp_rel"] = jnp.sum(mx_mae / (mx_val + 1e-8) * 100.0 * g)

        ta = jnp.where(vmask, jnp.abs(targets), big_neg)
        seg_cmax = segment.segment_max(ta, node_graph, n_graphs)
        at_cmax = (ta == seg_cmax[node_graph]) & vmask
        cden = jnp.maximum(
            _seg_sum(at_cmax.astype(ta.dtype), node_graph, n_graphs), 1.0
        )
        for i, comp in enumerate(["x", "y"]):
            sel = at_cmax[:, i].astype(ta.dtype)
            d = cden[:, i]
            v = _seg_sum(
                jnp.abs(targets[:, i]) * sel, node_graph, n_graphs
            ) / d
            m = _seg_sum(abs_diff[:, i] * sel, node_graph, n_graphs) / d
            r = _seg_sum(
                (abs_diff[:, i] / (jnp.abs(targets[:, i]) + 1e-8)) * sel,
                node_graph, n_graphs,
            ) / d * 100.0
            out[f"max_{comp}_val"] = jnp.sum(v * g)
            out[f"max_{comp}_mae"] = jnp.sum(m * g)
            out[f"max_{comp}_rel"] = jnp.sum(r * g)

        high_rows = (target_mag >= threshold) & valid
        low_rows = (target_mag < threshold) & valid
        add_region("_high", high_rows[:, None] & jnp.ones_like(targets, bool))
        add_region("_low", low_rows[:, None] & jnp.ones_like(targets, bool))
        add_region("", vmask & jnp.ones_like(targets, bool))

        mse_pg, _ = _seg_mean(
            jnp.mean(targets**2 - predictions**2, axis=-1), node_graph,
            n_graphs, valid,
        )
        out["mse"] = jnp.sum(mse_pg * g)
        row_max = jnp.max(jnp.where(vmask, abs_diff, -jnp.inf), axis=-1)
        mx = segment.segment_max(
            jnp.where(valid, row_max, -jnp.inf), node_graph, n_graphs
        )
        out["max_mae"] = jnp.sum(jnp.where(jnp.isfinite(mx), mx, 0.0) * g)
        mean_pg, cnt = _seg_mean(
            jnp.mean(abs_diff, axis=-1), node_graph, n_graphs, valid
        )
        sq_pg, _ = _seg_mean(
            jnp.mean(abs_diff**2, axis=-1), node_graph, n_graphs, valid
        )
        var = jnp.maximum(sq_pg - mean_pg**2, 0.0)
        unbias = cnt * targets.shape[1] / jnp.maximum(
            cnt * targets.shape[1] - 1.0, 1.0
        )
        out["std_mae"] = jnp.sum(jnp.sqrt(var * unbias) * g)
        out["p90_abs"] = jnp.sum(
            _seg_masked_quantile(
                jnp.mean(abs_diff, axis=-1), node_graph, n_graphs, valid, 0.9
            ) * g
        )
        return out

    raise NotImplementedError(
        f"Error metrics not implemented for prediction type: {prediction_type}"
    )
