"""Loss registry — full parity with Utils/Losses.py:8-66, segment-op based.

Two calling conventions, matching how the reference trainer invokes them
(TRAIN_FINAL.py:261-294):

- *flat* losses (buckling / generic): ``loss(pred, target, mask)`` over
  per-graph scalars with a validity mask (the mask replaces the reference's
  dynamic batch size).
- *graph family* (node-level): ``loss(pred, target, node_graph, node_mask,
  graph_mask, x)`` — per-graph reductions via segment ops instead of the
  reference's Python loop over graphs (Losses.py:343-360, 431-443 etc., a
  device-sync antipattern this build eliminates).

All are jit-compatible; masked rows/graphs contribute exactly zero.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from buckgnn_tpu.ops import segment


def _seg_sum(data, segment_ids, num_segments):
    """Per-graph sums via the one-hot matmul (ops/segment.py: few-segment
    scatter-lowered segment_sum is ~10x slower on TPU)."""
    return segment.segment_sum_dense(data, segment_ids, num_segments)

__all__ = ["get_loss_function"]


def _masked_mean_strict(v, mask):
    """Mean of v over elements whose leading-dim mask is True; the mask
    broadcasts over trailing dims (each valid row contributes all of its
    components)."""
    m = mask.astype(v.dtype)
    trailing = int(np.prod(v.shape[mask.ndim:])) if v.ndim > mask.ndim else 1
    while m.ndim < v.ndim:
        m = m[..., None]
    return jnp.sum(v * m) / jnp.maximum(jnp.sum(m) * trailing, 1.0)


# --------------------------------------------------------------------- #
# flat (graph-scalar / element-wise) losses
# --------------------------------------------------------------------- #


def mse_loss(pred, target, mask):
    return _masked_mean_strict((pred - target) ** 2, mask)


def relative_error_loss(pred, target, mask, epsilon=1e-8):
    """The buckling default (RelativeErrorLoss, Losses.py:755-761)."""
    return _masked_mean_strict(
        jnp.abs(pred - target) / (jnp.abs(target) + epsilon), mask
    )


def log_cosh_loss(pred, target, mask):
    # (Losses.py:763-765); numerically-stable log(cosh(x))
    x = jnp.abs(pred - target)
    v = x + jnp.log1p(jnp.exp(-2.0 * x)) - jnp.log(2.0)
    return _masked_mean_strict(v, mask)


def eigenvalue_loss(pred, target, mask, alpha=0.5, beta=0.5):
    # (Losses.py:767-776)
    return alpha * mse_loss(pred, target, mask) + beta * relative_error_loss(
        pred, target, mask
    )


def order_preserving_loss(pred, target, mask):
    # pairwise ranking hinge (Losses.py:778-782); masked pairs excluded
    mse = mse_loss(pred, target, mask)
    dp = pred[:, None] - pred[None, :]
    dt = target[:, None] - target[None, :]
    pair_mask = (mask[:, None] & mask[None, :]).astype(pred.dtype)
    order = jnp.sum(jnp.maximum(-(dp * dt), 0.0) * pair_mask) / jnp.maximum(
        jnp.sum(pair_mask), 1.0
    )
    return mse + order


def mape_loss(pred, target, mask):
    # NOTE: the reference's live MAPE class is plain MAE (Losses.py:883-890)
    return _masked_mean_strict(jnp.abs(target - pred), mask)


def mae_loss(pred, target, mask):
    # NOTE: the reference's MAE class computes squared error (Losses.py:697-722)
    return _masked_mean_strict(jnp.abs(pred - target) ** 2, mask)


def rrse_loss(pred, target, mask):
    # sqrt(mean(err^2)/sum(y^2)) (Losses.py:915-921)
    m = mask.astype(pred.dtype)
    num = _masked_mean_strict((pred - target) ** 2, mask)
    den = jnp.sum((target**2) * _bcast(m, target))
    return jnp.sqrt(num / den)


def rrse1_loss(pred, target, mask):
    # sqrt(mean(err^2/y^2)) (Losses.py:925-931)
    return jnp.sqrt(
        _masked_mean_strict((pred - target) ** 2 / (target**2), mask)
    )


def msle_loss(pred, target, mask, epsilon=1e-8):
    # (Losses.py:168-203)
    pred = jnp.maximum(pred, 0.0)
    target = jnp.maximum(target, 0.0)
    lp = jnp.log1p(pred + epsilon)
    lt = jnp.log1p(target + epsilon)
    return _masked_mean_strict((lp - lt) ** 2, mask)


def _bcast(m, v):
    while m.ndim < v.ndim:
        m = m[..., None]
    return m


class RSELoss:
    """sqrt(mean(err^2)/mean((y - y_mean_train)^2)) (Losses.py:902-912)."""

    def __init__(self, values, epsilon=1e-8):
        self.y_mean = float(np.mean(np.asarray(values)))
        self.epsilon = epsilon

    def __call__(self, pred, target, mask):
        num = _masked_mean_strict((pred - target) ** 2, mask)
        den = _masked_mean_strict((target - self.y_mean) ** 2, mask) + self.epsilon
        return jnp.sqrt(num / den)


class FocalLossRegression:
    """Histogram-weighted focal regression loss (Losses.py:784-862).

    Bin weights are computed host-side at construction from the training
    target distribution (inverse smoothed frequency, zero-bin fill-left,
    9-tap smoothing for >=100 bins); the forward pass is jit-compatible.
    """

    def __init__(
        self, values, alpha=1.0, gamma=2.0, num_bins=10, penalty_factor=2.0
    ):
        self.alpha = alpha
        self.gamma = gamma
        self.num_bins = num_bins
        self.penalty_factor = penalty_factor

        values = np.asarray(values, dtype=np.float32).reshape(-1)
        self.min_val = float(values.min())
        self.max_val = float(values.max())
        hist, bin_edges = np.histogram(
            values, bins=num_bins, range=(self.min_val, self.max_val)
        )
        freq = hist.astype(np.float64) / len(values)
        zero_idx = np.where(hist == 0)[0]
        for idx in zero_idx:
            if idx == 0:
                continue
            freq[idx] = freq[idx - 1]
        weights = 1.0 / (freq + 1.0)
        weights = weights / weights.sum()
        if num_bins > 99:
            k = 9
            pad = k // 2
            wpad = np.pad(weights, pad, mode="reflect")
            kernel = np.ones(k) / k
            weights = np.convolve(wpad, kernel, mode="valid")
        self.bin_edges = jnp.asarray(bin_edges, dtype=jnp.float32)
        self.weights = jnp.asarray(weights, dtype=jnp.float32)

    def _weights_for(self, predictions, targets):
        idx = jnp.searchsorted(self.bin_edges[1:], targets, side="right") - 1
        idx = jnp.clip(idx, 0, self.num_bins - 1)
        w = self.weights[idx]
        oob = (predictions < self.min_val) | (predictions > self.max_val)
        return jnp.where(oob, self.penalty_factor, w)

    def __call__(self, pred, target, mask):
        errors = jnp.abs(pred - target)
        w = self._weights_for(pred, target)
        v = w * errors**self.gamma
        return self.alpha * _masked_mean_strict(v, mask)


class FocalRRSE(FocalLossRegression):
    """(Losses.py:933-956); scalar RRSE error weighted per-sample."""

    def __init__(self, values, alpha=1.0, gamma=2.0, num_bins=100,
                 penalty_factor=10, **kw):
        super().__init__(values, alpha, gamma, num_bins, penalty_factor)

    def __call__(self, pred, target, mask):
        m = mask.astype(pred.dtype)
        err = jnp.sqrt(
            _masked_mean_strict((pred - target) ** 2, mask)
            / jnp.sum(target**2 * _bcast(m, target))
        )
        idx = jnp.clip(
            jnp.searchsorted(self.bin_edges[1:], target, side="right") - 1,
            0, self.num_bins - 1,
        )
        w = self.weights[idx]
        oob = (pred < self.min_val) | (pred > self.max_val)
        w = jnp.where(oob, w * self.penalty_factor, w)
        return self.alpha * _masked_mean_strict(w * err**self.gamma, mask)


class FocalMAPE(FocalLossRegression):
    """(Losses.py:959-983); scalar masked-MAPE weighted per-sample."""

    def __call__(self, pred, target, mask):
        err = _masked_mean_strict(
            jnp.abs(pred - target) / (jnp.abs(target) + 1e-8), mask
        )
        w = self._weights_for(pred, target)
        return self.alpha * _masked_mean_strict(w * err**self.gamma, mask)


# --------------------------------------------------------------------- #
# static (node-level, non-graph-aggregated) losses
# --------------------------------------------------------------------- #


class StaticAnalysisLoss:
    """alpha * relative + (1 - alpha) * MSE (Losses.py:136-150)."""

    def __init__(self, alpha=0.5):
        self.alpha = alpha

    def __call__(self, pred, target, mask):
        rel = _masked_mean_strict(
            jnp.abs((pred - target) / (target + 1e-8)), mask
        )
        mse = mse_loss(pred, target, mask)
        return self.alpha * rel + (1 - self.alpha) * mse


def static_mae_loss(pred, target, mask):
    # L1 norm of the error vector (Losses.py:152-166)
    return jnp.sum(jnp.abs(pred - target) * _bcast(mask.astype(pred.dtype), pred))


class StaticFocalStressLoss:
    """MSE + focal + magnitude weighting over masked rows (Losses.py:205-243)."""

    def __init__(self, alpha=0.25, gamma=2.0):
        self.alpha = alpha
        self.gamma = gamma

    def __call__(self, pred, target, mask):
        m = _bcast(mask.astype(pred.dtype), pred)
        err = jnp.abs(target - pred)
        count = jnp.maximum(jnp.sum(m * jnp.ones_like(pred)), 1.0)
        mse = jnp.sum(((target - pred) ** 2) * m) / count
        focal = jnp.sum((err**self.gamma) * err * m) / count
        weighted = jnp.sum((jnp.abs(target) + 1.0) * err * m) / count
        return mse + self.alpha * (focal + weighted)


# --------------------------------------------------------------------- #
# graph family (node-level, per-graph aggregation x10000 / x100 scaling)
# --------------------------------------------------------------------- #


def _per_graph_mean(v, node_graph, node_mask, n_graphs):
    """Mean over each graph's valid node-rows; v: [N, C] -> [G]."""
    m = node_mask.astype(v.dtype)
    num = _seg_sum(
        jnp.sum(v, axis=-1) * m, node_graph, n_graphs
    )
    den = _seg_sum(m * v.shape[-1], node_graph, n_graphs)
    return num / jnp.maximum(den, 1.0)


def _graphs_mean(per_graph, graph_mask):
    g = graph_mask.astype(per_graph.dtype)
    return jnp.sum(per_graph * g) / jnp.maximum(jnp.sum(g), 1.0)


def _total_force(x, node_graph, node_mask, n_graphs):
    """Per-graph total force magnitude; force features at x[:, 3:5]
    (Losses.py:519-524)."""
    f = jnp.linalg.norm(x[:, 3:5], axis=1) * node_mask.astype(x.dtype)
    return _seg_sum(f, node_graph, n_graphs)


class GraphLoss:
    """Shared machinery for the graph_* family."""

    scale = 10000.0

    def per_graph(self, pred, target, node_graph, node_mask, graph_mask, x):
        raise NotImplementedError

    def __call__(self, pred, target, node_graph, node_mask, graph_mask, x):
        n_graphs = graph_mask.shape[0]
        pg = self.per_graph(pred, target, node_graph, node_mask, n_graphs, x)
        return _graphs_mean(pg, graph_mask) * self.scale


class GraphMSELoss(GraphLoss):
    # mean(|pred^2 - target^2|) per graph (Losses.py:445-475)
    def per_graph(self, pred, target, node_graph, node_mask, n_graphs, x):
        return _per_graph_mean(
            jnp.abs(pred**2 - target**2), node_graph, node_mask, n_graphs
        )


class GraphMAELoss(GraphLoss):
    # (Losses.py:477-507)
    def per_graph(self, pred, target, node_graph, node_mask, n_graphs, x):
        return _per_graph_mean(
            jnp.abs(pred - target), node_graph, node_mask, n_graphs
        )


class GraphRelativeError(GraphLoss):
    # mean relative error per graph, eps=0.1 (Losses.py:362-401)
    def per_graph(self, pred, target, node_graph, node_mask, n_graphs, x):
        rel = jnp.abs(pred - target) / (jnp.abs(target) + 0.1)
        return _per_graph_mean(rel, node_graph, node_mask, n_graphs)


class GraphMixedError:
    """0.2 * per-graph quantile(rel, 0.2) + 0.8 * per-graph MAE
    (Losses.py:403-443). Quantiles need per-graph gathering; computed via a
    [G, N] masked matrix + nanquantile (fine at batch scale)."""

    def __init__(self, epsilon=1e-8, percentile=0.2):
        self.epsilon = epsilon
        self.percentile = percentile

    def __call__(self, pred, target, node_graph, node_mask, graph_mask, x):
        n_graphs = graph_mask.shape[0]
        rel = jnp.abs(pred - target) / (jnp.abs(target) + self.epsilon)
        rel_flat = jnp.mean(rel, axis=-1)  # averaged over components per node
        valid = node_mask
        member = (
            node_graph[None, :] == jnp.arange(n_graphs)[:, None]
        ) & valid[None, :]
        mat = jnp.where(member, rel_flat[None, :], jnp.nan)
        q = jnp.nanquantile(mat, self.percentile, axis=1)
        q = jnp.where(jnp.isnan(q), 0.0, q)
        mae = _per_graph_mean(
            jnp.abs(pred - target), node_graph, node_mask, n_graphs
        )
        return 0.2 * _graphs_mean(q, graph_mask) + 0.8 * _graphs_mean(
            mae, graph_mask
        )


class GraphMaxComponentRelativeError(GraphLoss):
    """Relative error at each component's max-|target| location per graph
    (Losses.py:303-360)."""

    def per_graph(self, pred, target, node_graph, node_mask, n_graphs, x):
        big_neg = jnp.asarray(-jnp.inf, target.dtype)
        ta = jnp.where(node_mask[:, None], jnp.abs(target), big_neg)
        # argmax per (graph, component): segment_max then match
        seg_max = segment.segment_max(ta, node_graph, n_graphs)  # [G, C]
        at_max = ta == seg_max[node_graph]  # [N, C] one-hot-ish
        at_max = at_max & node_mask[:, None]
        rel = jnp.abs(pred - target) / (jnp.abs(target) + 1e-8)
        num = _seg_sum(
            jnp.where(at_max, rel, 0.0), node_graph, n_graphs
        )
        den = _seg_sum(
            at_max.astype(rel.dtype), node_graph, n_graphs
        )
        per_comp = num / jnp.maximum(den, 1.0)
        return jnp.mean(per_comp, axis=-1)


class _ScaledGraphLoss(GraphLoss):
    """Force-magnitude scaling wrapper (Losses.py:509-695). The reference
    computes the total force over the WHOLE batch's x for every graph
    (a bug: compute_total_force(x) ignores the graph mask,
    Losses.py:557-562); we scale per graph as intended."""

    scale = 100.0
    min_scale = 0.1

    def __call__(self, pred, target, node_graph, node_mask, graph_mask, x):
        n_graphs = graph_mask.shape[0]
        pg = self.per_graph(pred, target, node_graph, node_mask, n_graphs, x)
        force = _total_force(x, node_graph, node_mask, n_graphs)
        pg = pg * jnp.maximum(force, self.min_scale)
        return _graphs_mean(pg, graph_mask) * self.scale


class ScaledGraphMAELoss(_ScaledGraphLoss):
    def per_graph(self, pred, target, node_graph, node_mask, n_graphs, x):
        return _per_graph_mean(
            jnp.abs(pred - target), node_graph, node_mask, n_graphs
        )


class ScaledGraphMSELoss(_ScaledGraphLoss):
    def per_graph(self, pred, target, node_graph, node_mask, n_graphs, x):
        return _per_graph_mean(
            jnp.abs(pred**2 - target**2), node_graph, node_mask, n_graphs
        )


class ScaledGraphRELoss(_ScaledGraphLoss):
    # L1-norm relative error per graph (Losses.py:627-695)
    def per_graph(self, pred, target, node_graph, node_mask, n_graphs, x):
        m = node_mask.astype(pred.dtype)[:, None]
        err = _seg_sum(
            jnp.sum(jnp.abs(pred - target) * m, axis=-1), node_graph, n_graphs
        )
        tgt = _seg_sum(
            jnp.sum(jnp.abs(target) * m, axis=-1), node_graph, n_graphs
        )
        return err / (tgt + 1e-8)


# --------------------------------------------------------------------- #


def get_loss_function(
    loss_name: str,
    all_values=None,
    use_z_coord: bool = False,
    use_rotations: bool = False,
):
    """Loss registry (get_loss_function, Utils/Losses.py:8-66)."""
    flat = {
        "mse": mse_loss,
        "relative_error": relative_error_loss,
        "log_cosh": log_cosh_loss,
        "eigenvalue": eigenvalue_loss,
        "order_preserving": order_preserving_loss,
        "mape": mape_loss,
        "mae": mae_loss,
        "rrse": rrse_loss,
        "rrse1": rrse1_loss,
        "msle": msle_loss,
    }
    if loss_name in flat:
        return flat[loss_name]
    if loss_name == "rse":
        return RSELoss(all_values)
    if loss_name == "focal":
        return FocalLossRegression(all_values, alpha=1.0, gamma=2.0, num_bins=100)
    if loss_name == "focal_rrse":
        return FocalRRSE(all_values, alpha=1.0, gamma=2.0, num_bins=100,
                         penalty_factor=10)
    if loss_name == "focal_mape":
        return FocalMAPE(all_values, alpha=1.0, gamma=2.0, num_bins=100)
    if loss_name == "static_mixed":
        return StaticAnalysisLoss(alpha=0.1)
    if loss_name == "static_mse":
        return StaticAnalysisLoss(alpha=0.0)
    if loss_name == "static_relative":
        return StaticAnalysisLoss(alpha=1.0)
    if loss_name == "static_stress":
        return StaticFocalStressLoss()
    if loss_name == "static_mae":
        return static_mae_loss
    graph = {
        "graph_mse": GraphMSELoss,
        "graph_mae": GraphMAELoss,
        "graph_rel": GraphRelativeError,
        "graph_mixed": GraphMixedError,
        "graph_max_rel": GraphMaxComponentRelativeError,
        "graph_rel_scaled": ScaledGraphRELoss,
        "graph_mae_scaled": ScaledGraphMAELoss,
        "graph_mse_scaled": ScaledGraphMSELoss,
    }
    if loss_name in graph:
        return graph[loss_name]()
    raise ValueError(f"Unknown loss function: {loss_name}")


GRAPH_FAMILY = {
    "graph_mse", "graph_mae", "graph_rel", "graph_mixed", "graph_max_rel",
    "graph_rel_scaled", "graph_mae_scaled", "graph_mse_scaled",
}
STATIC_FAMILY = {
    "static_mixed", "static_mse", "static_relative", "static_stress",
    "static_mae",
}
