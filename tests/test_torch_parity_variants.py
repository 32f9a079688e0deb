"""Independent-torch per-layer parity for the REST of the model family.

tests/test_torch_parity.py covers GraphSage_addAggr_Shared + mean pool;
this module extends the independent plain-torch re-implementations (PyG is
absent here) to every remaining `model_name` of the reference
(Models/BuckGNN.py:311-526): per-layer SAGE variants with mean/max
aggregation and BatchNorm, the woBatchNorm variants, GraphSage_MLP's inner
residual, the EA_GNN / EA_GNN_Shared GraphNetBlock stacks
(Models/BuckGNN.py:528-566), the SAG-pooled GraphSAGE variant
(Models/BuckGNN.py:190-217 + SAGPooling semantics), and the
supernode_with_pooling readout (Models/BuckGNN.py:273-307). Weights are
shared (flax params loaded into the torch math), activations compared layer
by layer in float64-vs-float32 tolerances.

BatchNorm runs in eval mode against RANDOM injected running stats (not the
init identity), so the normalization math is actually exercised.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from buckgnn_tpu.graph.batch import batch_iterator, suggest_capacities
from buckgnn_tpu.graph.normalizer import normalize_dataset
from buckgnn_tpu.graph.synthetic import generate_dataset
from buckgnn_tpu.models import BuckGNN

H = 32
L = 3
EPS = 1e-5  # torch BatchNorm1d default


def _graph(supernode=False, seed=4):
    ds = generate_dataset(2, seed=seed, min_side=6, max_side=6,
                          use_super_node=supernode,
                          use_virtual_edges=not supernode)
    (g, _), _ = normalize_dataset(ds)
    return g


def _batch(g, n_graphs=1):
    graphs = [g] if n_graphs == 1 else [g, g]
    ncap, ecap = suggest_capacities(graphs, n_graphs, slack=1.5)
    return next(iter(batch_iterator(graphs, n_graphs, ncap, ecap)))


def _t(a):
    return torch.tensor(np.asarray(a, np.float64), dtype=torch.float64)


class TorchParams:
    """Navigate the flax param tree from torch."""

    def __init__(self, params, stats=None):
        self.params = params
        self.stats = stats or {}

    def dense(self, x, scope, bias=True):
        p = self.params
        for k in scope.split("/"):
            p = p[k]
        out = x @ _t(p["kernel"])
        if bias:
            out = out + _t(p["bias"])
        return out

    def mlp(self, x, scope, n_layers):
        for i in range(n_layers):
            x = self.dense(x, f"{scope}/lin_{i}")
            if i + 1 < n_layers:
                x = torch.relu(x)
        return x

    def bn_eval(self, x, scope):
        """torch nn.BatchNorm1d eval mode with running stats."""
        p = self.params[scope]
        s = self.stats[scope]
        mean, var = _t(s["mean"]), _t(s["var"])
        xhat = (x - mean) / torch.sqrt(var + EPS)
        return xhat * _t(p["scale"]) + _t(p["bias"])

    def sage(self, x, s, r, scope, aggr="add"):
        """PyG SAGEConv(normalize=True) semantics."""
        n = x.shape[0]
        if aggr == "max":
            agg = torch.full_like(x, -torch.inf)
            agg.index_reduce_(0, r, x[s], "amax", include_self=True)
            agg = torch.where(torch.isinf(agg), torch.zeros_like(agg), agg)
        elif aggr == "mean":
            agg = torch.zeros_like(x)
            agg.index_add_(0, r, x[s])
            cnt = torch.zeros(n, dtype=torch.float64)
            cnt.index_add_(0, r, torch.ones_like(r, dtype=torch.float64))
            agg = agg / cnt.clamp_min(1.0)[:, None]
        else:
            agg = torch.zeros_like(x)
            agg.index_add_(0, r, x[s])
        out = self.dense(agg, f"{scope}/lin_l") + self.dense(
            x, f"{scope}/lin_r", bias=False
        )
        return out / out.norm(dim=-1, keepdim=True).clamp_min(1e-12)

    def gn_block(self, x, e, s, r, scope):
        """GraphNetBlock (Models/BuckGNN.py:528-566): row=receiver,
        col=sender in the GraphBatch layout."""
        n = x.shape[0]
        e = self.mlp(torch.cat([x[r], x[s], e], dim=1),
                     f"{scope}/edge_mlp", 2)
        msg = self.mlp(torch.cat([x[s], e], dim=1),
                       f"{scope}/node_mlp_phi", 2)
        agg = torch.zeros_like(x)
        agg.index_add_(0, r, msg)
        cnt = torch.zeros(n, dtype=torch.float64)
        cnt.index_add_(0, r, torch.ones_like(r, dtype=torch.float64))
        agg = agg / cnt.clamp_min(1.0)[:, None]
        x = self.mlp(torch.cat([x, agg], dim=1), f"{scope}/node_mlp_gamma", 2)
        return x + self.mlp(x, f"{scope}/node_mlp_beta", 2), e


def _init_with_stats(model, batch, bn_scopes, rng):
    """init + inject random BN running stats + random scale/bias so
    eval-mode BatchNorm is non-trivial."""
    variables = model.init(jax.random.key(0), batch, deterministic=True)
    variables = jax.tree.map(np.asarray, variables)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    for scope in bn_scopes:
        stats[scope]["mean"] = rng.normal(size=H).astype(np.float32) * 0.1
        stats[scope]["var"] = rng.uniform(0.5, 2.0, size=H).astype(np.float32)
        params[scope]["scale"] = rng.normal(size=H).astype(np.float32) * 0.2 + 1
        params[scope]["bias"] = rng.normal(size=H).astype(np.float32) * 0.1
    return {"params": params, **({"batch_stats": stats} if stats else {})}


@pytest.mark.parametrize("name,aggr,use_bn", [
    ("GraphSage_addAggr", "add", True),
    ("GraphSage_sumAggr", "add", True),
    ("GraphSage_meanAggr", "mean", True),
    ("GraphSage_maxAggr", "max", True),
    ("GraphSage_addAggr_woBatchNorm", "add", False),
    ("GraphSage_sumAggr_woBatchNorm", "add", False),
])
def test_per_layer_sage_variants(rng, name, aggr, use_bn):
    g = _graph()
    batch = _batch(g)
    n = g.n_node
    model = BuckGNN(num_node_features=g.x.shape[1], num_edge_features=5,
                    hidden_channels=H, num_layers=L, pooling_layer="mean",
                    dropout_rate=0.0, model_name=name)
    scopes = [f"bn_{i}" for i in range(L)] if use_bn else []
    variables = _init_with_stats(model, batch, scopes, rng)
    tp = TorchParams(variables["params"], variables.get("batch_stats"))

    # torch forward with per-layer captures
    x = _t(g.x)
    s, r = torch.tensor(np.asarray(g.senders), dtype=torch.long), \
        torch.tensor(np.asarray(g.receivers), dtype=torch.long)
    x = tp.mlp(x, "node_encoder", 2)
    acts = []
    for i in range(L):
        x_prev = x
        x = tp.sage(x, s, r, f"sage_{i}", aggr=aggr)
        if use_bn:
            x = tp.bn_eval(x, f"bn_{i}")
        x = torch.relu(x)
        if 0 < i < L - 1:
            x = x + x_prev
        acts.append(x.clone())
    pooled = x.mean(dim=0, keepdim=True)
    pred_t = tp.mlp(pooled, "decoder", 2).reshape(-1)

    pred, _ = model.apply(variables, batch, deterministic=True)
    gm = np.asarray(batch.graph_mask)
    np.testing.assert_allclose(np.asarray(pred)[gm], pred_t.numpy(),
                               rtol=5e-4, atol=5e-5, err_msg=name)

    # per-layer re-step through the bound flax modules
    from buckgnn_tpu.models.blocks import (
        MLP, MaskedBatchNorm, SAGEConv, encoder_widths,
    )

    params = variables["params"]
    x_f = MLP(encoder_widths(H), name="node_encoder").apply(
        {"params": params["node_encoder"]}, batch.nodes
    )
    for i in range(L):
        x_prev = x_f
        x_f = SAGEConv(H, aggr=aggr, normalize=True).apply(
            {"params": params[f"sage_{i}"]},
            x_f, batch.senders, batch.receivers,
        )
        if use_bn:
            x_f = MaskedBatchNorm().apply(
                {"params": params[f"bn_{i}"],
                 "batch_stats": variables["batch_stats"][f"bn_{i}"]},
                x_f, batch.node_mask, use_running_average=True,
            )
        x_f = jax.nn.relu(x_f)
        if 0 < i < L - 1:
            x_f = x_f + x_prev
        np.testing.assert_allclose(
            np.asarray(x_f)[:n], acts[i].numpy(), rtol=2e-4, atol=2e-5,
            err_msg=f"{name} layer {i}",
        )


def test_per_layer_graphsage_mlp(rng):
    """GraphSage_MLP: SAGE -> BN -> relu -> Linear -> SAME BN -> relu +
    inner residual from the raw SAGE output (Models/BuckGNN.py:472-492)."""
    g = _graph()
    batch = _batch(g)
    model = BuckGNN(num_node_features=g.x.shape[1], num_edge_features=5,
                    hidden_channels=H, num_layers=L, pooling_layer="mean",
                    dropout_rate=0.0, model_name="GraphSage_MLP")
    scopes = [f"bn_{i}" for i in range(L)]
    variables = _init_with_stats(model, batch, scopes, rng)
    tp = TorchParams(variables["params"], variables.get("batch_stats"))

    x = _t(g.x)
    s = torch.tensor(np.asarray(g.senders), dtype=torch.long)
    r = torch.tensor(np.asarray(g.receivers), dtype=torch.long)
    x = tp.mlp(x, "node_encoder", 2)
    for i in range(L):
        x_prev = x
        x = tp.sage(x, s, r, f"sage_{i}")
        x_sage = x
        x = torch.relu(tp.bn_eval(x, f"bn_{i}"))
        x = tp.dense(x, f"mlp_{i}")
        x = torch.relu(tp.bn_eval(x, f"bn_{i}"))
        x = x_sage + x
        if 0 < i < L - 1:
            x = x + x_prev
    pred_t = tp.mlp(x.mean(dim=0, keepdim=True), "decoder", 2).reshape(-1)

    pred, _ = model.apply(variables, batch, deterministic=True)
    gm = np.asarray(batch.graph_mask)
    np.testing.assert_allclose(np.asarray(pred)[gm], pred_t.numpy(),
                               rtol=5e-4, atol=5e-5)


@pytest.mark.parametrize("name", ["EA_GNN", "EA_GNN_Shared"])
def test_per_layer_ea_gnn(rng, name):
    g = _graph()
    batch = _batch(g)
    n, e = g.n_node, g.n_edge
    model = BuckGNN(num_node_features=g.x.shape[1], num_edge_features=5,
                    hidden_channels=H, num_layers=L, pooling_layer="mean",
                    dropout_rate=0.0, model_name=name)
    variables = _init_with_stats(model, batch, [], rng)
    tp = TorchParams(variables["params"])

    x = _t(g.x)
    ea = _t(g.edge_attr)
    s = torch.tensor(np.asarray(g.senders), dtype=torch.long)
    r = torch.tensor(np.asarray(g.receivers), dtype=torch.long)
    x = tp.mlp(x, "node_encoder", 2)
    ea = tp.mlp(ea, "edge_encoder", 2)
    acts = []
    for i in range(L):
        scope = ("shared_gn_block" if name == "EA_GNN_Shared"
                 else f"gn_block_{i}")
        x_prev, e_prev = x, ea
        x, ea = tp.gn_block(x, ea, s, r, scope)
        if 0 < i < L - 1:
            x = x + x_prev
            ea = ea + e_prev
        acts.append((x.clone(), ea.clone()))
    pred_t = tp.mlp(x.mean(dim=0, keepdim=True), "decoder", 2).reshape(-1)

    pred, _ = model.apply(variables, batch, deterministic=True)
    gm = np.asarray(batch.graph_mask)
    np.testing.assert_allclose(np.asarray(pred)[gm], pred_t.numpy(),
                               rtol=1e-3, atol=5e-5, err_msg=name)

    # per-layer: re-step the bound flax GraphNetBlock. pack_graphs sorts
    # edges by receiver, so edge activations come back in batch order —
    # build the graph-order -> batch-order permutation from the unique
    # directed (sender, receiver) pairs to compare edge features.
    from buckgnn_tpu.models.blocks import MLP, GraphNetBlock, encoder_widths

    bs, br = np.asarray(batch.senders), np.asarray(batch.receivers)
    em = np.asarray(batch.edge_mask)
    lookup = {}
    for k in np.nonzero(em)[0]:
        lookup[(int(bs[k]), int(br[k]))] = int(k)
    perm = np.array(
        [lookup[(int(a), int(b))]
         for a, b in zip(np.asarray(g.senders), np.asarray(g.receivers))]
    )
    assert len(set(perm)) == e, "duplicate directed edges break the mapping"

    params = variables["params"]
    x_f = MLP(encoder_widths(H), name="node_encoder").apply(
        {"params": params["node_encoder"]}, batch.nodes)
    e_f = MLP(encoder_widths(H), name="edge_encoder").apply(
        {"params": params["edge_encoder"]}, batch.edges)
    for i in range(L):
        scope = ("shared_gn_block" if name == "EA_GNN_Shared"
                 else f"gn_block_{i}")
        x_prev, e_prev = x_f, e_f
        x_f, e_f = GraphNetBlock(H).apply(
            {"params": params[scope]},
            x_f, e_f, batch.senders, batch.receivers,
        )
        if 0 < i < L - 1:
            x_f = x_f + x_prev
            e_f = e_f + e_prev
        xt, et = acts[i]
        np.testing.assert_allclose(np.asarray(x_f)[:n], xt.numpy(),
                                   rtol=1e-3, atol=2e-5,
                                   err_msg=f"{name} x layer {i}")
        np.testing.assert_allclose(np.asarray(e_f)[perm], et.numpy(),
                                   rtol=1e-3, atol=2e-5,
                                   err_msg=f"{name} edge layer {i}")


def test_supernode_with_pooling_readout(rng):
    """supernode_with_pooling: concat(mean-pool of real nodes, supernode
    features) -> decoder (Models/BuckGNN.py:293-300), on a 2-graph batch."""
    g = _graph(supernode=True)
    batch = _batch(g, n_graphs=2)
    model = BuckGNN(num_node_features=g.x.shape[1], num_edge_features=5,
                    hidden_channels=H, num_layers=2,
                    pooling_layer="supernode_with_pooling",
                    dropout_rate=0.0, model_name="GraphSage_addAggr_Shared")
    variables = _init_with_stats(model, batch, [], rng)
    tp = TorchParams(variables["params"])

    def torch_graph_pred(g):
        x = _t(g.x)
        s = torch.tensor(np.asarray(g.senders), dtype=torch.long)
        r = torch.tensor(np.asarray(g.receivers), dtype=torch.long)
        x = tp.mlp(x, "node_encoder", 2)
        for i in range(2):
            x_prev = x
            x = tp.sage(x, s, r, "shared_graphsage_block")
            x = torch.relu(x)
            if 0 < i < 1:
                x = x + x_prev
        # supernode is the LAST node; real nodes are the rest
        pooled = x[:-1].mean(dim=0, keepdim=True)
        readout = torch.cat([pooled, x[-1:]], dim=1)
        return tp.mlp(readout, "decoder", 2).reshape(-1)

    want = torch_graph_pred(g)
    pred, _ = model.apply(variables, batch, deterministic=True)
    got = np.asarray(pred)[np.asarray(batch.graph_mask)]
    for k in range(2):  # the same graph twice -> identical predictions
        np.testing.assert_allclose(got[k:k + 1], want.numpy(),
                                   rtol=5e-4, atol=5e-5)


def test_per_layer_graphsage_sag(rng):
    """GraphSAGE_SAG: torch implements SAGPooling(ratio=0.5, GNN=SAGEConv,
    aggr='add') by physical compaction (keep top-ceil(n/2) nodes by SAGE
    score, x *= tanh(score), drop edges touching removed nodes —
    torch_geometric.nn.SAGPooling semantics); the flax static-shape variant
    zeroes dropped nodes instead. Post-pool activations must agree on the
    kept nodes."""
    g = _graph()
    batch = _batch(g)
    model = BuckGNN(num_node_features=g.x.shape[1], num_edge_features=5,
                    hidden_channels=H, num_layers=4, pooling_layer="mean",
                    dropout_rate=0.0, model_name="GraphSAGE_SAG",
                    sag_ratio=0.5)
    scopes = [f"bn1_{i}" for i in range(2)] + [f"bn2_{i}" for i in range(2)]
    variables = _init_with_stats(model, batch, scopes, rng)
    tp = TorchParams(variables["params"], variables.get("batch_stats"))

    x = _t(g.x)
    s = torch.tensor(np.asarray(g.senders), dtype=torch.long)
    r = torch.tensor(np.asarray(g.receivers), dtype=torch.long)
    x = tp.mlp(x, "node_encoder", 2)
    for i in range(2):
        identity = x
        x = tp.sage(x, s, r, f"sage1_{i}")
        x = torch.relu(tp.bn_eval(x, f"bn1_{i}"))
        if i > 0:
            x = x + identity
    # SAGPooling: score via SAGEConv(h -> 1, aggr=add, no normalize)
    n = x.shape[0]
    agg = torch.zeros_like(x)
    agg.index_add_(0, r, x[s])
    score = (tp.dense(agg, "sag_score/lin_l")
             + tp.dense(x, "sag_score/lin_r", bias=False)).reshape(-1)
    k = int(np.ceil(0.5 * n))
    keep = torch.topk(score, k).indices.sort().values
    x = (x * torch.tanh(score)[:, None])[keep]
    # filter edges to kept nodes, relabel
    lut = torch.full((n,), -1, dtype=torch.long)
    lut[keep] = torch.arange(k)
    emask = (lut[s] >= 0) & (lut[r] >= 0)
    s2, r2 = lut[s[emask]], lut[r[emask]]
    for i in range(2):
        identity = x
        x = tp.sage(x, s2, r2, f"sage2_{i}")
        x = torch.relu(tp.bn_eval(x, f"bn2_{i}"))
        x = x + identity
    pred_t = tp.mlp(x.mean(dim=0, keepdim=True), "decoder", 2).reshape(-1)

    pred, aux = model.apply(variables, batch, deterministic=True)
    # final prediction: flax mean-pools the zero-padded kept set with true
    # counts — compare graph prediction
    gm = np.asarray(batch.graph_mask)
    np.testing.assert_allclose(np.asarray(pred)[gm], pred_t.numpy(),
                               rtol=1e-3, atol=5e-5)
    # kept-node activation parity is implied by the prediction; also check
    # the kept sets agree
    keep_flax = np.asarray(aux["node_keep"])[:n]
    keep_torch = np.zeros(n, bool)
    keep_torch[keep.numpy()] = True
    assert (keep_flax == keep_torch).all()
