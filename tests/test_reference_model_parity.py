"""Per-layer parity against the reference's ACTUAL Models/BuckGNN.py.

The BASELINE bar is "per-layer activations allclose vs reference on
identical inputs". tests/test_torch_parity*.py check an *independent*
plain-torch re-implementation; this module closes the literal bar by
executing /root/reference/Models/BuckGNN.py VERBATIM (importlib-loaded, no
code copied) on top of a minimal clean-room torch_geometric/torch_scatter
shim (tests/pyg_shim/), loading the flax model's initialized weights into
the reference torch module, and comparing activations layer by layer via
forward hooks on the shared nn.Dropout (applied once per layer after the
skip connection in every SAGE variant, Models/BuckGNN.py:352, and twice —
x then edge_attr — in the EA variants, :335-336).

Skipped when the reference tree is not present.
"""

import importlib.util
import os
import sys

import jax
import numpy as np
import pytest
import torch

from buckgnn_tpu.graph.batch import batch_iterator, suggest_capacities
from buckgnn_tpu.graph.normalizer import normalize_dataset
from buckgnn_tpu.graph.synthetic import generate_dataset
from buckgnn_tpu.models import BuckGNN

REF_FILE = "/root/reference/Models/BuckGNN.py"
H = 64
L = 3

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_FILE), reason="reference tree not available"
)


@pytest.fixture(scope="module")
def ref_mod():
    """Load the reference model file verbatim with the PyG shim on path."""
    shim = os.path.join(os.path.dirname(__file__), "pyg_shim")
    sys.path.insert(0, shim)
    try:
        spec = importlib.util.spec_from_file_location(
            "reference_buckgnn", REF_FILE
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(shim)
    return mod


def _graph(supernode=False, seed=4):
    ds = generate_dataset(2, seed=seed, min_side=6, max_side=6,
                          use_super_node=supernode,
                          use_virtual_edges=not supernode)
    (g, _), _ = normalize_dataset(ds)
    return g


def _batch(graphs):
    ncap, ecap = suggest_capacities(graphs, len(graphs), slack=1.5)
    return next(iter(batch_iterator(graphs, len(graphs), ncap, ecap)))


def _torch_inputs(graphs):
    """Concatenate graphs into the reference's (x, edge_index, edge_attr,
    batch) quadruple. edge_index = [receivers, senders]: the reference's
    GraphNetBlock unpacks row, col = edge_index and scatters messages
    phi([x[col], e]) at row (Models/BuckGNN.py:553-561) — our GraphBatch
    aggregates x[senders] at receivers. SAGEConv is orientation-agnostic
    on the symmetric directed edge sets both sides emit."""
    xs, eis, eas, bids = [], [], [], []
    off = 0
    for k, g in enumerate(graphs):
        xs.append(np.asarray(g.x, np.float64))
        eis.append(np.stack([np.asarray(g.receivers) + off,
                             np.asarray(g.senders) + off]))
        eas.append(np.asarray(g.edge_attr, np.float64))
        bids.append(np.full(g.n_node, k))
        off += g.n_node
    return (
        torch.tensor(np.concatenate(xs), dtype=torch.float64),
        torch.tensor(np.concatenate(eis, axis=1), dtype=torch.long),
        torch.tensor(np.concatenate(eas), dtype=torch.float64),
        torch.tensor(np.concatenate(bids), dtype=torch.long),
    )


def _fill_linear(sd, params, tname, fscope, bias=True):
    p = params
    for k in fscope.split("/"):
        p = p[k]
    sd[f"{tname}.weight"] = torch.tensor(
        np.asarray(p["kernel"], np.float64).T)
    if bias:
        sd[f"{tname}.bias"] = torch.tensor(np.asarray(p["bias"], np.float64))


def _fill_mlp(sd, params, tprefix, fscope, n_lin):
    for i in range(n_lin):
        _fill_linear(sd, params, f"{tprefix}.{2 * i}", f"{fscope}/lin_{i}")


def _fill_sage(sd, params, tprefix, fscope):
    _fill_linear(sd, params, f"{tprefix}.lin_l", f"{fscope}/lin_l")
    _fill_linear(sd, params, f"{tprefix}.lin_r", f"{fscope}/lin_r",
                 bias=False)


def _fill_bn(sd, params, stats, tprefix, fscope):
    sd[f"{tprefix}.weight"] = torch.tensor(
        np.asarray(params[fscope]["scale"], np.float64))
    sd[f"{tprefix}.bias"] = torch.tensor(
        np.asarray(params[fscope]["bias"], np.float64))
    sd[f"{tprefix}.running_mean"] = torch.tensor(
        np.asarray(stats[fscope]["mean"], np.float64))
    sd[f"{tprefix}.running_var"] = torch.tensor(
        np.asarray(stats[fscope]["var"], np.float64))


def _fill_gn_block(sd, params, tprefix, fscope):
    for part in ("edge_mlp", "node_mlp_phi", "node_mlp_gamma",
                 "node_mlp_beta"):
        _fill_mlp(sd, params, f"{tprefix}.{part}", f"{fscope}/{part}", 2)


def _load(ref_model, sd):
    ref_model.double().eval()
    result = ref_model.load_state_dict(sd, strict=False)
    assert not result.unexpected_keys, result.unexpected_keys
    return ref_model


def _hook_dropout(ref_model):
    caps = []
    ref_model.dropout.register_forward_hook(
        lambda m, i, o: caps.append(o.detach().clone()))
    return caps


def _init_with_stats(model, batch, bn_scopes, seed=0):
    variables = model.init(jax.random.key(0), batch, deterministic=True)
    variables = jax.tree.map(np.asarray, variables)
    rng = np.random.default_rng(seed)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    for scope in bn_scopes:
        stats[scope]["mean"] = rng.normal(size=H).astype(np.float32) * 0.1
        stats[scope]["var"] = rng.uniform(0.5, 2.0, size=H).astype(
            np.float32)
        params[scope]["scale"] = (rng.normal(size=H).astype(np.float32)
                                  * 0.2 + 1)
        params[scope]["bias"] = rng.normal(size=H).astype(np.float32) * 0.1
    return {"params": params, **({"batch_stats": stats} if stats else {})}


@pytest.mark.parametrize("pooling", ["mean", "supernode_with_pooling"])
def test_reference_addaggr_shared(ref_mod, pooling):
    """Flagship variant (GraphSage_addAggr_Shared, TRAIN_FINAL.py:66,81)
    run through the reference code itself, both readout heads."""
    supernode = pooling != "mean"
    g = _graph(supernode=supernode)
    graphs = [g, g] if supernode else [g]
    batch = _batch(graphs)
    model = BuckGNN(num_node_features=g.x.shape[1], num_edge_features=5,
                    hidden_channels=H, num_layers=L, pooling_layer=pooling,
                    dropout_rate=0.0, model_name="GraphSage_addAggr_Shared")
    variables = _init_with_stats(model, batch, [])
    params = variables["params"]

    ref = ref_mod.BuckGNN(
        num_node_features=g.x.shape[1], num_edge_features=5,
        hidden_channels=H, num_layers=L, pooling_layer=pooling,
        prediction_type="buckling", dropout_rate=0.0,
        model_name="GraphSage_addAggr_Shared")
    sd = {}
    _fill_mlp(sd, params, "node_encoder", "node_encoder", 2)
    _fill_mlp(sd, params, "decoder", "decoder", 2)
    _fill_sage(sd, params, "shared_graphsage_block", "shared_graphsage_block")
    _load(ref, sd)
    caps = _hook_dropout(ref)

    x, ei, ea, bid = _torch_inputs(graphs)
    with torch.no_grad():
        pred_ref, _ = ref(x, ei, ea, bid)
    pred_ref = np.atleast_1d(pred_ref.numpy())

    pred, _ = model.apply(variables, batch, deterministic=True)
    got = np.asarray(pred)[np.asarray(batch.graph_mask)]
    np.testing.assert_allclose(got, pred_ref, rtol=5e-4, atol=5e-5)

    # per-layer vs hand-stepped bound flax modules
    from buckgnn_tpu.models.blocks import MLP, SAGEConv, encoder_widths

    assert len(caps) == L
    n_all = sum(gr.n_node for gr in graphs)
    x_f = MLP(encoder_widths(H), name="node_encoder").apply(
        {"params": params["node_encoder"]}, batch.nodes)
    for i in range(L):
        x_prev = x_f
        x_f = SAGEConv(H, aggr="add", normalize=True).apply(
            {"params": params["shared_graphsage_block"]},
            x_f, batch.senders, batch.receivers)
        x_f = jax.nn.relu(x_f)
        if 0 < i < L - 1:
            x_f = x_f + x_prev
        np.testing.assert_allclose(
            np.asarray(x_f)[:n_all], caps[i].numpy(), rtol=2e-4, atol=2e-5,
            err_msg=f"layer {i} ({pooling})")


@pytest.mark.parametrize("name,tlist,aggr", [
    ("GraphSage_addAggr", "sage_blocks_add", "add"),
    ("GraphSage_meanAggr", "sage_blocks_mean", "mean"),
    ("GraphSage_maxAggr", "sage_blocks_max", "max"),
])
def test_reference_sage_bn_variants(ref_mod, name, tlist, aggr):
    """Per-layer SAGE + BatchNorm variants, eval-mode BN with injected
    non-trivial running stats on both sides."""
    g = _graph()
    batch = _batch([g])
    model = BuckGNN(num_node_features=g.x.shape[1], num_edge_features=5,
                    hidden_channels=H, num_layers=L, pooling_layer="mean",
                    dropout_rate=0.0, model_name=name)
    variables = _init_with_stats(model, batch,
                                 [f"bn_{i}" for i in range(L)])
    params = variables["params"]
    stats = variables["batch_stats"]

    ref = ref_mod.BuckGNN(
        num_node_features=g.x.shape[1], num_edge_features=5,
        hidden_channels=H, num_layers=L, pooling_layer="mean",
        prediction_type="buckling", dropout_rate=0.0, model_name=name)
    sd = {}
    _fill_mlp(sd, params, "node_encoder", "node_encoder", 2)
    _fill_mlp(sd, params, "decoder", "decoder", 2)
    for i in range(L):
        _fill_sage(sd, params, f"{tlist}.{i}", f"sage_{i}")
        _fill_bn(sd, params, stats, f"batch_norms.{i}", f"bn_{i}")
    _load(ref, sd)
    caps = _hook_dropout(ref)

    x, ei, ea, bid = _torch_inputs([g])
    with torch.no_grad():
        pred_ref, _ = ref(x, ei, ea, bid)
    pred, _ = model.apply(variables, batch, deterministic=True)
    got = np.asarray(pred)[np.asarray(batch.graph_mask)]
    np.testing.assert_allclose(got, np.atleast_1d(pred_ref.numpy()),
                               rtol=5e-4, atol=5e-5, err_msg=name)

    from buckgnn_tpu.models.blocks import (
        MLP, MaskedBatchNorm, SAGEConv, encoder_widths,
    )

    assert len(caps) == L
    x_f = MLP(encoder_widths(H), name="node_encoder").apply(
        {"params": params["node_encoder"]}, batch.nodes)
    for i in range(L):
        x_prev = x_f
        x_f = SAGEConv(H, aggr=aggr, normalize=True).apply(
            {"params": params[f"sage_{i}"]},
            x_f, batch.senders, batch.receivers)
        x_f = MaskedBatchNorm().apply(
            {"params": params[f"bn_{i}"], "batch_stats": stats[f"bn_{i}"]},
            x_f, batch.node_mask, use_running_average=True)
        x_f = jax.nn.relu(x_f)
        if 0 < i < L - 1:
            x_f = x_f + x_prev
        np.testing.assert_allclose(
            np.asarray(x_f)[:g.n_node], caps[i].numpy(),
            rtol=2e-4, atol=2e-5, err_msg=f"{name} layer {i}")


def test_reference_graphsage_mlp(ref_mod):
    """GraphSage_MLP — the reference's quirk of reusing ONE BatchNorm
    module (self.batch_norms[i]) twice inside the layer must reproduce.

    The reference's constructor never creates sage_blocks_add/sage_mlps
    for model_name="GraphSage_MLP" (Models/BuckGNN.py:135-149 only fire
    for "GraphSage_addAggr"), so the variant crashes as shipped — one of
    the broken variants our framework made functional. Construct with
    "GraphSage_addAggr" (which builds the exact module set the MLP
    forward needs) and flip model_name so the reference's GraphSage_MLP
    forward branch (:472-492) executes verbatim."""
    g = _graph()
    batch = _batch([g])
    model = BuckGNN(num_node_features=g.x.shape[1], num_edge_features=5,
                    hidden_channels=H, num_layers=L, pooling_layer="mean",
                    dropout_rate=0.0, model_name="GraphSage_MLP")
    variables = _init_with_stats(model, batch,
                                 [f"bn_{i}" for i in range(L)])
    params = variables["params"]
    stats = variables["batch_stats"]

    ref = ref_mod.BuckGNN(
        num_node_features=g.x.shape[1], num_edge_features=5,
        hidden_channels=H, num_layers=L, pooling_layer="mean",
        prediction_type="buckling", dropout_rate=0.0,
        model_name="GraphSage_addAggr")
    with pytest.raises(AttributeError):
        # as shipped, the variant is unconstructable/broken
        broken = ref_mod.BuckGNN(
            num_node_features=g.x.shape[1], num_edge_features=5,
            hidden_channels=H, num_layers=L, pooling_layer="mean",
            prediction_type="buckling", dropout_rate=0.0,
            model_name="GraphSage_MLP")
        broken.double()(*_torch_inputs([g]))
    ref.model_name = "GraphSage_MLP"
    sd = {}
    _fill_mlp(sd, params, "node_encoder", "node_encoder", 2)
    _fill_mlp(sd, params, "decoder", "decoder", 2)
    for i in range(L):
        _fill_sage(sd, params, f"sage_blocks_add.{i}", f"sage_{i}")
        _fill_bn(sd, params, stats, f"batch_norms.{i}", f"bn_{i}")
        _fill_linear(sd, params, f"sage_mlps.{i}", f"mlp_{i}")
    _load(ref, sd)

    x, ei, ea, bid = _torch_inputs([g])
    with torch.no_grad():
        pred_ref, _ = ref(x, ei, ea, bid)
    pred, _ = model.apply(variables, batch, deterministic=True)
    got = np.asarray(pred)[np.asarray(batch.graph_mask)]
    np.testing.assert_allclose(got, np.atleast_1d(pred_ref.numpy()),
                               rtol=5e-4, atol=5e-5)


@pytest.mark.parametrize("name", ["EA_GNN", "EA_GNN_Shared"])
def test_reference_ea_gnn(ref_mod, name):
    """Edge-augmented GraphNetBlock stacks: per-layer node AND edge
    activations captured from the reference's dropout calls (x first,
    edge_attr second, Models/BuckGNN.py:335-336 / :386-387)."""
    g = _graph()
    batch = _batch([g])
    model = BuckGNN(num_node_features=g.x.shape[1], num_edge_features=5,
                    hidden_channels=H, num_layers=L, pooling_layer="mean",
                    dropout_rate=0.0, model_name=name)
    variables = _init_with_stats(model, batch, [])
    params = variables["params"]

    ref = ref_mod.BuckGNN(
        num_node_features=g.x.shape[1], num_edge_features=5,
        hidden_channels=H, num_layers=L, pooling_layer="mean",
        prediction_type="buckling", dropout_rate=0.0, model_name=name)
    sd = {}
    _fill_mlp(sd, params, "node_encoder", "node_encoder", 2)
    _fill_mlp(sd, params, "edge_encoder", "edge_encoder", 2)
    _fill_mlp(sd, params, "decoder", "decoder", 2)
    if name == "EA_GNN_Shared":
        _fill_gn_block(sd, params, "shared_gn_block", "shared_gn_block")
    else:
        for i in range(L):
            _fill_gn_block(sd, params, f"gn_blocks.{i}", f"gn_block_{i}")
    _load(ref, sd)
    caps = _hook_dropout(ref)

    x, ei, ea, bid = _torch_inputs([g])
    with torch.no_grad():
        pred_ref, _ = ref(x, ei, ea, bid)
    pred, _ = model.apply(variables, batch, deterministic=True)
    got = np.asarray(pred)[np.asarray(batch.graph_mask)]
    np.testing.assert_allclose(got, np.atleast_1d(pred_ref.numpy()),
                               rtol=1e-3, atol=5e-5, err_msg=name)

    # per-layer: even captures are x, odd are edge_attr. pack_graphs sorts
    # edges by receiver — map graph order -> batch order via the unique
    # directed pairs.
    from buckgnn_tpu.models.blocks import MLP, GraphNetBlock, encoder_widths

    assert len(caps) == 2 * L
    bs, br = np.asarray(batch.senders), np.asarray(batch.receivers)
    em = np.asarray(batch.edge_mask)
    lookup = {(int(a), int(b)): int(k)
              for k, (a, b) in enumerate(zip(bs, br)) if em[k]}
    perm = np.array([lookup[(int(a), int(b))] for a, b in
                     zip(np.asarray(g.senders), np.asarray(g.receivers))])
    assert len(set(perm)) == g.n_edge

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
            x_f, e_f, batch.senders, batch.receivers)
        if 0 < i < L - 1:
            x_f = x_f + x_prev
            e_f = e_f + e_prev
        np.testing.assert_allclose(
            np.asarray(x_f)[:g.n_node], caps[2 * i].numpy(),
            rtol=1e-3, atol=2e-5, err_msg=f"{name} x layer {i}")
        np.testing.assert_allclose(
            np.asarray(e_f)[perm], caps[2 * i + 1].numpy(),
            rtol=1e-3, atol=2e-5, err_msg=f"{name} edge layer {i}")


def test_reference_graphsage_sag(ref_mod):
    """GraphSAGE_SAG: the reference's SAGPooling (shim: per-graph
    top-ceil(ratio*n) by SAGE score, x *= tanh(score), filtered edges)
    vs the flax static-shape SAG — kept sets and final prediction."""
    g = _graph()
    batch = _batch([g])
    model = BuckGNN(num_node_features=g.x.shape[1], num_edge_features=5,
                    hidden_channels=H, num_layers=4, pooling_layer="mean",
                    dropout_rate=0.0, model_name="GraphSAGE_SAG",
                    sag_ratio=0.5)
    scopes = [f"bn1_{i}" for i in range(2)] + [f"bn2_{i}" for i in range(2)]
    variables = _init_with_stats(model, batch, scopes)
    params = variables["params"]
    stats = variables["batch_stats"]

    ref = ref_mod.BuckGNN(
        num_node_features=g.x.shape[1], num_edge_features=5,
        hidden_channels=H, num_layers=4, pooling_layer="mean",
        prediction_type="buckling", dropout_rate=0.0,
        model_name="GraphSAGE_SAG")
    sd = {}
    _fill_mlp(sd, params, "node_encoder", "node_encoder", 2)
    _fill_mlp(sd, params, "decoder", "decoder", 2)
    for i in range(2):
        _fill_sage(sd, params, f"sage_layers_1.{i}", f"sage1_{i}")
        _fill_bn(sd, params, stats, f"batch_norms_1.{i}", f"bn1_{i}")
        _fill_sage(sd, params, f"sage_layers_2.{i}", f"sage2_{i}")
        _fill_bn(sd, params, stats, f"batch_norms_2.{i}", f"bn2_{i}")
    _fill_sage(sd, params, "pool.gnn", "sag_score")
    _load(ref, sd)

    x, ei, ea, bid = _torch_inputs([g])
    with torch.no_grad():
        pred_ref, _ = ref(x, ei, ea, bid)
    pred, aux = model.apply(variables, batch, deterministic=True)
    got = np.asarray(pred)[np.asarray(batch.graph_mask)]
    np.testing.assert_allclose(got, np.atleast_1d(pred_ref.numpy()),
                               rtol=1e-3, atol=5e-5)

    # kept sets must agree (reference SAGPooling perm vs flax node_keep)
    hooked = {}
    ref.pool.register_forward_hook(
        lambda m, i, o: hooked.update(perm=o[4].detach().numpy()))
    with torch.no_grad():
        ref(x, ei, ea, bid)
    keep_ref = np.zeros(g.n_node, bool)
    keep_ref[hooked["perm"]] = True
    keep_flax = np.asarray(aux["node_keep"])[:g.n_node]
    assert (keep_flax == keep_ref).all()


def test_reference_static_disp_head(ref_mod):
    """Node-level head: static_disp predictions for real nodes with the
    supernode excluded (Models/BuckGNN.py:518-521)."""
    g = _graph(supernode=True)
    batch = _batch([g])
    model = BuckGNN(num_node_features=g.x.shape[1], num_edge_features=5,
                    hidden_channels=H, num_layers=2,
                    pooling_layer="supernode_with_pooling",
                    prediction_type="static_disp", dropout_rate=0.0,
                    model_name="GraphSage_addAggr_Shared")
    variables = _init_with_stats(model, batch, [])
    params = variables["params"]

    ref = ref_mod.BuckGNN(
        num_node_features=g.x.shape[1], num_edge_features=5,
        hidden_channels=H, num_layers=2,
        pooling_layer="supernode_with_pooling",
        prediction_type="static_disp", dropout_rate=0.0,
        model_name="GraphSage_addAggr_Shared")
    sd = {}
    _fill_mlp(sd, params, "node_encoder", "node_encoder", 2)
    _fill_mlp(sd, params, "decoder", "decoder", 2)
    _fill_sage(sd, params, "shared_graphsage_block", "shared_graphsage_block")
    _load(ref, sd)

    x, ei, ea, bid = _torch_inputs([g])
    with torch.no_grad():
        pred_ref, _ = ref(x, ei, ea, bid)
    # reference predicts only for real (non-super) nodes, in node order;
    # the supernode is the LAST node of the graph
    assert pred_ref.shape == (g.n_node - 1, 2)
    pred, _ = model.apply(variables, batch, deterministic=True)
    np.testing.assert_allclose(np.asarray(pred)[:g.n_node - 1],
                               pred_ref.numpy(), rtol=5e-4, atol=5e-5)
