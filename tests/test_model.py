"""BuckGNN model family: shapes, variants, padding-invariance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from buckgnn_tpu.graph.batch import capacity_for, pack_graphs
from buckgnn_tpu.models.buckgnn import BuckGNN
from tests.conftest import make_random_graph

ALL_VARIANTS = [
    "GraphSage_addAggr_Shared",
    "GraphSage_sumAggr",
    "GraphSage_addAggr",
    "GraphSage_meanAggr",
    "GraphSage_maxAggr",
    "GraphSage_sumAggr_woBatchNorm",
    "GraphSage_addAggr_woBatchNorm",
    "GraphSage_MLP",
    "EA_GNN",
    "EA_GNN_Shared",
    "GraphSAGE_SAG",
    "EAGNN_SAG",
]


def _batch(rng, supernode=False, sizes=(6, 9)):
    graphs = [make_random_graph(rng, n, supernode=supernode) for n in sizes]
    n_cap, e_cap, g_cap = capacity_for(graphs)
    return pack_graphs(graphs, n_cap, e_cap, g_cap), graphs


def _init_apply(model, batch, deterministic=True):
    variables = model.init(jax.random.key(0), batch, deterministic=True)
    if deterministic:
        out = model.apply(variables, batch, deterministic=True)
    else:
        out, _ = model.apply(
            variables, batch, deterministic=False, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(1)},
        )
    return variables, out


@pytest.mark.parametrize("variant", ALL_VARIANTS)
def test_variant_forward_shapes(rng, variant):
    batch, _ = _batch(rng)
    model = BuckGNN(
        num_node_features=15, num_edge_features=5, hidden_channels=32,
        num_layers=4, model_name=variant,
    )
    _, (pred, aux) = _init_apply(model, batch)
    assert pred.shape == (batch.n_graph_cap,)
    assert np.all(np.isfinite(np.asarray(pred)))


@pytest.mark.parametrize(
    "pooling", ["mean", "mean_no_super", "mlp", "mlp_no_super",
                "supernode_only", "supernode_with_pooling", "hybrid"]
)
def test_poolings(rng, pooling):
    batch, _ = _batch(rng, supernode="super" in pooling or "no_super" in pooling)
    model = BuckGNN(
        num_node_features=16, num_edge_features=5, hidden_channels=32,
        num_layers=3, pooling_layer=pooling,
    )
    _, (pred, aux) = _init_apply(model, batch)
    assert pred.shape == (batch.n_graph_cap,)
    assert np.all(np.isfinite(np.asarray(pred)))


@pytest.mark.parametrize("ptype,out", [("static_disp", 2), ("static_stress", 3),
                                       ("mode_shape", 3)])
def test_node_level_heads(rng, ptype, out):
    batch, _ = _batch(rng)
    model = BuckGNN(
        num_node_features=15, num_edge_features=5, hidden_channels=32,
        num_layers=3, prediction_type=ptype,
    )
    _, (pred, aux) = _init_apply(model, batch)
    assert pred.shape == (batch.n_node_cap, out)


def test_padding_invariance(rng):
    """Predictions for real graphs must not depend on padding capacity."""
    graphs = [make_random_graph(rng, n) for n in (6, 9)]
    n_cap, e_cap, g_cap = capacity_for(graphs)
    small = pack_graphs(graphs, n_cap, e_cap, g_cap)
    big = pack_graphs(graphs, n_cap + 64, e_cap + 256, g_cap + 5)
    model = BuckGNN(
        num_node_features=15, num_edge_features=5, hidden_channels=32,
        num_layers=4,
    )
    variables = model.init(jax.random.key(0), small, deterministic=True)
    p_small, _ = model.apply(variables, small, deterministic=True)
    p_big, _ = model.apply(variables, big, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(p_small)[:2], np.asarray(p_big)[:2], rtol=2e-5, atol=2e-6
    )


def test_padding_invariance_batchnorm(rng):
    """Masked BN: training-mode stats must ignore pad rows."""
    graphs = [make_random_graph(rng, n) for n in (6, 9)]
    n_cap, e_cap, g_cap = capacity_for(graphs)
    small = pack_graphs(graphs, n_cap, e_cap, g_cap)
    big = pack_graphs(graphs, n_cap + 64, e_cap + 256, g_cap + 5)
    model = BuckGNN(
        num_node_features=15, num_edge_features=5, hidden_channels=32,
        num_layers=3, model_name="GraphSage_addAggr", dropout_rate=0.0,
    )
    variables = model.init(jax.random.key(0), small, deterministic=True)
    (p_small, _), _ = model.apply(
        variables, small, deterministic=False, mutable=["batch_stats"],
        rngs={"dropout": jax.random.key(1)},
    )
    (p_big, _), _ = model.apply(
        variables, big, deterministic=False, mutable=["batch_stats"],
        rngs={"dropout": jax.random.key(1)},
    )
    np.testing.assert_allclose(
        np.asarray(p_small)[:2], np.asarray(p_big)[:2], rtol=2e-5, atol=2e-6
    )


def test_permutation_invariance_graph_order(rng):
    """Packing graphs in a different order permutes predictions consistently."""
    graphs = [make_random_graph(rng, n) for n in (5, 8, 11)]
    n_cap, e_cap, g_cap = capacity_for(graphs)
    b1 = pack_graphs(graphs, n_cap, e_cap, g_cap)
    b2 = pack_graphs(graphs[::-1], n_cap, e_cap, g_cap)
    model = BuckGNN(num_node_features=15, num_edge_features=5,
                    hidden_channels=32, num_layers=4)
    variables = model.init(jax.random.key(0), b1, deterministic=True)
    p1, _ = model.apply(variables, b1, deterministic=True)
    p2, _ = model.apply(variables, b2, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(p1)[:3], np.asarray(p2)[:3][::-1], rtol=2e-5, atol=2e-6
    )


def test_supernode_pooling_excludes_super(rng):
    batch, graphs = _batch(rng, supernode=True)
    model = BuckGNN(
        num_node_features=15, num_edge_features=5, hidden_channels=32,
        num_layers=2, pooling_layer="supernode_with_pooling",
    )
    variables = model.init(jax.random.key(0), batch, deterministic=True)
    pred, aux = model.apply(variables, batch, deterministic=True)
    # supernodes flagged not-real
    mask = np.asarray(aux["real_node_mask"])
    assert not mask[graphs[0].n_node - 1]
    assert not mask[graphs[0].n_node + graphs[1].n_node - 1]
    assert mask[: graphs[0].n_node - 1].all()


def test_remat_matches_plain(rng):
    """nn.remat changes memory, not math: identical outputs and grads."""
    import jax
    import jax.numpy as jnp
    from buckgnn_tpu.graph.batch import pack_graphs
    from tests.conftest import make_random_graph

    graphs = [make_random_graph(rng, n_nodes=10 + i) for i in range(3)]
    batch = pack_graphs(graphs, 64, 256, 4)
    kwargs = dict(num_node_features=graphs[0].x.shape[1],
                  num_edge_features=graphs[0].edge_attr.shape[1],
                  hidden_channels=16, num_layers=3, dropout_rate=0.0)
    m0 = BuckGNN(remat=False, **kwargs)
    m1 = BuckGNN(remat=True, **kwargs)
    v = m0.init(jax.random.key(0), batch, deterministic=True)

    def loss(m, v):
        pred, _ = m.apply(v, batch, deterministic=True)
        return jnp.sum(pred * jnp.asarray(batch.graph_mask, pred.dtype))

    np.testing.assert_allclose(float(loss(m0, v)), float(loss(m1, v)),
                               rtol=1e-6)
    g0 = jax.grad(lambda v: loss(m0, v))(v)
    g1 = jax.grad(lambda v: loss(m1, v))(v)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
