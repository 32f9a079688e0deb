"""Windowed dense EA_GNN (ops/ea_windowed.py) == the XLA gather/scatter
path: forward and gradients, including out-of-band (far) senders from
long-range virtual edges."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from buckgnn_tpu.graph.batch import pack_graphs
from buckgnn_tpu.graph.synthetic import generate_dataset
from buckgnn_tpu.models import BuckGNN

TILE, WIDTH = 128, 64


def _packed(n_graphs=4, seed=0, supernode=False):
    ds = generate_dataset(
        n_graphs, seed=seed, min_side=6, max_side=9,
        use_super_node=supernode, use_virtual_edges=True,
    )
    n = sum(g.n_node for g in ds) + 1
    ncap = ((max(n, TILE + WIDTH) + TILE - 1) // TILE) * TILE
    ecap = ((sum(g.n_edge for g in ds) + 127) // 128) * 128
    return pack_graphs(ds, ncap, ecap, n_graphs + 1,
                       band_width=WIDTH, band_tile=TILE), ds


def test_windows_cover_all_edges():
    batch, _ = _packed()
    assert batch.win_edges is not None
    sidx = np.asarray(batch.win_sidx)
    ridx = np.asarray(batch.win_ridx)
    slab = TILE + WIDTH
    n_real = int(np.asarray(batch.edge_mask).sum())
    # every real edge appears exactly once: in-band entries + far entries
    n_inband = int((sidx < slab).sum())
    far_send = np.asarray(batch.win_far_send)
    n_far = int((far_send != batch.dead_node_index).sum())
    assert n_inband + n_far == n_real
    # far entries occupy window slots with sentinel sidx but REAL ridx
    assert int((ridx < TILE).sum()) == n_real


@pytest.mark.parametrize("name", ["EA_GNN", "EA_GNN_Shared"])
def test_windowed_matches_xla(rng, name):
    batch, ds = _packed(seed=2)
    kwargs = dict(
        num_node_features=ds[0].x.shape[1], num_edge_features=5,
        hidden_channels=32, num_layers=3, pooling_layer="mean",
        dropout_rate=0.0, model_name=name,
    )
    m_ref = BuckGNN(impl="xla", **kwargs)
    m_win = BuckGNN(impl="banded_pallas", **kwargs)
    variables = m_ref.init(jax.random.key(0), batch, deterministic=True)
    p_ref, _ = m_ref.apply(variables, batch, deterministic=True)
    p_win, _ = m_win.apply(variables, batch, deterministic=True)
    gm = np.asarray(batch.graph_mask)
    np.testing.assert_allclose(
        np.asarray(p_ref)[gm], np.asarray(p_win)[gm], rtol=2e-4, atol=2e-5
    )


def test_windowed_grads_match_xla(rng):
    batch, ds = _packed(seed=3)
    kwargs = dict(
        num_node_features=ds[0].x.shape[1], num_edge_features=5,
        hidden_channels=32, num_layers=2, pooling_layer="mean",
        dropout_rate=0.0, model_name="EA_GNN_Shared",
    )
    m_ref = BuckGNN(impl="xla", **kwargs)
    m_win = BuckGNN(impl="banded_pallas", **kwargs)
    variables = m_ref.init(jax.random.key(0), batch, deterministic=True)

    def loss(model, v):
        pred, _ = model.apply(v, batch, deterministic=True)
        return jnp.sum(pred * jnp.asarray(batch.graph_mask, pred.dtype))

    g_ref = jax.grad(lambda v: loss(m_ref, v))(variables)
    g_win = jax.grad(lambda v: loss(m_win, v))(variables)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_win)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_windowed_with_remat_grads(rng):
    """h >= 256 turns block remat on by default: nn.remat(GraphNetBlock)
    must trace through the windowed args (arrays in the `windows` tuple,
    static geometry as a module attribute) and reproduce the non-remat
    gradients exactly."""
    batch, ds = _packed(seed=5)
    kwargs = dict(
        num_node_features=ds[0].x.shape[1], num_edge_features=5,
        hidden_channels=256, num_layers=2, pooling_layer="mean",
        dropout_rate=0.0, model_name="EA_GNN_Shared",
        impl="banded_pallas",
    )
    m_remat = BuckGNN(remat=None, **kwargs)   # auto-on at h=256
    m_plain = BuckGNN(remat=False, **kwargs)
    variables = m_plain.init(jax.random.key(0), batch, deterministic=True)

    def loss(model, v):
        pred, _ = model.apply(v, batch, deterministic=True)
        return jnp.sum(pred * jnp.asarray(batch.graph_mask, pred.dtype))

    g_r = jax.grad(lambda v: loss(m_remat, v))(variables)
    g_p = jax.grad(lambda v: loss(m_plain, v))(variables)
    for a, b in zip(jax.tree.leaves(g_r), jax.tree.leaves(g_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
