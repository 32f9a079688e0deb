"""Banded SAGE aggregation == gather/scatter aggregation, exactly."""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from buckgnn_tpu.graph.batch import pack_graphs
from buckgnn_tpu.graph.normalizer import normalize_dataset
from buckgnn_tpu.graph.synthetic import generate_dataset
from buckgnn_tpu.models.buckgnn import BuckGNN
from buckgnn_tpu.ops.banded import banded_sage_aggregate, make_agg_context
from buckgnn_tpu.ops.sage import sage_aggregate


def _packed(supernode=False, n_graphs=4, seed=0, band_width=128, tile=256):
    ds = generate_dataset(
        n_graphs, seed=seed, min_side=5, max_side=9,
        use_super_node=supernode, use_virtual_edges=not supernode,
    )
    n = sum(g.n_node for g in ds) + 1
    ncap = ((max(n, tile + band_width) + tile - 1) // tile) * tile
    ecap = ((sum(g.n_edge for g in ds) + 127) // 128) * 128
    return pack_graphs(ds, ncap, ecap, n_graphs + 1,
                       band_width=band_width, band_tile=tile), ds


@pytest.mark.parametrize("supernode", [False, True])
@pytest.mark.parametrize("aggr", ["add", "mean"])
def test_banded_matches_gather(rng, supernode, aggr):
    batch, _ = _packed(supernode=supernode)
    x = jnp.asarray(
        rng.normal(size=(batch.n_node_cap, 32)).astype(np.float32)
    )
    # zero the dead row like the real pipeline (pad features are zero)
    x = x.at[batch.dead_node_index].set(0.0)
    ctx = make_agg_context(batch)
    got = banded_sage_aggregate(x, ctx, aggr=aggr)
    want = sage_aggregate(x, batch.senders, batch.receivers,
                          batch.n_node_cap, aggr=aggr)
    mask = np.asarray(batch.node_mask)
    np.testing.assert_allclose(
        np.asarray(got)[mask], np.asarray(want)[mask], rtol=1e-5, atol=1e-5
    )


def test_supernode_star_detected():
    batch, _ = _packed(supernode=True)
    assert batch.has_supernode_edges
    # star edges must be excluded from band+spill
    n_star = int(
        np.sum(np.asarray(batch.n_real_node)[:-1] - 1) * 2
    )
    n_all = int(np.sum(np.asarray(batch.edge_mask)))
    n_band = int(np.sum(np.asarray(batch.band_receivers) != batch.dead_node_index))
    n_spill = int(np.sum(np.asarray(batch.spill_receivers) != batch.dead_node_index))
    assert n_band + n_spill == n_all - n_star


def test_band_covers_most_mesh_edges():
    batch, _ = _packed(supernode=False)
    n_band = int(np.sum(np.asarray(batch.band_receivers) != batch.dead_node_index))
    n_spill = int(np.sum(np.asarray(batch.spill_receivers) != batch.dead_node_index))
    # virtual edges are ~13% plus rare out-of-band mesh edges
    assert n_band / (n_band + n_spill) > 0.75


def test_model_banded_impl_matches_xla(rng):
    batch, ds = _packed(supernode=True)
    kwargs = dict(
        num_node_features=ds[0].x.shape[1], num_edge_features=5,
        hidden_channels=32, num_layers=4,
        pooling_layer="supernode_with_pooling",
    )
    m_ref = BuckGNN(impl="xla", **kwargs)
    m_band = BuckGNN(impl="banded", **kwargs)
    variables = m_ref.init(jax.random.key(0), batch, deterministic=True)
    p_ref, _ = m_ref.apply(variables, batch, deterministic=True)
    p_band, _ = m_band.apply(variables, batch, deterministic=True)
    gm = np.asarray(batch.graph_mask)
    np.testing.assert_allclose(
        np.asarray(p_ref)[gm], np.asarray(p_band)[gm], rtol=2e-4, atol=2e-5
    )


def test_model_without_band_data_falls_back(rng):
    # impl='banded' but batch packed without band data -> gather path
    ds = generate_dataset(2, seed=3, min_side=4, max_side=5)
    from buckgnn_tpu.graph.batch import capacity_for

    ncap, ecap, gcap = capacity_for(ds)
    batch = pack_graphs(ds, ncap, ecap, gcap)
    model = BuckGNN(num_node_features=15, num_edge_features=5,
                    hidden_channels=16, num_layers=2, impl="banded")
    v = model.init(jax.random.key(0), batch, deterministic=True)
    pred, _ = model.apply(v, batch, deterministic=True)
    assert np.isfinite(np.asarray(pred)).all()


def test_pallas_kernel_matches_xla_interpret(rng):
    """Pallas banded matmul (interpret mode on CPU) == XLA slab einsum."""
    import jax.numpy as jnp
    from buckgnn_tpu.ops.pallas_banded import pallas_banded_matmul

    tile, width, h = 128, 64, 32
    n = 4 * tile
    slab = tile + width
    band = (rng.random((4, tile, slab)) < 0.02).astype(np.float32)
    x = rng.normal(size=(n, h)).astype(np.float32)
    got = np.asarray(pallas_banded_matmul(
        jnp.asarray(band), jnp.asarray(x), tile, width, interpret=True))
    starts = np.clip(np.arange(4) * tile - width // 2, 0, n - slab)
    want = np.stack([band[t] @ x[starts[t]:starts[t]+slab] for t in range(4)])
    np.testing.assert_allclose(got, want.reshape(n, h), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("supernode", [False, True])
def test_banded_pallas_model_matches_xla(rng, supernode):
    batch, ds = _packed(supernode=supernode)
    kwargs = dict(
        num_node_features=ds[0].x.shape[1], num_edge_features=5,
        hidden_channels=32, num_layers=3,
        pooling_layer="supernode_with_pooling" if supernode else "mean",
    )
    m_ref = BuckGNN(impl="xla", **kwargs)
    m_pal = BuckGNN(impl="banded_pallas", **kwargs)
    variables = m_ref.init(jax.random.key(0), batch, deterministic=True)
    p_ref, _ = m_ref.apply(variables, batch, deterministic=True)
    p_pal, _ = m_pal.apply(variables, batch, deterministic=True)
    gm = np.asarray(batch.graph_mask)
    np.testing.assert_allclose(
        np.asarray(p_ref)[gm], np.asarray(p_pal)[gm], rtol=2e-4, atol=2e-5
    )


@pytest.mark.parametrize("impl", ["banded", "banded_pallas"])
def test_banded_gradients_match_xla(rng, impl):
    """Symmetry-based custom VJP == autodiff through the gather path."""
    import jax.numpy as jnp

    batch, ds = _packed(supernode=True)
    kwargs = dict(
        num_node_features=ds[0].x.shape[1], num_edge_features=5,
        hidden_channels=16, num_layers=2,
        pooling_layer="supernode_with_pooling", dropout_rate=0.0,
    )
    m_ref = BuckGNN(impl="xla", **kwargs)
    m_band = BuckGNN(impl=impl, **kwargs)
    variables = m_ref.init(jax.random.key(0), batch, deterministic=True)

    def loss(model, v):
        pred, _ = model.apply(v, batch, deterministic=True)
        return jnp.sum(pred * jnp.asarray(batch.graph_mask, pred.dtype))

    g_ref = jax.grad(lambda v: loss(m_ref, v))(variables)
    g_band = jax.grad(lambda v: loss(m_band, v))(variables)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_band)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
        )


def test_analytic_supernode_optout_matches(rng):
    """analytic_supernode=False routes star edges through band/spill —
    same results as the analytic path."""
    import jax.numpy as jnp
    from buckgnn_tpu.graph.batch import batch_iterator, suggest_capacities
    from buckgnn_tpu.graph.normalizer import normalize_dataset
    from buckgnn_tpu.graph.synthetic import generate_dataset
    from buckgnn_tpu.ops.banded import banded_sage_aggregate, make_agg_context

    ds = generate_dataset(3, seed=9, min_side=4, max_side=6,
                          use_super_node=True, use_virtual_edges=False)
    normed, _ = normalize_dataset(ds)
    ncap, ecap = suggest_capacities(normed, 3, slack=1.3)
    ncap = ((max(ncap, 96) + 63) // 64) * 64
    kw = dict(band_width=32, band_tile=64)
    b_an = next(iter(batch_iterator(normed, 3, ncap, ecap, **kw)))
    b_no = next(iter(batch_iterator(normed, 3, ncap, ecap,
                                    analytic_supernode=False, **kw)))
    assert b_an.has_supernode_edges and not b_no.has_supernode_edges
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(ncap, 16)).astype(np.float32))
    a = banded_sage_aggregate(x, make_agg_context(b_an))
    c = banded_sage_aggregate(x, make_agg_context(b_no))
    # dead-row padding self-loop counts differ between layouts; only real
    # rows are meaningful
    nm = np.asarray(b_an.node_mask)
    np.testing.assert_allclose(np.asarray(a)[nm], np.asarray(c)[nm],
                               rtol=1e-4, atol=1e-4)


def test_fused_spill_with_tile_cap_overflow(rng):
    """A node receiving > SPILL_CHUNK-7 out-of-band edges overflows the
    per-tile window; the excess must land in spill2 and the Pallas path
    (interpret mode) must still equal the gather aggregation exactly."""
    from buckgnn_tpu.graph.batch import SPILL_CHUNK, GraphData

    n = 700  # > tile + width so a far sender is out-of-band
    hub = 0
    far = rng.integers(450, 700, size=320)  # 320 > 249 cap, all spill to hub
    s_und = np.concatenate([far, np.arange(1, 640, 2)])
    r_und = np.concatenate([np.full(len(far), hub), np.arange(2, 641, 2)])
    senders = np.concatenate([s_und, r_und]).astype(np.int32)
    receivers = np.concatenate([r_und, s_und]).astype(np.int32)
    g = GraphData(
        x=rng.normal(size=(n, 128)).astype(np.float32),
        senders=senders, receivers=receivers,
        edge_attr=rng.normal(size=(len(senders), 5)).astype(np.float32),
        y=np.zeros((1,), np.float32),
    )
    batch = pack_graphs([g], 1024, ((len(senders) + 127) // 128) * 128, 2,
                        band_width=128, band_tile=256)
    n2 = int(np.sum(np.asarray(batch.spill2_receivers) != batch.dead_node_index))
    assert n2 > 0, "expected per-tile cap overflow into spill2"
    # per-tile main-spill counts respect the kernel window
    sr = np.asarray(batch.spill_receivers)
    real = sr != batch.dead_node_index
    cnt = np.bincount(sr[real] // 256, minlength=4)
    assert cnt.max() <= SPILL_CHUNK - 7

    x = jnp.asarray(rng.normal(size=(1024, 128)).astype(np.float32))
    x = x.at[batch.dead_node_index].set(0.0)
    ctx = make_agg_context(batch, use_pallas=True)
    got = banded_sage_aggregate(x, ctx, aggr="add")
    want = sage_aggregate(x, batch.senders, batch.receivers, 1024, aggr="add")
    mask = np.asarray(batch.node_mask)
    np.testing.assert_allclose(
        np.asarray(got)[mask], np.asarray(want)[mask], rtol=1e-4, atol=1e-4
    )
