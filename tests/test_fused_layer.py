"""Fused whole-layer SAGE kernel (ops/pallas_sage_layer.py) == the unfused
composition, in Pallas interpret mode on CPU.

The in-kernel dropout PRNG has no interpret path, so CPU coverage is the
rate==0 surface (conv + normalize + relu + skip, forward AND backward
incl. the weight grads); the dropout mask/stream identity is verified on
hardware by benchmarks/probe_fused_layer.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from buckgnn_tpu.graph.batch import pack_graphs
from buckgnn_tpu.graph.synthetic import generate_dataset
from buckgnn_tpu.models.blocks import l2_normalize
from buckgnn_tpu.models.buckgnn import BuckGNN
from buckgnn_tpu.ops.banded import banded_sage_aggregate, make_agg_context
from buckgnn_tpu.ops.pallas_sage_layer import (
    fused_sage_layer,
    supports_fused_layer,
)


def _packed(n_graphs=4, seed=0, band_width=128, tile=256,
            supernode=False, virtual=None):
    ds = generate_dataset(
        n_graphs, seed=seed, min_side=5, max_side=9,
        use_super_node=supernode,
        use_virtual_edges=not supernode if virtual is None else virtual,
    )
    n = sum(g.n_node for g in ds) + 1
    ncap = ((max(n, tile + band_width) + tile - 1) // tile) * tile
    ecap = ((sum(g.n_edge for g in ds) + 127) // 128) * 128
    return pack_graphs(ds, ncap, ecap, n_graphs + 1,
                       band_width=band_width, band_tile=tile), ds


def _composition(x, w_l, b_l, w_r, ctx, skip):
    agg = banded_sage_aggregate(x, ctx, aggr="add")
    out = agg @ w_l + b_l + x @ w_r
    y = l2_normalize(out)
    r = jax.nn.relu(y)
    return r + x if skip else r


@pytest.mark.parametrize("supernode", [False, True])
@pytest.mark.parametrize("skip", [False, True])
def test_fused_layer_forward_matches(rng, skip, supernode):
    batch, _ = _packed(supernode=supernode)
    ctx = make_agg_context(batch, use_pallas=True)
    h = 128
    x = jnp.asarray(rng.normal(size=(batch.n_node_cap, h)), jnp.float32)
    x = x.at[batch.dead_node_index].set(0.0)
    w_l = jnp.asarray(rng.normal(size=(h, h)) * 0.1, jnp.float32)
    b_l = jnp.asarray(rng.normal(size=(h,)) * 0.1, jnp.float32)
    w_r = jnp.asarray(rng.normal(size=(h, h)) * 0.1, jnp.float32)
    assert supports_fused_layer(ctx, x, "add", True)
    got = fused_sage_layer(x, w_l, b_l, w_r, ctx, skip=skip, rate=0.0,
                           seed=None, deterministic=True)
    want = _composition(x, w_l, b_l, w_r, ctx, skip)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("supernode", [False, True])
@pytest.mark.parametrize("skip", [False, True])
def test_fused_layer_grads_match(rng, skip, supernode):
    batch, _ = _packed(seed=3, supernode=supernode)
    ctx = make_agg_context(batch, use_pallas=True)
    h = 128
    x = jnp.asarray(rng.normal(size=(batch.n_node_cap, h)), jnp.float32)
    x = x.at[batch.dead_node_index].set(0.0)
    w_l = jnp.asarray(rng.normal(size=(h, h)) * 0.1, jnp.float32)
    b_l = jnp.asarray(rng.normal(size=(h,)) * 0.1, jnp.float32)
    w_r = jnp.asarray(rng.normal(size=(h, h)) * 0.1, jnp.float32)
    mask = jnp.asarray(batch.node_mask, jnp.float32)[:, None]
    probe = jnp.asarray(rng.normal(size=(batch.n_node_cap, h)), jnp.float32)

    def loss_fused(x, w_l, b_l, w_r):
        z = fused_sage_layer(x, w_l, b_l, w_r, ctx, skip=skip, rate=0.0,
                             seed=jnp.zeros((2,), jnp.int32),
                             deterministic=False)
        return jnp.sum(z * mask * probe)

    def loss_ref(x, w_l, b_l, w_r):
        z = _composition(x, w_l, b_l, w_r, ctx, skip)
        return jnp.sum(z * mask * probe)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, w_l, b_l, w_r)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, w_l, b_l, w_r)
    for a, b, name in zip(g_fused, g_ref, ["dx", "dw_l", "db_l", "dw_r"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"gradient mismatch: {name}",
        )


@pytest.mark.parametrize("supernode", [False, True])
def test_fused_layer_grads_match_many_tiles(rng, supernode):
    """Same as test_fused_layer_grads_match but on a 6+-tile batch so the
    merged backward's 2-tile unroll and the INTERIOR band branch (slab =
    [j-1 tail | j | j+1 head]) execute — the default batches pack into 2
    tiles, which only covers the edge branches and unroll=1."""
    batch, _ = _packed(n_graphs=10, seed=7, band_width=64, tile=128,
                       supernode=supernode)
    n_tiles = batch.n_node_cap // batch.band_tile
    assert n_tiles >= 4 and n_tiles % 2 == 0, n_tiles
    ctx = make_agg_context(batch, use_pallas=True)
    h = 128
    x = jnp.asarray(rng.normal(size=(batch.n_node_cap, h)), jnp.float32)
    x = x.at[batch.dead_node_index].set(0.0)
    w_l = jnp.asarray(rng.normal(size=(h, h)) * 0.1, jnp.float32)
    b_l = jnp.asarray(rng.normal(size=(h,)) * 0.1, jnp.float32)
    w_r = jnp.asarray(rng.normal(size=(h, h)) * 0.1, jnp.float32)
    mask = jnp.asarray(batch.node_mask, jnp.float32)[:, None]
    probe = jnp.asarray(rng.normal(size=(batch.n_node_cap, h)), jnp.float32)

    def loss_fused(x, w_l, b_l, w_r):
        z = fused_sage_layer(x, w_l, b_l, w_r, ctx, skip=True, rate=0.0,
                             seed=jnp.zeros((2,), jnp.int32),
                             deterministic=False)
        return jnp.sum(z * mask * probe)

    def loss_ref(x, w_l, b_l, w_r):
        z = _composition(x, w_l, b_l, w_r, ctx, skip=True)
        return jnp.sum(z * mask * probe)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, w_l, b_l, w_r)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, w_l, b_l, w_r)
    for a, b, name in zip(g_fused, g_ref, ["dx", "dw_l", "db_l", "dw_r"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"gradient mismatch: {name}",
        )


def test_threaded_star_chain_grads_match(rng):
    """A 3-layer chain with star threading (star_source + star_in /
    star_next: the merged backward defers each layer's supernode-star
    correction into its neighbor's kernel) == the unfused composition,
    forward AND backward."""
    batch, _ = _packed(seed=5, supernode=True)
    assert batch.has_supernode_edges and not batch.has_spill_edges
    ctx = make_agg_context(batch, use_pallas=True)
    h = 128
    x = jnp.asarray(rng.normal(size=(batch.n_node_cap, h)), jnp.float32)
    x = x.at[batch.dead_node_index].set(0.0)
    ws = [
        tuple(
            jnp.asarray(rng.normal(size=s) * 0.1, jnp.float32)
            for s in ((h, h), (h,), (h, h))
        )
        for _ in range(3)
    ]
    mask = jnp.asarray(batch.node_mask, jnp.float32)[:, None]
    probe = jnp.asarray(rng.normal(size=(batch.n_node_cap, h)), jnp.float32)

    from buckgnn_tpu.ops.pallas_sage_layer import star_source

    def loss_fused(x, ws):
        z, star = star_source(x, ctx)
        table = None
        for i, (w_l, b_l, w_r) in enumerate(ws):
            z, star, table = fused_sage_layer(
                z, w_l, b_l, w_r, ctx, skip=i == 1, rate=0.0,
                seed=jnp.zeros((2,), jnp.int32), deterministic=False,
                star_in=star, star_next=i < 2,
                table_in=table, emit_table=i < 2,
            )
        return jnp.sum(z * mask * probe)

    def loss_ref(x, ws):
        z = x
        for i, (w_l, b_l, w_r) in enumerate(ws):
            z = _composition(z, w_l, b_l, w_r, ctx, skip=i == 1)
        return jnp.sum(z * mask * probe)

    assert np.allclose(loss_fused(x, ws), loss_ref(x, ws), rtol=1e-4)
    g_fused = jax.grad(loss_fused, argnums=(0, 1))(x, ws)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(x, ws)
    for a, b in zip(jax.tree.leaves(g_fused), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("supernode", [False, True])
def test_model_fused_path_matches_xla(rng, supernode):
    """End-to-end: the flagship model with the fused layer engaged (eval,
    banded_pallas) == the plain XLA implementation."""
    batch, ds = _packed(seed=1, supernode=supernode)
    kwargs = dict(
        num_node_features=ds[0].x.shape[1], num_edge_features=5,
        hidden_channels=128, num_layers=3,
        pooling_layer="supernode_with_pooling" if supernode else "mean",
    )
    m_ref = BuckGNN(impl="xla", **kwargs)
    m_fused = BuckGNN(impl="banded_pallas", **kwargs)
    variables = m_ref.init(jax.random.key(0), batch, deterministic=True)
    p_ref, _ = m_ref.apply(variables, batch, deterministic=True)
    p_fused, _ = m_fused.apply(variables, batch, deterministic=True)
    gm = np.asarray(batch.graph_mask)
    np.testing.assert_allclose(
        np.asarray(p_ref)[gm], np.asarray(p_fused)[gm], rtol=2e-4, atol=2e-5
    )


def test_model_fused_grads_supernode_with_spill(rng):
    """Supernode batch WITH out-of-band (spill) edges: star threading is
    off and the SPLIT backward applies its own star inside the band
    kernel — this combination has no other model-level coverage."""
    # scramble node order so some mesh edges exceed the band width (the
    # generator's locality keeps everything in-band otherwise)
    import dataclasses as dc

    ds = generate_dataset(3, seed=9, min_side=8, max_side=11,
                          use_super_node=True, use_virtual_edges=False)
    rng_p = np.random.default_rng(1)
    scrambled = []
    for g in ds:
        perm = rng_p.permutation(g.n_node)
        inv = np.empty_like(perm)
        inv[perm] = np.arange(g.n_node)
        scrambled.append(dc.replace(
            g, x=g.x[perm], senders=inv[g.senders].astype(np.int32),
            receivers=inv[g.receivers].astype(np.int32),
            supernode=int(inv[g.supernode]),
        ))
    ds = scrambled
    tile, width = 128, 64
    n = sum(g.n_node for g in ds) + 1
    ncap = ((max(n, tile + width) + tile - 1) // tile) * tile
    ecap = ((sum(g.n_edge for g in ds) + 127) // 128) * 128
    batch = pack_graphs(ds, ncap, ecap, 4, band_width=width,
                        band_tile=tile)
    assert batch.has_supernode_edges and batch.has_spill_edges
    kwargs = dict(
        num_node_features=ds[0].x.shape[1], num_edge_features=5,
        hidden_channels=128, num_layers=3,
        pooling_layer="supernode_with_pooling", dropout_rate=0.0,
    )
    m_ref = BuckGNN(impl="xla", **kwargs)
    m_fused = BuckGNN(impl="banded_pallas", **kwargs)
    variables = m_ref.init(jax.random.key(0), batch, deterministic=True)

    def loss(model, v):
        pred, _ = model.apply(v, batch, deterministic=True)
        return jnp.sum(pred * jnp.asarray(batch.graph_mask, pred.dtype))

    g_ref = jax.grad(lambda v: loss(m_ref, v))(variables)
    g_fused = jax.grad(lambda v: loss(m_fused, v))(variables)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("supernode", [False, True])
def test_model_fused_grads_match_xla(rng, supernode):
    batch, ds = _packed(seed=2, supernode=supernode)
    kwargs = dict(
        num_node_features=ds[0].x.shape[1], num_edge_features=5,
        hidden_channels=128, num_layers=3,
        pooling_layer="supernode_with_pooling" if supernode else "mean",
        dropout_rate=0.0,
    )
    m_ref = BuckGNN(impl="xla", **kwargs)
    m_fused = BuckGNN(impl="banded_pallas", **kwargs)
    variables = m_ref.init(jax.random.key(0), batch, deterministic=True)

    def loss(model, v):
        pred, _ = model.apply(v, batch, deterministic=False,
                              rngs={"dropout": jax.random.key(1)})
        return jnp.sum(pred * jnp.asarray(batch.graph_mask, pred.dtype))

    g_ref = jax.grad(lambda v: loss(m_ref, v))(variables)
    g_fused = jax.grad(lambda v: loss(m_fused, v))(variables)
    flat_r, tdef_r = jax.tree.flatten(g_ref)
    flat_f, tdef_f = jax.tree.flatten(g_fused)
    assert tdef_r == tdef_f, "param tree must be identical across impls"
    for a, b in zip(flat_r, flat_f):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4
        )


def test_local_star_window_matches_global(rng):
    """The per-tile local star-table window (batch.gwin/lcode/lacc; a
    [2*GW, H] slice + K=2*GW selection matmul) must be bit-identical to
    the full-table path through a threaded 2-layer chain — forward, dx
    and dW, including the deferred-star backward handoff. 24 graphs +
    4-tile cap alignment give >= 8 node tiles so the merged backward's
    4-tile unroll engages."""
    ds = generate_dataset(24, seed=4, min_side=5, max_side=9,
                          use_super_node=True, use_virtual_edges=False)
    nreal = sum(g.n_node for g in ds) + 1
    ncap = ((max(nreal, 256 + 128) + 1023) // 1024) * 1024
    ecap = ((sum(g.n_edge for g in ds) + 127) // 128) * 128
    batch = pack_graphs(ds, ncap, ecap, 25, band_width=128, band_tile=256)
    assert (batch.n_node_cap // 256) % 4 == 0
    assert batch.n_node_cap // 256 > 4
    assert batch.gwin is not None and not batch.has_spill_edges
    from buckgnn_tpu.ops.pallas_sage_layer import star_source

    ctx_l = make_agg_context(batch, band_dtype=jnp.bfloat16,
                             use_pallas=True)
    batch_g = batch.replace(gwin=None, lcode=None, lacc=None)
    ctx_g = make_agg_context(batch_g, band_dtype=jnp.bfloat16,
                             use_pallas=True)
    n, h = batch.n_node_cap, 128
    x = jnp.asarray(rng.normal(size=(n, h)) * 0.1, jnp.bfloat16)
    x = x.at[batch.dead_node_index].set(0.0)
    w_l = jnp.asarray(rng.normal(size=(h, h)) * 0.05, jnp.bfloat16)
    b_l = jnp.asarray(rng.normal(size=(h,)) * 0.05, jnp.bfloat16)
    w_r = jnp.asarray(rng.normal(size=(h, h)) * 0.05, jnp.bfloat16)
    probe = jnp.asarray(rng.normal(size=(n, h)), jnp.float32)

    def loss_fn(ctx):
        def f(xx, wl):
            xx2, star = star_source(xx, ctx)
            z, t_out, _ = fused_sage_layer(
                xx2, wl, b_l, w_r, ctx, skip=True, rate=0.0, seed=None,
                deterministic=True, star_in=star, star_next=True)
            z2, _, _ = fused_sage_layer(
                z, wl, b_l, w_r, ctx, skip=True, rate=0.0, seed=None,
                deterministic=True, star_in=t_out, star_next=False)
            return jnp.sum(z2.astype(jnp.float32) * probe)
        return f

    # On CPU interpret the windowed (K=2*GW) and full-table (K=tg)
    # selection matmuls agree bitwise (one-hot columns add exact zeros),
    # but real-TPU / future Mosaic scheduling may reassociate the f32
    # accumulation — compare with a tight tolerance, not equality.
    vl = float(jax.jit(loss_fn(ctx_l))(x, w_l))
    vg = float(jax.jit(loss_fn(ctx_g))(x, w_l))
    np.testing.assert_allclose(vl, vg, rtol=1e-6, atol=1e-6)
    gl = jax.jit(jax.grad(loss_fn(ctx_l), argnums=(0, 1)))(x, w_l)
    gg = jax.jit(jax.grad(loss_fn(ctx_g), argnums=(0, 1)))(x, w_l)
    for a, b in zip(gl, gg):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-5, atol=1e-6)
