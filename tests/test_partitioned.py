"""Edge-partitioned aggregation (parallel/partitioned.py) == single-device
banded/gather aggregation, on the virtual 8-device CPU mesh.

Covers the SURVEY §2.2 mandate: halo exchange over the 'model' axis +
spill all_to_all + supernode psum, forward AND backward (symmetric VJP).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from buckgnn_tpu.graph.batch import pack_graphs
from buckgnn_tpu.graph.synthetic import generate_dataset
from buckgnn_tpu.ops.banded import banded_sage_aggregate, make_agg_context
from buckgnn_tpu.parallel.partitioned import (
    partition_batch,
    partitioned_sage_aggregate,
)

TILE, WIDTH = 128, 64


def _packed(n_graphs=8, seed=0, supernode=False, n_shards=4):
    ds = generate_dataset(
        n_graphs, seed=seed, min_side=5, max_side=9,
        use_super_node=supernode, use_virtual_edges=not supernode,
    )
    n = sum(g.n_node for g in ds) + 1
    mult = n_shards * TILE
    ncap = ((max(n, TILE + WIDTH) + mult - 1) // mult) * mult
    ecap = ((sum(g.n_edge for g in ds) + 127) // 128) * 128
    return pack_graphs(ds, ncap, ecap, n_graphs + 1,
                       band_width=WIDTH, band_tile=TILE)


def _mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("model",))


@pytest.mark.parametrize("supernode", [False, True])
@pytest.mark.parametrize("n_shards", [1, 4])
def test_partitioned_matches_banded_forward(rng, supernode, n_shards):
    batch = _packed(supernode=supernode, n_shards=max(n_shards, 4))
    pb = partition_batch(batch, n_shards)
    mesh = _mesh(n_shards)
    x = jnp.asarray(rng.normal(size=(batch.n_node_cap, 32)), jnp.float32)
    x = x.at[batch.dead_node_index].set(0.0)

    ctx = make_agg_context(batch)
    want = np.asarray(banded_sage_aggregate(x, ctx, aggr="add"))
    got = np.asarray(
        jax.jit(
            lambda v: partitioned_sage_aggregate(v, pb, mesh=mesh)
        )(x)
    )
    mask = np.asarray(batch.node_mask)
    np.testing.assert_allclose(got[mask], want[mask], rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("supernode", [False, True])
def test_partitioned_grads_match(rng, supernode):
    batch = _packed(seed=3, supernode=supernode)
    pb = partition_batch(batch, 4)
    mesh = _mesh(4)
    x = jnp.asarray(rng.normal(size=(batch.n_node_cap, 32)), jnp.float32)
    x = x.at[batch.dead_node_index].set(0.0)
    probe = jnp.asarray(rng.normal(size=x.shape), jnp.float32)
    mask = jnp.asarray(batch.node_mask, jnp.float32)[:, None]
    ctx = make_agg_context(batch)

    g_part = jax.jit(jax.grad(lambda v: jnp.sum(
        partitioned_sage_aggregate(v, pb, mesh=mesh) * probe * mask
    )))(x)
    g_ref = jax.jit(jax.grad(lambda v: jnp.sum(
        banded_sage_aggregate(v, ctx, aggr="add") * probe * mask
    )))(x)
    np.testing.assert_allclose(
        np.asarray(g_part)[np.asarray(batch.node_mask)],
        np.asarray(g_ref)[np.asarray(batch.node_mask)],
        rtol=1e-5, atol=1e-5,
    )


@pytest.mark.parametrize("supernode", [False, True])
def test_model_partitioned_matches_single_device(rng, supernode):
    """Flagship model with impl='banded_partitioned' on a 4-device 'model'
    mesh == the single-device banded implementation: predictions AND
    parameter gradients (VERDICT r1 missing #2 'done' bar)."""
    from buckgnn_tpu.models.buckgnn import BuckGNN

    batch = _packed(seed=7, supernode=supernode)
    pb = partition_batch(batch, 4)
    pbatch = batch.replace(part=pb)
    mesh = _mesh(4)
    kwargs = dict(
        num_node_features=batch.nodes.shape[1], num_edge_features=5,
        hidden_channels=32, num_layers=3,
        pooling_layer="supernode_with_pooling" if supernode else "mean",
        dropout_rate=0.0,
    )
    m_ref = BuckGNN(impl="banded", **kwargs)
    m_part = BuckGNN(impl="banded_partitioned", **kwargs)
    with jax.set_mesh(mesh):
        variables = jax.jit(
            lambda: m_ref.init(jax.random.key(0), batch, deterministic=True)
        )()
        pred_ref, _ = jax.jit(
            lambda v: m_ref.apply(v, batch, deterministic=True)
        )(variables)
        pred_part, _ = jax.jit(
            lambda v: m_part.apply(v, pbatch, deterministic=True)
        )(variables)
        gm = np.asarray(batch.graph_mask)
        np.testing.assert_allclose(
            np.asarray(pred_part)[gm], np.asarray(pred_ref)[gm],
            rtol=1e-4, atol=1e-5,
        )

        def loss(m, b):
            def f(v):
                pred, _ = m.apply(v, b, deterministic=True)
                return jnp.sum(
                    jnp.where(b.graph_mask, pred, 0.0) ** 2
                )
            return f

        g_ref = jax.jit(jax.grad(loss(m_ref, batch)))(variables)
        g_part = jax.jit(jax.grad(loss(m_part, pbatch)))(variables)
    # identical param trees -> leaves align positionally
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves_with_path(g_part),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(pa)}",
        )


def test_partition_batch_routes_cross_shard_spill(rng):
    """Virtual edges reach across shard boundaries — the routing tables
    must carry them (non-trivial send lists between distinct devices)."""
    batch = _packed(seed=5, supernode=False)
    pb = partition_batch(batch, 4)
    assert pb.has_spill
    send = np.asarray(pb.send_idx)
    recv_r = np.asarray(pb.recv_receivers)
    nl = batch.n_node_cap // 4
    # at least one real routed message between two DIFFERENT shards
    cross = 0
    for s in range(4):
        for d in range(4):
            if s != d and np.any(recv_r[d] < nl):
                cross += 1
    assert cross > 0
    assert send.shape[0] == send.shape[1] == 4


def test_partitioned_without_ambient_mesh(rng):
    """The CLI exposes segment_impl='banded_partitioned' without any mesh
    setup: the operator must fall back to a local mesh over n_shards
    devices instead of crashing in shard_map (regression: mesh=None with
    no ambient 'model' axis raised at trace time)."""
    batch = _packed(n_shards=1)
    pb = partition_batch(batch, 1)
    x = jnp.asarray(rng.normal(size=(batch.n_node_cap, 32)), jnp.float32)
    x = x.at[batch.dead_node_index].set(0.0)
    ctx = make_agg_context(batch)
    want = np.asarray(banded_sage_aggregate(x, ctx, aggr="add"))
    got = np.asarray(
        jax.jit(lambda v: partitioned_sage_aggregate(v, pb))(x)
    )
    mask = np.asarray(batch.node_mask)
    np.testing.assert_allclose(got[mask], want[mask], rtol=1e-5, atol=1e-5)


def test_pad_partitioned_matches_recompute(rng):
    """pad_partitioned(pb, caps) == partition_batch(batch, caps) output
    behaviorally: the padded shards aggregate identically."""
    from buckgnn_tpu.parallel.partitioned import pad_partitioned

    batch = _packed(n_graphs=8, seed=4, n_shards=4)
    pb = partition_batch(batch, 4)
    s_cap = int(pb.send_idx.shape[-1]) + 16
    e_cap = int(pb.recv_perm.shape[-1]) + 24
    padded = pad_partitioned(pb, s_cap, e_cap, force_spill=True)
    ref = partition_batch(batch, 4, spill_cap=s_cap, recv_cap=e_cap,
                          force_spill=True)
    mesh = _mesh(4)
    x = jnp.asarray(rng.normal(size=(batch.n_node_cap, 32)), jnp.float32)
    x = x.at[batch.dead_node_index].set(0.0)
    a = np.asarray(jax.jit(
        lambda v: partitioned_sage_aggregate(v, padded, mesh=mesh))(x))
    b = np.asarray(jax.jit(
        lambda v: partitioned_sage_aggregate(v, ref, mesh=mesh))(x))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)
