"""GraphBatch packing invariants."""

import numpy as np
import pytest

from buckgnn_tpu.graph.batch import (
    GraphData,
    batch_iterator,
    capacity_for,
    pack_graphs,
)
from tests.conftest import make_random_graph


def test_pack_basic(rng):
    graphs = [make_random_graph(rng, n) for n in (5, 9, 7)]
    n_cap, e_cap, g_cap = capacity_for(graphs)
    b = pack_graphs(graphs, n_cap, e_cap, g_cap)

    total_nodes = sum(g.n_node for g in graphs)
    total_edges = sum(g.n_edge for g in graphs)
    assert int(np.sum(np.asarray(b.node_mask))) == total_nodes
    assert int(np.sum(np.asarray(b.edge_mask))) == total_edges
    assert int(np.sum(np.asarray(b.graph_mask))) == 3
    # padding graph is the last slot and owns all pad nodes
    node_graph = np.asarray(b.node_graph)
    assert np.all(node_graph[total_nodes:] == g_cap - 1)
    # receivers sorted ascending, CSR offsets consistent
    recv = np.asarray(b.receivers)
    assert np.all(np.diff(recv) >= 0)
    ro = np.asarray(b.row_offsets)
    for nidx in range(n_cap):
        seg = recv[ro[nidx] : ro[nidx + 1]]
        assert np.all(seg == nidx)
    # pad edges are dead-node self-loops
    send = np.asarray(b.senders)
    pad = ~np.asarray(b.edge_mask)
    assert np.all(send[pad] == n_cap - 1)
    assert np.all(recv[pad] == n_cap - 1)


def test_pack_edge_content_preserved(rng):
    g = make_random_graph(rng, 6)
    n_cap, e_cap, g_cap = capacity_for([g])
    b = pack_graphs([g], n_cap, e_cap, g_cap)
    # every original (sender, receiver, attr) triple appears exactly once
    got = {
        (int(s), int(r)): np.asarray(b.edges)[i]
        for i, (s, r) in enumerate(zip(np.asarray(b.senders), np.asarray(b.receivers)))
        if np.asarray(b.edge_mask)[i]
    }
    for s, r, a in zip(g.senders, g.receivers, g.edge_attr):
        np.testing.assert_allclose(got[(int(s), int(r))], a)


def test_pack_overflow_raises(rng):
    g = make_random_graph(rng, 10)
    with pytest.raises(ValueError):
        pack_graphs([g], g.n_node, 10_000, 2)  # no room for dead node


def test_supernode_index(rng):
    graphs = [make_random_graph(rng, n, supernode=True) for n in (4, 6)]
    n_cap, e_cap, g_cap = capacity_for(graphs)
    b = pack_graphs(graphs, n_cap, e_cap, g_cap)
    sn = np.asarray(b.supernode_index)
    assert sn[0] == 3
    assert sn[1] == 4 + 6 - 1
    assert sn[2] == n_cap - 1  # pad graph -> dead node


def test_batch_iterator_fixed_shapes(rng):
    graphs = [make_random_graph(rng, int(n)) for n in rng.integers(4, 12, size=10)]
    batches = list(batch_iterator(graphs, 4, 64, 256))
    assert all(b.nodes.shape == batches[0].nodes.shape for b in batches)
    total = sum(int(np.sum(np.asarray(b.graph_mask))) for b in batches)
    assert total == 10


def test_node_level_targets(rng):
    graphs = [
        make_random_graph(rng, n, graph_target_dim=3, node_level=True)
        for n in (5, 7)
    ]
    n_cap, e_cap, g_cap = capacity_for(graphs)
    b = pack_graphs(graphs, n_cap, e_cap, g_cap)
    assert b.y.shape == (n_cap, 3)
    np.testing.assert_allclose(np.asarray(b.y)[:5], graphs[0].y)
    np.testing.assert_allclose(np.asarray(b.y)[5:12], graphs[1].y)


def test_select_band_geometry_scrambled_mesh():
    """Auto band-width selection (the ONE source of truth for trainer /
    inference / timer): on a scrambled-node-order mesh, the selected
    geometry + RCM packing must keep the spill fraction under the target
    instead of silently degrading into the scatter path."""
    from buckgnn_tpu.graph.batch import select_band_geometry
    from buckgnn_tpu.graph.synthetic import generate_dataset

    ds = generate_dataset(6, seed=11, min_side=8, max_side=12,
                          use_virtual_edges=False)
    # scramble node order to destroy the generator's row-major locality
    rng = np.random.default_rng(0)
    scrambled = []
    for g in ds:
        perm = rng.permutation(g.n_node)
        inv = np.empty_like(perm)
        inv[perm] = np.arange(g.n_node)
        import dataclasses as dc
        scrambled.append(dc.replace(
            g, x=g.x[perm],
            senders=inv[g.senders].astype(np.int32),
            receivers=inv[g.receivers].astype(np.int32),
            y=g.y, supernode=(int(inv[g.supernode]) if g.supernode >= 0
                              else -1),
        ))
    target = 0.05
    tile, width = select_band_geometry(scrambled, target_spill=target)
    assert width in (64, 128, 256)
    n = sum(g.n_node for g in scrambled) + 1
    ncap = ((max(n, tile + width) + tile - 1) // tile) * tile
    ecap = ((sum(g.n_edge for g in scrambled) + 127) // 128) * 128
    batches = list(batch_iterator(scrambled, 6, ncap, ecap,
                                  band_width=width, band_tile=tile,
                                  rcm=True))
    spill = real = 0
    for b in batches:
        dead = b.n_node_cap - 1
        spill += int((np.asarray(b.spill_receivers) != dead).sum())
        spill += int((np.asarray(b.spill2_receivers) != dead).sum())
        real += int(np.asarray(b.edge_mask).sum())
    assert spill / real <= target * 2.5  # packed-tile phase slack


def test_select_band_geometry_ignores_supernode_stars():
    """Supernode star edges are handled analytically at pack time
    (never in the band), so width selection must not count them: a
    banded grid dataset with supernodes should still get the smallest
    width, and the chosen geometry must pack spill-free."""
    from buckgnn_tpu.graph.batch import select_band_geometry
    from buckgnn_tpu.graph.synthetic import generate_dataset

    ds = generate_dataset(6, seed=3, min_side=8, max_side=12,
                          use_super_node=True, use_virtual_edges=False)
    assert all(g.supernode >= 0 for g in ds)
    tile, width = select_band_geometry(ds)
    # star edges are ~2n of ~6n per graph; counting them caps in-band
    # around 0.75 and would force the widest candidate
    assert width == 64, width
    n = sum(g.n_node for g in ds) + 1
    ncap = ((max(n, tile + width) + tile - 1) // tile) * tile
    ecap = ((sum(g.n_edge for g in ds) + 127) // 128) * 128
    b = next(iter(batch_iterator(ds, 6, ncap, ecap, band_width=width,
                                 band_tile=tile, rcm=True)))
    assert not b.has_spill_edges and not b.has_spill2_edges
    assert b.has_supernode_edges


def test_select_band_geometry_counts_partial_stars():
    """Width selection only excludes supernode edges when the star is
    FULL (2*(n-1) directed edges) — the same guard _band_split applies.
    A partial star lands in band/spill at pack time, so its edges must
    count toward the width choice instead of being silently dropped."""
    from buckgnn_tpu.graph.batch import select_band_geometry
    from buckgnn_tpu.graph.synthetic import generate_dataset
    import dataclasses as dc

    # graphs must exceed one band slab (tile+width) for star edges to
    # leave the band at all; 24-28-side grids are 576-784 nodes
    ds = generate_dataset(4, seed=3, min_side=24, max_side=28,
                          use_super_node=True, use_virtual_edges=False)
    partial = []
    for g in ds:
        # drop ONE directed star edge -> the star is no longer full
        touches = (g.senders == g.supernode) | (g.receivers == g.supernode)
        drop = np.where(touches)[0][0]
        keep = np.ones(g.n_edge, dtype=bool)
        keep[drop] = False
        partial.append(dc.replace(
            g, senders=g.senders[keep], receivers=g.receivers[keep],
            edge_attr=g.edge_attr[keep]))
    # star edges reach across the whole graph: counting them caps the
    # in-band fraction ~0.75 and forces the widest candidate
    _, w_partial = select_band_geometry(partial)
    assert w_partial == 256, w_partial
    # analytic_supernode=False counts stars even when full
    _, w_off = select_band_geometry(ds, analytic_supernode=False)
    assert w_off == 256, w_off


def test_batch_iterator_local_star_windows_flag():
    """local_star_windows=False forces the global star-table path (gwin
    stripped) — the trainer's sticky fallback for borderline datasets
    whose repacks would otherwise flip treedefs mid-training."""
    from buckgnn_tpu.graph.synthetic import generate_dataset

    ds = generate_dataset(6, seed=3, min_side=8, max_side=12,
                          use_super_node=True, use_virtual_edges=False)
    n = sum(g.n_node for g in ds) + 1
    ncap = ((max(n, 256 + 64) + 255) // 256) * 256
    ecap = ((sum(g.n_edge for g in ds) + 127) // 128) * 128
    kw = dict(band_width=64, band_tile=256, rcm=True)
    b_local = next(iter(batch_iterator(ds, 6, ncap, ecap, **kw)))
    assert b_local.gcode is not None and b_local.gwin is not None
    b_glob = next(iter(batch_iterator(ds, 6, ncap, ecap,
                                      local_star_windows=False, **kw)))
    assert b_glob.gcode is not None
    assert b_glob.gwin is None and b_glob.lcode is None
    assert b_glob.lacc is None


def test_batch_iterator_window_cap_floors():
    """min_win_cap/min_far_cap pad the run-wide EA edge-window caps up to
    caller-supplied floors — the trainer feeds back the largest caps seen
    across repack_every_epoch shuffles so every epoch compiles once."""
    from buckgnn_tpu.graph.synthetic import generate_dataset

    ds = generate_dataset(6, seed=2, min_side=8, max_side=12,
                          use_virtual_edges=True)
    n = sum(g.n_node for g in ds) + 1
    ncap = ((max(n, 256 + 128) + 255) // 256) * 256
    ecap = ((sum(g.n_edge for g in ds) + 127) // 128) * 128
    kw = dict(band_width=128, band_tile=256)
    base = next(iter(batch_iterator(ds, 6, ncap, ecap, **kw)))
    w0, f0 = base.win_edges.shape[1], base.win_far_pos.shape[0]
    padded = next(iter(batch_iterator(ds, 6, ncap, ecap,
                                      min_win_cap=w0 + 64,
                                      min_far_cap=f0 + 512, **kw)))
    assert padded.win_edges.shape[1] == w0 + 64
    assert padded.win_far_pos.shape[0] == f0 + 512
    # pads must be inert: sentinel indices everywhere in the new columns
    # (any code >= slab selects nothing; pads carry FAR_SLOT_SENTINEL so
    # extended-slab far codes [slab, slab+Ct) can never alias them)
    sidx = np.asarray(padded.win_sidx)[:, w0:]
    assert (sidx >= 256 + 128).all()
    ridx = np.asarray(padded.win_ridx)[:, w0:]
    assert (ridx == 256).all()
    far = np.asarray(padded.win_far_send)[f0:]
    assert (far == padded.n_node_cap - 1).all()
    # tiled-far (ft) and sender-window (fs) caps pad the same way, and
    # the sender-sorted fs_src flat indices must be re-mapped to the
    # widened Ct stride: cross-check the two views still describe the
    # SAME far rows (fused-EA backward fold correctness)
    ft0 = base.win_far_tsend.shape[1]
    fs0 = base.win_fs_src.shape[1]
    padded2 = next(iter(batch_iterator(ds, 6, ncap, ecap,
                                       min_far_tile_cap=ft0 + 16,
                                       min_fs_cap=fs0 + 8, **kw)))
    assert padded2.win_far_tsend.shape[1] == ft0 + 16
    assert padded2.win_fs_src.shape[1] == fs0 + 8
    tsend2 = np.asarray(padded2.win_far_tsend)
    assert (tsend2[:, ft0:] == padded2.n_node_cap - 1).all()
    lidx2 = np.asarray(padded2.win_fs_lidx)
    assert (lidx2[:, fs0:] == 256).all()
    src2 = np.asarray(padded2.win_fs_src)
    ct2 = tsend2.shape[1]
    for ts in range(src2.shape[0]):
        for c in range(src2.shape[1]):
            if lidx2[ts, c] == 256:  # pad
                continue
            sender = ts * 256 + lidx2[ts, c]
            k = src2[ts, c]
            assert tsend2[k // ct2, k % ct2] == sender


def test_local_star_windows_fall_back_for_tiny_graphs():
    """When a 256-node tile spans more graphs than LOCAL_STAR_ROWS, the
    pack must omit the local star-table windows (kernels then use the
    full-table selection path) instead of emitting out-of-window codes."""
    from buckgnn_tpu.graph.batch import LOCAL_STAR_ROWS
    from buckgnn_tpu.graph.synthetic import generate_dataset

    # ~9-node graphs: a 256-row tile spans ~28 graphs > LOCAL_STAR_ROWS
    ds = generate_dataset(40, seed=5, min_side=3, max_side=3,
                          use_super_node=True, use_virtual_edges=False)
    assert max(g.n_node for g in ds) * LOCAL_STAR_ROWS < 256
    n = sum(g.n_node for g in ds) + 1
    ncap = ((max(n, 256 + 128) + 255) // 256) * 256
    ecap = ((sum(g.n_edge for g in ds) + 127) // 128) * 128
    b = pack_graphs(ds, ncap, ecap, 41, band_width=128, band_tile=256)
    assert b.has_supernode_edges
    assert b.gwin is None and b.lcode is None and b.lacc is None
    assert b.gcode is not None  # global path stays available

def test_batch_iterator_uniform_spill_caps():
    """Spill / spill2 list capacities must be run-uniform (one compiled
    shape; jax.tree.map stacking in the DP path), padded with inert
    dead-node rows, with floors for cross-repack stability — and the
    padded batches must aggregate identically to the per-batch shapes."""
    import jax.numpy as jnp

    from buckgnn_tpu.graph.normalizer import normalize_dataset
    from buckgnn_tpu.graph.synthetic import generate_dataset
    from buckgnn_tpu.ops.banded import banded_sage_aggregate, make_agg_context
    from buckgnn_tpu.ops.segment import segment_sum

    ds = generate_dataset(12, seed=3, min_side=6, max_side=14,
                          use_super_node=False, use_virtual_edges=True)
    normed, _ = normalize_dataset(ds)
    kw = dict(band_width=16, band_tile=128, rcm=True)
    bs = list(batch_iterator(normed, 4, 1024, 4096, **kw))
    assert len(bs) > 1
    shapes = {(b.spill_senders.shape[0], b.spill2_senders.shape[0],
               b.band_senders.shape[0]) for b in bs}
    assert len(shapes) == 1, shapes
    es, e2, eb = next(iter(shapes))
    # floors grow the caps further (trainer repack feedback)
    grown = list(batch_iterator(normed, 4, 1024, 4096,
                                min_spill_cap=es + 256,
                                min_spill2_cap=e2 + 128,
                                min_band_cap=eb + 128, **kw))
    assert all(b.spill_senders.shape[0] == es + 256 for b in grown)
    assert all(b.spill2_senders.shape[0] == e2 + 128 for b in grown)
    assert all(b.band_senders.shape[0] == eb + 128 for b in grown)
    # padding must be inert: aggregation output matches the plain
    # segment-sum oracle on real nodes
    rng = np.random.default_rng(0)
    for b in grown:
        n = b.nodes.shape[0]
        h = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
        out_b = np.asarray(banded_sage_aggregate(h, make_agg_context(b)))
        out_s = np.asarray(segment_sum(h[b.senders], b.receivers, n))
        real = np.asarray(b.node_mask)[:, None]
        np.testing.assert_allclose(out_b * real, out_s * real,
                                   rtol=2e-5, atol=2e-5)


def test_batch_iterator_banded_no_edge_features(rng):
    """Banded packing over graphs WITHOUT 2-D edge features (fe_dim == 0,
    so no edge windows are built) must not crash at the run-uniform
    window-cap widening (regression: cs_max was only assigned inside the
    win_edges branch but read unconditionally -> UnboundLocalError)."""
    import dataclasses

    graphs = [make_random_graph(rng, n) for n in (40, 55, 33, 61)]
    graphs = [
        dataclasses.replace(g, edge_attr=np.zeros(len(g.senders), np.float32))
        for g in graphs
    ]
    bs = list(batch_iterator(graphs, 2, 256, 2048,
                             band_width=16, band_tile=128))
    assert len(bs) == 2
    assert all(b.win_edges is None for b in bs)
