"""Multi-device execution on the virtual 8-device CPU mesh: DP training-step
parity with single-device, edge-partitioned aggregation parity."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from buckgnn_tpu.config import TrainConfig
from buckgnn_tpu.graph.batch import batch_iterator, suggest_capacities
from buckgnn_tpu.graph.normalizer import normalize_dataset
from buckgnn_tpu.graph.synthetic import generate_dataset
from buckgnn_tpu.parallel.dp import (
    make_parallel_train_step,
    shard_stacked_batch,
    stack_batches,
)
from buckgnn_tpu.parallel.edge_partition import edge_partitioned_aggregate
from buckgnn_tpu.parallel.mesh import make_mesh
from buckgnn_tpu.train.losses import get_loss_function
from buckgnn_tpu.train.trainer import (
    build_model,
    init_state,
    make_optimizer,
    make_train_step,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_edge_partitioned_aggregate_matches_local(rng):
    mesh = make_mesh(n_data=1, n_model=4)
    n, e = 32, 256
    x = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
    senders = jnp.asarray(rng.integers(0, n, size=e).astype(np.int32))
    receivers = jnp.asarray(np.sort(rng.integers(0, n, size=e)).astype(np.int32))
    for aggr in ("add", "mean", "max"):
        got = edge_partitioned_aggregate(x, senders, receivers, mesh, aggr)
        from buckgnn_tpu.ops.sage import sage_aggregate

        want = sage_aggregate(x, senders, receivers, n, aggr=aggr,
                              indices_are_sorted=False)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )


@pytest.fixture(scope="module")
def dp_setup():
    ds = generate_dataset(32, seed=0, min_side=3, max_side=5)
    normed, nz = normalize_dataset(ds)
    cfg = TrainConfig(hidden_channels=16, num_layers=2, batch_size=4,
                      dropout_rate=0.0, lr=1e-3)
    ncap, ecap = suggest_capacities(normed, 4)
    ecap = ((ecap + 255) // 256) * 256  # divisible by model axis
    batches = list(batch_iterator(normed, 4, ncap, ecap))[:4]
    return cfg, normed, nz, batches


def test_dp_train_step_matches_sequential_loss(dp_setup):
    """Stacked-vmap DP loss == weighted mean of per-batch single-device
    losses."""
    cfg, normed, nz, batches = dp_setup
    model = build_model(cfg, normed[0].x.shape[1], normed[0].edge_attr.shape[1])
    opt = make_optimizer(cfg)
    state = init_state(model, opt, batches[0])
    criterion = get_loss_function(cfg.loss_function)

    mesh = make_mesh(n_data=4, n_model=2)
    pstep = make_parallel_train_step(model, opt, criterion, cfg, nz, mesh)
    stacked = shard_stacked_batch(stack_batches(batches), mesh)
    key = jax.random.key(0)
    new_state, metrics = pstep(state, stacked, key, jnp.float32(cfg.lr))
    dp_loss = float(metrics["loss"])

    # sequential reference
    tstep, estep = make_train_step(model, opt, criterion, cfg, nz)
    losses, weights = [], []
    for b in batches:
        m, _ = estep(state, b)
        losses.append(float(m["loss"]))
        weights.append(float(np.sum(np.asarray(b.graph_mask))))
    want = np.sum(np.array(losses) * np.array(weights)) / np.sum(weights)
    np.testing.assert_allclose(dp_loss, want, rtol=1e-5)
    # params actually changed
    a = jax.tree.leaves(state.params)[0]
    b_ = jax.tree.leaves(new_state.params)[0]
    assert not np.allclose(np.asarray(a), np.asarray(b_))


def test_dp_grads_match_large_batch(dp_setup):
    """DP over 4 shards == single-device step over the union batch: the
    parameters after one step must match (weighted-loss equivalence)."""
    import optax

    cfg, normed, nz, batches = dp_setup
    model = build_model(cfg, normed[0].x.shape[1], normed[0].edge_attr.shape[1])
    # SGD (identity transform; the step scales by -lr) so parameter deltas are
    # LINEAR in the gradients — Adam's first step is sign-like and amplifies
    # numerical noise on near-zero gradients.
    opt = optax.identity()
    state = init_state(model, opt, batches[0])
    criterion = get_loss_function(cfg.loss_function)
    mesh = make_mesh(n_data=4, n_model=1)

    # shard batches built explicitly as quartets of normed[:16] so the DP
    # union equals the big batch exactly (batch_iterator may spill on
    # capacity and shift composition)
    from buckgnn_tpu.graph.batch import pack_graphs

    ncap0 = batches[0].n_node_cap * 2
    ecap0 = batches[0].n_edge_cap * 2
    quartets = [
        pack_graphs(list(normed[i : i + 4]), ncap0, ecap0, 5)
        for i in range(0, 16, 4)
    ]
    state = init_state(model, opt, quartets[0])
    pstep = make_parallel_train_step(model, opt, criterion, cfg, nz, mesh)
    stacked = shard_stacked_batch(stack_batches(quartets), mesh)
    new_state, _ = pstep(state, stacked, jax.random.key(0),
                         jnp.float32(cfg.lr))

    graphs = list(normed[:16])
    ncap = ncap0 * 4
    ecap = ecap0 * 4
    big = pack_graphs(graphs, ncap, ecap, 17)
    tstep, _ = make_train_step(model, opt, criterion, cfg, nz)
    big_state, _ = tstep(state, big, jax.random.key(1), jnp.float32(cfg.lr))

    for p0, a, b in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(new_state.params),
                        jax.tree.leaves(big_state.params)):
        da = np.asarray(a) - np.asarray(p0)  # == -lr * grad_dp
        db = np.asarray(b) - np.asarray(p0)  # == -lr * grad_big
        np.testing.assert_allclose(da, db, rtol=2e-2, atol=1e-7)


def test_dryrun_multichip_entry():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_scaling_bench_harness():
    """scaling_bench runs 1 vs N devices through the same DP step and
    reports efficiency (numbers on virtual CPU devices are smoke-level)."""
    from buckgnn_tpu.parallel.scaling import scaling_bench

    out = scaling_bench(n_devices=4, graphs_per_device=2, min_side=3,
                        max_side=4, n_steps=2)
    assert out["n_devices"] == 4
    assert out["per_count"][1]["edges_per_s"] > 0
    assert out["per_count"][4]["edges_per_s"] > 0
    assert 0 < out["scaling_efficiency"]


def test_initialize_distributed_single_process():
    from buckgnn_tpu.parallel.mesh import host_shard, initialize_distributed

    topo = initialize_distributed()
    assert topo["process_count"] >= 1
    assert topo["global_devices"] >= topo["local_devices"]
    # per-host ETL sharding partitions the work list exactly
    items = list(range(13))
    shards = [host_shard(items, i, 4) for i in range(4)]
    assert sorted(sum(shards, [])) == items


def test_dp_with_banded_batches():
    """Banded batches (band matrix + spill arrays) shard over the data axis
    and train under the parallel step."""
    from buckgnn_tpu.parallel.mesh import make_mesh
    from buckgnn_tpu.train.losses import get_loss_function
    from buckgnn_tpu.train.trainer import build_model, init_state, make_optimizer

    ds = generate_dataset(4, seed=3, min_side=4, max_side=5)
    normed, nz = normalize_dataset(ds)
    cfg = TrainConfig(hidden_channels=8, num_layers=2, batch_size=2,
                      lr=1e-3, segment_impl="banded")
    ncap, ecap = suggest_capacities(normed, 2)
    tile, width = 64, 32
    ncap = ((max(ncap, tile + width) + tile - 1) // tile) * tile
    ecap = ((ecap + 127) // 128) * 128
    batches = list(batch_iterator(normed, 2, ncap, ecap, band_width=width,
                                  band_tile=tile, rcm=True))[:2]
    assert batches[0].band is not None
    mesh = make_mesh(n_data=2, n_model=1, devices=jax.devices()[:2])
    model = build_model(cfg, normed[0].x.shape[1], normed[0].edge_attr.shape[1])
    opt = make_optimizer(cfg)
    step = make_parallel_train_step(model, opt,
                                    get_loss_function(cfg.loss_function),
                                    cfg, nz, mesh)
    stacked = shard_stacked_batch(stack_batches(batches), mesh)
    state = init_state(model, opt, batches[0])
    state, metrics = step(state, stacked, jax.random.key(0),
                          jnp.float32(1e-3))
    assert np.isfinite(float(metrics["loss"]))


def test_dp_with_fused_ea_batches():
    """The fused EA block kernel (custom VJP + pallas_call) must compose
    with the DP step's vmap over stacked batches — multi-chip EA training
    is a production path, not just single-chip. Loss must equal the
    graph-weighted mean of per-batch sequential losses."""
    from buckgnn_tpu.parallel.mesh import make_mesh
    from buckgnn_tpu.train.losses import get_loss_function
    from buckgnn_tpu.train.trainer import (
        build_model, init_state, make_optimizer, make_train_step,
    )

    ds = generate_dataset(8, seed=5, min_side=8, max_side=10,
                          use_virtual_edges=True)
    normed, nz = normalize_dataset(ds)
    cfg = TrainConfig(hidden_channels=128, num_layers=2, batch_size=4,
                      lr=1e-3, dropout_rate=0.0,
                      segment_impl="banded_pallas",
                      model_name="EA_GNN_Shared")
    ncap, ecap = suggest_capacities(normed, 4)
    tile, width = 128, 64
    ncap = ((max(ncap, tile + width) + tile - 1) // tile) * tile
    ecap = ((ecap + 127) // 128) * 128
    batches = list(batch_iterator(normed, 4, ncap, ecap, band_width=width,
                                  band_tile=tile, rcm=True))[:2]
    assert len(batches) == 2
    from buckgnn_tpu.ops.pallas_ea_block import supports_fused_ea

    assert supports_fused_ea(batches[0], 128), "fused path must engage"
    mesh = make_mesh(n_data=2, n_model=1, devices=jax.devices()[:2])
    model = build_model(cfg, normed[0].x.shape[1],
                        normed[0].edge_attr.shape[1])
    opt = make_optimizer(cfg)
    crit = get_loss_function(cfg.loss_function)
    step = make_parallel_train_step(model, opt, crit, cfg, nz, mesh)
    stacked = shard_stacked_batch(stack_batches(batches), mesh)
    state = init_state(model, opt, batches[0])
    _, metrics = step(state, stacked, jax.random.key(0),
                      jnp.float32(1e-3))
    dp_loss = float(metrics["loss"])
    assert np.isfinite(dp_loss)

    # sequential oracle: graph-weighted mean of per-batch losses
    train_step, _ = make_train_step(model, opt, crit, cfg, nz)
    losses, ws = [], []
    for b in batches:
        _, m = train_step(state, b, jax.random.key(0), jnp.float32(1e-3))
        losses.append(float(m["loss"]))
        ws.append(float(np.sum(np.asarray(b.graph_mask,
                                          dtype=np.float32))))
    oracle = float(np.average(losses, weights=ws))
    assert dp_loss == pytest.approx(oracle, rel=1e-5)


def test_dp_with_fused_sage_batches():
    """Same DP-composition guarantee for the fused SAGE layer kernel
    (supernode star threading + merged backward under vmap)."""
    from buckgnn_tpu.parallel.mesh import make_mesh
    from buckgnn_tpu.train.losses import get_loss_function
    from buckgnn_tpu.train.trainer import (
        build_model, init_state, make_optimizer, make_train_step,
    )

    ds = generate_dataset(8, seed=6, min_side=8, max_side=10,
                          use_super_node=True, use_virtual_edges=False)
    normed, nz = normalize_dataset(ds)
    cfg = TrainConfig(hidden_channels=128, num_layers=2, batch_size=4,
                      lr=1e-3, dropout_rate=0.0,
                      segment_impl="banded_pallas",
                      pooling_layer="supernode_with_pooling")
    ncap, ecap = suggest_capacities(normed, 4)
    tile, width = 128, 64
    ncap = ((max(ncap, tile + width) + tile - 1) // tile) * tile
    ecap = ((ecap + 127) // 128) * 128
    batches = list(batch_iterator(normed, 4, ncap, ecap, band_width=width,
                                  band_tile=tile, rcm=True))[:2]
    assert len(batches) == 2
    mesh = make_mesh(n_data=2, n_model=1, devices=jax.devices()[:2])
    model = build_model(cfg, normed[0].x.shape[1],
                        normed[0].edge_attr.shape[1])
    opt = make_optimizer(cfg)
    crit = get_loss_function(cfg.loss_function)
    step = make_parallel_train_step(model, opt, crit, cfg, nz, mesh)
    stacked = shard_stacked_batch(stack_batches(batches), mesh)
    state = init_state(model, opt, batches[0])
    _, metrics = step(state, stacked, jax.random.key(0),
                      jnp.float32(1e-3))
    dp_loss = float(metrics["loss"])
    assert np.isfinite(dp_loss)
    train_step, _ = make_train_step(model, opt, crit, cfg, nz)
    losses, ws = [], []
    for b in batches:
        _, m = train_step(state, b, jax.random.key(0), jnp.float32(1e-3))
        losses.append(float(m["loss"]))
        ws.append(float(np.sum(np.asarray(b.graph_mask,
                                          dtype=np.float32))))
    oracle = float(np.average(losses, weights=ws))
    assert dp_loss == pytest.approx(oracle, rel=1e-5)
