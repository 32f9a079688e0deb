"""Tile-sharded EA model parallelism (parallel/ea_shard.py) == the
single-device fused stack: kernel-level stack parity, full-model parity
through BuckGNN(impl='banded_partitioned'), and the DP x TP mesh
composition — all on the 8-virtual-device CPU mesh (interpret mode,
rate 0; the in-kernel PRNG path needs real TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from buckgnn_tpu.graph.batch import pack_graphs
from buckgnn_tpu.graph.synthetic import generate_dataset
from buckgnn_tpu.models import BuckGNN
from buckgnn_tpu.ops.pallas_ea_block import fused_ea_block
from buckgnn_tpu.parallel.ea_shard import (
    ea_tp_stack,
    pad_ea_shards,
    shard_caps,
    shard_ea_batch,
)
from buckgnn_tpu.parallel.mesh import make_mesh

TILE, WIDTH, H, FE = 128, 64, 256, 5


def _packed(n_graphs=16, seed=2, n_shards=4):
    ds = generate_dataset(n_graphs, seed=seed, min_side=8, max_side=11,
                          use_virtual_edges=True)
    n = sum(g.n_node for g in ds) + 1
    align = n_shards * TILE
    ncap = ((max(n, TILE + WIDTH) + align - 1) // align) * align
    ecap = ((sum(g.n_edge for g in ds) + 127) // 128) * 128
    batch = pack_graphs(ds, ncap, ecap, n_graphs + 1,
                        band_width=WIDTH, band_tile=TILE)
    assert int((np.asarray(batch.win_far_tsend)
                != batch.dead_node_index).sum()) > 0, "need far senders"
    return batch, ds


def _rand_params(rng, h=H, fe=FE):
    d = lambda s: jnp.asarray(
        rng.normal(size=s, scale=1.0 / np.sqrt(s[0])).astype(np.float32))
    params = {m: {"lin_0": {"kernel": d((i0, h)), "bias": d((h,))},
                  "lin_1": {"kernel": d((h, h)), "bias": d((h,))}}
              for m, i0 in [("edge_mlp", 3 * h), ("node_mlp_phi", 2 * h),
                            ("node_mlp_gamma", 2 * h),
                            ("node_mlp_beta", h)]}
    enc = {"lin_0": {"kernel": d((fe, 64)), "bias": d((64,))},
           "lin_1": {"kernel": d((64, 128)), "bias": d((128,))},
           "lin_2": {"kernel": d((128, h)), "bias": d((h,))}}
    return params, enc


def _assert_tree_close(g_a, g_b, tol=2e-4):
    flat_a, _ = jax.tree_util.tree_flatten_with_path(g_a)
    flat_b, _ = jax.tree_util.tree_flatten_with_path(g_b)
    for (kp, a), (_, b) in zip(flat_a, flat_b):
        a, b = np.asarray(a), np.asarray(b)
        denom = max(float(np.abs(a).max()), 1e-6)
        assert float(np.abs(a - b).max()) / denom < tol, (
            jax.tree_util.keystr(kp))


def test_stack_parity_kernel_level():
    """ea_tp_stack (shard_map, 4 shards, per-layer all_gather,
    far_grad='hybrid') == the single-device fused stack, forward AND
    every weight/encoder gradient — boundary-crossing senders re-ride
    the far machinery against the replicated x."""
    batch, _ = _packed()
    shards = shard_ea_batch(batch, 4)
    rng = np.random.default_rng(0)
    params, enc = _rand_params(rng)
    x0 = jnp.asarray(rng.normal(size=(batch.n_node_cap, H))
                     .astype(np.float32))
    L = 3
    mesh = make_mesh(n_data=2, n_model=4)

    def ref_stack(x, p, ep):
        from buckgnn_tpu.parallel.ea_shard import _encode_edges
        e = _encode_edges(batch.win_edges, ep, x.dtype)
        for i in range(L):
            x, e = fused_ea_block(x, e, p, batch, skip=0 < i < L - 1,
                                  rate=0.0, seed=None, deterministic=True)
        return x

    def tp(x, p, ep):
        return ea_tp_stack(x, shards, [p] * L, ep, rate=0.0, seed=None,
                           deterministic=True)

    x_ref = ref_stack(x0, params, enc)
    with jax.set_mesh(mesh):
        x_tp = tp(x0, params, enc)
    np.testing.assert_allclose(np.asarray(x_ref), np.asarray(x_tp),
                               rtol=2e-4, atol=2e-5)

    def loss(fn):
        return lambda p, ep: jnp.sum(fn(x0, p, ep) ** 2)

    g_ref = jax.grad(loss(ref_stack), argnums=(0, 1))(params, enc)
    with jax.set_mesh(mesh):
        g_tp = jax.grad(loss(tp), argnums=(0, 1))(params, enc)
    _assert_tree_close(g_ref, g_tp)


@pytest.mark.parametrize("name", ["EA_GNN", "EA_GNN_Shared"])
def test_model_parity(name):
    """BuckGNN(impl='banded_partitioned') with ea_part attached routes
    the stack through shard_map and must match the single-device fused
    path (impl='banded_pallas') in predictions and gradients with the
    SAME param tree (checkpoint compatibility)."""
    batch, ds = _packed(seed=3)
    # widen every cap beyond the needed minima — zone/fs padding must be
    # inert (the run-uniform shapes the trainer feeds back)
    cl, cr, cs = shard_caps(shard_ea_batch(batch, 4))
    shards = shard_ea_batch(batch, 4, local_cap=cl + 8,
                            remote_cap=cr + 8, fs_cap=cs + 8)
    b_tp = batch.replace(ea_part=shards)
    kwargs = dict(
        num_node_features=ds[0].x.shape[1], num_edge_features=5,
        hidden_channels=H, num_layers=3, pooling_layer="mean",
        dropout_rate=0.0, model_name=name,
    )
    m_ref = BuckGNN(impl="banded_pallas", **kwargs)
    m_tp = BuckGNN(impl="banded_partitioned", **kwargs)
    mesh = make_mesh(n_data=2, n_model=4)
    variables = m_ref.init(jax.random.key(0), batch, deterministic=True)
    with jax.set_mesh(mesh):
        v_tp = m_tp.init(jax.random.key(0), b_tp, deterministic=True)
    assert (jax.tree.structure(variables["params"])
            == jax.tree.structure(v_tp["params"]))

    p_ref, _ = m_ref.apply(variables, batch, deterministic=True)
    with jax.set_mesh(mesh):
        p_tp, _ = m_tp.apply(variables, b_tp, deterministic=True)
    gm = np.asarray(batch.graph_mask)
    np.testing.assert_allclose(np.asarray(p_ref)[gm],
                               np.asarray(p_tp)[gm],
                               rtol=2e-4, atol=2e-5)

    def loss(m, b):
        def f(params):
            pred, _ = m.apply({"params": params}, b, deterministic=True)
            return jnp.sum(jnp.where(batch.graph_mask, pred, 0.0) ** 2)
        return f

    g_ref = jax.grad(loss(m_ref, batch))(variables["params"])
    with jax.set_mesh(mesh):
        g_tp = jax.grad(loss(m_tp, b_tp))(variables["params"])
    _assert_tree_close(g_ref, g_tp)


def test_dp_tp_composition():
    """DP x TP: the parallel train step vmaps over stacked batches while
    each per-shard model shard_maps over 'model' — loss must equal the
    graph-weighted mean of sequential single-device fused losses."""
    from buckgnn_tpu.config import TrainConfig
    from buckgnn_tpu.graph.batch import batch_iterator
    from buckgnn_tpu.graph.normalizer import normalize_dataset
    from buckgnn_tpu.parallel.dp import (
        make_parallel_train_step, shard_stacked_batch, stack_batches,
    )
    from buckgnn_tpu.train.losses import get_loss_function
    from buckgnn_tpu.train.trainer import (
        build_model, init_state, make_optimizer, make_train_step,
    )

    n_data, n_model = 2, 4
    ds = generate_dataset(8, seed=5, min_side=8, max_side=10,
                          use_virtual_edges=True)
    normed, nz = normalize_dataset(ds)
    cfg = TrainConfig(hidden_channels=H, num_layers=2, batch_size=4,
                      lr=1e-3, dropout_rate=0.0,
                      segment_impl="banded_partitioned",
                      model_name="EA_GNN_Shared")
    align = n_model * TILE
    n = sum(g.n_node for g in normed) + 1
    ncap = ((max(n, TILE + WIDTH) + align - 1) // align) * align
    ecap = ((sum(g.n_edge for g in normed) + 127) // 128) * 128
    batches = list(batch_iterator(normed, 4, ncap, ecap,
                                  band_width=WIDTH, band_tile=TILE,
                                  rcm=True))[:n_data]
    assert len(batches) == n_data
    needed = [shard_caps(shard_ea_batch(b, n_model)) for b in batches]
    cl = max(n[0] for n in needed)
    cr = max(n[1] for n in needed)
    cs = max(n[2] for n in needed)
    batches = [b.replace(ea_part=shard_ea_batch(
        b, n_model, local_cap=cl, remote_cap=cr, fs_cap=cs))
        for b in batches]

    mesh = make_mesh(n_data=n_data, n_model=n_model)
    crit = get_loss_function(cfg.loss_function)
    with jax.set_mesh(mesh):
        model = build_model(cfg, normed[0].x.shape[1], 5)
        opt = make_optimizer(cfg)
        state = init_state(model, opt, batches[0])
        step = make_parallel_train_step(model, opt, crit, cfg, nz, mesh)
        stacked = shard_stacked_batch(stack_batches(batches), mesh)
        _, metrics = step(state, stacked, jax.random.key(0),
                          jnp.float32(1e-3))
        dp_loss = float(metrics["loss"])
    assert np.isfinite(dp_loss)

    # sequential oracle on the single-device fused path
    import dataclasses

    cfg_1 = dataclasses.replace(cfg, segment_impl="banded_pallas")
    model_1 = build_model(cfg_1, normed[0].x.shape[1], 5)
    opt_1 = make_optimizer(cfg_1)
    step_1, _ = make_train_step(model_1, opt_1, crit, cfg_1, nz)
    losses, ws = [], []
    for b in batches:
        _, m = step_1(state, b.replace(ea_part=None), jax.random.key(0),
                      jnp.float32(1e-3))
        losses.append(float(m["loss"]))
        ws.append(float(np.sum(np.asarray(b.graph_mask,
                                          dtype=np.float32))))
    oracle = float(np.average(losses, weights=ws))
    assert dp_loss == pytest.approx(oracle, rel=1e-5)


def test_trainer_attaches_ea_shards(tmp_path):
    """train_gnn with segment_impl='banded_partitioned' and an EA model
    attaches EAShards (not PartitionedBatch) to every batch and trains;
    with no ambient mesh this runs the 1-shard degenerate case."""
    from buckgnn_tpu.config import TrainConfig
    from buckgnn_tpu.graph.normalizer import normalize_dataset
    from buckgnn_tpu.train.trainer import train_gnn

    ds = generate_dataset(8, seed=11, min_side=6, max_side=8,
                          use_virtual_edges=True)
    normed, nz = normalize_dataset(ds)
    cfg = TrainConfig(hidden_channels=H, num_layers=2, batch_size=4,
                      num_epochs=1, lr=1e-3, dropout_rate=0.0,
                      segment_impl="banded_partitioned",
                      model_name="EA_GNN_Shared")
    res = train_gnn(cfg, normed[:6], normed[6:], nz, str(tmp_path),
                    trial_id="ea_tp_smoke", verbose=False)
    assert np.isfinite(res.best_val_mape)


def test_stack_parity_two_shards_width128():
    """Wide-band geometry (width == tile: slab 256, halo crossers span
    a full tile) with 2 shards — the other production EA geometry."""
    ds = generate_dataset(12, seed=13, min_side=8, max_side=11,
                          use_virtual_edges=True)
    n = sum(g.n_node for g in ds) + 1
    width = TILE
    align = 2 * 2 * TILE  # 2 shards x >= 2 tiles (slab = 2*tile)
    ncap = ((max(n, TILE + width) + align - 1) // align) * align
    ecap = ((sum(g.n_edge for g in ds) + 127) // 128) * 128
    batch = pack_graphs(ds, ncap, ecap, 13, band_width=width,
                        band_tile=TILE)
    shards = shard_ea_batch(batch, 2)
    rng = np.random.default_rng(1)
    params, enc = _rand_params(rng)
    x0 = jnp.asarray(rng.normal(size=(ncap, H)).astype(np.float32))
    mesh = make_mesh(n_data=4, n_model=2)

    from buckgnn_tpu.parallel.ea_shard import _encode_edges
    e0 = _encode_edges(batch.win_edges, enc, x0.dtype)
    x_ref, _ = fused_ea_block(x0, e0, params, batch, skip=False,
                              rate=0.0, seed=None, deterministic=True)
    with jax.set_mesh(mesh):
        x_tp = ea_tp_stack(x0, shards, [params], enc, rate=0.0,
                           seed=None, deterministic=True)
    np.testing.assert_allclose(np.asarray(x_ref), np.asarray(x_tp),
                               rtol=2e-4, atol=2e-5)


def test_pad_ea_shards_equals_capped_rebuild():
    """pad_ea_shards (the trainer's single-build widen path) must be
    bit-identical to rebuilding with explicit caps via shard_ea_batch —
    remote-zone window codes shift by the local-zone growth, far zones
    pad with the dead row, fs_src re-bases onto the new cf stride."""
    batch, _ = _packed(n_graphs=12, seed=21, n_shards=4)
    native = shard_ea_batch(batch, 4)
    cl, cr, cs = shard_caps(native)
    caps = (cl + 16, cr + 8, cs + 24)
    direct = shard_ea_batch(batch, 4, local_cap=caps[0],
                            remote_cap=caps[1], fs_cap=caps[2])
    padded = pad_ea_shards(native, *caps)
    assert padded.cf_local == direct.cf_local == caps[0]
    for f in ("sidx", "ridx", "far", "row_off", "edges", "fs_src",
              "fs_lidx"):
        np.testing.assert_array_equal(
            np.asarray(getattr(padded, f)), np.asarray(getattr(direct, f)),
            err_msg=f)
    # no-op widen returns the same object
    assert pad_ea_shards(native, cl, cr, cs) is native


def test_trainer_ea_tp_small_dataset_gets_slab_floor(tmp_path):
    """train_gnn under a 4-way model mesh with a dataset small enough
    that the lcm alignment alone rounds n_node_cap to exactly
    n_shards*tile must still give every shard a full slab (tile + width
    rows) — regression for the round-5 self-review crash (pack() died in
    shard_ea_batch's slab assert before training started)."""
    from buckgnn_tpu.config import TrainConfig
    from buckgnn_tpu.graph.normalizer import normalize_dataset
    from buckgnn_tpu.train.trainer import train_gnn

    ds = generate_dataset(8, seed=17, min_side=6, max_side=7,
                          use_virtual_edges=True)
    assert sum(g.n_node for g in ds) + 1 <= 4 * TILE, (
        "fixture must stay small enough that the pre-fix alignment "
        "rounds to exactly n_shards*tile")
    normed, nz = normalize_dataset(ds)
    cfg = TrainConfig(hidden_channels=H, num_layers=2, batch_size=8,
                      num_epochs=1, lr=1e-3, dropout_rate=0.0,
                      segment_impl="banded_partitioned",
                      model_name="EA_GNN_Shared")
    mesh = make_mesh(n_data=2, n_model=4)
    with jax.set_mesh(mesh):
        res = train_gnn(cfg, normed[:6], normed[6:], nz, str(tmp_path),
                        trial_id="ea_tp_floor", verbose=False)
    assert np.isfinite(res.best_val_mape)


def test_shard_requires_slab_rows():
    """Too many shards for the capacity must fail loudly, not mis-slice."""
    batch, _ = _packed(n_graphs=4, seed=14, n_shards=4)
    n_tiles = batch.n_node_cap // TILE
    with pytest.raises(AssertionError, match="slab"):
        shard_ea_batch(batch, n_tiles)  # 1 tile/shard < slab at width 64
