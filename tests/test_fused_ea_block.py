"""Fused EA GraphNetBlock kernel (ops/pallas_ea_block.py) == the
windowed/XLA paths: forward and gradients through the full model,
including out-of-band (far) senders, interior-tile slab halos, skip
layers and both EA variants. CPU runs use interpret mode at rate 0; the
in-kernel dropout PRNG is covered on real TPU by
benchmarks/probe_fused_ea.py (same protocol as the SAGE kernels)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from buckgnn_tpu.graph.batch import pack_graphs
from buckgnn_tpu.graph.synthetic import generate_dataset
from buckgnn_tpu.models import BuckGNN
from buckgnn_tpu.ops.pallas_ea_block import supports_fused_ea

TILE, WIDTH = 128, 64
H = 128  # fused path requires h % 128 == 0


def _packed(n_graphs=16, seed=2, supernode=False):
    """>= 4 node tiles so the backward's interior/first/last halo
    emission paths all execute (slabs of adjacent tiles overlap)."""
    ds = generate_dataset(
        n_graphs, seed=seed, min_side=8, max_side=11,
        use_super_node=supernode, use_virtual_edges=True,
    )
    n = sum(g.n_node for g in ds) + 1
    # EVEN tile count so the kernels' unroll-2 path is what CPU tests
    # cover (odd counts fall back to unroll 1)
    ncap = ((max(n, TILE + WIDTH) + 2 * TILE - 1)
            // (2 * TILE)) * (2 * TILE)
    ecap = ((sum(g.n_edge for g in ds) + 127) // 128) * 128
    batch = pack_graphs(ds, ncap, ecap, n_graphs + 1,
                        band_width=WIDTH, band_tile=TILE)
    assert batch.n_node_cap // TILE >= 4
    assert int((np.asarray(batch.win_far_tsend)
                != batch.dead_node_index).sum()) > 0, "need far senders"
    return batch, ds


def _models(name, ds, supernode=False):
    kwargs = dict(
        num_node_features=ds[0].x.shape[1], num_edge_features=5,
        hidden_channels=H, num_layers=3,
        pooling_layer="supernode_with_pooling" if supernode else "mean",
        dropout_rate=0.0, model_name=name,
    )
    return BuckGNN(impl="xla", **kwargs), BuckGNN(impl="banded_pallas",
                                                  **kwargs)


@pytest.mark.parametrize("name", ["EA_GNN", "EA_GNN_Shared"])
def test_fused_forward_matches_xla(name):
    batch, ds = _packed()
    assert supports_fused_ea(batch, H)
    m_ref, m_fused = _models(name, ds)
    variables = m_ref.init(jax.random.key(0), batch, deterministic=True)
    p_ref, _ = m_ref.apply(variables, batch, deterministic=True)
    p_fused, _ = m_fused.apply(variables, batch, deterministic=True)
    gm = np.asarray(batch.graph_mask)
    np.testing.assert_allclose(
        np.asarray(p_ref)[gm], np.asarray(p_fused)[gm],
        rtol=2e-4, atol=2e-5,
    )


@pytest.mark.parametrize("name", ["EA_GNN", "EA_GNN_Shared"])
def test_fused_grads_match_xla(name):
    """Full-model gradient parity: covers de_win threading across blocks,
    the halo fold, dfar via the take() transpose, every dW and the skip
    pass-through (L=3 has a middle skip layer)."""
    batch, ds = _packed(seed=3)
    m_ref, m_fused = _models(name, ds)
    variables = m_ref.init(jax.random.key(1), batch, deterministic=True)

    def loss(m):
        def f(params):
            pred, _ = m.apply({"params": params}, batch,
                              deterministic=True)
            return jnp.sum(jnp.where(batch.graph_mask, pred, 0.0) ** 2)
        return f

    g_ref = jax.grad(loss(m_ref))(variables["params"])
    g_fused = jax.grad(loss(m_fused))(variables["params"])
    flat_r, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_f, _ = jax.tree_util.tree_flatten_with_path(g_fused)
    for (kp, a), (_, b) in zip(flat_r, flat_f):
        a, b = np.asarray(a), np.asarray(b)
        denom = max(float(np.abs(a).max()), 1e-6)
        assert float(np.abs(a - b).max()) / denom < 2e-4, (
            jax.tree_util.keystr(kp))


def test_fused_supernode_batch_forward_and_grads():
    """Supernode star edges ride the ordinary windows for EA models (no
    analytic-star machinery on this path) — the fused kernel must agree
    on a supernode batch in BOTH passes (supernode rows are high-degree
    hubs, the stress case for the scatter-mean and sender folds)."""
    batch, ds = _packed(seed=4, supernode=True)
    m_ref, m_fused = _models("EA_GNN_Shared", ds, supernode=True)
    variables = m_ref.init(jax.random.key(0), batch, deterministic=True)
    p_ref, _ = m_ref.apply(variables, batch, deterministic=True)
    p_fused, _ = m_fused.apply(variables, batch, deterministic=True)
    gm = np.asarray(batch.graph_mask)
    np.testing.assert_allclose(
        np.asarray(p_ref)[gm], np.asarray(p_fused)[gm],
        rtol=2e-4, atol=2e-5,
    )

    def loss(m):
        def f(params):
            pred, _ = m.apply({"params": params}, batch,
                              deterministic=True)
            return jnp.sum(jnp.where(batch.graph_mask, pred, 0.0) ** 2)
        return f

    g_ref = jax.grad(loss(m_ref))(variables["params"])
    g_fused = jax.grad(loss(m_fused))(variables["params"])
    flat_r, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_f, _ = jax.tree_util.tree_flatten_with_path(g_fused)
    for (kp, a), (_, b) in zip(flat_r, flat_f):
        a, b = np.asarray(a), np.asarray(b)
        denom = max(float(np.abs(a).max()), 1e-6)
        assert float(np.abs(a - b).max()) / denom < 2e-4, (
            jax.tree_util.keystr(kp))


def test_remat_true_forces_unfused_path():
    """remat=True is the escape hatch to the windowed XLA path; results
    must still match (and the fused path must not run — it would ignore
    the remat request silently otherwise)."""
    batch, ds = _packed(seed=5)
    kwargs = dict(
        num_node_features=ds[0].x.shape[1], num_edge_features=5,
        hidden_channels=H, num_layers=2, pooling_layer="mean",
        dropout_rate=0.0, model_name="EA_GNN_Shared",
    )
    m_fused = BuckGNN(impl="banded_pallas", **kwargs)
    m_remat = BuckGNN(impl="banded_pallas", remat=True, **kwargs)
    variables = m_fused.init(jax.random.key(0), batch, deterministic=True)
    p_f, _ = m_fused.apply(variables, batch, deterministic=True)
    p_r, _ = m_remat.apply(variables, batch, deterministic=True)
    gm = np.asarray(batch.graph_mask)
    np.testing.assert_allclose(np.asarray(p_f)[gm], np.asarray(p_r)[gm],
                               rtol=2e-4, atol=2e-5)


def test_encoder_fusion_matches_xla_encoder():
    """Layer-0 encoder fusion (encoder_params): the in-kernel 3-layer
    edge-encoder chain (zero-padded weights, VERDICT r4 next #3) must
    reproduce the XLA-encoder -> fused-block formulation in BOTH passes,
    including the encoder weight/bias grads accumulated in VMEM (vs the
    autodiff of the XLA MLP). h=256 exercises the production (64, 128,
    h) widths with a kernel-level call — no model plumbing."""
    from buckgnn_tpu.ops.pallas_ea_block import (
        fused_ea_block, supports_fused_encoder,
    )

    h, fe = 256, 5
    batch, _ = _packed(seed=6)
    assert supports_fused_encoder(batch, h, fe)
    rng = np.random.default_rng(0)

    def dense(shape):
        return jnp.asarray(
            rng.normal(size=shape, scale=1.0 / np.sqrt(shape[0]))
            .astype(np.float32))

    params = {
        "edge_mlp": {"lin_0": {"kernel": dense((3 * h, h)),
                               "bias": dense((h,))},
                     "lin_1": {"kernel": dense((h, h)),
                               "bias": dense((h,))}},
        "node_mlp_phi": {"lin_0": {"kernel": dense((2 * h, h)),
                                   "bias": dense((h,))},
                         "lin_1": {"kernel": dense((h, h)),
                                   "bias": dense((h,))}},
        "node_mlp_gamma": {"lin_0": {"kernel": dense((2 * h, h)),
                                     "bias": dense((h,))},
                           "lin_1": {"kernel": dense((h, h)),
                                     "bias": dense((h,))}},
        "node_mlp_beta": {"lin_0": {"kernel": dense((h, h)),
                                    "bias": dense((h,))},
                          "lin_1": {"kernel": dense((h, h)),
                                    "bias": dense((h,))}},
    }
    enc_params = {
        "lin_0": {"kernel": dense((fe, 64)), "bias": dense((64,))},
        "lin_1": {"kernel": dense((64, 128)), "bias": dense((128,))},
        "lin_2": {"kernel": dense((128, h)), "bias": dense((h,))},
    }
    x = jnp.asarray(rng.normal(size=(batch.n_node_cap, h))
                    .astype(np.float32))
    raw = batch.win_edges.astype(jnp.float32)

    def xla_encode(ep, r):
        t = jnp.maximum(r @ ep["lin_0"]["kernel"] + ep["lin_0"]["bias"],
                        0.0)
        t = jnp.maximum(t @ ep["lin_1"]["kernel"] + ep["lin_1"]["bias"],
                        0.0)
        return t @ ep["lin_2"]["kernel"] + ep["lin_2"]["bias"]

    kw = dict(skip=False, rate=0.0, seed=None, deterministic=True)

    def out_ref(p, ep):
        zx, ze = fused_ea_block(x, xla_encode(ep, raw), p, batch, **kw)
        return zx, ze

    def out_enc(p, ep):
        zx, ze = fused_ea_block(x, raw, p, batch, encoder_params=ep, **kw)
        return zx, ze

    (zx_r, ze_r) = out_ref(params, enc_params)
    (zx_e, ze_e) = out_enc(params, enc_params)
    np.testing.assert_allclose(np.asarray(zx_r), np.asarray(zx_e),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ze_r), np.asarray(ze_e),
                               rtol=2e-4, atol=2e-5)

    def loss(out_fn):
        def f(p, ep):
            zx, ze = out_fn(p, ep)
            return jnp.sum(zx ** 2) + jnp.sum(ze ** 2)
        return f

    g_ref = jax.grad(loss(out_ref), argnums=(0, 1))(params, enc_params)
    g_enc = jax.grad(loss(out_enc), argnums=(0, 1))(params, enc_params)
    flat_r, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_e, _ = jax.tree_util.tree_flatten_with_path(g_enc)
    for (kp, a), (_, b) in zip(flat_r, flat_e):
        a, b = np.asarray(a), np.asarray(b)
        denom = max(float(np.abs(a).max()), 1e-6)
        assert float(np.abs(a - b).max()) / denom < 2e-4, (
            jax.tree_util.keystr(kp))


def test_model_encoder_fusion_h256_forward_and_grads():
    """Model-level parity at h=256, where supports_fused_encoder engages
    and block 0 consumes the RAW edge window with the encoder in-kernel:
    predictions AND every gradient (including edge_encoder's, now
    accumulated in VMEM) must match the XLA path; the edge_encoder param
    tree must be identical between paths (checkpoint compatibility)."""
    batch, ds = _packed(seed=7)
    kwargs = dict(
        num_node_features=ds[0].x.shape[1], num_edge_features=5,
        hidden_channels=256, num_layers=2, pooling_layer="mean",
        dropout_rate=0.0, model_name="EA_GNN_Shared",
    )
    m_ref = BuckGNN(impl="xla", **kwargs)
    m_fused = BuckGNN(impl="banded_pallas", **kwargs)
    variables = m_ref.init(jax.random.key(2), batch, deterministic=True)
    v_fused = m_fused.init(jax.random.key(2), batch, deterministic=True)
    assert (jax.tree.structure(variables["params"])
            == jax.tree.structure(v_fused["params"]))
    p_ref, _ = m_ref.apply(variables, batch, deterministic=True)
    p_fused, _ = m_fused.apply(variables, batch, deterministic=True)
    gm = np.asarray(batch.graph_mask)
    np.testing.assert_allclose(
        np.asarray(p_ref)[gm], np.asarray(p_fused)[gm],
        rtol=2e-4, atol=2e-5,
    )

    def loss(m):
        def f(params):
            pred, _ = m.apply({"params": params}, batch,
                              deterministic=True)
            return jnp.sum(jnp.where(batch.graph_mask, pred, 0.0) ** 2)
        return f

    g_ref = jax.grad(loss(m_ref))(variables["params"])
    g_fused = jax.grad(loss(m_fused))(variables["params"])
    flat_r, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_f, _ = jax.tree_util.tree_flatten_with_path(g_fused)
    for (kp, a), (_, b) in zip(flat_r, flat_f):
        a, b = np.asarray(a), np.asarray(b)
        denom = max(float(np.abs(a).max()), 1e-6)
        assert float(np.abs(a - b).max()) / denom < 2e-4, (
            jax.tree_util.keystr(kp))
