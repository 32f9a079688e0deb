"""Verify + time the fused whole-layer SAGE kernel on the real chip.

Checks:
  1. eval forward == unfused composition (bf16 tolerances)
  2. training forward/backward dropout streams agree (grad wrt a probe
     direction is consistent with the forward's zero pattern)
  3. flagship virtual-edge step time, fused vs unfused, one process

Usage: timeout 1800 python benchmarks/probe_fused_layer.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from buckgnn_tpu.graph.batch import pack_graphs
from buckgnn_tpu.graph.synthetic import generate_dataset
from buckgnn_tpu.models.blocks import l2_normalize
from buckgnn_tpu.ops.banded import banded_sage_aggregate, make_agg_context
from buckgnn_tpu.ops.dropout import dropout_scale
from buckgnn_tpu.ops import pallas_sage_layer as fsl


def unit_checks():
    rng = np.random.default_rng(0)
    ds = generate_dataset(8, seed=0, min_side=8, max_side=12,
                          use_super_node=False, use_virtual_edges=True)
    n = sum(g.n_node for g in ds) + 1
    tile, width = 256, 128
    ncap = ((max(n, tile + width) + tile - 1) // tile) * tile
    ecap = ((sum(g.n_edge for g in ds) + 127) // 128) * 128
    batch = pack_graphs(ds, ncap, ecap, 9, band_width=width, band_tile=tile)
    ctx = make_agg_context(batch, band_dtype=jnp.bfloat16, use_pallas=True)
    h = 512
    x = jnp.asarray(rng.normal(size=(ncap, h)), jnp.bfloat16)
    x = x.at[batch.dead_node_index].set(0.0)
    w_l = jnp.asarray(rng.normal(size=(h, h)) * 0.05, jnp.bfloat16)
    b_l = jnp.asarray(rng.normal(size=(h,)) * 0.05, jnp.bfloat16)
    w_r = jnp.asarray(rng.normal(size=(h, h)) * 0.05, jnp.bfloat16)

    # 1. eval forward parity
    z = jax.jit(lambda *a: fsl.fused_sage_layer(
        *a, ctx, skip=True, rate=0.0, seed=None, deterministic=True))(
        x, w_l, b_l, w_r)
    agg = banded_sage_aggregate(x, ctx, aggr="add")
    want = jax.nn.relu(l2_normalize(
        (agg @ w_l + b_l + x @ w_r).astype(jnp.float32))) + x.astype(
        jnp.float32)
    zf = np.asarray(z, np.float32)
    wf = np.asarray(want, np.float32)
    nm = np.asarray(batch.node_mask)
    err = np.abs(zf - wf)[nm].max()
    print(f"eval fwd max err vs composition: {err:.4f}", flush=True)
    assert err < 0.05, "fused forward mismatch"

    # 2. training: dropout fwd/bwd stream identity
    RATE = 0.1
    seed = jnp.asarray([123, 456], jnp.int32)
    zt = jax.jit(lambda *a: fsl.fused_sage_layer(
        *a, ctx, skip=True, rate=RATE, seed=seed, deterministic=False))(
        x, w_l, b_l, w_r)
    zt = np.asarray(zt, np.float32)
    kept = zt != 0.0
    frac = kept[nm].mean()
    print(f"train fwd kept fraction: {frac:.4f} (want ~{1-RATE})", flush=True)
    assert abs(frac - (1 - RATE)) < 5e-3

    probe = jnp.asarray(rng.normal(size=zt.shape), jnp.bfloat16)

    def loss(xx):
        zz = fsl.fused_sage_layer(xx, w_l, b_l, w_r, ctx, skip=True,
                                  rate=RATE, seed=seed, deterministic=False)
        return jnp.sum(zz.astype(jnp.float32) * probe.astype(jnp.float32))

    dx = jax.jit(jax.grad(loss))(x)
    assert np.isfinite(np.asarray(dx, np.float32)).all()
    # grads flow and weight grads are finite
    dwl = jax.jit(jax.grad(lambda w: jnp.sum(fsl.fused_sage_layer(
        x, w, b_l, w_r, ctx, skip=True, rate=RATE, seed=seed,
        deterministic=False).astype(jnp.float32) * probe)))(w_l)
    assert np.isfinite(np.asarray(dwl, np.float32)).all()
    print("train bwd finite (dx, dW_l)", flush=True)

    # mask consistency: rate with a second seed changes the pattern; the
    # same seed reproduces it exactly
    zt2 = jax.jit(lambda *a: fsl.fused_sage_layer(
        *a, ctx, skip=True, rate=RATE, seed=seed, deterministic=False))(
        x, w_l, b_l, w_r)
    assert (np.asarray(zt2, np.float32) == zt).all(), "same seed must repeat"

    # fwd/bwd dropout STREAM IDENTITY: the backward regenerates the mask
    # from the same per-(seed, tile) streams (fwd kernel is 4-tile
    # unrolled, merged bwd 2-tile — both key on the ABSOLUTE tile index).
    # Decisive check: extract the ACTUAL mask from the forward's zeros,
    # rebuild the loss in XLA with that exact mask, and compare ANALYTIC
    # gradients. (A finite-difference check is useless here: the bf16
    # input cast swallows the perturbation non-uniformly.)
    keep = jnp.asarray(zt != 0.0, jnp.float32)
    scale = dropout_scale(RATE)

    def loss_ref_masked(xx, wl):
        agg = banded_sage_aggregate(xx, ctx, aggr="add")
        out = (agg.astype(jnp.float32) @ wl.astype(jnp.float32)
               + b_l.astype(jnp.float32)
               + xx.astype(jnp.float32) @ w_r.astype(jnp.float32))
        y = l2_normalize(out)
        r = jnp.maximum(y, 0.0) + xx.astype(jnp.float32)
        return jnp.sum(keep * r * scale * probe.astype(jnp.float32))

    def loss_fused(xx, wl):
        zz = fsl.fused_sage_layer(xx, wl, b_l, w_r, ctx, skip=True,
                                  rate=RATE, seed=seed,
                                  deterministic=False)
        return jnp.sum(zz.astype(jnp.float32) * probe.astype(jnp.float32))

    gf = jax.jit(jax.grad(loss_fused, argnums=(0, 1)))(x, w_l)
    gr = jax.jit(jax.grad(loss_ref_masked, argnums=(0, 1)))(x, w_l)
    for a, b, name in zip(gf, gr, ("dx", "dW_l")):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        rel = np.abs(a - b).max() / max(np.abs(b).max(), 1e-9)
        print(f"dropout-stream grad parity {name}: max rel {rel:.5f}",
              flush=True)
        assert rel < 0.03, (name, rel)
    print("unit checks OK", flush=True)


def step_ab():
    for name, kw in {
        "virtual-edges (fused layers)": dict(),
        "supernode (fused layers)": dict(use_super_node=True),
    }.items():
        setup = bench.build_bench_setup(**kw)
        res = bench.run_bench(setup, n_warmup=3, n_steps=20)
        print(f"== {name} ==  train {res['train_step_ms']:.2f} ms "
              f"({res['train_edges_per_s']/1e6:.2f}M e/s)  "
              f"eval {res['infer_step_ms']:.2f} ms "
              f"({res['infer_samples_per_s']:.0f} samples/s)", flush=True)


if __name__ == "__main__":
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    unit_checks()
    step_ab()
