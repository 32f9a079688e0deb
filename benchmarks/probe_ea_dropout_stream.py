"""Decisive fwd/bwd dropout-stream check for the fused EA block (TPU):
extract the ACTUAL keep masks from the fused forward's zeros (neither
output stream is relu'd, so exact zeros identify dropped slots up to
measure-zero coincidences), rebuild the block + mask in XLA via the
windowed formulation, and compare analytic gradients at bf16
tolerances — the EA analog of benchmarks/probe_dropout_stream.py.

Usage: timeout 1800 python benchmarks/probe_ea_dropout_stream.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from buckgnn_tpu.graph.batch import pack_graphs
from buckgnn_tpu.graph.synthetic import generate_dataset
from buckgnn_tpu.ops import ea_windowed as eaw
from buckgnn_tpu.ops.pallas_ea_block import fused_ea_block, supports_fused_ea

RATE = 0.1
SCALE = 1.0 / (1.0 - RATE)
H = 512
TILE, WIDTH = 128, 64


def main():
    rng = np.random.default_rng(0)
    ds = generate_dataset(12, seed=0, min_side=8, max_side=12,
                          use_super_node=False, use_virtual_edges=True)
    n = sum(g.n_node for g in ds) + 1
    ncap = ((max(n, TILE + WIDTH) + 4 * TILE - 1)
            // (4 * TILE)) * (4 * TILE)
    ecap = ((sum(g.n_edge for g in ds) + 127) // 128) * 128
    batch = pack_graphs(ds, ncap, ecap, 13, band_width=WIDTH,
                        band_tile=TILE)
    assert supports_fused_ea(batch, H)
    n_tiles = ncap // TILE
    w_cap = batch.win_edges.shape[1]

    def w(shape, s=0.05):
        return jnp.asarray(rng.normal(size=shape) * s, jnp.bfloat16)

    params = {
        "edge_mlp": {"lin_0": {"kernel": w((3 * H, H)),
                               "bias": w((H,), 0.02).astype(jnp.float32)},
                     "lin_1": {"kernel": w((H, H)),
                               "bias": w((H,), 0.02).astype(jnp.float32)}},
        "node_mlp_phi": {"lin_0": {"kernel": w((2 * H, H)),
                                   "bias": w((H,), 0.02).astype(jnp.float32)},
                         "lin_1": {"kernel": w((H, H)),
                                   "bias": w((H,), 0.02).astype(jnp.float32)}},
        "node_mlp_gamma": {"lin_0": {"kernel": w((2 * H, H)),
                                     "bias": w((H,), 0.02).astype(jnp.float32)},
                           "lin_1": {"kernel": w((H, H)),
                                     "bias": w((H,), 0.02).astype(jnp.float32)}},
        "node_mlp_beta": {"lin_0": {"kernel": w((H, H)),
                                    "bias": w((H,), 0.02).astype(jnp.float32)},
                          "lin_1": {"kernel": w((H, H)),
                                    "bias": w((H,), 0.02).astype(jnp.float32)}},
    }
    x = w((ncap, H), 0.1).at[batch.dead_node_index].set(0.0)
    e_win = w((n_tiles, w_cap, H), 0.1)
    seed = jnp.asarray([321, 654], jnp.int32)

    # probes restricted to REAL rows/slots (window pads produce inert
    # bias garbage in ze that nothing downstream consumes)
    node_ok = np.asarray(batch.node_mask, np.float32)[:, None]
    slot_ok = (np.asarray(batch.win_ridx) < TILE).astype(
        np.float32)[..., None]
    p_x = jnp.asarray(rng.normal(size=(ncap, H)) * node_ok, jnp.float32)
    p_e = jnp.asarray(rng.normal(size=(n_tiles, w_cap, H)) * slot_ok,
                      jnp.float32)

    fused = jax.jit(lambda xx, ee: fused_ea_block(
        xx, ee, params, batch, skip=True, rate=RATE, seed=seed,
        deterministic=False))
    zx, ze = fused(x, e_win)
    kx = jnp.asarray(np.asarray(zx, np.float32) != 0.0, jnp.float32)
    ke = jnp.asarray(np.asarray(ze, np.float32) != 0.0, jnp.float32)
    drop_frac = 1.0 - float(np.asarray(ke).mean())
    print(f"extracted e-mask drop fraction {drop_frac:.4f} "
          f"(rate {RATE})", flush=True)

    def loss_fused(xx, ee, k_e0):
        p2 = jax.tree.map(lambda v: v, params)
        p2["edge_mlp"]["lin_0"]["kernel"] = k_e0
        zx_, ze_ = fused_ea_block(xx, ee, p2, batch, skip=True,
                                  rate=RATE, seed=seed,
                                  deterministic=False)
        return (jnp.sum(zx_.astype(jnp.float32) * p_x)
                + jnp.sum(ze_.astype(jnp.float32) * p_e))

    geom = eaw.window_geometry(batch)
    degree = eaw.window_degree(batch)
    sidx, ridx = batch.win_sidx, batch.win_ridx
    fpos, fsend = batch.win_far_pos, batch.win_far_send

    def make_ref_loss(kx_m, ke_m, sc):
        def loss_ref(xx, ee, k_e0):
            return _ref(xx, ee, k_e0, kx_m, ke_m, sc)
        return loss_ref

    def _ref(xx, ee, k_e0, kx_m, ke_m, sc):
        f32 = jnp.float32

        def g_r(p):
            return eaw.gather_receivers(p, ridx, geom)

        def g_s(p):
            return eaw.gather_senders(p, sidx, fpos, fsend, geom)

        k_p0 = params["node_mlp_phi"]["lin_0"]["kernel"]
        k_g0 = params["node_mlp_gamma"]["lin_0"]["kernel"]
        bm = params
        e1 = jax.nn.relu(
            g_r(xx @ k_e0[:H]).astype(f32)
            + g_s(xx @ k_e0[H:2 * H]).astype(f32)
            + (ee @ k_e0[2 * H:]).astype(f32)
            + bm["edge_mlp"]["lin_0"]["bias"]).astype(jnp.bfloat16)
        e2 = ((e1 @ bm["edge_mlp"]["lin_1"]["kernel"]).astype(f32)
              + bm["edge_mlp"]["lin_1"]["bias"])
        e2c = e2.astype(jnp.bfloat16)
        m1 = jax.nn.relu(
            g_s(xx @ k_p0[:H]).astype(f32)
            + (e2c @ k_p0[H:]).astype(f32)
            + bm["node_mlp_phi"]["lin_0"]["bias"]).astype(jnp.bfloat16)
        msg = ((m1 @ bm["node_mlp_phi"]["lin_1"]["kernel"]).astype(f32)
               + bm["node_mlp_phi"]["lin_1"]["bias"]).astype(jnp.bfloat16)
        agg = eaw.scatter_mean_messages(msg, ridx, degree, geom)
        g1 = jax.nn.relu(
            (xx @ k_g0[:H]).astype(f32)
            + (agg @ k_g0[H:]).astype(f32)
            + bm["node_mlp_gamma"]["lin_0"]["bias"]).astype(jnp.bfloat16)
        x1 = ((g1 @ bm["node_mlp_gamma"]["lin_1"]["kernel"]).astype(f32)
              + bm["node_mlp_gamma"]["lin_1"]["bias"])
        x1c = x1.astype(jnp.bfloat16)
        b1 = jax.nn.relu(
            (x1c @ bm["node_mlp_beta"]["lin_0"]["kernel"]).astype(f32)
            + bm["node_mlp_beta"]["lin_0"]["bias"]).astype(jnp.bfloat16)
        x2 = x1 + (b1 @ bm["node_mlp_beta"]["lin_1"]["kernel"]).astype(f32) \
            + bm["node_mlp_beta"]["lin_1"]["bias"]
        out_x = (x2 + xx.astype(f32)) * kx_m * sc
        out_e = (e2 + ee.astype(f32)) * ke_m * sc
        return jnp.sum(out_x * p_x) + jnp.sum(out_e * p_e)

    loss_ref = make_ref_loss(kx, ke, SCALE)
    ref_loss_rate0 = make_ref_loss(jnp.ones_like(kx), jnp.ones_like(ke),
                                   1.0)

    # rate-0 CONTROL on the same pair of formulations: fused-vs-windowed
    # bf16 accumulation noise WITHOUT dropout — the dropout check then
    # asserts rate-R deviations stay at that baseline (a wrong mask in
    # either pass would blow the rate-R grads up by orders of magnitude;
    # exact-math parity of both passes is the CPU interpret test)
    fused0 = jax.jit(lambda xx, ee: fused_ea_block(
        xx, ee, params, batch, skip=True, rate=0.0, seed=None,
        deterministic=True))
    zx0, ze0 = fused0(x, e_win)
    del zx0, ze0

    def loss_fused0(xx, ee, k_e0):
        p2 = jax.tree.map(lambda v: v, params)
        p2["edge_mlp"]["lin_0"]["kernel"] = k_e0
        zx_, ze_ = fused_ea_block(xx, ee, p2, batch, skip=True,
                                  rate=0.0, seed=None,
                                  deterministic=True)
        return (jnp.sum(zx_.astype(jnp.float32) * p_x)
                + jnp.sum(ze_.astype(jnp.float32) * p_e))

    k_e0 = params["edge_mlp"]["lin_0"]["kernel"]
    lf = float(jax.jit(loss_fused)(x, e_win, k_e0))
    lr = float(jax.jit(loss_ref)(x, e_win, k_e0))
    print(f"loss fused={lf:.2f} ref(masked)={lr:.2f} "
          f"rel={abs(lf - lr) / max(abs(lr), 1e-6):.5f}", flush=True)
    assert abs(lf - lr) / max(abs(lr), 1e-6) < 0.01

    def norms(ga, gb, name):
        a = np.asarray(ga, np.float64)
        b = np.asarray(gb, np.float64)
        if name == "dx":
            a, b = a * node_ok, b * node_ok
        if name == "de_win":
            a, b = a * slot_ok, b * slot_ok
        nrel = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9)
        mrel = np.abs(a - b).max() / max(np.abs(b).max(), 1e-9)
        return nrel, mrel

    gf = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2)))(x, e_win, k_e0)
    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(x, e_win, k_e0)
    gf0 = jax.jit(jax.grad(loss_fused0, argnums=(0, 1, 2)))(x, e_win,
                                                            k_e0)
    gr0 = jax.jit(jax.grad(ref_loss_rate0, argnums=(0, 1, 2)))(
        x, e_win, k_e0)
    ok = True
    for a, b, a0, b0, name in zip(gf, gr, gf0, gr0,
                                  ("dx", "de_win", "dK_e0")):
        nrel, mrel = norms(a, b, name)
        nrel0, mrel0 = norms(a0, b0, name)
        print(f"{name}: rate-{RATE} norm-rel {nrel:.5f} (max {mrel:.4f})"
              f" | rate-0 baseline norm-rel {nrel0:.5f} (max {mrel0:.4f})",
              flush=True)
        # dropout must not add error beyond the formulation baseline
        ok = ok and nrel < max(3.0 * nrel0, 0.02)
    assert ok
    print("EA DROPOUT-STREAM OK", flush=True)


if __name__ == "__main__":
    main()
