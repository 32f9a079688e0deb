"""Fully-fused edge-augmented GraphNetBlock (Pallas, TPU).

One kernel invocation runs, per node tile, the ENTIRE block the reference
computes as edge_mlp -> phi -> scatter_mean -> gamma -> beta
(/root/reference/Models/BuckGNN.py:528-566) plus the stack-level skip and
dropout (:103-106):

    e1  = relu(x_r @ K_er + x_s @ K_es + e @ K_ee + b_e0)
    e'  = e1 @ W_e1 + b_e1
    m1  = relu(x_s @ K_px + e' @ K_pe + b_p0)
    agg = scatter_mean(m1 @ W_p1 + b_p1 over receivers)
    g1  = relu([x | agg] @ W_g0 + b_g0);  x1 = g1 @ W_g1 + b_g1
    x'  = x1 + relu(x1 @ W_b0 + b_b0) @ W_b1 + b_b1
    out = dropout(x' (+ x_in), e' (+ e_in))

Rationale (measured round 3, benchmarks/probe_ea_profile.py): the
windowed-XLA EA step is HBM-bound — 92% of its 185 ms device time sits in
~85 separate window fusions over [T, W, 512] / [*, 1536] arrays; every
MLP boundary round-trips 244-732 MB of edge-window activations through
HBM. Fusing the whole block touches the edge window once in, once out;
every intermediate lives in VMEM. Design brief:
docs/ea_fused_block_design.md.

Geometry (graph/batch.py): edges are receiver-sorted into per-node-tile
windows of W slots. Senders resolve through ONE selection space — the
EXTENDED slab: rows [0, slab) are the tile's contiguous x-slab (DMA'd
like the SAGE kernels' _slab_copy), rows [slab, slab + Ct) are the
tile's out-of-band ("far") sender rows, pre-gathered in XLA as
x[win_far_tsend] and fed as a [T, Ct, H] input. win_sidx carries the
extended code (far slots = slab + rank, pads = FAR_SLOT_SENTINEL), so
in-band and far senders ride the same [W, slab + Ct] iota-compare
selection matmul and the far correction never materializes a [T, W, H]
add in XLA. Receivers are tile-local ([W, tile] selection); the
scatter-mean is the transposed receiver selection. Selections are built
in f32 then converted — the i1 relayout does not compile (see
pallas_sage_layer.SPILL_SCHED notes).

Backward: ONE kernel per tile replays the forward chain from STORED
e1/m1 residuals (the forward emits the two post-relu edge/phi
activations as [T, W, H] outputs; recomputing the edge front-end
instead was measured ~20% more bwd flops, and the extra residual
round trip hides under DMA — RESULTS.md round-4 ladder), accumulates
every weight/bias grad in f32 VMEM across the sequential grid (zeroed
at grid step 0, += unconditionally after), and emits de_win, a
receiver-tiled dfar table, and the sender dx in two parts: the
tile-center block plus a [2*width, H] halo of slab-overlap
contributions (slabs of adjacent tiles overlap by width). In XLA, the
halo folds into dx with two shifted pad-adds, and dfar folds into dx
via the win_fs_src/win_fs_lidx sender-window one-hot matmul inside
_fused_block_bwd — x_far itself is gathered under stop_gradient and
its cotangent declared zero (a take() transpose would materialize an
unfoldable scatter of zeros; the star-table lesson). Dropout masks are
regenerated from the per-(layer, tile) seed exactly like the fused
SAGE kernels — no PRNG output ever touches HBM; CPU runs use interpret
mode at rate 0 (the in-kernel PRNG needs a real TPU).

Scope guards: `supports_fused_ea` — windowed batch with tiled far
fields, H % 128 == 0, width % 16 == 0, width <= tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import dtypes
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from buckgnn_tpu.ops.dropout import dropout_scale, dropout_threshold
from buckgnn_tpu.ops.pallas_sage_layer import (
    DROPOUT_BITS,
    _keep_mask,
    _pick_unroll,
    _seed_tile,
    _slab_copy,
    _StaticDict,
)

_VMEM_LIMIT = 100 * 1024 * 1024
_NBUF = 4
# tiles per grid step. Unroll 2 measured NEGATIVE on the v5e
# (benchmarks/probe_ea_tile.py, 2026-08-21): tile-128 flagship step
# 136.8 -> 162.2 ms/step fwd+bwd unrolled (tile-256 was a wash,
# 162.0 -> 159.3) — the doubled body blows past the schedulable live-set
# and Mosaic spills, unlike the SAGE kernels whose per-tile chains are
# far shorter. Machinery kept for re-testing on other shapes.
_UNROLL_FWD = 1
_UNROLL_BWD = 1

# weight-dict key order for the kernels' positional args
_WKEYS = ("wer", "wee", "wsp", "we1", "wpe", "wp1", "wg0", "wg1", "wb0",
          "wb1", "bias")
# extra keys in encoder-fusion mode (layer 0): padded edge_encoder
# weights; their biases ride as rows 8..10 of the (11, h) bias stack
_ENC_WKEYS = ("wen0", "wen1", "wen2")


def _zero_tangent(v):
    if jnp.issubdtype(v.dtype, jnp.integer) or v.dtype == jnp.bool_:
        return np.zeros(v.shape, dtypes.float0)
    return jnp.zeros_like(v)


def _cast_dwd(wd, grads, keys):
    """Weight-grad dict for the custom-VJP returns: each f32 accumulator
    cast back to its weight's dtype (shared by both backward variants)."""
    return {k: g.astype(wd[k].dtype) for k, g in zip(keys, grads)}


def _sel(codes, k, dtype):
    """[rows, k] selection: sel[r, j] = (codes[r] == j); codes [rows, 1].
    Built in f32 then converted (Mosaic can't relayout the i1 mask)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (codes.shape[0], k), 1)
    return jnp.where(iota == codes, jnp.float32(1),
                     jnp.float32(0)).astype(dtype)


def _loc_of(t, *, tile, width, n_nodes):
    slab = tile + width
    start = jnp.clip(t * tile - width // 2, 0, max(n_nodes - slab, 0))
    return pl.multiple_of(t * tile - start, 8)


def _stage_offset(t, *, tile, width, n_nodes):
    """Offset of the slab inside the [tile + 2*width] virtual window
    whose row v covers node t*tile - width + v (so v = r + start -
    (t*tile - width) for slab row r): width for the clamped first tile,
    width//2 interior, 0 for the clamped last tile."""
    slab = tile + width
    start = jnp.clip(t * tile - width // 2, 0, max(n_nodes - slab, 0))
    return pl.multiple_of(start - t * tile + width, 8)


def _colsum(v):
    return jnp.sum(v, axis=0, keepdims=True)


def _enc_chain(raw, wen0_ref, wen1_ref, wen2_ref, bias_ref, *, cdt):
    """In-kernel edge ENCODER (VERDICT r4 next #3): the reference's
    3-layer edge_encoder MLP (in->64->128->h, Models/BuckGNN.py:67-82,
    feeding the first block at :326-327) computed from the RAW edge
    window [W, fe8] instead of reading the [W, h] encoded window from
    HBM. Weights are zero-padded to (fe8, 128)/(128, 128)/(128, h) —
    relu(0 + 0) == 0, so the padded lanes are exactly inert and the
    sliced-back weight grads land in the real regions. Returns the two
    post-relu hiddens (the backward reads relu' signs off them) and the
    encoder output."""
    f32 = jnp.float32
    w128 = wen1_ref.shape[0]
    b0 = bias_ref[8:9].astype(f32)[:, :w128]
    b1 = bias_ref[9:10].astype(f32)[:, :w128]
    b2 = bias_ref[10:11].astype(f32)
    z1 = jnp.dot(raw, wen0_ref[...], preferred_element_type=f32) + b0
    h1 = jnp.maximum(z1, 0.0).astype(cdt)
    z2 = jnp.dot(h1, wen1_ref[...], preferred_element_type=f32) + b1
    h2 = jnp.maximum(z2, 0.0).astype(cdt)
    e_in = (jnp.dot(h2, wen2_ref[...], preferred_element_type=f32)
            + b2).astype(cdt)
    return h1, h2, e_in


def _recompute(slab_ref, slot, far, e_in, sel_r, sel_s, cnt,
               wer_ref, wee_ref, wsp_ref, we1_ref, wpe_ref, wp1_ref,
               wg0_ref, wg1_ref, wb0_ref, wb1_ref, bias_ref,
               *, loc, tile, h, cdt, res=None):
    """Forward chain shared by both kernels. Returns every value the
    backward needs; relu' signs are read off the post-relu values
    (v > 0 <=> z > 0 exactly). ``res=(e1, m1)`` skips the edge-MLP
    front end (projections + selections + z_e1/z_m1) — the backward
    reads those two [W, h] activations as residuals the forward stored
    (recomputing them cost ~20% of the backward's flops; storing costs
    one extra window round trip that the DMA pipeline hides)."""
    f32 = jnp.float32
    x_tile = slab_ref[slot, pl.ds(loc, tile), :]
    ext = jnp.concatenate([slab_ref[slot], far], axis=0)  # [slab+Ct, h]
    if res is None:
        p_r = jnp.dot(x_tile, wer_ref[...],
                      preferred_element_type=f32).astype(cdt)
        p_sp = jnp.dot(ext, wsp_ref[...],
                       preferred_element_type=f32).astype(cdt)
        gs = jnp.dot(sel_s, p_sp, preferred_element_type=f32)  # [W, 2h]
        z_e1 = (
            jnp.dot(sel_r, p_r, preferred_element_type=f32)
            + gs[:, :h]
            + jnp.dot(e_in, wee_ref[...], preferred_element_type=f32)
            + bias_ref[0:1].astype(f32)
        )
        e1 = jnp.maximum(z_e1, 0.0).astype(cdt)
    else:
        e1 = res[0]
    e2f = (jnp.dot(e1, we1_ref[...], preferred_element_type=f32)
           + bias_ref[1:2].astype(f32))
    e2 = e2f.astype(cdt)
    if res is None:
        z_m1 = (gs[:, h:]
                + jnp.dot(e2, wpe_ref[...], preferred_element_type=f32)
                + bias_ref[2:3].astype(f32))
        m1 = jnp.maximum(z_m1, 0.0).astype(cdt)
    else:
        m1 = res[1]
    sm = jax.lax.dot_general(
        sel_r, m1, (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    ).astype(cdt)                                        # [tile, h]
    deg = jnp.maximum(cnt, 1.0)                          # [tile, 1] f32
    aggf = (jnp.dot(sm, wp1_ref[...], preferred_element_type=f32)
            + cnt * bias_ref[3:4].astype(f32)) / deg
    agg = aggf.astype(cdt)
    xa = jnp.concatenate([x_tile, agg], axis=1)          # [tile, 2h]
    z_g = (jnp.dot(xa, wg0_ref[...], preferred_element_type=f32)
           + bias_ref[4:5].astype(f32))
    g1 = jnp.maximum(z_g, 0.0).astype(cdt)
    x1f = (jnp.dot(g1, wg1_ref[...], preferred_element_type=f32)
           + bias_ref[5:6].astype(f32))
    x1 = x1f.astype(cdt)
    z_b = (jnp.dot(x1, wb0_ref[...], preferred_element_type=f32)
           + bias_ref[6:7].astype(f32))
    b1 = jnp.maximum(z_b, 0.0).astype(cdt)
    x2 = x1f + jnp.dot(b1, wb1_ref[...], preferred_element_type=f32) \
        + bias_ref[7:8].astype(f32)
    return dict(x_tile=x_tile, ext=ext, e1=e1, e2f=e2f, e2=e2, m1=m1,
                sm=sm, deg=deg, agg=agg, xa=xa, g1=g1, x1f=x1f, x1=x1,
                b1=b1, x2=x2)


# --------------------------------------------------------------------- #
# forward
# --------------------------------------------------------------------- #


def _fwd_kernel(
    seed_ref,
    e_ref, sidx_ref, ridx_ref, far_ref, cnt_ref,
    wer_ref, wee_ref, wsp_ref, we1_ref, wpe_ref, wp1_ref, wg0_ref,
    wg1_ref, wb0_ref, wb1_ref, bias_ref,
    *rest,
    tile, width, n_nodes, n_tiles, w_cap, ct, h, x_dtype,
    skip, thr, scale, unroll, save_res, enc=False,
):
    if enc:
        # e_ref holds the RAW [unroll, W, fe8] edge window; the encoder
        # runs in-kernel (_enc_chain)
        wen0_ref, wen1_ref, wen2_ref, x_hbm, *outs = rest
    else:
        x_hbm, *outs = rest
    outs = list(outs)
    if save_res:
        zx_ref, ze_ref, e1s_ref, m1s_ref, slab_ref, sem = outs
    else:
        zx_ref, ze_ref, slab_ref, sem = outs
    p = pl.program_id(0)
    base = p * unroll
    copy = functools.partial(_slab_copy, x_hbm, slab_ref, sem,
                             tile=tile, width=width, n_nodes=n_nodes)
    nbuf = slab_ref.shape[0]

    @pl.when(p == 0)
    def _():
        for j in range(min(nbuf, n_tiles)):
            copy(j, slot=j % nbuf).start()

    @pl.when(p > 0)
    def _():
        for j in range(unroll):
            i = base + (nbuf - unroll) + j

            @pl.when(i < n_tiles)
            def _():
                copy(i, slot=jax.lax.rem(i, nbuf)).start()

    cdt = x_dtype
    for sub in range(unroll):
        t = base + sub
        slot = jax.lax.rem(t, nbuf)
        copy(t, slot=slot).wait()
        loc = _loc_of(t, tile=tile, width=width, n_nodes=n_nodes)
        sel_r = _sel(ridx_ref[sub], tile, cdt)
        sel_s = _sel(sidx_ref[sub], tile + width + ct, cdt)
        if enc:
            _, _, e_in = _enc_chain(e_ref[sub], wen0_ref, wen1_ref,
                                    wen2_ref, bias_ref, cdt=cdt)
        else:
            e_in = e_ref[sub]
        r = _recompute(
            slab_ref, slot, far_ref[sub], e_in, sel_r, sel_s,
            cnt_ref[sub],
            wer_ref, wee_ref, wsp_ref, we1_ref, wpe_ref, wp1_ref, wg0_ref,
            wg1_ref, wb0_ref, wb1_ref, bias_ref,
            loc=loc, tile=tile, h=h, cdt=cdt,
        )
        x_out, e_out = r["x2"], r["e2f"]
        if skip:
            x_out = x_out + r["x_tile"].astype(jnp.float32)
            e_out = e_out + e_ref[sub].astype(jnp.float32)
        if thr is not None:
            _seed_tile(seed_ref, t)
            keep_e = _keep_mask(e_out.shape, thr)
            e_out = jnp.where(keep_e, e_out * jnp.float32(scale),
                              jnp.float32(0.0))
            keep_x = _keep_mask(x_out.shape, thr)
            x_out = jnp.where(keep_x, x_out * jnp.float32(scale),
                              jnp.float32(0.0))
        zx_ref[pl.ds(sub * tile, tile), :] = x_out.astype(cdt)
        ze_ref[sub] = e_out.astype(cdt)
        if save_res:
            e1s_ref[sub] = r["e1"]
            m1s_ref[sub] = r["m1"]


def _call_fwd(x, e_win, x_far, wd, sidx, ridx, cnt, seed, *, static,
              save_res=False):
    s = static
    tile, width, h = s["tile"], s["width"], s["h"]
    n, n_tiles = s["n_nodes"], s["n_tiles"]
    w_cap, ct = s["w_cap"], s["ct"]
    enc = bool(s.get("enc"))
    assert not (enc and s["skip"]), "encoder fusion is layer 0 (no skip)"
    unroll = _pick_unroll(n_tiles, _UNROLL_FWD)
    kern = functools.partial(
        _fwd_kernel, tile=tile, width=width, n_nodes=n, n_tiles=n_tiles,
        w_cap=w_cap, ct=ct, h=h, x_dtype=x.dtype, skip=s["skip"],
        thr=s["thr"], scale=s["scale"], unroll=unroll, save_res=save_res,
        enc=enc,
    )
    full = lambda shp: pl.BlockSpec(shp, lambda t: (0,) * len(shp),
                                    memory_space=pltpu.VMEM)
    blk_e = pl.BlockSpec((unroll, w_cap, h), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM)
    # enc mode: the edge-window INPUT is the raw [T, W, fe8] features
    blk_ein = (pl.BlockSpec((unroll, w_cap, e_win.shape[2]),
                            lambda t: (t, 0, 0), memory_space=pltpu.VMEM)
               if enc else blk_e)
    wkeys = _WKEYS + (_ENC_WKEYS if enc else ())
    bias_rows = 11 if enc else 8
    enc_w_specs = ([full(wd["wen0"].shape), full(wd["wen1"].shape),
                    full(wd["wen2"].shape)] if enc else [])
    blk_i = pl.BlockSpec((unroll, w_cap, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM)
    nbuf = max(_NBUF, 2 * unroll) if n_tiles > 2 else 2
    return pl.pallas_call(
        kern,
        grid=(n_tiles // unroll,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # seed
            blk_ein, blk_i, blk_i,
            pl.BlockSpec((unroll, ct, h), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),      # far
            pl.BlockSpec((unroll, tile, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),      # cnt
            full((h, h)), full((h, h)), full((h, 2 * h)), full((h, h)),
            full((h, h)), full((h, h)), full((2 * h, h)), full((h, h)),
            full((h, h)), full((h, h)), full((bias_rows, h)),
        ] + enc_w_specs + [
            pl.BlockSpec(memory_space=pl.ANY),          # x
        ],
        out_specs=[
            pl.BlockSpec((unroll * tile, h), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            blk_e,
        ] + ([blk_e, blk_e] if save_res else []),
        out_shape=[
            jax.ShapeDtypeStruct((n, h), x.dtype),
            jax.ShapeDtypeStruct((n_tiles, w_cap, h), x.dtype),
        ] + ([jax.ShapeDtypeStruct((n_tiles, w_cap, h), x.dtype)] * 2
             if save_res else []),
        scratch_shapes=[
            pltpu.VMEM((nbuf, tile + width, h), x.dtype),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
        interpret=s["interpret"],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(seed, e_win, sidx, ridx, x_far, cnt, *[wd[k] for k in wkeys], x)


# --------------------------------------------------------------------- #
# backward
# --------------------------------------------------------------------- #


def _bwd_kernel(
    seed_ref,
    dzx_ref, dze_ref, e1s_ref, m1s_ref,
    e_ref, sidx_ref, ridx_ref, far_ref, cnt_ref,
    wer_ref, wee_ref, wsp_ref, we1_ref, wpe_ref, wp1_ref, wg0_ref,
    wg1_ref, wb0_ref, wb1_ref, bias_ref,
    *rest,
    tile, width, n_nodes, n_tiles, w_cap, ct, h, x_dtype,
    skip, thr, scale, unroll, enc=False,
):
    if enc:
        # e_ref is the raw window; no de_win output (the raw features
        # carry no gradient) — encoder weight grads instead
        (wen0_ref, wen1_ref, wen2_ref, x_hbm,
         dx_ref, dhalo_ref, dfar_ref,
         dwer_ref, dwee_ref, dwsp_ref, dwe1_ref, dwpe_ref, dwp1_ref,
         dwg0_ref, dwg1_ref, dwb0_ref, dwb1_ref, dbias_ref,
         dwen0_ref, dwen1_ref, dwen2_ref,
         slab_ref, sem, stage_ref) = rest
        deo_ref = None
    else:
        (x_hbm,
         dx_ref, dhalo_ref, deo_ref, dfar_ref,
         dwer_ref, dwee_ref, dwsp_ref, dwe1_ref, dwpe_ref, dwp1_ref,
         dwg0_ref, dwg1_ref, dwb0_ref, dwb1_ref, dbias_ref,
         slab_ref, sem, stage_ref) = rest
    f32 = jnp.float32
    p = pl.program_id(0)
    base = p * unroll
    copy = functools.partial(_slab_copy, x_hbm, slab_ref, sem,
                             tile=tile, width=width, n_nodes=n_nodes)
    nbuf = slab_ref.shape[0]
    slab = tile + width

    @pl.when(p == 0)
    def _():
        for j in range(min(nbuf, n_tiles)):
            copy(j, slot=j % nbuf).start()

    @pl.when(p > 0)
    def _():
        for j in range(unroll):
            i = base + (nbuf - unroll) + j

            @pl.when(i < n_tiles)
            def _():
                copy(i, slot=jax.lax.rem(i, nbuf)).start()

    cdt = x_dtype

    def tile_body(sub):
        t = base + sub
        slot = jax.lax.rem(t, nbuf)
        copy(t, slot=slot).wait()
        loc = _loc_of(t, tile=tile, width=width, n_nodes=n_nodes)
        sel_r = _sel(ridx_ref[sub], tile, cdt)
        sel_s = _sel(sidx_ref[sub], slab + ct, cdt)
        if enc:
            hen1, hen2, e_in = _enc_chain(e_ref[sub], wen0_ref, wen1_ref,
                                          wen2_ref, bias_ref, cdt=cdt)
        else:
            e_in = e_ref[sub]
        cnt = cnt_ref[sub]
        r = _recompute(
            slab_ref, slot, far_ref[sub], e_in, sel_r, sel_s, cnt,
            wer_ref, wee_ref, wsp_ref, we1_ref, wpe_ref, wp1_ref,
            wg0_ref, wg1_ref, wb0_ref, wb1_ref, bias_ref,
            loc=loc, tile=tile, h=h, cdt=cdt,
            res=(e1s_ref[sub], m1s_ref[sub]),
        )

        dzx = dzx_ref[pl.ds(sub * tile, tile), :].astype(f32)
        dze = dze_ref[sub].astype(f32)
        if thr is not None:
            # regenerate the EXACT forward masks: same seed, same draw
            # order (e first, then x)
            _seed_tile(seed_ref, t)
            keep_e = _keep_mask(dze.shape, thr)
            dze = jnp.where(keep_e, dze * jnp.float32(scale),
                            jnp.float32(0.0))
            keep_x = _keep_mask(dzx.shape, thr)
            dzx = jnp.where(keep_x, dzx * jnp.float32(scale),
                            jnp.float32(0.0))

        # relu' masks: compare in f32 — Mosaic has no bf16 vector compare
        # ("Target does not support this comparison"); v > 0 <=> z > 0
        m_b1 = r["b1"].astype(f32) > 0.0
        m_g1 = r["g1"].astype(f32) > 0.0
        m_m1 = r["m1"].astype(f32) > 0.0
        m_e1 = r["e1"].astype(f32) > 0.0

        # ---- beta ----
        dx2 = dzx
        dx2_c = dx2.astype(cdt)
        db1 = jax.lax.dot_general(dx2_c, wb1_ref[...],
                                  (((1,), (1,)), ((), ())),
                                  preferred_element_type=f32)
        dzb = jnp.where(m_b1, db1, 0.0).astype(cdt)
        dx1 = dx2 + jax.lax.dot_general(
            dzb, wb0_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=f32)
        dx1_c = dx1.astype(cdt)
        # ---- gamma ----
        dg1 = jax.lax.dot_general(dx1_c, wg1_ref[...],
                                  (((1,), (1,)), ((), ())),
                                  preferred_element_type=f32)
        dzg = jnp.where(m_g1, dg1, 0.0).astype(cdt)
        dxa = jax.lax.dot_general(dzg, wg0_ref[...],
                                  (((1,), (1,)), ((), ())),
                                  preferred_element_type=f32)  # [tile, 2h]
        dxt = dxa[:, :h]
        dagg = dxa[:, h:]
        # ---- scatter-mean + phi lin1 ----
        dagg_d = dagg / r["deg"]
        dagg_c = dagg_d.astype(cdt)
        dsm = jax.lax.dot_general(dagg_c, wp1_ref[...],
                                  (((1,), (1,)), ((), ())),
                                  preferred_element_type=f32).astype(cdt)
        dm1 = jnp.dot(sel_r, dsm, preferred_element_type=f32)
        dzm = jnp.where(m_m1, dm1, 0.0).astype(cdt)
        de2 = dze + jax.lax.dot_general(
            dzm, wpe_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=f32)
        de2_c = de2.astype(cdt)
        # ---- edge MLP ----
        de1f = jax.lax.dot_general(de2_c, we1_ref[...],
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=f32)
        de1 = jnp.where(m_e1, de1f, 0.0).astype(cdt)
        deo = jax.lax.dot_general(de1, wee_ref[...],
                                  (((1,), (1,)), ((), ())),
                                  preferred_element_type=f32)
        if skip:
            deo = deo + dze
        if enc:
            # backprop deo THROUGH the in-kernel encoder chain instead
            # of writing the [W, h] de_win to HBM: the raw window has no
            # gradient, so only the padded weight grads leave the kernel
            deo_c = deo.astype(cdt)
            dh2 = jax.lax.dot_general(deo_c, wen2_ref[...],
                                      (((1,), (1,)), ((), ())),
                                      preferred_element_type=f32)
            dz2f = jnp.where(hen2.astype(f32) > 0.0, dh2, 0.0)
            dz2 = dz2f.astype(cdt)
            dh1 = jax.lax.dot_general(dz2, wen1_ref[...],
                                      (((1,), (1,)), ((), ())),
                                      preferred_element_type=f32)
            dz1f = jnp.where(hen1.astype(f32) > 0.0, dh1, 0.0)
            dz1 = dz1f.astype(cdt)
            dwen2_t = jax.lax.dot_general(hen2, deo_c,
                                          (((0,), (0,)), ((), ())),
                                          preferred_element_type=f32)
            dwen1_t = jax.lax.dot_general(hen1, dz2,
                                          (((0,), (0,)), ((), ())),
                                          preferred_element_type=f32)
            dwen0_t = jax.lax.dot_general(e_ref[sub], dz1,
                                          (((0,), (0,)), ((), ())),
                                          preferred_element_type=f32)
        else:
            deo_ref[sub] = deo.astype(cdt)
        r_de1 = jax.lax.dot_general(
            sel_r, de1, (((0,), (0,)), ((), ())),
            preferred_element_type=f32).astype(cdt)          # [tile, h]
        dxt = dxt + jax.lax.dot_general(
            r_de1, wer_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=f32)
        # ---- sender space (slab + far), one transposed selection ----
        both = jnp.concatenate([de1, dzm], axis=1)           # [W, 2h]
        s_both = jax.lax.dot_general(
            sel_s, both, (((0,), (0,)), ((), ())),
            preferred_element_type=f32).astype(cdt)          # [slab+Ct, 2h]
        d_ext = jax.lax.dot_general(
            s_both, wsp_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=f32)                      # [slab+Ct, h]
        dfar_ref[sub] = d_ext[slab:].astype(cdt)
        # center + halo: write the slab part into the virtual [tile+2w]
        # window whose row v covers node t*tile - width + v
        # (_stage_offset); per-sub staging slots — no WAR hazard between
        # unrolled tiles
        off = _stage_offset(t, tile=tile, width=width, n_nodes=n_nodes)
        stage_ref[sub, pl.ds(0, width), :] = jnp.zeros((width, h), f32)
        stage_ref[sub, pl.ds(tile + width, width), :] = jnp.zeros(
            (width, h), f32)
        stage_ref[sub, pl.ds(off, slab), :] = d_ext[:slab]
        dx_total = dxt + stage_ref[sub, pl.ds(width, tile), :]
        if skip:
            dx_total = dx_total + dzx
        dx_ref[pl.ds(sub * tile, tile), :] = dx_total.astype(cdt)
        dhalo_ref[sub, pl.ds(0, width), :] = stage_ref[
            sub, pl.ds(0, width), :].astype(cdt)
        dhalo_ref[sub, pl.ds(width, width), :] = stage_ref[
            sub, pl.ds(tile + width, width), :].astype(cdt)

        # ---- weight/bias grads (f32 accumulation across the grid) ----
        dwb1_t = jax.lax.dot_general(r["b1"], dx2_c,
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
        dwb0_t = jax.lax.dot_general(r["x1"], dzb,
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
        dwg1_t = jax.lax.dot_general(r["g1"], dx1_c,
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
        dwg0_t = jax.lax.dot_general(r["xa"], dzg,
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
        dwp1_t = jax.lax.dot_general(r["sm"], dagg_c,
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
        dwpe_t = jax.lax.dot_general(r["e2"], dzm,
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
        dwe1_t = jax.lax.dot_general(r["e1"], de2_c,
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
        dwee_t = jax.lax.dot_general(e_in, de1, (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
        dwer_t = jax.lax.dot_general(r["x_tile"], r_de1,
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
        dwsp_t = jax.lax.dot_general(r["ext"], s_both,
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
        dbias_t = jnp.concatenate([
            _colsum(jnp.where(m_e1, de1f, 0.0)),  # b_e0 (de1 pre-cast)
            _colsum(de2),                         # b_e1
            _colsum(jnp.where(m_m1, dm1, 0.0)),   # b_p0 (dzm pre-cast)
            _colsum(cnt * dagg_d),                # b_p1
            _colsum(jnp.where(m_g1, dg1, 0.0)),   # b_g0
            _colsum(dx1),                         # b_g1
            _colsum(jnp.where(m_b1, db1, 0.0)),   # b_b0
            _colsum(dx2),                         # b_b1
        ], axis=0)
        if enc:
            w128 = wen1_ref.shape[0]
            dbias_t = jnp.concatenate([
                dbias_t,
                jnp.pad(_colsum(dz1f), ((0, 0), (0, h - w128))),  # be_0
                jnp.pad(_colsum(dz2f), ((0, 0), (0, h - w128))),  # be_1
                _colsum(deo),                                     # be_2
            ], axis=0)

        # unconditional accumulate — the accumulators were zeroed once at
        # p == 0 below; putting per-step set-vs-accumulate in pl.when
        # regions costs region overhead on EVERY grid step, and wrapping
        # whole tile bodies in regions measured 135.6 -> 183.8 ms/step
        # (regions are control-flow barriers that break the
        # cross-grid-step pipeline, cf. the SAGE merged-bwd notes)
        dwer_ref[...] += dwer_t
        dwee_ref[...] += dwee_t
        dwsp_ref[...] += dwsp_t
        dwe1_ref[...] += dwe1_t
        dwpe_ref[...] += dwpe_t
        dwp1_ref[...] += dwp1_t
        dwg0_ref[...] += dwg0_t
        dwg1_ref[...] += dwg1_t
        dwb0_ref[...] += dwb0_t
        dwb1_ref[...] += dwb1_t
        dbias_ref[...] += dbias_t
        if enc:
            dwen0_ref[...] += dwen0_t
            dwen1_ref[...] += dwen1_t
            dwen2_ref[...] += dwen2_t

    @pl.when(p == 0)
    def _():
        refs = [dwer_ref, dwee_ref, dwsp_ref, dwe1_ref, dwpe_ref,
                dwp1_ref, dwg0_ref, dwg1_ref, dwb0_ref, dwb1_ref,
                dbias_ref]
        if enc:
            refs += [dwen0_ref, dwen1_ref, dwen2_ref]
        for ref in refs:
            ref[...] = jnp.zeros(ref.shape, jnp.float32)

    for _sub in range(unroll):
        tile_body(_sub)


def _call_bwd(dzx, dze, e1s, m1s, x, e_win, x_far, wd, sidx, ridx, cnt,
              seed, *, static):
    s = static
    tile, width, h = s["tile"], s["width"], s["h"]
    n, n_tiles = s["n_nodes"], s["n_tiles"]
    w_cap, ct = s["w_cap"], s["ct"]
    enc = bool(s.get("enc"))
    unroll = _pick_unroll(n_tiles, _UNROLL_BWD)
    kern = functools.partial(
        _bwd_kernel, tile=tile, width=width, n_nodes=n, n_tiles=n_tiles,
        w_cap=w_cap, ct=ct, h=h, x_dtype=x.dtype, skip=s["skip"],
        thr=s["thr"], scale=s["scale"], unroll=unroll, enc=enc,
    )
    full = lambda shp: pl.BlockSpec(shp, lambda t: (0,) * len(shp),
                                    memory_space=pltpu.VMEM)
    blk_e = pl.BlockSpec((unroll, w_cap, h), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM)
    blk_ein = (pl.BlockSpec((unroll, w_cap, e_win.shape[2]),
                            lambda t: (t, 0, 0), memory_space=pltpu.VMEM)
               if enc else blk_e)
    blk_i = pl.BlockSpec((unroll, w_cap, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM)
    nbuf = max(_NBUF, 2 * unroll) if n_tiles > 2 else 2
    f32 = jnp.float32
    wkeys = _WKEYS + (_ENC_WKEYS if enc else ())
    bias_rows = 11 if enc else 8
    enc_w_specs = ([full(wd["wen0"].shape), full(wd["wen1"].shape),
                    full(wd["wen2"].shape)] if enc else [])
    enc_w_shapes = ([jax.ShapeDtypeStruct(wd["wen0"].shape, f32),
                     jax.ShapeDtypeStruct(wd["wen1"].shape, f32),
                     jax.ShapeDtypeStruct(wd["wen2"].shape, f32)]
                    if enc else [])
    return pl.pallas_call(
        kern,
        grid=(n_tiles // unroll,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # seed
            pl.BlockSpec((unroll * tile, h), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),      # dzx
            blk_e,                                      # dze
            blk_e, blk_e,                               # e1s, m1s
            blk_ein, blk_i, blk_i,
            pl.BlockSpec((unroll, ct, h), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),      # far
            pl.BlockSpec((unroll, tile, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),      # cnt
            full((h, h)), full((h, h)), full((h, 2 * h)), full((h, h)),
            full((h, h)), full((h, h)), full((2 * h, h)), full((h, h)),
            full((h, h)), full((h, h)), full((bias_rows, h)),
        ] + enc_w_specs + [
            pl.BlockSpec(memory_space=pl.ANY),          # x
        ],
        out_specs=[
            pl.BlockSpec((unroll * tile, h), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),      # dx center
            pl.BlockSpec((unroll, 2 * width, h), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),      # dhalo
        ] + ([] if enc else [blk_e]) + [                # de_win
            pl.BlockSpec((unroll, ct, h), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),      # dfar
            full((h, h)), full((h, h)), full((h, 2 * h)), full((h, h)),
            full((h, h)), full((h, h)), full((2 * h, h)), full((h, h)),
            full((h, h)), full((h, h)), full((bias_rows, h)),
        ] + enc_w_specs,
        out_shape=[
            jax.ShapeDtypeStruct((n, h), x.dtype),
            jax.ShapeDtypeStruct((n_tiles, 2 * width, h), x.dtype),
        ] + ([] if enc else
             [jax.ShapeDtypeStruct((n_tiles, w_cap, h), x.dtype)]) + [
            jax.ShapeDtypeStruct((n_tiles, ct, h), x.dtype),
            jax.ShapeDtypeStruct((h, h), f32),          # dwer
            jax.ShapeDtypeStruct((h, h), f32),          # dwee
            jax.ShapeDtypeStruct((h, 2 * h), f32),      # dwsp
            jax.ShapeDtypeStruct((h, h), f32),          # dwe1
            jax.ShapeDtypeStruct((h, h), f32),          # dwpe
            jax.ShapeDtypeStruct((h, h), f32),          # dwp1
            jax.ShapeDtypeStruct((2 * h, h), f32),      # dwg0
            jax.ShapeDtypeStruct((h, h), f32),          # dwg1
            jax.ShapeDtypeStruct((h, h), f32),          # dwb0
            jax.ShapeDtypeStruct((h, h), f32),          # dwb1
            jax.ShapeDtypeStruct((bias_rows, h), f32),  # dbias
        ] + enc_w_shapes,
        scratch_shapes=[
            pltpu.VMEM((nbuf, tile + width, h), x.dtype),
            pltpu.SemaphoreType.DMA((nbuf,)),
            pltpu.VMEM((unroll, tile + 2 * width, h), f32),  # halo staging
        ],
        interpret=s["interpret"],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(seed, dzx, dze, e1s, m1s, e_win, sidx, ridx, x_far, cnt,
      *[wd[k] for k in wkeys], x)


# --------------------------------------------------------------------- #
# custom VJP + public API
# --------------------------------------------------------------------- #


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_block(static, x, e_win, x_far, wd, sidx, ridx, cnt, fs_src,
                 fs_lidx, seed):
    return tuple(_call_fwd(x, e_win, x_far, wd, sidx, ridx, cnt, seed,
                           static=static))


def _fused_block_fwd(static, x, e_win, x_far, wd, sidx, ridx, cnt,
                     fs_src, fs_lidx, seed):
    zx, ze, e1s, m1s = _call_fwd(x, e_win, x_far, wd, sidx, ridx, cnt,
                                 seed, static=static, save_res=True)
    return (zx, ze), (x, e_win, x_far, wd, sidx, ridx, cnt, fs_src,
                      fs_lidx, seed, e1s, m1s)


def _fold_dx(dx, dhalo, dfar, x, fs_src, fs_lidx, static, fold_far=True):
    """Shared XLA epilogue of both backward variants: fold the
    slab-overlap halos (two shifted pad-adds) and — unless
    ``fold_far=False`` (pure far_grad='autodiff': every far sender's
    gradient rides the caller's take() transpose instead; under
    'hybrid' this stays True and the fs tables cover only the
    shard-local zone) — the receiver-tiled dfar table (sender-window
    one-hot matmul) into dx."""
    tile, width = static["tile"], static["width"]
    n, h = x.shape
    n_tiles = static["n_tiles"]
    # fold the slab-overlap halos: dhalo[t, :width] covers nodes
    # [t*tile - width, t*tile), dhalo[t, width:] covers
    # [(t+1)*tile, (t+1)*tile + width) — two shifted pad-adds, all
    # elementwise (boundary tiles wrote zeros in out-of-range rows)
    dxf = dx.astype(jnp.float32)
    left = dhalo[:, :width].astype(jnp.float32)
    right = dhalo[:, width:].astype(jnp.float32)
    lp = jnp.pad(left, ((0, 0), (tile - width, 0), (0, 0))).reshape(n, h)
    dxf = dxf + jnp.concatenate(
        [lp[tile:], jnp.zeros((tile, h), jnp.float32)], axis=0)
    rp = jnp.pad(right, ((0, 0), (0, tile - width), (0, 0))).reshape(n, h)
    dxf = dxf + jnp.concatenate(
        [jnp.zeros((tile, h), jnp.float32), rp[:-tile]], axis=0)
    if not fold_far:
        return dxf
    # far-sender dx: gather the receiver-tiled dfar rows into their
    # SENDER-tile windows and fold with a per-tile one-hot matmul — the
    # row scatter-add this replaces ran ~40 ns/row (1.07 ms/layer at
    # flagship shape); pads carry lidx == tile and select nothing
    cs = fs_src.shape[1]
    rows = jnp.take(dfar.reshape(n_tiles * dfar.shape[1], h),
                    fs_src.reshape(-1), axis=0).reshape(n_tiles, cs, h)
    sel = (fs_lidx[..., None]
           == jnp.arange(tile, dtype=jnp.int32)[None, None, :])
    contrib = jnp.einsum(
        "tcl,tch->tlh", sel.astype(rows.dtype), rows,
        preferred_element_type=jnp.float32).reshape(n, h)
    return dxf + contrib


def _far_cotangents(dx, dhalo, dfar, x, x_far, fs_src, fs_lidx, static):
    """Halo-folded dx and x_far's cotangent per far_grad mode:
    'fold'     — every far rank folds via the fs tables; x_far cotangent
                 zeros (the caller stop-gradded the gather — a zeros
                 cotangent through a take() transpose would materialize
                 a scatter of zeros XLA can't fold, the star-table
                 lesson, ~4.7 ms/step of dead arithmetic);
    'autodiff' — nothing folds; the raw dfar table IS the cotangent and
                 the caller's take() transpose scatter-adds it into the
                 (replicated) x;
    'hybrid'   — ranks [0, far_local) have shard-LOCAL senders and fold
                 via the per-shard fs tables; only the remote tail
                 returns as cotangent, so the scatter covers just the
                 true cross-shard rows."""
    far_auto = bool(static.get("far_autodiff"))
    fl = int(static.get("far_local", 0) or 0)
    dxf = _fold_dx(dx, dhalo, dfar, x, fs_src, fs_lidx, static,
                   fold_far=(not far_auto) or fl > 0)
    if not far_auto:
        return dxf, jnp.zeros_like(x_far)
    if fl > 0:
        dxfar = jnp.concatenate(
            [jnp.zeros((dfar.shape[0], fl, dfar.shape[2]), x_far.dtype),
             dfar[:, fl:].astype(x_far.dtype)], axis=1)
    else:
        dxfar = dfar.astype(x_far.dtype)
    return dxf, dxfar


def _fused_block_bwd(static, res, cts):
    (x, e_win, x_far, wd, sidx, ridx, cnt, fs_src, fs_lidx, seed, e1s,
     m1s) = res
    dzx, dze = cts
    outs = _call_bwd(dzx, dze, e1s, m1s, x, e_win, x_far, wd, sidx, ridx,
                     cnt, seed, static=static)
    (dx, dhalo, deo, dfar, dwer, dwee, dwsp, dwe1, dwpe, dwp1, dwg0,
     dwg1, dwb0, dwb1, dbias) = outs
    dxf, dxfar = _far_cotangents(dx, dhalo, dfar, x, x_far, fs_src,
                                 fs_lidx, static)
    dwd = _cast_dwd(wd, (dwer, dwee, dwsp, dwe1, dwpe, dwp1, dwg0,
                         dwg1, dwb0, dwb1, dbias), _WKEYS)
    return (dxf.astype(x.dtype), deo, dxfar, dwd,
            _zero_tangent(sidx), _zero_tangent(ridx), jnp.zeros_like(cnt),
            _zero_tangent(fs_src), _zero_tangent(fs_lidx),
            _zero_tangent(seed))


_fused_block.defvjp(_fused_block_fwd, _fused_block_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_block_enc(static, x, raw_win, x_far, wd, sidx, ridx, cnt,
                     fs_src, fs_lidx, seed):
    return tuple(_call_fwd(x, raw_win, x_far, wd, sidx, ridx, cnt, seed,
                           static=static))


def _fused_block_enc_fwd(static, x, raw_win, x_far, wd, sidx, ridx, cnt,
                         fs_src, fs_lidx, seed):
    zx, ze, e1s, m1s = _call_fwd(x, raw_win, x_far, wd, sidx, ridx, cnt,
                                 seed, static=static, save_res=True)
    return (zx, ze), (x, raw_win, x_far, wd, sidx, ridx, cnt, fs_src,
                      fs_lidx, seed, e1s, m1s)


def _fused_block_enc_bwd(static, res, cts):
    (x, raw_win, x_far, wd, sidx, ridx, cnt, fs_src, fs_lidx, seed, e1s,
     m1s) = res
    dzx, dze = cts
    outs = _call_bwd(dzx, dze, e1s, m1s, x, raw_win, x_far, wd, sidx,
                     ridx, cnt, seed, static=static)
    (dx, dhalo, dfar, dwer, dwee, dwsp, dwe1, dwpe, dwp1, dwg0,
     dwg1, dwb0, dwb1, dbias, dwen0, dwen1, dwen2) = outs
    dxf, dxfar = _far_cotangents(dx, dhalo, dfar, x, x_far, fs_src,
                                 fs_lidx, static)
    dwd = _cast_dwd(wd, (dwer, dwee, dwsp, dwe1, dwpe, dwp1, dwg0,
                         dwg1, dwb0, dwb1, dbias, dwen0, dwen1, dwen2),
                    _WKEYS + _ENC_WKEYS)
    # the raw edge window is DATA (no gradient)
    return (dxf.astype(x.dtype), jnp.zeros_like(raw_win),
            dxfar, dwd,
            _zero_tangent(sidx), _zero_tangent(ridx), jnp.zeros_like(cnt),
            _zero_tangent(fs_src), _zero_tangent(fs_lidx),
            _zero_tangent(seed))


_fused_block_enc.defvjp(_fused_block_enc_fwd, _fused_block_enc_bwd)


def supports_fused_encoder(batch, h: int, fe: int) -> bool:
    """Static eligibility of IN-KERNEL edge-encoder fusion for layer 0:
    the 3-layer encoder shape (in->64->128->h, hidden > 128 in
    models/blocks.py::encoder_widths) with raw features padding to the
    fe8 = 8 window lane width."""
    return supports_fused_ea(batch, h) and h > 128 and fe <= 8


def supports_fused_ea(batch, h: int) -> bool:
    """Static eligibility of the fused EA block for this batch/width."""
    return (
        batch.win_edges is not None
        and getattr(batch, "win_far_tsend", None) is not None
        and getattr(batch, "win_fs_src", None) is not None
        and batch.band_tile is not None
        and h % 128 == 0
        and batch.band_width % 16 == 0
        and batch.band_width <= batch.band_tile
        and batch.n_node_cap % batch.band_tile == 0
    )


def fused_ea_block(
    x: jnp.ndarray,
    e_win: jnp.ndarray,
    params,
    batch,
    *,
    skip: bool,
    rate: float,
    seed: jnp.ndarray | None,
    deterministic: bool,
    encoder_params=None,
    far_grad: str = "fold",
    far_local: int = 0,
    x_full=None,
):
    """One full GraphNetBlock + skip + dropout. ``params`` is the flax
    param subtree of a GraphNetBlock (edge_mlp / node_mlp_phi /
    node_mlp_gamma / node_mlp_beta); weight-dict construction lives
    OUTSIDE the custom VJP, so its transposes (slice/concat adjoints)
    ride plain autodiff. The x_far gather is under stop_gradient: the
    custom VJP folds the far-sender gradient into dx itself via the
    win_fs_src/win_fs_lidx one-hot matmul and declares x_far's
    cotangent zero. Requires ``supports_fused_ea(batch, h)``.

    ``encoder_params`` (layer 0 only, requires
    ``supports_fused_encoder``): ``e_win`` is then the RAW [T, W, fe]
    edge-feature window and the reference's 3-layer edge_encoder MLP
    (Models/BuckGNN.py:67-82, feeding the first block at :326-327) runs
    IN-KERNEL from zero-padded weights — the [T, W, h] encoded window
    never exists in HBM in either direction (the backward accumulates
    the encoder weight grads in VMEM instead of emitting de_win)."""
    n, h = x.shape
    tile, width = batch.band_tile, batch.band_width
    n_tiles = n // tile
    w_cap = e_win.shape[1]
    ct = batch.win_far_tsend.shape[1]
    cdt = x.dtype

    k_e0 = params["edge_mlp"]["lin_0"]["kernel"].astype(cdt)
    k_p0 = params["node_mlp_phi"]["lin_0"]["kernel"].astype(cdt)
    k_g0 = params["node_mlp_gamma"]["lin_0"]["kernel"].astype(cdt)
    wd = dict(
        wer=k_e0[:h],
        wee=k_e0[2 * h:],
        wsp=jnp.concatenate([k_e0[h:2 * h], k_p0[:h]], axis=1),
        we1=params["edge_mlp"]["lin_1"]["kernel"].astype(cdt),
        wpe=k_p0[h:],
        wp1=params["node_mlp_phi"]["lin_1"]["kernel"].astype(cdt),
        wg0=k_g0,
        wg1=params["node_mlp_gamma"]["lin_1"]["kernel"].astype(cdt),
        wb0=params["node_mlp_beta"]["lin_0"]["kernel"].astype(cdt),
        wb1=params["node_mlp_beta"]["lin_1"]["kernel"].astype(cdt),
        bias=jnp.stack([
            params["edge_mlp"]["lin_0"]["bias"],
            params["edge_mlp"]["lin_1"]["bias"],
            params["node_mlp_phi"]["lin_0"]["bias"],
            params["node_mlp_phi"]["lin_1"]["bias"],
            params["node_mlp_gamma"]["lin_0"]["bias"],
            params["node_mlp_gamma"]["lin_1"]["bias"],
            params["node_mlp_beta"]["lin_0"]["bias"],
            params["node_mlp_beta"]["lin_1"]["bias"],
        ], axis=0).astype(jnp.float32),
    )
    enc = encoder_params is not None
    if enc:
        assert not skip, "encoder fusion is layer 0 (no skip)"
        fe = e_win.shape[2]
        e_win = jnp.pad(e_win.astype(cdt), ((0, 0), (0, 0), (0, 8 - fe)))
        k0 = encoder_params["lin_0"]["kernel"].astype(cdt)  # [fe, 64]
        k1 = encoder_params["lin_1"]["kernel"].astype(cdt)  # [64, 128]
        k2 = encoder_params["lin_2"]["kernel"].astype(cdt)  # [128, h]
        w128 = k1.shape[1]
        wd["wen0"] = jnp.pad(k0, ((0, 8 - fe), (0, w128 - k0.shape[1])))
        wd["wen1"] = jnp.pad(k1, ((0, w128 - k1.shape[0]), (0, 0)))
        wd["wen2"] = k2
        wd["bias"] = jnp.concatenate([
            wd["bias"],
            jnp.pad(encoder_params["lin_0"]["bias"].astype(jnp.float32),
                    (0, h - k0.shape[1]))[None],
            jnp.pad(encoder_params["lin_1"]["bias"].astype(jnp.float32),
                    (0, h - w128))[None],
            encoder_params["lin_2"]["bias"].astype(jnp.float32)[None],
        ], axis=0)
    sidx = batch.win_sidx.reshape(n_tiles, w_cap, 1)
    ridx = batch.win_ridx.reshape(n_tiles, w_cap, 1)
    cnt = (batch.row_offsets[1:] - batch.row_offsets[:-1]).astype(
        jnp.float32).reshape(n_tiles, tile, 1)
    # stop_gradient ('fold' mode): the custom VJP folds the far-sender
    # gradient into dx itself (sender-window one-hot fold) and declares
    # x_far's cotangent zero; without stop_gradient the zero cotangent
    # would still transpose this take() into a scatter of zeros XLA
    # cannot fold away. 'autodiff' mode (tile-sharded TP, where far
    # senders may live on other shards): the VJP hands dfar back as
    # x_far's cotangent and this take() transposes into a real
    # scatter-add against the (replicated) x. 'hybrid' (+far_local):
    # the far table's leading far_local ranks have SHARD-LOCAL senders
    # — they fold in-kernel-shard via the fs tables like 'fold', and
    # only the remote tail [far_local:] rides the autodiff scatter.
    # x_full (tile-sharded TP): far rows carry GLOBAL ids into the
    # replicated node state while the kernel's slab DMAs read the LOCAL
    # rows x
    x_src = x if x_full is None else x_full
    tsend = batch.win_far_tsend
    fl = int(far_local) if far_grad == "hybrid" else 0
    if far_grad == "fold":
        x_far = jnp.take(jax.lax.stop_gradient(x_src), tsend.reshape(-1),
                         axis=0).reshape(n_tiles, ct, h)
    elif far_grad == "hybrid":
        xf_loc = jnp.take(jax.lax.stop_gradient(x_src),
                          tsend[:, :fl].reshape(-1),
                          axis=0).reshape(n_tiles, fl, h)
        xf_rem = jnp.take(x_src, tsend[:, fl:].reshape(-1),
                          axis=0).reshape(n_tiles, ct - fl, h)
        x_far = jnp.concatenate([xf_loc, xf_rem], axis=1)
    else:  # 'autodiff'
        x_far = jnp.take(x_src, tsend.reshape(-1),
                         axis=0).reshape(n_tiles, ct, h)
    training = not deterministic
    active = training and rate > 0.0
    thr = dropout_threshold(rate, DROPOUT_BITS) if active else None
    scale = dropout_scale(rate, DROPOUT_BITS) if thr is not None else None
    static = _StaticDict(tuple(sorted(dict(
        tile=tile, width=width, h=h, n_nodes=n, n_tiles=n_tiles,
        w_cap=w_cap, ct=ct, skip=bool(skip), thr=thr, scale=scale,
        enc=enc, far_autodiff=far_grad in ("autodiff", "hybrid"),
        far_local=fl, interpret=jax.default_backend() == "cpu",
    ).items())))
    if seed is None:
        seed = jnp.zeros((2,), jnp.int32)
    block = _fused_block_enc if enc else _fused_block
    zx, ze = block(static, x, e_win, x_far, wd, sidx, ridx, cnt,
                   batch.win_fs_src, batch.win_fs_lidx, seed)
    return zx, ze
