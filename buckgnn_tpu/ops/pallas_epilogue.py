"""Fused ReLU + skip + dropout layer epilogue (Pallas, TPU).

Every GraphSAGE processor layer in the reference ends with
``x = relu(conv(x)); x = x + x_prev (mid layers); x = dropout(x)``
(Models/BuckGNN.py:338-352). Left to XLA, that epilogue costs per layer:
one RngBitGenerator writing a full uint32 word per element to HBM
(~236 MB at the flagship shape), an elementwise fusion re-reading those
words, and a mask residual read again by the backward pass.

This kernel removes all PRNG/mask HBM traffic: mask bits are generated
*inside* the kernel (``pltpu.prng_random_bits``, seeded per (step seed,
grid tile)) and the backward pass **regenerates** them from the same seed
instead of loading a residual. Per layer the epilogue then moves only the
operands themselves:

  forward:   read conv-out [N,H] (+ skip), write y        — no bits, no mask
  backward:  read g, conv-out, write dc (+ dskip)         — bits regenerated

The keep decision is ``bits < round((1-rate)·2^32)`` and survivors scale
by the exact inverse of the quantized keep probability (see
ops/dropout.py), so the op is unbiased: E[y] == relu(c) + p.

**Measured outcome (v5e, 2026-08-18)**: a wash — see the
``relu_skip_dropout`` docstring. Off by default; verified correct on
hardware by benchmarks/probe_epilogue.py.

Grad notes: d/dc = mask · scale · 1[c > 0], d/dp = mask · scale. The
backward needs only the *sign* of c, so the only residual is c itself —
which XLA deduplicates with the conv's own saved output. Deterministic
given (seed, shape): safe under ``jax.checkpoint``/remat.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from buckgnn_tpu.ops.dropout import dropout_scale, dropout_threshold

# Fixed row tile; N need not divide it (Pallas masks the tail block, and
# the per-tile PRNG shape is unchanged so fwd/bwd streams still agree).
# 1024x512 bf16 = 1 MB/buffer; <=4 buffers double-buffered stays well
# inside the ~16 MB VMEM.
_TILE_ROWS = 1024


def _pick_tile(n_rows: int) -> int:
    return min(_TILE_ROWS, max(16, n_rows))


def _seed_tile(seed_ref):
    # Mosaic's prng_seed takes at most 2 words; mix the grid index into
    # the first with a Weyl increment so every tile gets its own stream.
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] ^ (i * jnp.int32(-1640531527)), seed_ref[1])


def _fwd_kernel(seed_ref, c_ref, *rest, thr, scale, has_skip):
    if has_skip:
        p_ref, y_ref = rest
    else:
        (y_ref,) = rest
    _seed_tile(seed_ref)
    bits = pltpu.bitcast(pltpu.prng_random_bits(c_ref.shape), jnp.uint32)
    c = c_ref[:]
    t = jnp.maximum(c, jnp.zeros((), c.dtype))
    if has_skip:
        t = t + p_ref[:]
    keep = bits < jnp.uint32(thr)
    y_ref[:] = jnp.where(keep, t * jnp.asarray(scale, c.dtype),
                         jnp.zeros((), c.dtype))


def _bwd_kernel(seed_ref, g_ref, c_ref, *rest, thr, scale, has_skip):
    if has_skip:
        dc_ref, dp_ref = rest
    else:
        (dc_ref,) = rest
    # Identical seeding and a single same-shape generation call reproduce
    # the forward tile's bit stream exactly.
    _seed_tile(seed_ref)
    bits = pltpu.bitcast(pltpu.prng_random_bits(g_ref.shape), jnp.uint32)
    g = g_ref[:]
    keep = bits < jnp.uint32(thr)
    gm = jnp.where(keep, g * jnp.asarray(scale, g.dtype),
                   jnp.zeros((), g.dtype))
    if has_skip:
        dp_ref[:] = gm
    # relu gradient; the compare runs in f32 (Mosaic has no bf16 compare
    # on this target)
    pos = c_ref[:].astype(jnp.float32) > jnp.float32(0.0)
    dc_ref[:] = jnp.where(pos, gm, jnp.zeros((), g.dtype))


def _row_specs(n_specs: int, tile: int, h: int):
    return [
        pl.BlockSpec((tile, h), lambda i: (i, 0), memory_space=pltpu.VMEM)
        for _ in range(n_specs)
    ]


def _call_fwd(c, p, seed, rate):
    n, h = c.shape
    tile = _pick_tile(n)
    has_skip = p is not None
    kern = functools.partial(_fwd_kernel, thr=dropout_threshold(rate),
                             scale=dropout_scale(rate), has_skip=has_skip)
    operands = (seed, c) + ((p,) if has_skip else ())
    return pl.pallas_call(
        kern,
        grid=(-(-n // tile),),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + _row_specs(1 + has_skip, tile, h),
        out_specs=_row_specs(1, tile, h)[0],
        out_shape=jax.ShapeDtypeStruct((n, h), c.dtype),
    )(*operands)


def _call_bwd(c, seed, g, rate, has_skip):
    n, h = c.shape
    tile = _pick_tile(n)
    kern = functools.partial(_bwd_kernel, thr=dropout_threshold(rate),
                             scale=dropout_scale(rate), has_skip=has_skip)
    out_shape = jax.ShapeDtypeStruct((n, h), c.dtype)
    return pl.pallas_call(
        kern,
        grid=(-(-n // tile),),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + _row_specs(2, tile, h),
        out_specs=_row_specs(2, tile, h) if has_skip
        else _row_specs(1, tile, h)[0],
        out_shape=[out_shape, out_shape] if has_skip else out_shape,
    )(seed, g, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_skip(c, p, seed, rate):
    return _call_fwd(c, p, seed, rate)


def _fused_skip_fwd(c, p, seed, rate):
    return _call_fwd(c, p, seed, rate), (c, seed)


def _fused_skip_bwd(rate, res, g):
    c, seed = res
    dc, dp = _call_bwd(c, seed, g, rate, has_skip=True)
    return dc, dp, None


_fused_skip.defvjp(_fused_skip_fwd, _fused_skip_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _fused_noskip(c, seed, rate):
    return _call_fwd(c, None, seed, rate)


def _fused_noskip_fwd(c, seed, rate):
    return _call_fwd(c, None, seed, rate), (c, seed)


def _fused_noskip_bwd(rate, res, g):
    c, seed = res
    dc = _call_bwd(c, seed, g, rate, has_skip=False)
    return dc, None


_fused_noskip.defvjp(_fused_noskip_fwd, _fused_noskip_bwd)


def seed_from_key(key: jax.Array) -> jnp.ndarray:
    """Two int32 seed words from any typed PRNG key (threefry or rbg)."""
    data = jax.random.key_data(key).reshape(-1)[:2]
    return jax.lax.bitcast_convert_type(data.astype(jnp.uint32), jnp.int32)


def supports(x: jnp.ndarray) -> bool:
    """Whether the fused kernel can handle this operand on this backend."""
    return (
        jax.default_backend() == "tpu"
        and x.ndim == 2
        and x.shape[-1] % 128 == 0
    )


def relu_skip_dropout(
    c: jnp.ndarray,
    p: jnp.ndarray | None,
    key: jax.Array | None,
    rate: float,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """``dropout(relu(c) + p, rate)`` — one fusion boundary for the layer
    epilogue.

    ``p`` may be None (no skip); ``key`` may be None only when ``rate<=0``
    (the deterministic epilogue, left to XLA's own fusion).

    ``use_pallas`` selects the in-VMEM-PRNG kernel above. Measured on the
    v5e (benchmarks/probe_epilogue.py + full-step A/B): the kernel is
    byte-exact-verified but a wash on step time — Pallas streams
    elementwise tiles at ~425 GB/s vs ~1060 GB/s for XLA's own fusions on
    this chip, which cancels exactly the PRNG-traffic saving — and costs
    +0.6 GB of residuals (the custom_vjp's saved conv-out is not deduped
    with the conv's own residual). So the XLA composition is the default;
    the kernel stays for TPU generations where Pallas streaming is at
    parity.
    """
    if rate <= 0.0 or key is None:
        t = jax.nn.relu(c)
        return t if p is None else t + p
    if use_pallas and supports(c):
        seed = seed_from_key(key)
        if p is None:
            return _fused_noskip(c, seed, float(rate))
        return _fused_skip(c, p, seed, float(rate))
    from buckgnn_tpu.ops.dropout import dropout

    t = jax.nn.relu(c)
    if p is not None:
        t = t + p
    return dropout(t, key, rate)
