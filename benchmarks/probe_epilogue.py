"""Verify + time the fused relu/skip/dropout epilogue on the real chip.

Checks (TPU-only; the in-kernel PRNG has no interpret-mode path):
  1. kept fraction ~ 1-rate, survivors scaled exactly
  2. backward regenerates the SAME mask as forward (the correctness
     linchpin of the recompute-instead-of-store design)
  3. relu/skip algebra matches the XLA composition on kept positions
  4. timing vs the unfused relu+skip+XLA-dropout composition

Usage: timeout 900 python benchmarks/probe_epilogue.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from buckgnn_tpu.ops.dropout import dropout, dropout_scale
from buckgnn_tpu.ops.pallas_epilogue import relu_skip_dropout

N, H, RATE = 115456, 512, 0.1


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.normal(size=(N, H)), jnp.bfloat16)
    p = jnp.asarray(rng.normal(size=(N, H)), jnp.bfloat16)
    key = jax.random.key(42, impl="rbg")
    np.asarray(c[0, 0])  # relay warmup

    fused = jax.jit(lambda a, b, k: relu_skip_dropout(a, b, k, RATE))
    y = np.asarray(fused(c, p, key).astype(jnp.float32))

    t = np.maximum(np.asarray(c, np.float32), 0) + np.asarray(p, np.float32)
    kept = y != 0.0
    frac = kept.mean()
    print(f"kept fraction: {frac:.5f} (want ~{1-RATE})", flush=True)
    assert abs(frac - (1 - RATE)) < 2e-3

    scale = np.float32(jnp.asarray(dropout_scale(RATE), jnp.bfloat16))
    ref = (t * scale).astype(np.float32)
    tb = jnp.asarray(t * scale, jnp.bfloat16)  # bf16 rounding parity
    mism = np.abs(y[kept] - np.asarray(tb, np.float32)[kept])
    print(f"max |y - scaled(relu+skip)| on kept: {mism.max():.3e}", flush=True)
    assert mism.max() <= 1e-6 or np.allclose(
        y[kept], np.asarray(tb, np.float32)[kept], rtol=2e-2
    )

    # backward mask == forward mask. The gradient mask (dp = scale on kept,
    # 0 on dropped) is exact; the forward's y!=0 detection undercounts kept
    # positions where relu(c)+p rounds to exactly 0 in bf16, so check
    # one-sided: every y!=0 must be bwd-kept, and y must be 0 on every
    # bwd-dropped position.
    dc, dp = jax.jit(jax.grad(
        lambda a, b, k: relu_skip_dropout(a, b, k, RATE)
        .astype(jnp.float32).sum(), argnums=(0, 1)))(c, p, key)
    dp = np.asarray(dp.astype(jnp.float32))
    bwd_kept = dp != 0.0
    n_bad = int((kept & ~bwd_kept).sum())
    print(f"fwd-kept outside bwd mask: {n_bad} "
          f"(t==0 fwd collisions: {int((~kept & bwd_kept).sum())})",
          flush=True)
    assert n_bad == 0, "backward regenerated a DIFFERENT mask"
    assert abs(bwd_kept.mean() - (1 - RATE)) < 2e-3
    dc = np.asarray(dc.astype(jnp.float32))
    np.testing.assert_allclose(
        dc, bwd_kept * scale * (np.asarray(c, np.float32) > 0), rtol=1e-2,
        atol=1e-3
    )
    print("grad algebra OK", flush=True)

    # timing: fused vs composition (chained to amortize dispatch)
    def chain(f, a, b, k, n=20):
        out = a
        for i in range(n):
            out = f(out, b, k)
        return out

    comp = jax.jit(lambda a, b, k: dropout(jax.nn.relu(a) + b, k, RATE))
    for name, f in [("fused", fused), ("xla-composition", comp)]:
        cf = jax.jit(lambda a, b, k, f=f: chain(f, a, b, k))
        cf(c, p, key).block_until_ready()
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            r = cf(c, p, key)
        r.block_until_ready()
        dt = (time.perf_counter() - t0) / (reps * 20) * 1e3
        print(f"{name:16s} fwd {dt:5.3f} ms/call", flush=True)


if __name__ == "__main__":
    main()
