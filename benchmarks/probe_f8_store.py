"""Mosaic float8 feasibility micro-probe (VERDICT r4 next #4).

The virtual-edge floor analysis (RESULTS.md round-4) names ONE untried
lever: the split backward reads ~708 MB/layer of bf16 y/agg residuals at
the HBM floor; halving the residual bytes with fp8 storage is the only
way to move that term. Before any kernel surgery, this answers the
enabling questions on the v5e:

1. can a Pallas TPU kernel STORE float8_e4m3fn output (bf16 -> f8 cast
   in-kernel)?
2. can another kernel LOAD it back and upcast?
3. what do the casts cost at [N, 512] scale vs the traffic saved
   (chained-wall A/B of copy kernels at bf16 vs f8 output)?

Usage: timeout 900 python benchmarks/probe_f8_store.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, H, TILE = 65536, 512, 512


def _store_kernel(x_ref, o_ref, *, out_dtype):
    o_ref[...] = x_ref[...].astype(out_dtype)


def _load_kernel(x_ref, o_ref):
    o_ref[...] = (x_ref[...].astype(jnp.float32) * 2.0).astype(o_ref.dtype)


def roundtrip(x, mid_dtype):
    store = pl.pallas_call(
        functools.partial(_store_kernel, out_dtype=mid_dtype),
        grid=(N // TILE,),
        in_specs=[pl.BlockSpec((TILE, H), lambda t: (t, 0))],
        out_specs=pl.BlockSpec((TILE, H), lambda t: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H), mid_dtype),
    )
    load = pl.pallas_call(
        _load_kernel,
        grid=(N // TILE,),
        in_specs=[pl.BlockSpec((TILE, H), lambda t: (t, 0))],
        out_specs=pl.BlockSpec((TILE, H), lambda t: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H), x.dtype),
    )
    return load(store(x))


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32) / 8.0,
                    dtype=jnp.bfloat16)
    np.asarray(jnp.zeros(1))  # relay warmup

    for dt in (jnp.bfloat16, jnp.float8_e4m3fn, jnp.float8_e5m2):
        name = jnp.dtype(dt).name
        try:
            f = jax.jit(functools.partial(roundtrip, mid_dtype=dt))
            out = f(x)
            err = float(jnp.max(jnp.abs(
                out.astype(jnp.float32) - x.astype(jnp.float32) * 2.0)))
            # chained timing: 20 dependent roundtrips in one dispatch
            @jax.jit
            def chain(x):
                def body(_, v):
                    return roundtrip(v, mid_dtype=dt) * 0.5
                return jax.lax.fori_loop(0, 20, body, x)

            r = chain(x); jax.block_until_ready(r)
            t0 = time.perf_counter()
            r = chain(x); jax.block_until_ready(r)
            dt_ms = (time.perf_counter() - t0) / 20 * 1e3
            gb = 2 * N * H * (1 + jnp.dtype(dt).itemsize) / 1e9
            print(f"{name}: OK  max|err|={err:.4f}  {dt_ms:.3f} ms/rt "
                  f"({gb / dt_ms * 1e3:.0f} GB/s effective)", flush=True)
        except Exception as e:
            print(f"{name}: FAILED — {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:160]}", flush=True)


if __name__ == "__main__":
    main()
