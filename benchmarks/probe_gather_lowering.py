"""How does the windowed one-hot gather lower, and is the base-dilated
convolution XLA picks for `einsum('tws,tsh->twh', onehot, slabs)` the
bottleneck? A/B against explicit dot_general and a pre-converted f32
one-hot at the EA flagship shape ([404, 1168, 384] x [404, 384, 512]).

Usage: timeout 1200 python benchmarks/probe_gather_lowering.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timed(fn, *args, n=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    T, W, S, H = 404, 1168, 384, 512
    rng = np.random.default_rng(0)
    sidx = jnp.asarray(rng.integers(0, S, size=(T, W)), jnp.int32)
    slabs = jnp.asarray(rng.normal(size=(T, S, H)) * 0.1, jnp.bfloat16)

    def v_einsum(sidx, slabs):
        onehot = (sidx[..., None]
                  == jnp.arange(S, dtype=jnp.int32)[None, None, :]
                  ).astype(jnp.bfloat16)
        return jnp.einsum("tws,tsh->twh", onehot, slabs,
                          preferred_element_type=jnp.float32
                          ).astype(jnp.bfloat16)

    def v_dotgen(sidx, slabs):
        onehot = (sidx[..., None]
                  == jnp.arange(S, dtype=jnp.int32)[None, None, :]
                  ).astype(jnp.bfloat16)
        out = lax.dot_general(
            onehot, slabs, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return out.astype(jnp.bfloat16)

    def v_f32sel(sidx, slabs):
        onehot = jnp.where(
            sidx[..., None] == jnp.arange(S, dtype=jnp.int32)[None, None, :],
            jnp.float32(1), jnp.float32(0)).astype(jnp.bfloat16)
        out = lax.dot_general(
            onehot, slabs, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return out.astype(jnp.bfloat16)

    def v_take(sidx, slabs):
        return jnp.take_along_axis(slabs, sidx[..., None], axis=1)

    for name, fn in (("einsum", v_einsum), ("dot_general", v_dotgen),
                     ("f32-sel dot", v_f32sel), ("take_along", v_take)):
        jf = jax.jit(fn)
        t = timed(jf, sidx, slabs)
        txt = jf.lower(sidx, slabs).compile().as_text()
        kind = ("conv" if "convolution" in txt else
                "dot" if " dot(" in txt or "dot-general" in txt else
                "gather" if "gather(" in txt else "?")
        print(f"{name:<14}: {t:7.3f} ms  (lowered as {kind})", flush=True)

    # MXU reference: plain batched matmul of the same FLOP count
    a = jnp.asarray(rng.normal(size=(T, W, S)) * 0.1, jnp.bfloat16)
    t = timed(jax.jit(lambda a, b: lax.dot_general(
        a, b, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)), a, slabs)
    print(f"{'dense matmul':<14}: {t:7.3f} ms  (same shape, real lhs)",
          flush=True)


if __name__ == "__main__":
    main()
