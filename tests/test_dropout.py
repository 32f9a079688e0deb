"""Tests for dropout (ops/dropout.py) and the fused layer epilogue
(ops/pallas_epilogue.py).

Semantics bar: torch.nn.functional.dropout as used between processor
layers in the reference (Models/BuckGNN.py:352) — zero with probability
~rate, scale survivors so the expectation is exactly preserved. The
Pallas PRNG path cannot run in interpret mode; its in-kernel mask is
verified on real TPU by benchmarks/probe_epilogue.py. Here we cover the
XLA implementations and the rate==0 exactness of the fused entry point.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from buckgnn_tpu.ops.dropout import dropout, dropout_scale, dropout_threshold
from buckgnn_tpu.ops.pallas_epilogue import relu_skip_dropout, seed_from_key


def test_rate_zero_is_identity():
    x = jnp.arange(12.0).reshape(3, 4)
    y = dropout(x, jax.random.key(0), 0.0)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_rate_one_is_zero():
    x = jnp.ones((3, 4))
    y = dropout(x, jax.random.key(0), 1.0)
    np.testing.assert_array_equal(np.asarray(y), 0.0)


@pytest.mark.parametrize("rate", [0.1, 0.5])
def test_drop_fraction_and_scale(rate):
    x = jnp.ones((512, 512), jnp.float32)
    y = np.asarray(dropout(x, jax.random.key(1), rate))
    keep_p = dropout_threshold(rate) / 2.0**32
    kept = y != 0.0
    # binomial(512*512, keep_p): std of the mean ~ 1e-3
    assert abs(kept.mean() - keep_p) < 5e-3
    # survivors are scaled by exactly the inverse quantized keep prob
    np.testing.assert_allclose(y[kept], dropout_scale(rate), rtol=1e-6)
    # unbiased: E[y] == x
    assert abs(y.mean() - 1.0) < 5e-3


def test_deterministic_given_key():
    x = jnp.ones((64, 64))
    k = jax.random.key(7)
    y1 = np.asarray(dropout(x, k, 0.1))
    y2 = np.asarray(dropout(x, k, 0.1))
    np.testing.assert_array_equal(y1, y2)
    y3 = np.asarray(dropout(x, jax.random.key(8), 0.1))
    assert (y1 != y3).any()


def test_mask_independent_of_values():
    k = jax.random.key(3)
    a = np.asarray(dropout(jnp.ones((32, 32)), k, 0.3))
    b = np.asarray(dropout(jnp.full((32, 32), 2.0), k, 0.3))
    np.testing.assert_array_equal(a != 0, b != 0)


def test_gradient_matches_mask():
    x = jnp.ones((16, 16), jnp.float32)
    k = jax.random.key(5)

    def f(v):
        return dropout(v, k, 0.5).sum()

    g = np.asarray(jax.grad(f)(x))
    y = np.asarray(dropout(x, k, 0.5))
    # d/dx of inverted dropout is the scaled mask itself
    np.testing.assert_allclose(g, y, rtol=1e-6)


def test_bf16_stays_bf16():
    x = jnp.ones((8, 8), jnp.bfloat16)
    y = dropout(x, jax.random.key(0), 0.1)
    assert y.dtype == jnp.bfloat16


def test_rbg_key_supported():
    x = jnp.ones((64, 64))
    y = np.asarray(dropout(x, jax.random.key(0, impl="rbg"), 0.5))
    assert 0.3 < (y != 0).mean() < 0.7


# ------------------- fused epilogue (XLA paths) ------------------- #


def test_epilogue_deterministic_is_relu_plus_skip():
    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.normal(size=(256, 128)), jnp.float32)
    p = jnp.asarray(rng.normal(size=(256, 128)), jnp.float32)
    y = relu_skip_dropout(c, p, None, 0.1)
    np.testing.assert_allclose(
        np.asarray(y), np.maximum(np.asarray(c), 0) + np.asarray(p), rtol=1e-6
    )
    y2 = relu_skip_dropout(c, None, jax.random.key(0), 0.0)
    np.testing.assert_allclose(np.asarray(y2), np.maximum(np.asarray(c), 0))


def test_epilogue_fallback_semantics_and_grad():
    # On CPU `supports()` is False, so this exercises the XLA fallback —
    # the same contract the Pallas kernel implements on TPU.
    rng = np.random.default_rng(1)
    c = jnp.asarray(rng.normal(size=(256, 128)), jnp.float32)
    p = jnp.asarray(rng.normal(size=(256, 128)), jnp.float32)
    k = jax.random.key(3)
    rate = 0.4
    y = np.asarray(relu_skip_dropout(c, p, k, rate))
    t = np.maximum(np.asarray(c), 0) + np.asarray(p)
    kept = y != 0
    np.testing.assert_allclose(y[kept], t[kept] * dropout_scale(rate),
                               rtol=1e-5)

    dc, dp = jax.grad(
        lambda a, b: relu_skip_dropout(a, b, k, rate).sum(), argnums=(0, 1)
    )(c, p)
    dc, dp = np.asarray(dc), np.asarray(dp)
    scale = dropout_scale(rate)
    mask = kept  # value-independent mask
    np.testing.assert_allclose(dp, mask * scale, rtol=1e-5)
    np.testing.assert_allclose(
        dc, mask * scale * (np.asarray(c) > 0), rtol=1e-5
    )


def test_seed_from_key_distinct():
    s0 = np.asarray(seed_from_key(jax.random.key(0)))
    s1 = np.asarray(seed_from_key(jax.random.key(1)))
    s0r = np.asarray(seed_from_key(jax.random.key(0, impl="rbg")))
    assert s0.shape == (2,) and s0.dtype == np.int32
    assert (s0 != s1).any()
    assert s0r.shape == (2,)
