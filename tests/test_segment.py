"""Segment ops vs numpy oracles (torch_scatter semantics)."""

import numpy as np
import jax.numpy as jnp

from buckgnn_tpu.ops import segment
from buckgnn_tpu.ops.sage import sage_aggregate


def _np_segment(data, ids, n, op):
    out = np.zeros((n,) + data.shape[1:], dtype=np.float64)
    cnt = np.zeros((n,))
    if op == "max":
        out[:] = -np.inf
    for i, s in enumerate(ids):
        if op == "max":
            out[s] = np.maximum(out[s], data[i])
        else:
            out[s] += data[i]
        cnt[s] += 1
    if op == "mean":
        out = out / np.maximum(cnt, 1)[:, None]
    if op == "max":
        out[cnt == 0] = 0.0
    return out


def test_segment_ops_match_oracle():
    rng = np.random.default_rng(1)
    data = rng.normal(size=(40, 8)).astype(np.float32)
    ids = np.sort(rng.integers(0, 10, size=40)).astype(np.int32)
    for op, fn in [
        ("sum", segment.segment_sum),
        ("mean", segment.segment_mean),
        ("max", segment.segment_max),
    ]:
        got = np.asarray(fn(jnp.asarray(data), jnp.asarray(ids), 10))
        want = _np_segment(data, ids, 10, op)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_empty_segments_zero():
    data = jnp.ones((4, 3))
    ids = jnp.array([0, 0, 3, 3], dtype=jnp.int32)
    for fn in (segment.segment_mean, segment.segment_max, segment.segment_sum):
        out = np.asarray(fn(data, ids, 6))
        assert np.all(out[1] == 0) and np.all(out[4] == 0)


def test_sage_aggregate_directions():
    # path graph 0-1-2, both directions
    x = jnp.asarray(np.array([[1.0], [10.0], [100.0]], np.float32))
    senders = jnp.array([1, 0, 2, 1], dtype=jnp.int32)
    receivers = jnp.array([0, 1, 1, 2], dtype=jnp.int32)
    out = np.asarray(sage_aggregate(x, senders, receivers, 3, aggr="add"))
    np.testing.assert_allclose(out[:, 0], [10.0, 101.0, 10.0])
    out = np.asarray(sage_aggregate(x, senders, receivers, 3, aggr="mean"))
    np.testing.assert_allclose(out[:, 0], [10.0, 50.5, 10.0])
    out = np.asarray(sage_aggregate(x, senders, receivers, 3, aggr="max"))
    np.testing.assert_allclose(out[:, 0], [10.0, 100.0, 10.0])


def test_segment_softmax_weights():
    logits = jnp.array([0.0, 1.0, 2.0, 5.0], dtype=jnp.float32)
    ids = jnp.array([0, 0, 1, 1], dtype=jnp.int32)
    w = np.asarray(segment.segment_softmax_weights(logits, ids, 3))
    np.testing.assert_allclose(w[:2].sum(), 1.0, rtol=1e-6)
    np.testing.assert_allclose(w[2:].sum(), 1.0, rtol=1e-6)
    assert w[1] > w[0] and w[3] > w[2]


def test_segment_sum_dense_matches_scatter():
    """one-hot matmul segment sums == scatter segment sums (2-D, 1-D, keep)."""
    rng = np.random.default_rng(2)
    data = rng.normal(size=(64, 16)).astype(np.float32)
    ids = np.sort(rng.integers(0, 9, size=64)).astype(np.int32)
    keep = rng.random(64) > 0.3
    want = _np_segment(data * keep[:, None], ids, 9, "sum")
    got = np.asarray(segment.segment_sum_dense(
        jnp.asarray(data), jnp.asarray(ids), 9, keep=jnp.asarray(keep)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # 1-D data (matvec path)
    v = rng.normal(size=64).astype(np.float32)
    got1 = np.asarray(segment.segment_sum_dense(jnp.asarray(v), jnp.asarray(ids), 9))
    want1 = _np_segment(v[:, None], ids, 9, "sum")[:, 0]
    np.testing.assert_allclose(got1, want1, rtol=1e-5, atol=1e-6)
    # counts
    cnt = np.asarray(segment.segment_count_dense(
        jnp.asarray(ids), 9, keep=jnp.asarray(keep)))
    want_cnt = np.bincount(ids[keep], minlength=9).astype(np.float32)
    np.testing.assert_allclose(cnt, want_cnt)


def test_l2_normalize_custom_vjp_matches_autodiff():
    import jax
    from buckgnn_tpu.models.blocks import l2_normalize

    rng = np.random.default_rng(3)
    v = rng.normal(size=(12, 8)).astype(np.float32)
    v[3] = 0.0  # padding row: grad must stay finite
    g = rng.normal(size=(12, 8)).astype(np.float32)

    def plain(x):
        sq = jnp.sum(x * x, axis=-1, keepdims=True)
        return x / jnp.sqrt(jnp.maximum(sq, 1e-24))

    y, vjp = jax.vjp(l2_normalize, jnp.asarray(v))
    y0, vjp0 = jax.vjp(plain, jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y0), rtol=1e-6)
    (dx,) = vjp(jnp.asarray(g))
    (dx0,) = vjp0(jnp.asarray(g))
    assert np.isfinite(np.asarray(dx)).all()
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx0),
                               rtol=1e-5, atol=1e-6)


def test_pallas_csr_segment_reduce_matches_xla():
    """gather_segment_reduce (interpret) == XLA segment ops, including a
    high-degree hub whose run spans several windows."""
    from buckgnn_tpu.ops.pallas_segment import gather_segment_reduce

    rng = np.random.default_rng(5)
    n, h = 512, 128
    # random edges + an 800-in-degree hub at node 3
    r = np.concatenate([rng.integers(0, n - 1, size=2000),
                        np.full(800, 3)])
    s = rng.integers(0, n - 1, size=len(r))
    order = np.argsort(r, kind="stable")
    s, r = s[order].astype(np.int32), r[order].astype(np.int32)
    x = jnp.asarray(rng.normal(size=(n, h)).astype(np.float32))
    for aggr in ("add", "mean"):
        got = gather_segment_reduce(x, jnp.asarray(s), jnp.asarray(r), n,
                                    aggr=aggr, interpret=True)
        want = np.asarray(getattr(segment, f"segment_{'sum' if aggr == 'add' else aggr}")(
            x[jnp.asarray(s)], jnp.asarray(r), n, indices_are_sorted=True))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)
    # narrow-feature + max fall back to XLA
    got = gather_segment_reduce(x[:, :8], jnp.asarray(s), jnp.asarray(r), n)
    want = np.asarray(segment.segment_sum(x[:, :8][jnp.asarray(s)],
                                          jnp.asarray(r), n,
                                          indices_are_sorted=True))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)
