"""Windowed dense formulation of the edge-augmented GraphNetBlock.

The reference's EA_GNN (Models/BuckGNN.py:528-566) gathers x[row], x[col]
per edge and scatter-means messages back — XLA lowers those to ~40 ns/row
sequential loops, which at ~450k directed edges dominates the step
(~897 ms/step measured at flagship shape with remat).

TPU-native reformulation: edges are receiver-sorted (graph/batch.py), so
each node tile owns one contiguous edge range. pack_graphs reshapes them
host-side into fixed [n_tiles, W] windows with LOCAL indices, and every
per-edge gather/scatter becomes a dense batched one-hot matmul that XLA
fuses the iota-compare into:

    x_s[t, w] = onehot(win_sidx[t, w], slab)  @ x_slab[t]    (senders)
    x_r[t, w] = onehot(win_ridx[t, w], tile)  @ x_tile[t]    (receivers)
    agg[t, k] = onehot(win_ridx)^T over w     @ msg[t]       (scatter-mean)

Out-of-band senders (a few % of edges — long-range virtual edges) are
corrected with ONE small gather + scatter-add over the flat window
buffer; pads carry sentinel indices whose one-hot rows are zero and point
at the dead node whose features are zero, so no masks appear anywhere.

Everything differentiates with plain autodiff — the one-hots are
constants, so the backward is the same dense matmuls transposed.
"""

from __future__ import annotations

import jax.numpy as jnp


def window_geometry(batch) -> tuple[int, int, int, int, int]:
    """STATIC window geometry (tile, width, slab, n_tiles, n) — hashable,
    so it can ride as a flax module attribute under nn.remat."""
    tile, width = batch.band_tile, batch.band_width
    n = batch.n_node_cap
    return (tile, width, tile + width, n // tile, n)


def window_degree(batch) -> jnp.ndarray:
    """[N, 1] incoming-edge counts for the mean (from CSR offsets)."""
    deg = (batch.row_offsets[1:] - batch.row_offsets[:-1]).astype(
        jnp.float32
    )
    return jnp.maximum(deg, 1.0)[:, None]


def supports_windowed(batch) -> bool:
    return batch.win_edges is not None and batch.band_tile is not None


def window_edge_features(batch) -> jnp.ndarray:
    """Raw edge features in window layout [n_tiles, W, Fe] (host-built)."""
    return batch.win_edges


def gather_senders(x, win_sidx, far_pos, far_send, geom) -> jnp.ndarray:
    """x[senders] in window layout [n_tiles, W, H]: slab one-hot matmul +
    far-sender scatter correction."""
    tile, width, slab, n_tiles, n = geom
    h = x.shape[1]
    starts = jnp.clip(
        jnp.arange(n_tiles) * tile - width // 2, 0, max(n - slab, 0)
    )
    idx = starts[:, None] + jnp.arange(slab)[None, :]
    slabs = x[idx]  # [T, slab, H] — contiguous row ranges
    onehot = (
        win_sidx[..., None]
        == jnp.arange(slab, dtype=jnp.int32)[None, None, :]
    ).astype(x.dtype)
    xs = jnp.einsum(
        "tws,tsh->twh", onehot, slabs,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    # out-of-band senders: small gather + scatter-add into the flat buffer
    # (pad entries point at the dead node -> zero rows, position 0)
    w = xs.shape[1]
    far_rows = x[far_send]
    xs = (
        xs.reshape(n_tiles * w, h)
        .at[far_pos]
        .add(far_rows, mode="drop")
        .reshape(n_tiles, w, h)
    )
    return xs


def gather_receivers(x, win_ridx, geom) -> jnp.ndarray:
    """x[receivers] in window layout (receivers are tile-local)."""
    tile, _, _, n_tiles, _ = geom
    tiles = x.reshape(n_tiles, tile, -1)
    onehot = (
        win_ridx[..., None]
        == jnp.arange(tile, dtype=jnp.int32)[None, None, :]
    ).astype(x.dtype)
    return jnp.einsum(
        "twk,tkh->twh", onehot, tiles,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def scatter_mean_messages(msg, win_ridx, degree, geom) -> jnp.ndarray:
    """scatter_mean(msg, receivers) as the transposed receiver one-hot
    matmul; pads (sentinel ridx) select nothing."""
    tile, _, _, n_tiles, n = geom
    onehot = (
        win_ridx[..., None]
        == jnp.arange(tile, dtype=jnp.int32)[None, None, :]
    ).astype(msg.dtype)
    agg = jnp.einsum(
        "twk,twh->tkh", onehot, msg,
        preferred_element_type=jnp.float32,
    ).reshape(n, -1)
    return (agg / degree).astype(msg.dtype)
