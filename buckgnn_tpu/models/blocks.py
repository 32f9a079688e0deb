"""Building blocks of the BuckGNN model family.

Each block documents the reference construct it reproduces (file:line into
/root/reference). Math follows the reference bit-for-bit where stated; the
implementations are segment-op based and fully static-shape.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from buckgnn_tpu.ops.sage import sage_aggregate


@jax.custom_vjp
def l2_normalize(v: jnp.ndarray) -> jnp.ndarray:
    """Row-wise F.normalize parity (norm clamped at 1e-12; grad-safe on
    exactly-zero padding rows).

    Custom VJP because the autodiff backward materializes ``sum(g*y)`` as a
    lane-dimension reduce, which runs ~10x off VPU peak on TPU (measured
    1.55 ms per [115456, 512] in the flagship step); the custom backward
    routes that row-sum through an MXU ones-matvec instead. The forward is
    left as the plain reduce so XLA keeps fusing it into the producing
    matmul's epilogue — an MXU ones-matvec was tried for the forward too
    and measured ~1 ms/step SLOWER (it forces the v*v intermediate to
    materialize instead of riding the producer fusion).
    """
    sq = jnp.sum(v * v, axis=-1, keepdims=True)
    return v / jnp.sqrt(jnp.maximum(sq, 1e-24))


def _l2n_fwd(v):
    sq = jnp.sum(v * v, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(jnp.maximum(sq, 1e-24))
    y = v * inv
    return y, (y, inv)


def _l2n_bwd(res, g):
    y, inv = res
    # s = rowsum(g*y), via the MXU: [N,H] @ [H,8] ones, col 0
    ones = jnp.ones((y.shape[-1], 8), y.dtype)
    s = jnp.matmul(g * y, ones, preferred_element_type=jnp.float32)
    s = s[:, :1].astype(g.dtype)
    # d/dv [v (v.v)^-1/2] = inv (g - y (y.g)); on clamped (zero) rows the
    # same expression reduces to inv*g, matching the clamp's true gradient
    return ((g - y * s) * inv,)


l2_normalize.defvjp(_l2n_fwd, _l2n_bwd)


class MLP(nn.Module):
    """Plain ReLU MLP: Linear-ReLU-...-Linear (no activation after last)."""

    widths: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, w in enumerate(self.widths):
            x = nn.Dense(w, dtype=self.dtype, name=f"lin_{i}")(x)
            if i + 1 < len(self.widths):
                x = nn.relu(x)
        return x


def encoder_widths(hidden_channels: int) -> tuple[int, ...]:
    """Encoder architecture switch on hidden size.

    Reference: 2-layer (in->64->h) for hidden<=128 (Models/BuckGNN.py:41-52),
    3-layer (in->64->128->h) for hidden>=256 (Models/BuckGNN.py:67-82). Sizes
    129..255 are unsupported by the reference (no branch); we use the deep
    variant for anything >128.
    """
    if hidden_channels <= 128:
        return (64, hidden_channels)
    return (64, 128, hidden_channels)


def decoder_widths(hidden_channels: int, output_dim: int) -> tuple[int, ...]:
    """Decoder: h(->128)->64->out (Models/BuckGNN.py:54-65, 84-100)."""
    if hidden_channels <= 128:
        return (64, output_dim)
    return (128, 64, output_dim)


class SAGEConv(nn.Module):
    """GraphSAGE convolution, PyG semantics (Models/BuckGNN.py:113-180).

    out_i = W_l · aggr_{j in N(i)} x_j + b_l + W_r · x_i   (lin_r bias-free)
    followed by L2 normalization when ``normalize`` (PyG SAGEConv with
    ``normalize=True``; F.normalize clamps the norm at 1e-12).
    """

    features: int
    aggr: str = "add"
    normalize: bool = True
    dtype: jnp.dtype = jnp.float32
    impl: str = "xla"  # 'xla' | 'pallas' | 'banded'

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        senders: jnp.ndarray,
        receivers: jnp.ndarray,
        agg_ctx=None,
        fused_epilogue: dict | None = None,
    ) -> jnp.ndarray:
        """``fused_epilogue`` (keys: skip, rate, key, deterministic) routes
        the whole layer — conv + normalize + relu (+skip) + dropout —
        through the single fused Pallas kernel (ops/pallas_sage_layer.py)
        and returns the POST-epilogue activations. The caller must have
        checked ``supports_fused_layer``. The param tree is identical in
        both modes (same lin_l/lin_r Dense children)."""
        num_nodes = x.shape[0]
        lin_l = nn.Dense(self.features, use_bias=True, dtype=self.dtype,
                         name="lin_l")
        lin_r = nn.Dense(self.features, use_bias=False, dtype=self.dtype,
                         name="lin_r")
        if fused_epilogue is not None:
            from buckgnn_tpu.ops.pallas_epilogue import seed_from_key
            from buckgnn_tpu.ops.pallas_sage_layer import fused_sage_layer

            # bind the Dense params without paying their matmuls (the
            # dummy rows are dead code after tracing)
            _ = lin_l(jnp.zeros((8, x.shape[-1]), self.dtype))
            _ = lin_r(jnp.zeros((8, x.shape[-1]), self.dtype))
            p = self.variables["params"]
            key = fused_epilogue["key"]
            return fused_sage_layer(
                x,
                jnp.asarray(p["lin_l"]["kernel"], x.dtype),
                jnp.asarray(p["lin_l"]["bias"], x.dtype),
                jnp.asarray(p["lin_r"]["kernel"], x.dtype),
                agg_ctx,
                skip=fused_epilogue["skip"],
                rate=fused_epilogue["rate"],
                seed=None if key is None else seed_from_key(key),
                deterministic=fused_epilogue["deterministic"],
                star_in=fused_epilogue.get("star_in"),
                star_next=fused_epilogue.get("star_next", False),
                table_in=fused_epilogue.get("table_in"),
                emit_table=fused_epilogue.get("emit_table", False),
            )
        if agg_ctx is not None and self.impl in (
            "banded", "banded_pallas", "banded_partitioned"
        ):
            from buckgnn_tpu.ops.banded import banded_sage_aggregate

            agg = banded_sage_aggregate(x, agg_ctx, aggr=self.aggr)
        else:
            agg = sage_aggregate(
                x, senders, receivers, num_nodes, aggr=self.aggr,
                impl="xla" if self.impl.startswith("banded") else self.impl,
            )
        out = lin_l(agg) + lin_r(x)
        if self.normalize:
            out = l2_normalize(out)
        return out


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d with padding-aware statistics.

    Functional parity with ``nn.BatchNorm1d`` (Models/BuckGNN.py:133,184) on
    the real rows: training normalizes by masked batch mean / biased variance
    and updates running stats with the unbiased variance (torch semantics,
    momentum 0.1, eps 1e-5); eval uses running stats. Padding rows pass
    through normalized like any row but never contribute to statistics.
    """

    momentum: float = 0.1
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: jnp.ndarray,
        use_running_average: bool = False,
    ) -> jnp.ndarray:
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            w = mask.astype(jnp.float32)
            n = jnp.maximum(jnp.sum(w), 1.0)
            mean = jnp.sum(x * w[:, None], axis=0) / n
            var = jnp.sum(jnp.square(x - mean) * w[:, None], axis=0) / n
            unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
            if not self.is_initializing():
                ra_mean.value = (
                    1.0 - self.momentum
                ) * ra_mean.value + self.momentum * mean
                ra_var.value = (
                    1.0 - self.momentum
                ) * ra_var.value + self.momentum * unbiased
        inv = jnp.reciprocal(jnp.sqrt(var + self.epsilon))
        return (x - mean) * inv * scale + bias


class _SplitDense(nn.Module):
    """Dense over a CONCATENATION, computed part-by-part.

    Parameter layout is IDENTICAL to ``nn.Dense`` applied to
    ``concatenate(parts)`` (one ``(sum(in_dims), features)`` kernel + one
    bias under this module's scope), but the concatenation is never
    materialized: each part multiplies its kernel slice and the partial
    products are summed. ``posts[i]`` (optional) is applied to part i's
    product BEFORE the sum — gathers are linear, so passing the gather
    there turns "gather rows then matmul" into "matmul once per node then
    gather", cutting the edge-dense matmul FLOPs by the average degree
    and removing the [E, sum(in_dims)] concat HBM round-trip (the
    dominant cost of the EA step: 92% of its 185 ms device time was
    elementwise fusions over [T, W, 512..1536] window arrays, XLA op
    profile 2026-08-20)."""

    features: int
    in_dims: tuple
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, parts, posts=None):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (sum(self.in_dims), self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        k = kernel.astype(self.dtype)
        out = None
        off = 0
        for i, p in enumerate(parts):
            d = self.in_dims[i]
            t = jnp.matmul(p.astype(self.dtype), k[off: off + d])
            off += d
            if posts is not None and posts[i] is not None:
                t = posts[i](t)
            out = t if out is None else out + t
        return out + bias.astype(self.dtype)


class SplitFirstMLP(nn.Module):
    """Two-layer MLP, param-tree-identical to ``MLP((f, f))``, whose first
    Dense is a _SplitDense over concat parts (with optional per-part
    post-transforms — gathers — applied before the sum)."""

    features: int
    in_dims: tuple
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, parts, posts=None):
        t = _SplitDense(self.features, self.in_dims, dtype=self.dtype,
                        name="lin_0")(parts, posts)
        return nn.Dense(self.features, dtype=self.dtype,
                        name="lin_1")(nn.relu(t))


class GraphNetBlock(nn.Module):
    """Edge-augmented message-passing block (Models/BuckGNN.py:528-566).

    For each directed edge entry [row, col] the reference computes
      e'    = edge_mlp([x_row, x_col, e])
      m     = phi([x_col, e'])
      agg_i = scatter_mean over edges with row == i
      x'    = gamma([x, agg]);  x' = x' + beta(x')
    In the `GraphBatch` layout row == receiver and col == sender (both
    directions of every undirected edge are materialized), which reproduces
    the reference exactly.

    TPU formulation: the first Dense of edge_mlp / phi / gamma runs as a
    _SplitDense — node features are PROJECTED per node first and the
    projections gathered per edge (linearity of gather), so x_row / x_col
    and the [E, 2h+Fe] concats never exist. Parameters stay bitwise
    layout-compatible with the plain concat MLPs (and the reference's
    state_dict mapping in the parity tests).
    """

    hidden_channels: int
    dtype: jnp.dtype = jnp.float32
    # static window geometry (ops/ea_windowed.py::window_geometry) — when
    # set, the call expects `windows` and runs the per-edge gathers and
    # the scatter-mean as dense batched one-hot matmuls, with edge_attr
    # in window layout [n_tiles, W, .] both ways. Same math, same params.
    window_geom: tuple | None = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        edge_attr: jnp.ndarray,
        senders: jnp.ndarray,
        receivers: jnp.ndarray,
        windows: tuple | None = None,  # (sidx, ridx, far_pos, far_send, deg)
        fused: dict | None = None,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        h = self.hidden_channels
        num_nodes = x.shape[0]
        hx = x.shape[-1]
        fe = edge_attr.shape[-1]
        if fused is not None:
            # whole-block Pallas fusion (ops/pallas_ea_block.py): the
            # entire edge_mlp/phi/scatter/gamma/beta chain PLUS the
            # stack-level skip and dropout run as one kernel per node
            # tile. The caller must have checked supports_fused_ea. Bind
            # the identical param tree with dummy rows (dead code after
            # tracing) and hand the flax subtree to the kernel wrapper.
            from buckgnn_tpu.ops.pallas_ea_block import fused_ea_block
            from buckgnn_tpu.ops.pallas_epilogue import seed_from_key

            dt = self.dtype
            # layer-0 encoder fusion: edge_attr is then the RAW window
            # and the block's edge input dim is the ENCODER output h
            enc_params = fused.get("enc_params")
            fe_param = h if enc_params is not None else fe
            _ = SplitFirstMLP(h, (hx, hx, fe_param), dtype=dt,
                              name="edge_mlp")(
                [jnp.zeros((8, hx), dt), jnp.zeros((8, hx), dt),
                 jnp.zeros((8, fe_param), dt)])
            _ = SplitFirstMLP(h, (hx, h), dtype=dt, name="node_mlp_phi")(
                [jnp.zeros((8, hx), dt), jnp.zeros((8, h), dt)])
            _ = SplitFirstMLP(h, (hx, h), dtype=dt, name="node_mlp_gamma")(
                [jnp.zeros((8, hx), dt), jnp.zeros((8, h), dt)])
            _ = MLP((h, h), dtype=dt, name="node_mlp_beta")(
                jnp.zeros((8, h), dt))
            if fused.get("bind_only"):
                # tile-sharded TP (parallel/ea_shard.py): the caller only
                # needs the param tree bound under this block's scope;
                # the kernels run inside its shard_map
                return x, edge_attr
            key = fused["key"]
            return fused_ea_block(
                x, edge_attr, self.variables["params"], fused["batch"],
                skip=fused["skip"], rate=fused["rate"],
                seed=None if key is None else seed_from_key(key),
                deterministic=fused["deterministic"],
                encoder_params=enc_params,
            )
        if self.window_geom is not None:
            from buckgnn_tpu.ops import ea_windowed as eaw

            sidx, ridx, far_pos, far_send, degree = windows
            geom = self.window_geom

            def g_recv(p):
                return eaw.gather_receivers(p, ridx, geom)

            def g_send(p):
                return eaw.gather_senders(p, sidx, far_pos, far_send, geom)
        else:
            def g_recv(p):
                return p[receivers]

            def g_send(p):
                return p[senders]

        edge_attr = SplitFirstMLP(h, (hx, hx, fe), dtype=self.dtype,
                                  name="edge_mlp")(
            [x, x, edge_attr], posts=[g_recv, g_send, None])
        messages = SplitFirstMLP(h, (hx, h), dtype=self.dtype,
                                 name="node_mlp_phi")(
            [x, edge_attr], posts=[g_send, None])
        if self.window_geom is not None:
            agg = eaw.scatter_mean_messages(messages, ridx, degree,
                                            self.window_geom)
        else:
            from buckgnn_tpu.ops import segment

            agg = segment.segment_mean(
                messages, receivers, num_nodes, indices_are_sorted=True
            )
        x = SplitFirstMLP(h, (hx, h), dtype=self.dtype,
                          name="node_mlp_gamma")([x, agg])
        x = x + MLP((h, h), dtype=self.dtype, name="node_mlp_beta")(x)
        return x, edge_attr
