"""The BuckGNN model family — one flax module covering every reference variant.

Reproduces ``Models/BuckGNN.py`` (class BuckGNN == the `EdgeAugmentedGNN`
imported by TRAIN_FINAL.py:14; identical constructor/forward contract) as a
single `model_name`-switched module:

  GraphSage_addAggr_Shared   weight-tied SAGEConv(add, normalize) x L
                             (the trained/default variant, TRAIN_FINAL.py:66,81)
  GraphSage_{sum,add,mean,max}Aggr        per-layer SAGE + BatchNorm
  GraphSage_{sum,add}Aggr_woBatchNorm     per-layer SAGE, no BN
  GraphSage_MLP              SAGE -> BN -> ReLU -> Linear -> BN -> ReLU
                             with inner residual (BuckGNN.py:472-492)
  EA_GNN / EA_GNN_Shared     edge-augmented GraphNetBlock stacks
  GraphSAGE_SAG / EAGNN_SAG  stacks with SAGPooling(ratio=0.5) mid-model

Poolings: mean / mean_no_super / mlp / mlp_no_super / supernode_only /
supernode_with_pooling / hybrid (BuckGNN.py:246-307).

Skip-connection placement matches the reference exactly: skips only for
0 < i < num_layers-1 in flat stacks (BuckGNN.py:349-351), `i > 0` in the
first SAG stack and unconditional in the second (BuckGNN.py:361,372,500,511).

TPU re-design notes (not a port):
- operates on a fixed-capacity `GraphBatch`; all per-graph Python loops of the
  reference (supernode indexing BuckGNN.py:255-271) are segment ops/gathers.
- SAGPooling keeps static shapes by masking instead of physically compacting:
  dropped nodes are zeroed and excluded from all later statistics/readout,
  which is exactly equivalent for the 'add'-aggregation convs used in the SAG
  stacks (BuckGNN.py:198,215).
- The reference's broken variants (e.g. model_name="GraphSage_MLP" references
  parameter lists its __init__ never creates) are made functional here.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from buckgnn_tpu.graph.batch import GraphBatch
from buckgnn_tpu.models.blocks import (
    MLP,
    GraphNetBlock,
    MaskedBatchNorm,
    SAGEConv,
    decoder_widths,
    encoder_widths,
)
from buckgnn_tpu.ops import pooling as pool_ops
from buckgnn_tpu.ops import segment
from buckgnn_tpu.ops.dropout import dropout as xla_dropout
from buckgnn_tpu.ops.pallas_epilogue import relu_skip_dropout


def output_dim_for(
    prediction_type: str, use_z_coord: bool, use_rotations: bool
) -> int:
    """Output dimension switch (Models/BuckGNN.py:19-38)."""
    if prediction_type == "buckling":
        return 1
    if prediction_type == "static_disp":
        if use_z_coord and use_rotations:
            return 6
        if use_z_coord:
            return 3
        if use_rotations:
            return 4
        return 2
    if prediction_type == "static_stress":
        return 3
    if prediction_type == "mode_shape":
        return 6 if use_rotations else 3
    raise ValueError(f"Unknown prediction type: {prediction_type}")


class BuckGNN(nn.Module):
    num_node_features: int
    num_edge_features: int
    hidden_channels: int = 128
    num_layers: int = 6
    pooling_layer: str = "mean"
    prediction_type: str = "buckling"
    use_z_coord: bool = False
    use_rotations: bool = False
    dropout_rate: float = 0.1
    model_name: str = "GraphSage_addAggr_Shared"
    dtype: jnp.dtype = jnp.float32
    impl: str = "xla"  # segment-reduction backend: 'xla' | 'pallas'
    sag_ratio: float = 0.5
    # rematerialize each conv layer in the backward pass (jax.checkpoint):
    # trades ~1/3 more FLOPs for O(L) -> O(1) activation memory, lifting
    # the batch-size ceiling (the reference was memory-bound at batch 16
    # on 16 GB, README.md:59-62). None = automatic (on for the edge-dense
    # EA_GNN family at h >= 256, off otherwise); True/False force it.
    remat: bool | None = None

    # ------------------------------------------------------------------ #

    @nn.compact
    def __call__(self, batch: GraphBatch, deterministic: bool = True):
        """Forward pass.

        Returns ``(pred, aux)`` where for graph-level prediction
        ``pred: [G_cap]`` and for node-level ``pred: [N_cap, out]``; ``aux``
        is a dict with ``real_node_mask`` (valid, non-super rows — the
        reference's ``x[is_real_node]`` selection, BuckGNN.py:519-521) and
        ``node_keep`` (SAG-surviving nodes).
        """
        h = self.hidden_channels
        L = self.num_layers
        name = self.model_name
        x_in = batch.nodes
        senders, receivers = batch.senders, batch.receivers

        # Supernode detection from input features (BuckGNN.py:315-316): the
        # last input feature is 1 exactly on supernodes.
        if "super" in self.pooling_layer:
            is_super = jnp.logical_and(batch.node_mask, x_in[:, -1] != 0)
        else:
            is_super = jnp.zeros((batch.n_node_cap,), dtype=bool)
        real_node_mask = jnp.logical_and(batch.node_mask, jnp.logical_not(is_super))

        def dropout(v):
            if deterministic or self.dropout_rate <= 0.0:
                return v
            return xla_dropout(v, self.make_rng("dropout"), self.dropout_rate)

        def epilogue(c, skip):
            # relu -> (+skip) -> dropout, fused into one Pallas kernel on
            # TPU (ops/pallas_epilogue.py): mask bits live only in VMEM
            # and are regenerated in the backward pass.
            key = (
                None
                if deterministic or self.dropout_rate <= 0.0
                else self.make_rng("dropout")
            )
            return relu_skip_dropout(c, skip, key, self.dropout_rate)

        Conv = nn.remat(SAGEConv) if self.remat else SAGEConv

        # Encode (BuckGNN.py:323)
        x = MLP(encoder_widths(h), dtype=self.dtype, name="node_encoder")(x_in)
        edge_attr = batch.edges
        node_keep = batch.node_mask  # narrowed by SAG pooling

        # Banded aggregation context: built once per forward, shared by all
        # SAGE layers (ops/banded.py).
        agg_ctx = None
        if (
            self.impl in ("banded", "banded_pallas", "banded_partitioned")
            and batch.band_senders is not None
        ):
            from buckgnn_tpu.ops.banded import make_agg_context

            agg_ctx = make_agg_context(
                batch, band_dtype=self.dtype,
                use_pallas=self.impl == "banded_pallas",
                # only the mean-aggregation variants divide by in-degree
                need_degree="mean" in name.lower(),
                # EA batches carry ea_part (tile shards) instead of part
                # (node-row shards) — their agg context stays unpartitioned
                partitioned=(self.impl == "banded_partitioned"
                             and batch.part is not None),
            )

        # ---------------- processors ---------------- #
        if name == "GraphSage_addAggr_Shared":
            conv = Conv(
                h, aggr="add", normalize=True, dtype=self.dtype, impl=self.impl,
                name="shared_graphsage_block",
            )
            from buckgnn_tpu.ops.pallas_sage_layer import supports_fused_layer

            # whole-layer Pallas fusion (conv+norm+relu+skip+dropout in one
            # kernel); the in-kernel PRNG has no CPU interpret path, so
            # training with dropout requires a real TPU
            can_fuse = (
                not self.remat
                and supports_fused_layer(agg_ctx, x, "add", True)
                and (
                    deterministic
                    or self.dropout_rate <= 0.0
                    or jax.default_backend() == "tpu"
                )
            )
            # star threading (supernode, spill-free batches): each fused
            # layer's backward hands its deferred supernode-star table to
            # its neighbor in-kernel instead of an XLA [N, H] pass; the
            # chain opens at the encoder boundary (star_source applies the
            # first layer's table to the encoder cotangent).
            thread = (
                can_fuse
                and batch.has_supernode_edges
                and not batch.has_spill_edges
                and batch.gcode is not None
            )
            star = None
            if thread:
                from buckgnn_tpu.ops.pallas_sage_layer import star_source

                x, star = star_source(x, agg_ctx)
            # fwd-table threading: each layer's kernel accumulates the
            # NEXT layer's star table from z on the fly, replacing the
            # per-layer XLA build (an [N, H] re-read at the fusion
            # bandwidth floor, 0.146 ms/layer measured). Only pays with
            # the LOCAL window accumulation (batch.gwin); the GLOBAL
            # [tg, tile] in-kernel accumulation measured +0.31 ms/layer
            # on the fwd critical path (2026-08-18) and stays off.
            thread_tables = thread and batch.gwin is not None
            table = None
            for i in range(L):
                x_prev = x
                skip = 0 < i < L - 1
                if can_fuse:
                    x = conv(
                        x, senders, receivers, agg_ctx,
                        fused_epilogue=dict(
                            skip=skip,
                            rate=self.dropout_rate,
                            key=(
                                None
                                if deterministic or self.dropout_rate <= 0.0
                                else self.make_rng("dropout")
                            ),
                            deterministic=deterministic,
                            star_in=star,
                            star_next=thread and i < L - 1,
                            table_in=table,
                            emit_table=thread_tables and i < L - 1,
                        ),
                    )
                    if thread:
                        x, star, table = x
                        if not (thread_tables and i < L - 1):
                            table = None
                else:
                    x = conv(x, senders, receivers, agg_ctx)
                    # relu + skip (only for 0<i<L-1, BuckGNN.py:349-351) +
                    # dropout, as one fused epilogue
                    x = epilogue(x, x_prev if skip else None)

        elif name in (
            "GraphSage_sumAggr",
            "GraphSage_addAggr",
            "GraphSage_meanAggr",
            "GraphSage_maxAggr",
            "GraphSage_sumAggr_woBatchNorm",
            "GraphSage_addAggr_woBatchNorm",
        ):
            aggr = {
                "GraphSage_sumAggr": "add",
                "GraphSage_addAggr": "add",
                "GraphSage_meanAggr": "mean",
                "GraphSage_maxAggr": "max",
                "GraphSage_sumAggr_woBatchNorm": "add",
                "GraphSage_addAggr_woBatchNorm": "add",
            }[name]
            use_bn = "woBatchNorm" not in name
            for i in range(L):
                x_prev = x
                x = Conv(
                    h, aggr=aggr, normalize=True, dtype=self.dtype, impl=self.impl,
                    name=f"sage_{i}",
                )(x, senders, receivers, agg_ctx)
                if use_bn:
                    x = MaskedBatchNorm(dtype=self.dtype, name=f"bn_{i}")(
                        x, batch.node_mask, use_running_average=deterministic
                    )
                x = epilogue(x, x_prev if 0 < i < L - 1 else None)

        elif name == "GraphSage_MLP":
            # SAGE -> BN -> ReLU -> Linear -> (same) BN -> ReLU, inner
            # residual from the raw SAGE output (BuckGNN.py:472-492; the
            # reference reuses one BN instance twice per layer).
            for i in range(L):
                x_prev = x
                x = Conv(
                    h, aggr="add", normalize=True, dtype=self.dtype, impl=self.impl,
                    name=f"sage_{i}",
                )(x, senders, receivers, agg_ctx)
                x_sage = x
                bn = MaskedBatchNorm(dtype=self.dtype, name=f"bn_{i}")
                x = bn(x, batch.node_mask, use_running_average=deterministic)
                x = nn.relu(x)
                x = nn.Dense(h, dtype=self.dtype, name=f"mlp_{i}")(x)
                x = bn(x, batch.node_mask, use_running_average=deterministic)
                x = nn.relu(x)
                x = x_sage + x
                if 0 < i < L - 1:
                    x = x + x_prev
                x = dropout(x)

        elif name in ("EA_GNN", "EA_GNN_Shared"):
            # windowed dense formulation when the batch carries edge
            # windows and a banded impl was requested: per-edge
            # gathers/scatter become batched one-hot matmuls
            # (ops/ea_windowed.py) instead of ~40 ns/row XLA loops
            win_geom = windows = None
            if self.impl.startswith("banded"):
                from buckgnn_tpu.ops import ea_windowed as eaw

                if eaw.supports_windowed(batch):
                    win_geom = eaw.window_geometry(batch)
                    windows = (batch.win_sidx, batch.win_ridx,
                               batch.win_far_pos, batch.win_far_send,
                               eaw.window_degree(batch))
                    edge_attr = eaw.window_edge_features(batch)
            shared = name == "EA_GNN_Shared"
            # whole-block Pallas fusion (ops/pallas_ea_block.py): the
            # entire block + skip + dropout runs as one kernel per node
            # tile, recomputing in its backward — no [T, W, H]
            # intermediate ever reaches HBM, so remat is moot on this
            # path. The in-kernel PRNG needs a real TPU (CPU covers
            # interpret mode at rate 0); remat=True forces the windowed
            # XLA path as an escape hatch.
            can_fuse_ea = fuse_enc = False
            if win_geom is not None and self.remat is not True:
                from buckgnn_tpu.ops.pallas_ea_block import (
                    supports_fused_ea,
                    supports_fused_encoder,
                )

                can_fuse_ea = supports_fused_ea(batch, h) and (
                    deterministic
                    or self.dropout_rate <= 0.0
                    or jax.default_backend() == "tpu"
                )
                # layer-0 encoder fusion: the edge_encoder MLP runs
                # inside block 0's kernels from the raw edge window —
                # the [T, W, h] encoded window never touches HBM
                # (reference Models/BuckGNN.py:326-327 feeds the encoder
                # into the first block)
                fuse_enc = can_fuse_ea and supports_fused_encoder(
                    batch, h, edge_attr.shape[-1])
            # tile-sharded model parallelism (parallel/ea_shard.py): the
            # edge windows and activations shard by receiver tile over
            # the 'model' mesh axis; the whole block stack runs inside
            # one shard_map with a per-layer all_gather of node state
            tp = (can_fuse_ea
                  and self.impl == "banded_partitioned"
                  and getattr(batch, "ea_part", None) is not None)
            enc_params = None
            if tp:
                pass  # encoder runs per shard inside ea_tp_stack
            elif fuse_enc:
                # bind the identical edge_encoder param tree with a
                # dummy call (dead code after tracing) and hand the
                # subtree to block 0's kernel; edge_attr STAYS raw
                _ = MLP(encoder_widths(h), dtype=self.dtype,
                        name="edge_encoder")(
                    jnp.zeros((8, edge_attr.shape[-1]), self.dtype))
                enc_params = self.variables["params"]["edge_encoder"]
            else:
                edge_attr = MLP(encoder_widths(h), dtype=self.dtype,
                                name="edge_encoder")(edge_attr)
            if tp:
                from buckgnn_tpu.ops.pallas_epilogue import seed_from_key
                from buckgnn_tpu.parallel.ea_shard import ea_tp_stack

                _ = MLP(encoder_widths(h), dtype=self.dtype,
                        name="edge_encoder")(
                    jnp.zeros((8, edge_attr.shape[-1]), self.dtype))
                enc_p = self.variables["params"]["edge_encoder"]
                e_dummy = jnp.zeros((1, 1, h), self.dtype)
                names = (["shared_gn_block"] * L if shared
                         else [f"gn_block_{i}" for i in range(L)])
                for nm in dict.fromkeys(names):
                    _ = GraphNetBlock(h, dtype=self.dtype,
                                      window_geom=win_geom, name=nm)(
                        x, e_dummy, senders, receivers, windows,
                        fused=dict(bind_only=True))
                bps = [self.variables["params"][nm] for nm in names]
                key = (None
                       if deterministic or self.dropout_rate <= 0.0
                       else self.make_rng("dropout"))
                x = ea_tp_stack(
                    x, batch.ea_part, bps, enc_p,
                    rate=self.dropout_rate,
                    seed=None if key is None else seed_from_key(key),
                    deterministic=deterministic,
                )
            # EA_GNN is edge-dense: each block holds [E, 2h+..] activations
            # (~1 GB/layer at flagship shape — the reference's batch-16
            # memory wall, README.md:59-62). On the unfused path, remat
            # the blocks by DEFAULT at h >= 256 so flagship-width EA_GNN
            # trains at batch 128 on one 16 GB chip (O(1) activation
            # memory; RESULTS.md has the measured step time).
            ea_remat = (not can_fuse_ea
                        and (h >= 256 if self.remat is None else self.remat))
            Block = nn.remat(GraphNetBlock) if ea_remat else GraphNetBlock
            if shared and not tp:
                block = Block(h, dtype=self.dtype, window_geom=win_geom,
                              name="shared_gn_block")
            for i in range(0 if tp else L):
                x_prev, e_prev = x, edge_attr
                blk = (
                    block
                    if shared
                    else Block(h, dtype=self.dtype, window_geom=win_geom,
                               name=f"gn_block_{i}")
                )
                skip = 0 < i < L - 1
                if can_fuse_ea:
                    x, edge_attr = blk(
                        x, edge_attr, senders, receivers, windows,
                        fused=dict(
                            skip=skip,
                            rate=self.dropout_rate,
                            key=(
                                None
                                if deterministic or self.dropout_rate <= 0.0
                                else self.make_rng("dropout")
                            ),
                            deterministic=deterministic,
                            batch=batch,
                            enc_params=enc_params if i == 0 else None,
                        ),
                    )
                    continue  # skip/dropout applied in-kernel
                x, edge_attr = blk(x, edge_attr, senders, receivers,
                                   windows)
                if skip:
                    x = x + x_prev
                    edge_attr = edge_attr + e_prev
                x = dropout(x)
                edge_attr = dropout(edge_attr)

        elif name == "GraphSAGE_SAG":
            n_before = L // 2
            n_after = L - n_before
            for i in range(n_before):
                identity = x
                x = Conv(
                    h, aggr="add", normalize=True, dtype=self.dtype, impl=self.impl,
                    name=f"sage1_{i}",
                )(x, senders, receivers, agg_ctx)
                x = MaskedBatchNorm(dtype=self.dtype, name=f"bn1_{i}")(
                    x, batch.node_mask, use_running_average=deterministic
                )
                x = nn.relu(x)
                x = dropout(x)
                if i > 0:
                    x = x + identity
            x, node_keep = self._sag_pool(x, batch, deterministic, agg_ctx)
            for i in range(n_after):
                identity = x
                x = Conv(
                    h, aggr="add", normalize=True, dtype=self.dtype, impl=self.impl,
                    name=f"sage2_{i}",
                )(x, senders, receivers, agg_ctx)
                x = x * node_keep.astype(x.dtype)[:, None]
                x = MaskedBatchNorm(dtype=self.dtype, name=f"bn2_{i}")(
                    x, node_keep, use_running_average=deterministic
                )
                x = nn.relu(x)
                x = dropout(x)
                x = x + identity
                x = x * node_keep.astype(x.dtype)[:, None]

        elif name == "EAGNN_SAG":
            edge_attr = MLP(encoder_widths(h), dtype=self.dtype, name="edge_encoder")(
                edge_attr
            )
            n_before = L // 2
            n_after = L - n_before
            for i in range(n_before):
                x_prev, e_prev = x, edge_attr
                x, edge_attr = GraphNetBlock(h, dtype=self.dtype, name=f"gn1_{i}")(
                    x, edge_attr, senders, receivers
                )
                x = dropout(x)
                edge_attr = dropout(edge_attr)
                if i > 0:
                    x = x + x_prev
                    edge_attr = edge_attr + e_prev
            x, node_keep = self._sag_pool(x, batch, deterministic, agg_ctx)
            edge_keep = jnp.logical_and(node_keep[senders], node_keep[receivers])
            edge_attr = edge_attr * edge_keep.astype(edge_attr.dtype)[:, None]
            for i in range(n_after):
                x_prev, e_prev = x, edge_attr
                x, edge_attr = GraphNetBlock(h, dtype=self.dtype, name=f"gn2_{i}")(
                    x, edge_attr, senders, receivers
                )
                x = x * node_keep.astype(x.dtype)[:, None]
                x = dropout(x)
                edge_attr = dropout(edge_attr)
                x = x + x_prev
                edge_attr = edge_attr + e_prev
                x = x * node_keep.astype(x.dtype)[:, None]

        else:
            raise ValueError(f"Unknown model_name: {name}")

        # ---------------- heads ---------------- #
        out_dim = output_dim_for(
            self.prediction_type, self.use_z_coord, self.use_rotations
        )
        dec_in_double = (
            self.pooling_layer == "supernode_with_pooling"
            and self.prediction_type == "buckling"
        )
        decoder = MLP(decoder_widths(h, out_dim), dtype=self.dtype, name="decoder")
        del dec_in_double  # (decoder input dim is inferred lazily by flax)

        aux = {"real_node_mask": real_node_mask, "node_keep": node_keep}

        if self.prediction_type == "buckling":
            pooled = self._pool(x, batch, is_super, node_keep, deterministic)
            pred = decoder(pooled)
            return pred.squeeze(-1), aux
        # static / mode_shape: per-node decoding; supernodes excluded via
        # aux['real_node_mask'] downstream (BuckGNN.py:519-524).
        return decoder(x), aux

    # ------------------------------------------------------------------ #

    def _pool(self, x, batch: GraphBatch, is_super, node_keep, deterministic):
        """Graph readout (BuckGNN.py:246-307) over segment layout."""
        p = self.pooling_layer
        mask = node_keep  # == node_mask except after SAG pooling

        def masked_mean(keep):
            # few-segment reduction -> one-hot matmul on the MXU
            # (~7x over the scatter-lowered segment_sum, ops/segment.py)
            total = segment.segment_sum_dense(
                x, batch.node_graph, batch.n_graph_cap, keep=keep
            )
            count = segment.segment_count_dense(
                batch.node_graph, batch.n_graph_cap, keep=keep
            )
            # divide in f32 (counts are exact there; bf16 rounds ints > 256)
            return total / jnp.maximum(count, 1.0)[:, None]

        if p == "mean":
            return masked_mean(mask)
        if p == "mean_no_super":
            return masked_mean(jnp.logical_and(mask, jnp.logical_not(is_super)))
        if p == "supernode_only":
            return x[batch.supernode_index]
        if p == "supernode_with_pooling":
            pooled = masked_mean(jnp.logical_and(mask, jnp.logical_not(is_super)))
            super_feats = x[batch.supernode_index]
            return jnp.concatenate([pooled, super_feats], axis=-1)
        if p in ("mlp", "mlp_no_super"):
            keep = (
                mask
                if p == "mlp"
                else jnp.logical_and(mask, jnp.logical_not(is_super))
            )
            pooled = masked_mean(keep)
            # MLPPooling: mean pool -> Linear -> ReLU (BuckGNN.py:568-581).
            pooled = nn.Dense(self.hidden_channels, dtype=self.dtype, name="pool_mlp")(
                pooled
            )
            return nn.relu(pooled)
        if p == "hybrid":
            # HybridPooling (BuckGNN.py:583-615): sigmoid-attention scatter_add
            # + mean + max pools, concatenated then mixed by an MLP.
            att = MLP(
                (self.hidden_channels, 1), dtype=self.dtype, name="hybrid_att"
            )(x)
            att = nn.sigmoid(att)
            weighted = x * att
            att_pool = segment.segment_sum_dense(
                weighted, batch.node_graph, batch.n_graph_cap, keep=mask
            )
            mean_pool = masked_mean(mask)
            big_neg = jnp.finfo(x.dtype).min
            masked_x = jnp.where(mask[:, None], x, big_neg)
            max_pool = segment.segment_max(
                masked_x, batch.node_graph, batch.n_graph_cap
            )
            count = segment.segment_count(
                batch.node_graph, batch.n_graph_cap, mask=mask
            )
            max_pool = jnp.where(count[:, None] > 0, max_pool, 0.0)
            combined = jnp.concatenate([att_pool, mean_pool, max_pool], axis=-1)
            return MLP(
                (self.hidden_channels, self.hidden_channels),
                dtype=self.dtype,
                name="hybrid_mix",
            )(combined)
        raise ValueError(f"Unknown pooling layer: {p}")

    def _sag_pool(self, x, batch: GraphBatch, deterministic, agg_ctx=None):
        """SAGPooling(ratio, GNN=SAGEConv, aggr='add') (BuckGNN.py:203-208).

        Static-shape variant: per-graph top-ceil(ratio*n) nodes by learned
        SAGE score; survivors get x * tanh(score), dropped nodes are zeroed
        and excluded downstream (exactly equivalent to physical compaction
        for add-aggregation).
        """
        score = SAGEConv(
            1, aggr="add", normalize=False, dtype=self.dtype, impl=self.impl,
            name="sag_score",
        )(x, batch.senders, batch.receivers, agg_ctx).squeeze(-1)
        # Rank nodes within each graph by descending score.
        order = jnp.lexsort((-score, batch.node_graph))
        counts = segment.segment_count(batch.node_graph, batch.n_graph_cap)
        starts = jnp.concatenate(
            [jnp.zeros((1,), jnp.float32), jnp.cumsum(counts)[:-1]]
        )
        sorted_graph = batch.node_graph[order]
        rank = jnp.arange(batch.n_node_cap) - starts[sorted_graph]
        k_per_graph = jnp.ceil(self.sag_ratio * batch.n_real_node.astype(jnp.float32))
        keep_sorted = rank < k_per_graph[sorted_graph]
        keep = jnp.zeros((batch.n_node_cap,), bool).at[order].set(keep_sorted)
        keep = jnp.logical_and(keep, batch.node_mask)
        x = x * jnp.tanh(score)[:, None] * keep.astype(x.dtype)[:, None]
        return x, keep


def model_config_dict(model: BuckGNN) -> dict:
    """The checkpoint `config` payload (TRAIN_FINAL.py:397-409)."""
    return dict(
        num_node_features=model.num_node_features,
        num_edge_features=model.num_edge_features,
        hidden_channels=model.hidden_channels,
        num_layers=model.num_layers,
        use_edge_attr=True,
        use_z_coord=model.use_z_coord,
        use_rotations=model.use_rotations,
        prediction_type=model.prediction_type,
        pooling_layer=model.pooling_layer,
        dropout_rate=model.dropout_rate,
        model_name=model.model_name,
    )
