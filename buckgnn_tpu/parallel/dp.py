"""Data-parallel (+ edge-sharded) training over a device mesh.

Design: one packed `GraphBatch` per data-parallel group, stacked on a leading
device axis and sharded with `NamedSharding(mesh, P('data'))`; the per-batch
loss is vmapped over that axis inside ONE jit — XLA's SPMD partitioner turns
the gradient reduction into a psum over ICI automatically. Edge arrays are
additionally sharding-constrained along the 'model' axis so the gather/
scatter of each batch's edge set is partitioned (GSPMD inserts the
all-reduce of partial node aggregations).

Loss weighting: each shard's loss is weighted by its real-graph count so the
result equals the single-device loss on the concatenation of all shards.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from buckgnn_tpu.config import TrainConfig
from buckgnn_tpu.graph.batch import GraphBatch
from buckgnn_tpu.graph.normalizer import DatasetNormalizer
from buckgnn_tpu.models.buckgnn import BuckGNN
from buckgnn_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from buckgnn_tpu.train.trainer import TrainState, make_loss_and_metrics


def stack_batches(batches: Sequence[GraphBatch]) -> GraphBatch:
    """Stack per-device GraphBatches on a leading axis (all same capacities)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *batches)


_EDGE_FIELDS = {"edges", "senders", "receivers", "edge_mask"}


def shard_stacked_batch(stacked: GraphBatch, mesh: Mesh) -> GraphBatch:
    """Leading axis -> 'data'; edge arrays additionally sharded on 'model'
    along the edge dimension (edge capacity must divide the model-axis size)."""
    kw = {}
    for f in dataclasses.fields(GraphBatch):
        v = getattr(stacked, f.name)
        if v is None or not hasattr(v, "ndim"):
            kw[f.name] = v  # absent optional arrays / static metadata
            continue
        spec = (
            P(DATA_AXIS, MODEL_AXIS) if f.name in _EDGE_FIELDS else P(DATA_AXIS)
        )
        kw[f.name] = jax.device_put(v, NamedSharding(mesh, spec))
    return GraphBatch(**kw)


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def make_parallel_train_step(
    model: BuckGNN,
    optimizer,
    criterion,
    cfg: TrainConfig,
    normalizer: DatasetNormalizer | None,
    mesh: Mesh,
):
    """Jitted SPMD train step over a stacked, sharded batch.

    Loss/metric assembly is the trainer's own
    (`train.trainer.make_loss_and_metrics`), so the DP step computes exactly
    the single-device loss and the full metric dict (incl. the per-key
    static aggregates), weighted/summed across shards.
    """
    compute_loss, compute_metrics = make_loss_and_metrics(criterion, cfg,
                                                          normalizer)

    def per_batch(params, batch_stats, batch: GraphBatch, dropout_key):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        (pred, aux), mutated = model.apply(
            variables, batch, deterministic=False, mutable=["batch_stats"],
            rngs={"dropout": dropout_key},
        )
        loss = compute_loss(pred, aux, batch)
        metrics = compute_metrics(pred, aux, batch)
        weight = jnp.sum(batch.graph_mask.astype(jnp.float32))
        return loss, metrics, weight, mutated.get("batch_stats", batch_stats)

    @jax.jit
    def train_step(state: TrainState, stacked: GraphBatch, dropout_key, lr):
        n_dev = stacked.nodes.shape[0]
        keys = jax.random.split(dropout_key, n_dev)

        def loss_fn(params):
            losses, metrics, weights, new_bs = jax.vmap(
                per_batch, in_axes=(None, None, 0, 0)
            )(params, state.batch_stats, stacked, keys)
            w = weights / jnp.maximum(jnp.sum(weights), 1.0)
            loss = jnp.sum(losses * w)
            # per-batch means (mape) weight by graph count; per-graph SUMS
            # (static/*) just add up across shards
            metrics = {
                k: (jnp.sum(v) if k.startswith("static/")
                    else jnp.sum(v * w))
                for k, v in metrics.items()
            }
            # BN running stats: average the per-shard updates
            new_bs = jax.tree.map(lambda v: jnp.mean(v, axis=0), new_bs)
            return loss, (metrics, new_bs)

        (loss, (metrics, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        import optax

        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        new_params = optax.apply_updates(state.params, updates)
        new_state = dataclasses.replace(
            state, params=new_params, batch_stats=new_bs, opt_state=new_opt
        )
        metrics["loss"] = loss
        return new_state, metrics

    return train_step
