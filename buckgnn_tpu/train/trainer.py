"""Training loop — jit-compiled steps, loss on denormalized targets.

Re-designs train_gnn (TRAIN_FINAL.py:168-455) TPU-first:

- ONE compiled train step and ONE compiled eval step for the whole run
  (fixed-capacity batches) — no per-batch host sync; metrics are device
  scalars fetched once per epoch.
- Loss is computed on denormalized eigenvalues exactly like the reference
  (TRAIN_FINAL.py:262: criterion(denorm(pred), denorm(y))).
- Adam + weight decay matches torch.optim.Adam(weight_decay=...) (L2 added
  to the gradient before the moment updates), cosine/warm-restart schedule
  stepped per epoch (TRAIN_FINAL.py:190-205,311-312).
- Checkpoints last/best-by-val-MAPE each epoch (TRAIN_FINAL.py:391-429),
  but with optimizer state included so training truly resumes.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from buckgnn_tpu.config import TrainConfig, checkpoint_config_dict
from buckgnn_tpu.graph.batch import GraphBatch, GraphData, batch_iterator, suggest_capacities
from buckgnn_tpu.graph.normalizer import DatasetNormalizer
from buckgnn_tpu.models.buckgnn import BuckGNN
from buckgnn_tpu.train import checkpoint as ckpt
from buckgnn_tpu.train.losses import GRAPH_FAMILY, get_loss_function
from buckgnn_tpu.train.metrics import MAPE_error, stress_errors
from buckgnn_tpu.train.schedule import lr_for_epoch
from buckgnn_tpu.utils import profiling
from buckgnn_tpu.utils.logging import MetricsWriter, ResultsFile
from buckgnn_tpu.utils.profiling import StepTimer


@struct.dataclass
class TrainState:
    params: dict
    batch_stats: dict
    opt_state: object
    epoch: int


def build_model(cfg: TrainConfig, num_node_features: int,
                num_edge_features: int) -> BuckGNN:
    return BuckGNN(
        num_node_features=num_node_features,
        num_edge_features=num_edge_features,
        hidden_channels=cfg.hidden_channels,
        num_layers=cfg.num_layers,
        pooling_layer=cfg.pooling_layer,
        prediction_type=cfg.prediction_type,
        use_z_coord=cfg.use_z_coord,
        use_rotations=cfg.use_rotations,
        dropout_rate=cfg.dropout_rate,
        model_name=cfg.model_name,
        dtype=jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32,
        impl=cfg.segment_impl,
        remat=cfg.remat,
    )


def make_optimizer(cfg: TrainConfig):
    """torch.optim.Adam(lr, weight_decay) parity: wd adds w*param to the
    gradient BEFORE the Adam moments; LR is applied outside (per-epoch)."""
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
    )


def _denorm_fns(normalizer: DatasetNormalizer, prediction_type: str):
    stats = normalizer.device_stats() if normalizer is not None else {}
    if prediction_type == "buckling":
        scale = stats.get("eigenvalue_scale", np.float32(1.0))
        center = stats.get("eigenvalue_center", np.float32(0.0))
        return (lambda v: v * scale + center), (scale, center)
    if prediction_type == "static_disp":
        scale = stats.get("displacement_scale", np.ones(2, np.float32))
        center = stats.get("displacement_center", np.zeros(2, np.float32))
        return (lambda v: v * scale + center), (scale, center)
    if prediction_type == "static_stress":
        scale = stats.get("gp_stress_scale", np.ones(3, np.float32))
        center = stats.get("gp_stress_center", np.zeros(3, np.float32))
        return (lambda v: v * scale + center), (scale, center)
    return (lambda v: v), (np.float32(1.0), np.float32(0.0))


def make_loss_and_metrics(criterion, cfg: TrainConfig,
                          normalizer: DatasetNormalizer | None):
    """Shared per-batch loss/metric assembly.

    ONE source of truth for how (pred, aux, batch) become the training loss
    and the metric dict — used by both the single-device steps
    (`make_train_step`) and the SPMD data-parallel step
    (`parallel/dp.py::make_parallel_train_step`), so the two can never
    drift. Returns `(compute_loss, compute_metrics)`.
    """
    prediction_type = cfg.prediction_type
    is_graph_loss = cfg.loss_function in GRAPH_FAMILY
    denorm, (ev_scale, ev_center) = _denorm_fns(normalizer, prediction_type)

    def compute_loss(pred, aux, batch: GraphBatch):
        if prediction_type == "buckling":
            y = batch.y[:, 0]
            return criterion(denorm(pred), denorm(y), batch.graph_mask)
        mask = aux["real_node_mask"]
        if "static" in prediction_type:
            dp, dy = denorm(pred), denorm(batch.y)
            if is_graph_loss:
                return criterion(dp, dy, batch.node_graph, mask,
                                 batch.graph_mask, batch.nodes)
            return criterion(dp, dy, mask)
        # mode_shape: loss on normalized values (TRAIN_FINAL.py:293-294)
        if is_graph_loss:
            return criterion(pred, batch.y, batch.node_graph, mask,
                             batch.graph_mask, batch.nodes)
        return criterion(pred, batch.y, mask)

    def compute_metrics(pred, aux, batch: GraphBatch):
        if prediction_type == "buckling":
            return {
                "mape": MAPE_error(pred, batch.y[:, 0], batch.graph_mask,
                                   "buckling", ev_scale, ev_center)
            }
        if "static" in prediction_type:
            # per-key static aggregates (the reference's per-key TB dicts,
            # TRAIN_FINAL.py:307-324); summed across batches (per-graph
            # sums), averaged per graph by the epoch loop
            threshold = 0.0001 if prediction_type == "static_disp" else 0.2
            d = stress_errors(
                denorm(pred), denorm(batch.y), batch.node_graph,
                aux["real_node_mask"], batch.graph_mask, prediction_type,
                threshold,
            )
            return {f"static/{k}": v for k, v in d.items()}
        return {}

    return compute_loss, compute_metrics


def make_train_step(model: BuckGNN, optimizer, criterion, cfg: TrainConfig,
                    normalizer: DatasetNormalizer | None):
    """One jitted optimization step. Returns (state, metrics dict)."""
    compute_loss, compute_metrics = make_loss_and_metrics(criterion, cfg,
                                                          normalizer)

    @jax.jit
    def train_step(state: TrainState, batch: GraphBatch, dropout_key, lr):
        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            (pred, aux), mutated = model.apply(
                variables, batch, deterministic=False,
                mutable=["batch_stats"],
                rngs={"dropout": dropout_key},
            )
            loss = compute_loss(pred, aux, batch)
            return loss, (mutated.get("batch_stats", state.batch_stats),
                          compute_metrics(pred, aux, batch))

        (loss, (new_bs, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        new_params = optax.apply_updates(state.params, updates)
        new_state = dataclasses.replace(
            state, params=new_params, batch_stats=new_bs, opt_state=new_opt
        )
        metrics["loss"] = loss
        return new_state, metrics

    @jax.jit
    def eval_step(state: TrainState, batch: GraphBatch):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        pred, aux = model.apply(variables, batch, deterministic=True)
        loss = compute_loss(pred, aux, batch)
        metrics = compute_metrics(pred, aux, batch)
        metrics["loss"] = loss
        return metrics, (pred, aux)

    return train_step, eval_step


def init_state(model: BuckGNN, optimizer, sample_batch: GraphBatch,
               seed: int = 0) -> TrainState:
    # jit the init: eager model.init dispatches every op individually to
    # the device (hundreds of round trips on remote/relayed backends);
    # jitted it is one compile + one execution.
    variables = jax.jit(
        lambda key, b: model.init(key, b, deterministic=True)
    )(jax.random.key(seed), sample_batch)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = jax.jit(optimizer.init)(params)
    return TrainState(params=params, batch_stats=batch_stats,
                      opt_state=opt_state, epoch=0)


def slice_static_targets(
    dataset: Sequence[GraphData], prediction_type: str
) -> list[GraphData]:
    """Target slicing for static runs (TRAIN_FINAL.py:1268-1279): the builder
    emits [disp | stress] node targets; static_disp keeps the first block,
    static_stress the last 3 columns."""
    if "static" not in prediction_type:
        return list(dataset)
    disp_dim = dataset[0].y.shape[1] - 3
    out = []
    for d in dataset:
        y = d.y[:, disp_dim:] if prediction_type == "static_stress" else (
            d.y[:, :disp_dim]
        )
        out.append(dataclasses.replace(d, y=y))
    return out


@dataclasses.dataclass
class TrainResult:
    state: TrainState
    best_val_mape: float
    history: list
    log_dir: str


def train_gnn(
    cfg: TrainConfig,
    train_data: Sequence[GraphData],
    val_data: Sequence[GraphData],
    normalizer: DatasetNormalizer | None,
    output_dir: str,
    trial_id: str | None = None,
    n_node_cap: int | None = None,
    n_edge_cap: int | None = None,
    resume_from: str | None = None,
    report_fn=None,
    verbose: bool = True,
) -> TrainResult:
    """The train_gnn orchestration (TRAIN_FINAL.py:168-455)."""
    train_data = slice_static_targets(train_data, cfg.prediction_type)
    val_data = slice_static_targets(val_data, cfg.prediction_type)
    trial_id = trial_id or f"manual_run_{int(time.time())}"
    log_dir = os.path.join(output_dir, "tensorboard_logs", trial_id)
    writer = MetricsWriter(log_dir)
    results = ResultsFile(
        os.path.join(log_dir, "results.txt"),
        header={"trial_id": trial_id, **dataclasses.asdict(cfg)},
    )
    wdir = os.path.join(log_dir, "weights")
    os.makedirs(wdir, exist_ok=True)

    num_node_features = train_data[0].x.shape[1]
    num_edge_features = train_data[0].edge_attr.shape[1]
    if n_node_cap is None or n_edge_cap is None:
        n_cap, e_cap = suggest_capacities(
            list(train_data) + list(val_data), cfg.batch_size
        )
        n_node_cap = n_node_cap or n_cap
        n_edge_cap = n_edge_cap or e_cap

    band_kw: dict = {}
    if cfg.segment_impl.startswith("banded"):
        # banded packing: tile-aligned node capacity, RCM node relabeling
        # for in-band locality on arbitrary-order meshes (graph/build.py),
        # band width auto-selected from the dataset's RCM bandwidth
        # (batch.py::select_band_geometry — ONE source of truth shared with
        # eval/inference.py and eval/timer.py).
        # Aligned to 4 tiles so the Pallas kernels' 4-tile unrolls engage
        # (fwd _UNROLL_FWD and the merged backward's _UNROLL_BWD both
        # need n_tiles % 4 == 0; bench.py uses the same alignment).
        from buckgnn_tpu.graph.batch import select_band_geometry

        # EA models run the fused GraphNetBlock kernel whose
        # selection-matmul flops scale with tile + slab: tile 128
        # measured 16% faster than 256 at flagship shape (v5e,
        # benchmarks/probe_ea_tile.py); width stays <= tile for the
        # backward's halo fold
        ea = cfg.model_name.startswith("EA_")
        tile, width = select_band_geometry(
            list(train_data) + list(val_data),
            **(dict(tile=128, widths=(64, 128)) if ea else {}),
        )
        align = 4 * tile
        if cfg.segment_impl == "banded_partitioned":
            # node capacity must split into tile-aligned shard ranges
            mesh = jax.sharding.get_abstract_mesh()
            n_shards = (mesh.shape["model"]
                        if "model" in mesh.axis_names else 1)
            import math

            align = math.lcm(align, n_shards * tile)
            if ea:
                # shard_ea_batch needs one full slab (tile + width rows)
                # per shard; width <= tile, so a 2-tile shard floor
                # guarantees it (same rule as __graft_entry__'s dryrun).
                # Without this, a small dataset on a 4-way model mesh
                # rounds n_node_cap to exactly n_shards*tile and pack()
                # dies in shard_ea_batch's slab assert.
                align = math.lcm(align, n_shards * 2 * tile)
        n_node_cap = ((max(n_node_cap, tile + width) + align - 1)
                      // align) * align
        band_kw = dict(band_width=width, band_tile=tile, rcm=True,
                       materialize_band=cfg.materialize_band)

    model = build_model(cfg, num_node_features, num_edge_features)
    optimizer = make_optimizer(cfg)

    all_values = (
        [float(np.reshape(d.y, (-1,))[0]) for d in train_data]
        if cfg.prediction_type == "buckling"
        else np.concatenate([np.reshape(d.y, (-1,)) for d in train_data])
    )
    criterion = get_loss_function(cfg.loss_function, all_values,
                                  cfg.use_z_coord, cfg.use_rotations)
    train_step, eval_step = make_train_step(model, optimizer, criterion, cfg,
                                            normalizer)

    # sticky edge-window caps: repack_every_epoch reshuffles batch
    # composition, and a shuffle that shifts the max per-tile edge count
    # would change the windowed shapes and recompile the train step —
    # feed the largest caps seen so far back in as floors. The local
    # star-window fallback is sticky the same way: once any repack's
    # tiles span too many graphs (gwin stripped -> global star tables),
    # later packs are forced global too so the treedef never flips back.
    win_floors = {"w": 0, "f": 0, "ft": 0, "fs": 0, "s": 0, "s2": 0,
                  "b": 0, "ea_cl": 0, "ea_cr": 0, "ea_cs": 0,
                  "local_star": True}

    def pack(data, shuffle, seed):
        batches = list(
            batch_iterator(data, cfg.batch_size, n_node_cap, n_edge_cap,
                           shuffle=shuffle, seed=seed,
                           min_win_cap=win_floors["w"],
                           min_far_cap=win_floors["f"],
                           min_far_tile_cap=win_floors["ft"],
                           min_fs_cap=win_floors["fs"],
                           min_spill_cap=win_floors["s"],
                           min_spill2_cap=win_floors["s2"],
                           min_band_cap=win_floors["b"],
                           local_star_windows=win_floors["local_star"],
                           **band_kw)
        )
        if batches and batches[0].win_edges is not None:
            win_floors["w"] = max(win_floors["w"],
                                  batches[0].win_edges.shape[1])
            win_floors["f"] = max(win_floors["f"],
                                  batches[0].win_far_pos.shape[0])
            win_floors["ft"] = max(win_floors["ft"],
                                   batches[0].win_far_tsend.shape[1])
            win_floors["fs"] = max(win_floors["fs"],
                                   batches[0].win_fs_src.shape[1])
        if batches and batches[0].spill_senders is not None:
            win_floors["s"] = max(win_floors["s"],
                                  int(batches[0].spill_senders.shape[0]))
            win_floors["s2"] = max(win_floors["s2"],
                                   int(batches[0].spill2_senders.shape[0]))
            win_floors["b"] = max(win_floors["b"],
                                  int(batches[0].band_senders.shape[0]))
        if any(b.gcode is not None and b.gwin is None for b in batches):
            win_floors["local_star"] = False
        if cfg.segment_impl == "banded_partitioned":
            # attach 'model'-axis shards for the ambient mesh
            # (jax.set_mesh); one shard otherwise. Caps/flags are
            # unified across the run so every batch shares a compiled
            # shape. SAGE models partition the banded aggregation's node
            # rows (parallel/partitioned.py); EA models tile-shard the
            # edge windows of the fused block stack
            # (parallel/ea_shard.py).
            mesh = jax.sharding.get_abstract_mesh()
            n_shards = (mesh.shape["model"]
                        if "model" in mesh.axis_names else 1)
            if cfg.model_name.startswith("EA_GNN"):
                from buckgnn_tpu.parallel.ea_shard import (
                    pad_ea_shards,
                    shard_caps,
                    shard_ea_batch,
                )

                # build each batch's shards ONCE at native caps, then
                # pad to the run maxima (pad_ea_shards is a vectorized
                # widen equivalent to a capped rebuild — shard_ea_batch
                # is two per-tile host loops, so building twice doubled
                # the pack cost) — with sticky cross-repack floors (same
                # role as the win_floors above: a reshuffle must not
                # change ea_part's shapes and recompile the step)
                built = [shard_ea_batch(b, n_shards) for b in batches]
                needed = [shard_caps(s) for s in built]
                cl = max(max(n[0] for n in needed), win_floors["ea_cl"])
                cr = max(max(n[1] for n in needed), win_floors["ea_cr"])
                cs = max(max(n[2] for n in needed), win_floors["ea_cs"])
                win_floors["ea_cl"], win_floors["ea_cr"] = cl, cr
                win_floors["ea_cs"] = cs
                batches = [
                    b.replace(ea_part=pad_ea_shards(s, cl, cr, cs))
                    for b, s in zip(batches, built)
                ]
            else:
                from buckgnn_tpu.parallel.partitioned import (
                    pad_partitioned,
                    partition_batch,
                )

                pbs = [partition_batch(b, n_shards) for b in batches]
                s_cap = max(int(pb.send_idx.shape[-1]) for pb in pbs)
                e_cap = max(int(pb.recv_perm.shape[-1]) for pb in pbs)
                any_spill = any(pb.has_spill for pb in pbs)
                batches = [
                    b.replace(part=pad_partitioned(pb, s_cap, e_cap,
                                                   force_spill=any_spill))
                    for b, pb in zip(batches, pbs)
                ]
        return batches

    train_batches = pack(train_data, True, cfg.seed)
    val_batches = pack(val_data, False, 0)

    state = init_state(model, optimizer, train_batches[0], cfg.seed)
    start_epoch = 0
    if resume_from is not None:
        state, _, _, _ = ckpt.load_checkpoint(resume_from, state)
        start_epoch = int(state.epoch)

    cfg_dict = checkpoint_config_dict(cfg, num_node_features, num_edge_features)
    key = jax.random.key(cfg.seed + 1, impl=cfg.rng_impl)
    best_fitness = 1e10
    history = []

    epoch_edges = sum(
        int(np.sum(np.asarray(b.edge_mask))) for b in train_batches
    )
    val_graphs = sum(
        int(np.sum(np.asarray(b.graph_mask))) for b in val_batches
    )
    timer = StepTimer()
    profiler_cm = None
    if cfg.profile_epochs > 0:
        profiler_cm = profiling.trace(os.path.join(log_dir, "profile"))
        profiler_cm.__enter__()

    for epoch in range(start_epoch, cfg.num_epochs):
        lr = lr_for_epoch(cfg, epoch)
        if cfg.repack_every_epoch and epoch > start_epoch:
            train_batches = pack(train_data, True, cfg.seed + epoch)
        order = np.random.default_rng(cfg.seed + epoch).permutation(
            len(train_batches)
        )
        # Metrics stay on device across the epoch (one host fetch per epoch);
        # the reference syncs per batch via .item() (TRAIN_FINAL.py:298).
        acc = None
        timer.start()
        for bi in order:
            key, sub = jax.random.split(key)
            state, metrics = train_step(state, train_batches[bi],
                                        sub, jnp.float32(lr))
            acc = metrics if acc is None else jax.tree.map(
                jnp.add, acc, metrics
            )
        acc = jax.device_get(acc)
        timer.stop(len(train_batches), epoch_edges)
        if profiler_cm is not None and epoch - start_epoch + 1 >= \
                cfg.profile_epochs:
            profiler_cm.__exit__(None, None, None)
            profiler_cm = None
        train_loss = float(acc["loss"]) / len(train_batches)
        train_mape = float(acc.get("mape", 0.0)) / len(train_batches)

        vacc = None
        for b in val_batches:
            metrics, _ = eval_step(state, b)
            vacc = metrics if vacc is None else jax.tree.map(
                jnp.add, vacc, metrics
            )
        vacc = jax.device_get(vacc)
        val_loss = float(vacc["loss"]) / len(val_batches)
        val_mape = float(vacc.get("mape", 0.0)) / len(val_batches)

        writer.add_scalar("Learning_Rate", lr, epoch)
        writer.add_scalar("Loss/train", train_loss, epoch)
        writer.add_scalar("Loss/validation", val_loss, epoch)
        writer.add_scalar("Perf/train_step_ms", timer.step_ms, epoch)
        writer.add_scalar("Perf/train_edges_per_s", timer.edges_per_s, epoch)
        timer.reset()
        if cfg.prediction_type == "buckling":
            writer.add_scalar("MAPE/train", train_mape, epoch)
            writer.add_scalar("MAPE/val", val_mape, epoch)
        for k, v in vacc.items():
            # per-key static aggregates (TRAIN_FINAL.py:307-324 parity):
            # stress_errors sums over graphs, so average per graph like the
            # reference (INFERENCE.py:153-172), not per batch
            if k.startswith("static/"):
                writer.add_scalar(f"{k}/val", float(v) / max(val_graphs, 1),
                                  epoch)

        state = dataclasses.replace(state, epoch=epoch + 1)
        ckpt.save_checkpoint(os.path.join(wdir, "last"), state, cfg,
                             cfg_dict, normalizer)
        if cfg.prediction_type == "buckling" and val_mape < best_fitness:
            best_fitness = val_mape
            ckpt.save_checkpoint(os.path.join(wdir, "best"), state, cfg,
                                 cfg_dict, normalizer)

        s = (
            f"Epoch {epoch + 1}/{cfg.num_epochs}, Train_Loss: {train_loss:.4f}, "
            f"Train_Mape: {train_mape:.2f}%, Val_Loss: {val_loss:.4f}, "
            f"Val_Mape:{val_mape:.2f}%"
        )
        results.append(s)
        if verbose:
            print(s)
        history.append(
            dict(epoch=epoch, train_loss=train_loss, val_loss=val_loss,
                 train_mape=train_mape, val_mape=val_mape, lr=lr)
        )
        if report_fn is not None:
            # Ray-Tune-style reporting hook (TRAIN_FINAL.py:447-453);
            # returns False to early-stop (ASHA-like schedulers).
            if report_fn(history[-1]) is False:
                break

    if profiler_cm is not None:  # fewer epochs ran than profile_epochs
        profiler_cm.__exit__(None, None, None)
    writer.close()
    return TrainResult(state=state, best_val_mape=best_fitness,
                       history=history, log_dir=log_dir)
