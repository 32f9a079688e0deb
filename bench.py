"""Benchmark: flagship 6-layer hidden-512 SAGE, edges/s/chip + step time.

Protocol mirrors the reference's INFERENCE_TIMER.py:151-270 (batch-128
forward with warmup, then timed loop) extended with a training-step
measurement; the primary metric follows BASELINE.json: edges/s/chip for the
6-layer h=512 SAGE stack.

The V100 baseline constant below is an estimate (the reference records no
hard numbers — SURVEY §6): a V100 running PyG SAGEConv at ~10 effective
fp32 TFLOP/s on this model shape sustains roughly 5e6 directed edges/s of
training throughput. vs_baseline = ours / that estimate.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import functools
import json
import time

import numpy as np

V100_TRAIN_EDGES_PER_S_EST = 5.0e6


def build_bench_setup(batch_size=128, hidden=512, num_layers=6, seed=0,
                      min_side=24, max_side=32, n_graphs=None,
                      impl="banded_pallas", compute_dtype="bfloat16",
                      band_width=None, band_tile=256, use_super_node=False,
                      use_virtual_edges=None, dataset=None, packing="exact",
                      model_name="GraphSage_addAggr_Shared"):
    """band_width=None auto-selects via select_band_geometry (the same
    source of truth the trainer uses); the bench meshes band fully at
    width 64 (supernode stars are analytic and never enter the band).

    ``dataset`` overrides the synthetic-panel dataset (e.g. organic
    ``datagen`` meshes). ``packing="trainer"`` sizes capacities via the
    trainer's own ``suggest_capacities`` (shuffle slack included) instead
    of exact-fitting the batch — the configuration users actually run.
    """
    import jax

    from buckgnn_tpu.config import TrainConfig
    from buckgnn_tpu.graph.batch import (
        batch_iterator, select_band_geometry, suggest_capacities,
    )
    from buckgnn_tpu.graph.normalizer import normalize_dataset
    from buckgnn_tpu.graph.synthetic import generate_dataset
    from buckgnn_tpu.train.losses import get_loss_function
    from buckgnn_tpu.train.trainer import (
        build_model, init_state, make_optimizer, make_train_step,
    )

    n_graphs = n_graphs or batch_size
    if use_virtual_edges is None:
        use_virtual_edges = not use_super_node
    if dataset is None:
        dataset = generate_dataset(
            n_graphs, seed=seed, min_side=min_side, max_side=max_side,
            use_super_node=use_super_node,
            use_virtual_edges=use_virtual_edges)
    else:
        n_graphs = min(n_graphs, len(dataset))
    normed, nz = normalize_dataset(dataset)
    cfg = TrainConfig(hidden_channels=hidden, num_layers=num_layers,
                      batch_size=batch_size, segment_impl=impl,
                      compute_dtype=compute_dtype, model_name=model_name)
    if impl.startswith("banded"):
        if band_width is None:
            band_tile, band_width = select_band_geometry(
                normed, tile=band_tile
            )
        bw = band_width
    else:
        bw = None
    if packing == "trainer":
        # the trainer's own capacity policy (train/trainer.py:265-299):
        # suggest_capacities slack so reshuffled epochs still pack
        ncap, ecap = suggest_capacities(normed, batch_size)
        if bw is not None:
            align = 4 * band_tile
            ncap = ((max(ncap, band_tile + bw) + align - 1) // align) * align
    else:
        # ONE fixed batch holds the whole dataset, so capacities are exact —
        # suggest_capacities' shuffle slack would add ~11% pure-padding node
        # tiles that cost full kernel time and carry zero edges
        n_real = sum(g.n_node for g in normed) + 1  # + dead node
        e_real = sum(g.n_edge for g in normed)
        ecap = ((e_real + 255) // 128) * 128
        if bw is not None:
            # 4-tile alignment so the Pallas kernels' unrolls engage
            align = 4 * band_tile
            ncap = ((max(n_real, band_tile + bw) + align - 1)
                    // align) * align
        else:
            ncap = n_real
    # rcm=True matches the trainer's packing AND select_band_geometry's
    # probe order — the selected width is only valid for RCM node order
    batch = next(iter(batch_iterator(normed, batch_size, ncap, ecap,
                                     band_width=bw, band_tile=band_tile,
                                     rcm=bw is not None)))
    if packing == "exact":
        assert int(np.sum(np.asarray(batch.graph_mask))) == n_graphs, (
            "bench batch must hold the full dataset"
        )
    model = build_model(cfg, normed[0].x.shape[1], normed[0].edge_attr.shape[1])
    opt = make_optimizer(cfg)
    state = init_state(model, opt, batch, seed=0)
    criterion = get_loss_function(cfg.loss_function)
    train_step, eval_step = make_train_step(model, opt, criterion, cfg, nz)
    n_edges = int(np.sum(np.asarray(batch.edge_mask)))
    n_graphs_real = int(np.sum(np.asarray(batch.graph_mask)))
    return dict(state=state, batch=batch, train_step=train_step,
                eval_step=eval_step, n_edges=n_edges, n_graphs=n_graphs_real,
                key=jax.random.key(0, impl=cfg.rng_impl))


def run_bench(setup, n_warmup=3, n_steps=50, chain=10):
    """``chain`` steps ride ONE dispatch (a jitted lax.fori_loop): each
    python->device dispatch crosses the axon relay and costs a variable
    2-4 ms, which at ~28 ms device steps would pollute the measurement by
    ~10-15%. Chaining is also how the production loop should run on TPU."""
    import jax
    import jax.numpy as jnp

    state, batch = setup["state"], setup["batch"]
    train_step, eval_step = setup["train_step"], setup["eval_step"]
    key = setup["key"]
    lr = jnp.float32(1e-3)

    @functools.partial(jax.jit, donate_argnums=0)
    def train_chain(state, key):
        def body(_, carry):
            state, key = carry
            key, sub = jax.random.split(key)
            state, _ = train_step(state, batch, sub, lr)
            return state, key

        return jax.lax.fori_loop(0, chain, body, (state, key))

    # NOTE: eval is NOT chained through fori_loop — its body would be
    # fully loop-invariant (state isn't carried, no RNG) and XLA's
    # while-loop invariant code motion would hoist the entire eval out of
    # the loop, under-reporting the step time by up to the chain length.
    # Plain async dispatch (block once at the end) keeps it honest; the
    # per-dispatch overhead pipelines.

    # warm up compile + the first device<->host transfer of this process
    for _ in range(n_warmup):
        state, key = train_chain(state, key)
    jax.block_until_ready(key)

    # dispatch all chains back-to-back and block ONCE on a tiny array:
    # blocking between chains costs ~60 ms of relay round-trips per block
    # (block_until_ready waits per buffer of the state pytree) — measured
    # +6 ms/step when a best-of-k variant synced after every chain
    n_chains = max(n_steps // chain, 1)
    t0 = time.perf_counter()
    for _ in range(n_chains):
        state, key = train_chain(state, key)
    jax.block_until_ready(key)
    train_dt = (time.perf_counter() - t0) / (n_chains * chain)

    m, _ = eval_step(state, batch)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(n_steps):
        m, _ = eval_step(state, batch)
    jax.block_until_ready(m["loss"])
    infer_dt = (time.perf_counter() - t0) / n_steps

    return dict(
        train_step_ms=train_dt * 1e3,
        infer_step_ms=infer_dt * 1e3,
        train_edges_per_s=setup["n_edges"] / train_dt,
        infer_edges_per_s=setup["n_edges"] / infer_dt,
        infer_samples_per_s=setup["n_graphs"] / infer_dt,
        n_edges=setup["n_edges"],
        n_graphs=setup["n_graphs"],
    )


def main():
    # thesis flagship config: super node + supernode pooling
    # (README.md:53-57); the analytic star edges count toward edges/s
    # exactly as the reference's materialized star edges would
    setup = build_bench_setup(use_super_node=True)
    res = run_bench(setup)
    value = res["train_edges_per_s"]
    print(
        json.dumps(
            {
                "metric": "train_edges_per_s_per_chip_6L_h512",
                "value": round(value, 1),
                "unit": "edges/s",
                "vs_baseline": round(value / V100_TRAIN_EDGES_PER_S_EST, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
