"""Latency benchmark — GNN surrogate vs FEA solver wall-clock.

INFERENCE_TIMER.py parity (:151-270): one sample replicated to a full batch,
warmup, then a timed forward loop reporting samples/sec and per-sample
latency; optionally times the external Nastran solver (single + parallel)
for the speedup comparison when a solver command is available — otherwise
the GNN-only path runs hermetically (the reference's NASTRAN=False switch,
INFERENCE_TIMER.py:298).
"""

from __future__ import annotations

import copy
import os
import subprocess
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Sequence

import jax
import numpy as np

from buckgnn_tpu.graph.batch import GraphData, batch_iterator, suggest_capacities


def time_gnn_forward(
    model, state, eval_step, sample: GraphData, batch_size: int = 128,
    n_warmup: int = 3, n_timed: int = 20, band_kw: dict | None = None,
):
    """Replicate one graph to a full batch (INFERENCE_TIMER.py:194-214) and
    time the forward loop (:226-238)."""
    graphs = [copy.deepcopy(sample) for _ in range(batch_size)]
    ncap, ecap = suggest_capacities(graphs, batch_size, slack=1.1)
    if band_kw:
        tile = band_kw.get("band_tile", 256)
        align = 4 * tile  # 4-tile unroll alignment (matches trainer/bench)
        ncap = ((max(ncap, tile + band_kw.get("band_width", 128)) + align - 1)
                // align) * align
    batch = next(iter(batch_iterator(graphs, batch_size, ncap, ecap,
                                     **(band_kw or {}))))
    for _ in range(n_warmup):
        m, _ = eval_step(state, batch)
    _ = np.asarray(m["loss"])  # force completion
    t0 = time.perf_counter()
    for _ in range(n_timed):
        m, _ = eval_step(state, batch)
    _ = np.asarray(m["loss"])
    dt = (time.perf_counter() - t0) / n_timed
    return dict(
        batch_time_s=dt,
        samples_per_s=batch_size / dt,
        latency_per_sample_ms=dt / batch_size * 1e3,
    )


def time_nastran(
    bdf_paths: Sequence[str],
    nastran_cmd: str = "nastran",
    parallel: int = 1,
    timeout: float = 600.0,
):
    """Solver wall-clock, single + thread-parallel batches
    (INFERENCE_TIMER.py:48-149). Returns None when the solver binary is
    unavailable (hermetic environments)."""
    from shutil import which

    if which(nastran_cmd) is None:
        return None

    def run_one(path):
        t0 = time.perf_counter()
        subprocess.run(
            [nastran_cmd, path, "scr=yes", "bat=no", "news=no"],
            cwd=os.path.dirname(path) or ".",
            timeout=timeout,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
            check=False,
        )
        return time.perf_counter() - t0

    t0 = time.perf_counter()
    singles = [run_one(p) for p in bdf_paths[:1]]
    single_time = singles[0] if singles else None
    if parallel > 1:
        with ThreadPoolExecutor(max_workers=parallel) as ex:
            list(ex.map(run_one, bdf_paths))
        parallel_time = (time.perf_counter() - t0) / max(len(bdf_paths), 1)
    else:
        parallel_time = single_time
    return dict(single_time_s=single_time, parallel_per_sample_s=parallel_time)


def run_time_analysis(
    model_path: str,
    sample: GraphData,
    output_path: str | None = None,
    batch_size: int = 128,
    bdf_paths: Sequence[str] = (),
    nastran_cmd: str = "nastran",
):
    """Full comparison report (run_time_analysis, INFERENCE_TIMER.py:151-270)."""
    from buckgnn_tpu.eval.inference import load_model_from_checkpoint
    from buckgnn_tpu.train import checkpoint as ckpt
    from buckgnn_tpu.train.losses import get_loss_function
    from buckgnn_tpu.train.trainer import (
        init_state, make_optimizer, make_train_step,
    )

    model, train_cfg, config, normalizer = load_model_from_checkpoint(model_path)
    optimizer = make_optimizer(train_cfg)
    graphs = [sample]
    band_kw: dict = {}
    if train_cfg.segment_impl.startswith("banded"):
        from buckgnn_tpu.graph.batch import select_band_geometry

        # EA checkpoints: tile 128 for the fused block kernel (see
        # trainer.train_gnn's geometry note)
        ea = str(config.get("model_name", "")).startswith("EA_")
        tile, width = select_band_geometry(
            graphs, **(dict(tile=128, widths=(64, 128)) if ea else {}),
        )
        band_kw = dict(band_width=width, band_tile=tile, rcm=True)
    ncap, ecap = suggest_capacities(graphs, 1, slack=2.0)
    if band_kw:
        tile, width = band_kw["band_tile"], band_kw["band_width"]
        align = 4 * tile
        ncap = ((max(ncap, tile + width) + align - 1) // align) * align
    b0 = next(iter(batch_iterator(graphs, 1, ncap, ecap, **band_kw)))
    state = init_state(model, optimizer, b0)
    state, _, _, _ = ckpt.load_checkpoint(model_path, state)
    criterion = get_loss_function(train_cfg.loss_function)
    _, eval_step = make_train_step(model, optimizer, criterion, train_cfg,
                                   normalizer)

    gnn = time_gnn_forward(model, state, eval_step, sample, batch_size,
                           band_kw=band_kw)
    solver = time_nastran(bdf_paths, nastran_cmd) if bdf_paths else None

    report = {"gnn": gnn, "nastran": solver}
    if solver and solver.get("single_time_s"):
        report["speedup_vs_single"] = (
            solver["single_time_s"] / (gnn["latency_per_sample_ms"] / 1e3)
        )
    if output_path:
        with open(output_path, "w") as f:
            f.write(f"GNN batch={batch_size}: "
                    f"{gnn['samples_per_s']:.1f} samples/s, "
                    f"{gnn['latency_per_sample_ms']:.3f} ms/sample\n")
            if solver:
                f.write(f"Nastran single: {solver['single_time_s']:.2f} s\n")
                f.write(
                    f"Nastran parallel/sample: "
                    f"{solver['parallel_per_sample_s']:.2f} s\n"
                )
                if "speedup_vs_single" in report:
                    f.write(f"Speedup: {report['speedup_vs_single']:.0f}x\n")
            else:
                f.write("Nastran: unavailable (GNN-only mode)\n")
    return report
