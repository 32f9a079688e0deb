"""Device-mesh construction for data x model (edge-partition) parallelism.

The reference has NO distributed execution at all (SURVEY §2.2: single GPU,
TRAIN_FINAL.py:96,172); this module is the comm backend the new framework
adds: `jax.sharding.Mesh` + NamedSharding/pjit, with collectives riding ICI.

Axes:
- 'data'  : data parallelism — each device (group) trains on its own packed
            GraphBatch; gradients all-reduce over this axis.
- 'model' : edge partitioning — each batch's edge set is split across this
            axis; per-device partial aggregations psum into full node states
            (the GNN analog of sequence/context parallelism).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Mesh of shape (n_data, n_model). Defaults to all devices on 'data'."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} needs {n_data * n_model} devices, "
            f"have {len(devices)}"
        )
    arr = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> dict:
    """Multi-host runtime bring-up (`jax.distributed.initialize`).

    On TPU pods every argument is discovered from the environment; pass
    them explicitly for CPU/GPU multi-process runs. Idempotent — safe to
    call when already initialized or when running single-process (returns
    the current topology either way). After this, `make_mesh()` sees every
    chip in the slice and DP gradients psum over DCN+ICI.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        pass  # already initialized
    except ValueError:
        pass  # nothing to discover: single-process run without coordinator
    return dict(
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        local_devices=len(jax.local_devices()),
        global_devices=len(jax.devices()),
    )


def host_shard(items, process_index: int | None = None,
               process_count: int | None = None) -> list:
    """Per-host slice of a dataset/work list (round-robin) — the multi-host
    input pipeline: each host's ETL builds only its own shard
    (replacing the reference's single-host mp.Pool, GraphCreate.py:625-630).
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return [x for i, x in enumerate(items) if i % pc == pi]
