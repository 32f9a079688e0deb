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
