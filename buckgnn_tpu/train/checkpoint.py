"""Checkpointing — params + optimizer state + step + normalizer + config.

The reference saves {model_state_dict, normalizer, config} to last.pt/best.pt
(TRAIN_FINAL.py:391-429) but NEVER saves optimizer/scheduler state, so it has
no true resume (SURVEY §5). This build does: the full TrainState (params,
batch_stats, opt_state, epoch, best fitness) round-trips, alongside the
normalizer stats (.npz) and config (.json) so inference can rebuild the model
purely from a checkpoint directory (INFERENCE.py:65-87 parity).
"""

from __future__ import annotations

import json
import os

import flax.serialization

from buckgnn_tpu.config import TrainConfig
from buckgnn_tpu.graph.normalizer import DatasetNormalizer


def save_checkpoint(
    path: str,
    state,
    train_config: TrainConfig,
    checkpoint_config: dict,
    normalizer: DatasetNormalizer | None,
) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "state.msgpack"), "wb") as f:
        f.write(flax.serialization.to_bytes(state))
    with open(os.path.join(path, "train_config.json"), "w") as f:
        f.write(train_config.to_json())
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(checkpoint_config, f, indent=2)
    if normalizer is not None:
        normalizer.save(os.path.join(path, "normalizer.npz"))


def load_checkpoint(path: str, state_template):
    """Restore (state, train_config, checkpoint_config, normalizer).

    ``state_template`` must be a structurally-identical TrainState (build it
    by initializing the model/optimizer from the stored configs).
    """
    with open(os.path.join(path, "state.msgpack"), "rb") as f:
        state = flax.serialization.from_bytes(state_template, f.read())
    with open(os.path.join(path, "train_config.json")) as f:
        train_config = TrainConfig.from_json(f.read())
    with open(os.path.join(path, "config.json")) as f:
        checkpoint_config = json.load(f)
    norm_path = os.path.join(path, "normalizer.npz")
    normalizer = (
        DatasetNormalizer.load(norm_path) if os.path.exists(norm_path) else None
    )
    return state, train_config, checkpoint_config, normalizer


def load_checkpoint_configs(path: str):
    """Read only the configs/normalizer (to build the template model)."""
    with open(os.path.join(path, "train_config.json")) as f:
        train_config = TrainConfig.from_json(f.read())
    with open(os.path.join(path, "config.json")) as f:
        checkpoint_config = json.load(f)
    norm_path = os.path.join(path, "normalizer.npz")
    normalizer = (
        DatasetNormalizer.load(norm_path) if os.path.exists(norm_path) else None
    )
    return train_config, checkpoint_config, normalizer
