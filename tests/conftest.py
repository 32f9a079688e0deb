"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-host logic is tested CPU-side per the reference-survey test strategy
(SURVEY.md §4.5); set env BEFORE jax is imported anywhere.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment's sitecustomize may pre-import jax with a TPU platform;
# jax.config.update still wins as long as no backend has been initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from buckgnn_tpu.graph.batch import GraphData  # noqa: E402


def make_random_graph(
    rng: np.random.Generator,
    n_nodes: int,
    n_feat: int = 15,
    e_feat: int = 5,
    graph_target_dim: int = 1,
    node_level: bool = False,
    supernode: bool = False,
) -> GraphData:
    """Small random graph with both edge directions materialized."""
    n_und = max(n_nodes, int(n_nodes * 1.5))
    a = rng.integers(0, n_nodes, size=n_und)
    b = rng.integers(0, n_nodes, size=n_und)
    keep = a != b
    a, b = a[keep], b[keep]
    # dedupe undirected pairs so (s, r) uniquely identifies an edge
    pairs = {tuple(sorted(p)) for p in zip(a.tolist(), b.tolist())}
    a = np.array([p[0] for p in sorted(pairs)], dtype=np.int64)
    b = np.array([p[1] for p in sorted(pairs)], dtype=np.int64)
    senders = np.concatenate([a, b]).astype(np.int32)
    receivers = np.concatenate([b, a]).astype(np.int32)
    x = rng.normal(size=(n_nodes, n_feat)).astype(np.float32)
    sn = -1
    if supernode:
        x[:, -1] = 0.0
        x[-1] = 0.0
        x[-1, -1] = 1.0
        sn = n_nodes - 1
    edge_attr = rng.normal(size=(senders.shape[0], e_feat)).astype(np.float32)
    if node_level:
        y = rng.normal(size=(n_nodes, graph_target_dim)).astype(np.float32)
    else:
        y = rng.normal(size=(graph_target_dim,)).astype(np.float32)
    return GraphData(
        x=x, senders=senders, receivers=receivers, edge_attr=edge_attr, y=y,
        supernode=sn,
    )


@pytest.fixture
def rng():
    return np.random.default_rng(0)
