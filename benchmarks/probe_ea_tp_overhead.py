"""Single-chip overhead of the EA tile-sharded TP path (n_shards=1).

Multi-chip hardware is not reachable from this environment, so the TP
path's hardware numbers can't be measured — but its single-shard
degenerate case CAN: same fused kernels inside a 1-device shard_map
with the far_grad='hybrid' backward (shard-local far rows fold via the
per-shard fs tables; at one shard the remote zone is empty) and a
trivial all_gather. The delta vs the plain fused path bounds the
per-chip cost the TP formulation adds before any communication —
measured ±0.0 ms with the hybrid fold (the all-autodiff first cut
cost +2.0 ms; RESULTS.md round-5).

Usage: timeout 1800 python benchmarks/probe_ea_tp_overhead.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from buckgnn_tpu.graph.normalizer import normalize_dataset
from buckgnn_tpu.graph.synthetic import generate_dataset
from probe_ea_tile import run


def main():
    ds = generate_dataset(64, seed=0, min_side=24, max_side=32,
                          use_super_node=False, use_virtual_edges=True)
    normed, nz = normalize_dataset(ds)
    print("arm fused (banded_pallas)", flush=True)
    a = run(normed, nz, 128, 64)
    print("arm tp-1shard (banded_partitioned)", flush=True)
    b = run(normed, nz, 128, 64, impl="banded_partitioned")
    a2 = run(normed, nz, 128, 64)
    b2 = run(normed, nz, 128, 64, impl="banded_partitioned")
    print(f"fused {a:.2f}/{a2:.2f} ms  tp1 {b:.2f}/{b2:.2f} ms  "
          f"overhead {((b + b2) - (a + a2)) / 2:+.2f} ms", flush=True)


if __name__ == "__main__":
    main()
