"""bench.py-protocol step-time rows for ALL THREE production configs
(VERDICT r4 next #2): SAGE supernode (the headline), SAGE virtual-edge,
and EA_GNN_Shared — one process, one relay warmup, chained train steps
and async eval exactly like bench.py. Append the three rows to the
tracked table in RESULTS.md each round.

Usage: timeout 1800 python benchmarks/bench_configs.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import build_bench_setup, run_bench

ROWS = [
    # (label, build kwargs) — geometries are the production picks
    # (CLAUDE.md perf state): SAGE auto (tile 256 / width 64 on these
    # meshes), EA tile 128 / width 64 (the round-5 pick; RESULTS.md).
    ("sage-supernode", dict(use_super_node=True)),
    ("sage-virtual", dict(use_super_node=False)),
    ("ea-virtual", dict(use_super_node=False, model_name="EA_GNN_Shared",
                        batch_size=64, n_graphs=64,
                        band_tile=128, band_width=64)),
]


def main():
    for label, kw in ROWS:
        setup = build_bench_setup(**kw)
        res = run_bench(setup)
        print(f"BENCH-ROW {label} | {res['train_step_ms']:.2f} ms/step | "
              f"{res['train_edges_per_s'] / 1e6:.2f}M train e/s | "
              f"{res['infer_step_ms']:.2f} ms eval | "
              f"{res['n_edges']} edges, {res['n_graphs']} graphs",
              flush=True)
        assert np.isfinite(res["train_step_ms"])


if __name__ == "__main__":
    main()
