"""Fused EA kernel geometry at the reference's protocol batch 128
(VERDICT r4 next #6; /root/reference/TRAIN_FINAL.py:1298).

Round 4 measured b128 at the b64-optimal geometry (tile 128 / width 128:
215.4 ms, same per-edge rate as b64) but never swept the geometry at the
doubled live set. Selection-matmul flops scale with (tile + slab + Ct)
while grid-step count scales with N/tile, so the optimum could in
principle shift with batch. One process, same dataset, A/B by chained
walls (probe_ea_tile protocol).

Usage: timeout 3600 python benchmarks/probe_ea_b128.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from buckgnn_tpu.graph.normalizer import normalize_dataset
from buckgnn_tpu.graph.synthetic import generate_dataset
from probe_ea_tile import run


def main():
    ds = generate_dataset(128, seed=0, min_side=24, max_side=32,
                          use_super_node=False, use_virtual_edges=True)
    normed, nz = normalize_dataset(ds)
    run(normed, nz, 128, 128, batch_size=128)   # b64-optimal control
    run(normed, nz, 128, 64, batch_size=128)
    run(normed, nz, 256, 128, batch_size=128)
    run(normed, nz, 192, 64, batch_size=128)


if __name__ == "__main__":
    main()
