"""A/B: EA layer-0 encoder fusion ON vs OFF (VERDICT r4 next #3).

Same process, same dataset/batch, chained-wall protocol of
probe_ea_tile. The OFF arm monkeypatches supports_fused_encoder to
False (the model re-reads it at trace time), restoring the round-4
configuration: XLA edge encoder -> [T, W, h] window in HBM -> fused
blocks. The ON arm runs the shipped dispatch (raw window + in-kernel
encoder for block 0, no de_win emission in its backward).

Usage: timeout 3600 python benchmarks/probe_ea_enc.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from buckgnn_tpu.graph.normalizer import normalize_dataset
from buckgnn_tpu.graph.synthetic import generate_dataset
from buckgnn_tpu.ops import pallas_ea_block
from probe_ea_tile import run


def main():
    ds = generate_dataset(64, seed=0, min_side=24, max_side=32,
                          use_super_node=False, use_virtual_edges=True)
    normed, nz = normalize_dataset(ds)

    real = pallas_ea_block.supports_fused_encoder
    pallas_ea_block.supports_fused_encoder = lambda *a, **k: False
    try:
        print("arm OFF (r4 configuration: XLA encoder)", flush=True)
        off = run(normed, nz, 128, 128)
    finally:
        pallas_ea_block.supports_fused_encoder = real
    print("arm ON (in-kernel encoder, block 0)", flush=True)
    on = run(normed, nz, 128, 128)
    # re-run both arms to separate drift from effect
    pallas_ea_block.supports_fused_encoder = lambda *a, **k: False
    try:
        off2 = run(normed, nz, 128, 128)
    finally:
        pallas_ea_block.supports_fused_encoder = real
    on2 = run(normed, nz, 128, 128)
    print(f"OFF {off:.2f}/{off2:.2f} ms  ON {on:.2f}/{on2:.2f} ms  "
          f"delta {((off + off2) - (on + on2)) / 2:+.2f} ms", flush=True)


if __name__ == "__main__":
    main()
