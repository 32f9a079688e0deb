"""EA production-path check + INFERENCE_TIMER row (split out of
probe_fused_ea.py so throughput numbers need not be re-measured when
only this part reruns).

Usage: timeout 3600 python benchmarks/probe_ea_timer.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from buckgnn_tpu.config import TrainConfig
from buckgnn_tpu.eval.timer import run_time_analysis
from buckgnn_tpu.graph.normalizer import normalize_dataset
from buckgnn_tpu.graph.synthetic import generate_dataset
from buckgnn_tpu.train.trainer import train_gnn


def main():
    ds = generate_dataset(128, seed=0, min_side=24, max_side=32,
                          use_super_node=False, use_virtual_edges=True)
    normed, nz = normalize_dataset(ds)
    cfg = TrainConfig(hidden_channels=512, num_layers=6, batch_size=64,
                      num_epochs=3, lr=1e-3, t_0=10,
                      segment_impl="banded_pallas",
                      compute_dtype="bfloat16",
                      model_name="EA_GNN_Shared")
    out = "/tmp/ea_timer_ckpt"
    res = train_gnn(cfg, normed[:100], normed[100:], nz, out,
                    trial_id="ea_probe", verbose=False)
    print(f"train_gnn EA: best val MAPE {res.best_val_mape:.2f}% "
          f"(3 epochs, production tile-128 geometry)", flush=True)
    assert np.isfinite(res.best_val_mape)
    last = os.path.join(res.log_dir, "weights", "last")
    rep = run_time_analysis(last, normed[0],
                            output_path="/tmp/ea_timer.txt",
                            batch_size=128)
    g = rep["gnn"]
    print(f"EA TIMER: {g['samples_per_s']:.0f} samples/s "
          f"({g['latency_per_sample_ms']:.4f} ms/sample, batch 128)",
          flush=True)
    print("PROBE OK", flush=True)


if __name__ == "__main__":
    main()
