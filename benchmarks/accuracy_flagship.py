"""Flagship-shape accuracy with variance bars (VERDICT r2 weak #7 / #8b).

Trains a PRODUCTION configuration on the synthetic datagen-distribution
oracle with MULTIPLE SEEDS, so the accuracy-parity claim carries
run-to-run variance instead of a single point. The r2 proxy experiment
(benchmarks/accuracy_parity.py) compared architectures at h=64/L=3; this
one fixes the exact flagship shapes.

``--config`` selects which production family (VERDICT r4 next #2 — the
pinned gates must cover all three, reference TRAIN_FINAL.py:246-453):

- ``sage``    (default): GraphSage_addAggr_Shared, 6L h512, supernode
  pooling, banded_pallas, bf16, dropout 0.1, batch 128 — the headline
  config (reference Models/BuckGNN.py:41-100).
- ``ea``:     EA_GNN_Shared, 6L h512, virtual edges, mean pooling,
  fused-block kernel, batch 64, 60 epochs — the second flagship family
  (reference Models/BuckGNN.py:528-566).
- ``virtual``: GraphSage_addAggr_Shared on the virtual-edge dataset
  (supernode and virtual edges are mutually exclusive,
  GraphCreate.py:379-415), mean pooling, batch 128.

Usage: timeout 5400 python benchmarks/accuracy_flagship.py \
          [--config sage|ea|virtual] [--graphs 512] [--epochs N] \
          [--seeds 0 1]

``--pinned`` (VERDICT r3 #5) freezes the ROUND-OVER-ROUND convergence
gate per config: generator seed 100 + sides 16-24 + 512 graphs + split
seed 0 + seeds 0 1 2, with the per-config epochs/batch above, overriding
every other flag. The sage spec is bit-identical to the round-3 entries
(14.54/15.54/13.99% best val MAPE); the ea spec reproduces the round-4
convergence runs (seeds 0/1: 14.71/15.71%). Run each config every round
after kernel changes and append the PINNED lines to the tracked table in
RESULTS.md; a regression beyond the ~1.6pp seed spread flags a
convergence bug.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CONFIGS = {
    "sage": dict(
        tag="FLAGSHIP 6L h512 supernode",
        dataset=dict(use_super_node=True, use_virtual_edges=False),
        train=dict(model_name="GraphSage_addAggr_Shared", batch_size=128,
                   pooling_layer="supernode_with_pooling"),
        pinned_epochs=120,
    ),
    "ea": dict(
        tag="EA_GNN_Shared 6L h512 virtual-edge",
        dataset=dict(use_super_node=False, use_virtual_edges=True),
        train=dict(model_name="EA_GNN_Shared", batch_size=64,
                   pooling_layer="mean"),
        pinned_epochs=60,
    ),
    "virtual": dict(
        tag="SAGE 6L h512 virtual-edge",
        dataset=dict(use_super_node=False, use_virtual_edges=True),
        train=dict(model_name="GraphSage_addAggr_Shared", batch_size=128,
                   pooling_layer="mean"),
        pinned_epochs=120,
    ),
}

PINNED = dict(graphs=512, seeds=[0, 1, 2])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", choices=sorted(CONFIGS), default="sage")
    ap.add_argument("--graphs", type=int, default=512)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1])
    ap.add_argument("--outdir", default="/tmp/acc_flagship")
    ap.add_argument("--pinned", action="store_true",
                    help="frozen round-over-round spec (overrides flags)")
    args = ap.parse_args()
    spec = CONFIGS[args.config]
    if args.pinned:
        args.graphs = PINNED["graphs"]
        args.epochs = spec["pinned_epochs"]
        args.seeds = PINNED["seeds"]
    elif args.epochs is None:
        args.epochs = spec["pinned_epochs"]

    from buckgnn_tpu.config import TrainConfig
    from buckgnn_tpu.graph.normalizer import normalize_dataset
    from buckgnn_tpu.graph.split import dataset_split
    from buckgnn_tpu.graph.synthetic import generate_dataset
    from buckgnn_tpu.train.trainer import train_gnn

    ds = generate_dataset(args.graphs, seed=100, min_side=16, max_side=24,
                          **spec["dataset"])
    idx_tr, idx_va = dataset_split(ds, lengths=(0.85, 0.15), seed=0)
    tr = [ds[int(i)] for i in idx_tr]
    va = [ds[int(i)] for i in idx_va]
    print(f"dataset[{args.config}]: {len(tr)}/{len(va)} graphs "
          f"(~{int(np.mean([g.n_node for g in ds]))} nodes each)",
          flush=True)
    normed_tr, nz = normalize_dataset(tr)
    normed_va, _ = normalize_dataset(va, normalizer=nz)

    results = []
    for seed in args.seeds:
        cfg = TrainConfig(
            hidden_channels=512, num_layers=6, dropout_rate=0.1, lr=1e-3,
            num_epochs=args.epochs, seed=seed,
            segment_impl="banded_pallas", compute_dtype="bfloat16",
            **spec["train"],
        )
        # sage keeps the historical trial tag so the pinned run is
        # byte-identical to the round-3/4 gate invocations
        trial = (f"flagship_seed{seed}" if args.config == "sage"
                 else f"{args.config}_seed{seed}")
        t0 = time.time()
        res = train_gnn(cfg, normed_tr, normed_va, nz,
                        os.path.join(args.outdir, trial),
                        trial_id=trial, verbose=False)
        results.append(res.best_val_mape)
        print(f"seed {seed}: best val MAPE {res.best_val_mape:.3f}%  "
              f"final {res.history[-1]['val_mape']:.3f}%  "
              f"({time.time() - t0:.0f}s, {args.epochs} epochs)",
              flush=True)

    r = np.asarray(results)
    tag = "PINNED " if args.pinned else ""
    print(f"{tag}{spec['tag']}, {len(r)} seeds: "
          f"best val MAPE mean {r.mean():.3f}%  min {r.min():.3f}%  "
          f"max {r.max():.3f}%  spread {r.max() - r.min():.3f}pp",
          flush=True)
    if args.pinned:
        print(f"PINNED-ROW {args.config} | "
              + " | ".join(f"{v:.2f}%" for v in r)
              + f" | mean {r.mean():.2f}%", flush=True)


if __name__ == "__main__":
    main()
