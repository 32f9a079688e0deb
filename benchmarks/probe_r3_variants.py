"""Round-3 bench variants in ONE TPU process (VERDICT r2 items 2 & 5).

Measures, with the exact bench.py protocol (chained fori_loop dispatch):
  A. supernode synthetic panels, exact packing   (headline anchor)
  B. virtual-edge synthetic panels, exact packing (VirtualEdgeCreate.py
     production path — last measured 15.34M e/s in round 1)
  C. supernode ORGANIC datagen meshes, exact packing
  D. supernode ORGANIC datagen meshes, TRAINER packing
     (suggest_capacities slack — the configuration users actually run)

Usage: python benchmarks/probe_r3_variants.py [--smoke]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import build_bench_setup, run_bench  # noqa: E402


def organic_dataset(n, seed=0, use_super_node=True):
    from buckgnn_tpu.datagen.shapes import generate_shape_mesh
    from buckgnn_tpu.graph.build import build_graph
    from buckgnn_tpu.graph.synthetic import fake_fea

    out = []
    for i in range(n):
        s = seed * 1_000_003 + i
        mesh = generate_shape_mesh(seed=s)
        out.append(build_graph(mesh, fake_fea(mesh, s), seed=s,
                               use_super_node=use_super_node,
                               use_virtual_edges=not use_super_node))
    return out


def describe(name, setup, res):
    b = setup["batch"]
    pad_nodes = int(b.nodes.shape[0]) - 1
    real_nodes = int(np.sum(np.asarray(b.node_mask)))
    print(json.dumps({
        "variant": name,
        "train_step_ms": round(res["train_step_ms"], 2),
        "eval_step_ms": round(res["infer_step_ms"], 2),
        "train_edges_per_s": round(res["train_edges_per_s"], 0),
        "n_edges": res["n_edges"],
        "n_graphs": res["n_graphs"],
        "node_cap": int(b.nodes.shape[0]),
        "node_fill": round(real_nodes / max(pad_nodes, 1), 3),
        "edge_cap": int(b.senders.shape[0]),
        "band_shape": (None if b.band is None else list(b.band.shape)),
        "n_spill": (None if b.spill_senders is None else
                    int(b.spill_senders.shape[0])),
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--only", default=None,
                    help="comma-separated subset of A,B,C,D")
    args = ap.parse_args()
    kw = {}
    bs = 128
    if args.smoke:
        kw = dict(min_side=5, max_side=7, hidden=128, num_layers=3)
        bs = 8
    n_steps = 10 if args.smoke else 50
    only = set((args.only or "A,B,C,D").upper().split(","))

    t0 = time.time()
    if "A" in only:
        setup = build_bench_setup(batch_size=bs, use_super_node=True, **kw)
        describe("A_supernode_exact", setup,
                 run_bench(setup, n_steps=n_steps))
        print(f"# A done at {time.time()-t0:.0f}s", flush=True)
    if "B" in only:
        setup = build_bench_setup(batch_size=bs, use_super_node=False, **kw)
        describe("B_virtual_edges_exact", setup,
                 run_bench(setup, n_steps=n_steps))
        print(f"# B done at {time.time()-t0:.0f}s", flush=True)

    ds = organic_dataset(8 if args.smoke else bs, seed=7)
    sizes = [g.n_node for g in ds]
    print(f"# organic dataset: {len(ds)} graphs, nodes "
          f"min/med/max = {min(sizes)}/{int(np.median(sizes))}/{max(sizes)}, "
          f"{time.time()-t0:.0f}s", flush=True)
    mkw = {k: v for k, v in kw.items() if k in ("hidden", "num_layers")}
    if "C" in only:
        setup = build_bench_setup(batch_size=bs, dataset=ds,
                                  packing="exact", **mkw)
        describe("C_organic_exact", setup, run_bench(setup, n_steps=n_steps))
        print(f"# C done at {time.time()-t0:.0f}s", flush=True)
    if "D" in only:
        setup = build_bench_setup(batch_size=bs, dataset=ds,
                                  packing="trainer", **mkw)
        describe("D_organic_trainer", setup,
                 run_bench(setup, n_steps=n_steps))
        print(f"# D done at {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
