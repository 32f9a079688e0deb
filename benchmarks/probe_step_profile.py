"""Capture an XLA profile of the flagship train/eval steps on the real chip.

Writes xplane traces to --out (default /tmp/bgtpu_profiles) for offline
parsing with benchmarks/parse_profile.py — capture once, parse many times.

Usage: timeout 1200 python benchmarks/probe_step_profile.py
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/bgtpu_profiles")
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--super", action="store_true",
                    help="use supernode config instead of virtual edges")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import build_bench_setup, run_bench

    configs = (("super", True),) if args.super else (
        ("virtual", False), ("super", True))
    for label, use_super in configs:
        setup = build_bench_setup(batch_size=args.batch_size,
                                  use_super_node=use_super)
        # run_bench's train chain donates its state argument — hand it a
        # COPY so the trace section below keeps live buffers
        setup_bench = dict(setup)
        setup_bench["state"] = jax.tree.map(
            lambda a: jnp.copy(a) if isinstance(a, jax.Array) else a,
            setup["state"],
        )
        res = run_bench(setup_bench, n_warmup=3, n_steps=20)
        print(f"== {label} ==", flush=True)
        for k, v in res.items():
            print(f"  {k}: {v:,.2f}" if isinstance(v, float) else
                  f"  {k}: {v}", flush=True)

        state, batch = setup["state"], setup["batch"]
        train_step, eval_step = setup["train_step"], setup["eval_step"]
        key = setup["key"]
        lr = jnp.float32(1e-3)

        tdir = os.path.join(args.out, f"train_{label}")
        with jax.profiler.trace(tdir):
            for _ in range(5):
                key, sub = jax.random.split(key)
                state, metrics = train_step(state, batch, sub, lr)
            jax.block_until_ready(metrics["loss"])
        print(f"train trace -> {tdir}", flush=True)

        edir = os.path.join(args.out, f"eval_{label}")
        with jax.profiler.trace(edir):
            for _ in range(5):
                m, _ = eval_step(state, batch)
            jax.block_until_ready(m["loss"])
        print(f"eval trace -> {edir}", flush=True)


if __name__ == "__main__":
    main()
