"""Dump optimized HLO of the flagship train step and print the definition
of the hot elementwise fusions (add_add_fusion etc.) for attribution.

Usage: timeout 1200 python benchmarks/probe_dump_hlo.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import build_bench_setup


def main():
    setup = build_bench_setup(use_super_node=True)
    state, batch = setup["state"], setup["batch"]
    train_step = setup["train_step"]
    key = setup["key"]
    lr = jnp.float32(1e-3)
    lowered = train_step.lower(state, batch, key, lr)
    txt = lowered.compile().as_text()
    with open("/tmp/train_step_hlo.txt", "w") as f:
        f.write(txt)
    print("bytes:", len(txt), "-> /tmp/train_step_hlo.txt", flush=True)


if __name__ == "__main__":
    main()
