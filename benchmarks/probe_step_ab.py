"""A/B the flagship step after kernel/step optimizations, on the real chip.

Measures train/eval step time + edges/s for the virtual-edge and supernode
configs in ONE process.

Usage: timeout 1800 python benchmarks/probe_step_ab.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_bench_setup, run_bench  # noqa: E402


def main():
    import jax

    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    # super + virtual is not a distinct config: the builder (like the
    # reference, GraphCreate.py:379-415) treats them as either/or
    for name, kw in {
        "virtual-edges": dict(),
        "supernode": dict(use_super_node=True),
    }.items():
        setup = build_bench_setup(**kw)
        res = run_bench(setup, n_warmup=3, n_steps=20)
        print(f"== {name} ==", flush=True)
        for k, v in res.items():
            print(f"  {k}: {v:,.2f}" if isinstance(v, float) else
                  f"  {k}: {v}", flush=True)


if __name__ == "__main__":
    main()
