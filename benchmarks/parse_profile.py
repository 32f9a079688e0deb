"""Parse an xplane profile dir (from probe_step_profile.py) offline.

Aggregates TPU device-plane op events by name and prints the breakdown of
device time per step. Works straight off the xplane proto (the
tensorboard_plugin_profile converter is incompatible with this TF build).

Usage: python benchmarks/parse_profile.py /tmp/bgtpu_profiles/train [n_steps]
"""

import collections
import glob
import re
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore


def classify(name: str) -> str:
    # classify by the instruction name only — full names embed operand text
    # (e.g. a fusion consuming a custom-call), which would misattribute
    n = name.split(" = ")[0].lower()
    if "custom-call" in n or "tpu_custom_call" in n or "pallas" in n:
        return "pallas-band-matmul"
    if "while" in n:
        return "while (sequential!)"
    if n.startswith(("dot", "fusion.dot")) or re.match(r".*\bdot\b", n):
        return "dot (dense matmul)"
    if "convert" in n:
        return "convert"
    if "scatter" in n:
        return "scatter"
    if "gather" in n:
        return "gather"
    if "rng" in n or "threefry" in n:
        return "rng"
    if "reduce" in n:
        return "reduce"
    if "fusion" in n:
        return "fusion (elementwise)"
    if "copy" in n or "transpose" in n:
        return "copy/transpose"
    return "other"


def main():
    root = sys.argv[1]
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    paths = sorted(glob.glob(f"{root}/**/*.xplane.pb", recursive=True))
    if not paths:
        sys.exit(f"no xplane.pb under {root}")
    # multiple captures may accumulate under one dir — take the newest
    import os as _os
    path = max(paths, key=_os.path.getmtime)
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())

    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        meta = plane.event_metadata
        by_name = collections.Counter()
        by_cat = collections.Counter()
        total = 0
        for line in plane.lines:
            # 'Async XLA Ops' durations span their overlap window and would
            # double-count; the synchronous 'XLA Ops' line is the real tally
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = meta[ev.metadata_id].name
                dur = ev.duration_ps
                by_name[name] += dur
                by_cat[classify(name)] += dur
                total += dur
        if not total:
            continue
        print(f"=== plane {plane.name}  (device total "
              f"{total / 1e12 / n_steps * 1e3:.2f} ms/step) ===")
        print("\n-- by category --")
        for cat, t in by_cat.most_common():
            print(f"{cat:<28} {t / total * 100:6.2f}%  "
                  f"{t / 1e12 / n_steps * 1e3:8.3f} ms/step")
        print("\n-- top 25 ops --")
        for name, t in by_name.most_common(25):
            print(f"{t / total * 100:6.2f}%  {t / 1e12 / n_steps * 1e3:8.3f} "
                  f"ms/step  {name[:90]}")


if __name__ == "__main__":
    main()
