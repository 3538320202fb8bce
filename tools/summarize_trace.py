#!/usr/bin/env python3
"""Summarize an XProf/xplane trace captured with jax.profiler (see
sdtpu/utils/profiling.py:trace) without needing TensorBoard: aggregates TPU
op durations by HLO name and prints the top-N.

Usage:
    python tools/summarize_trace.py /tmp/sdtpu_trace [--top 40]

(The xplane proto parser ships inside tensorflow's tsl; only used here.)
"""

import argparse
import glob
import os
from collections import defaultdict


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    paths = sorted(
        glob.glob(
            os.path.join(args.trace_dir, "plugins/profile/*/*.xplane.pb")
        )
    )
    if not paths:
        raise SystemExit(f"no .xplane.pb under {args.trace_dir}")
    path = paths[-1]
    print(f"# {path}")

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())

    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        totals = defaultdict(float)
        counts = defaultdict(int)
        for line in plane.lines:
            for ev in line.events:
                meta = plane.event_metadata.get(ev.metadata_id)
                name = meta.name if meta else str(ev.metadata_id)
                totals[name] += ev.duration_ps / 1e9  # ms
                counts[name] += 1
        print(f"\n== {plane.name}: {len(totals)} distinct ops ==")
        for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[: args.top]:
            print(f"{ms:9.3f} ms  x{counts[name]:5d}  {name[:110]}")


if __name__ == "__main__":
    main()
