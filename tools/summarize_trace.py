#!/usr/bin/env python3
"""Summarize an XProf/xplane trace captured with jax.profiler (see
sdtpu/utils/profiling.py:trace) without needing TensorBoard.

Two modes:

* default — SELF-TIME attribution on the "XLA Ops" line: a stack sweep
  subtracts nested children, restricts to the longest while-op interval
  (the denoise scan), and buckets by op kind.  This is the honest per-step
  decomposition: the naive all-lines sum double-counts async DMA
  (copy-start spans overlap compute and read as tens of ms — round-3
  BENCHLOG lesson).
* --raw — the old behavior: per-line duration sums over every plane line
  (useful for spotting DMA pressure, NOT for attribution).

Usage:
    python tools/summarize_trace.py /tmp/sdtpu_trace [--top 40] [--raw]
      [--steps 25]

(The xplane proto parser ships inside tensorflow's tsl; only used here.)
"""

import argparse
import glob
import os
import re
from collections import defaultdict


def load_xspace(trace_dir):
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.xplane.pb"))
    )
    if not paths:
        raise SystemExit(f"no .xplane.pb under {trace_dir}")
    path = paths[-1]
    print(f"# {path}")

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def raw_mode(xs, top):
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
        print(f"\n== {plane.name}: {len(totals)} distinct ops (RAW sums; "
              f"async DMA overlaps compute — do not attribute) ==")
        for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
            print(f"{ms:9.3f} ms  x{counts[name]:5d}  {name[:110]}")


def self_time_mode(xs, top, steps, outside=False):
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            evs = []
            for ev in line.events:
                meta = plane.event_metadata.get(ev.metadata_id)
                name = meta.name if meta else str(ev.metadata_id)
                evs.append((ev.offset_ps, ev.offset_ps + ev.duration_ps, name))
            evs.sort(key=lambda e: (e[0], -e[1]))
            whiles = [e for e in evs if e[2].startswith("%while")]
            if not whiles:
                print("(no while op found; summarizing the whole line)")
                s0, s1 = evs[0][0], max(e[1] for e in evs)
            else:
                scan = max(whiles, key=lambda e: e[1] - e[0])
                s0, s1 = scan[0], scan[1]
                print(f"scan: {scan[2][:70]}  {(s1 - s0) / 1e9:.1f} ms")

            def keep(st, en, nm):
                if nm.startswith("%while"):
                    return False
                inside = st >= s0 and en <= s1
                return not inside if outside else inside

            self_ps = defaultdict(float)
            counts = defaultdict(int)
            stack = []  # [start, end, name, child_ps]

            def pop_until(t):
                while stack and stack[-1][1] <= t:
                    st, en, nm, ch = stack.pop()
                    if keep(st, en, nm):
                        self_ps[nm] += (en - st) - ch
                        counts[nm] += 1
                    if stack:
                        stack[-1][3] += en - st

            for start, end, name in evs:
                pop_until(start)
                stack.append([start, end, name, 0.0])
            pop_until(float("inf"))

            total = sum(self_ps.values()) / 1e9
            where = "out-of-scan" if outside else "in-scan"
            print(f"{where} self time: {total:.1f} ms "
                  f"({total / steps:.3f} ms/step at --steps {steps})")

            def bucket(nm):
                return re.sub(r"\.\d+$", "", nm.split(" = ")[0].lstrip("%"))

            buck = defaultdict(float)
            bcount = defaultdict(int)
            for nm, ps in self_ps.items():
                buck[bucket(nm)] += ps
                bcount[bucket(nm)] += counts[nm]
            print("\n-- by op kind (self ms total / per step) --")
            for nm, ps in sorted(buck.items(), key=lambda kv: -kv[1])[:top]:
                print(f"{ps / 1e9:9.3f} ms ({ps / 1e9 / steps:6.3f}/step) "
                      f"x{bcount[nm]:6d}  {nm}")
            print("\n-- top individual ops (self time) --")
            for nm, ps in sorted(self_ps.items(), key=lambda kv: -kv[1])[:top]:
                print(f"{ps / 1e9:9.3f} ms x{counts[nm]:5d}  {nm[:130]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--raw", action="store_true",
                    help="old per-line duration sums (double-counts async "
                         "DMA; not for attribution)")
    ap.add_argument("--steps", type=int, default=25,
                    help="scan length for the ms/step column")
    ap.add_argument("--outside", action="store_true",
                    help="attribute self time OUTSIDE the denoise scan "
                         "(CLIP, VAE, packing) instead of inside it")
    args = ap.parse_args()

    xs = load_xspace(args.trace_dir)
    if args.raw:
        raw_mode(xs, args.top)
    else:
        self_time_mode(xs, args.top, args.steps, outside=args.outside)


if __name__ == "__main__":
    main()
