#!/usr/bin/env python
"""Summarize a jax.profiler trace: device-busy time vs wall, top XLA ops.

Usage: python scripts/trace_summary.py /tmp/jax_trace [top_n]

Works through the axon tunnel (the profiler runs device-side and ships
xplane back).  Used to separate real device time from the tunnel's
per-execute RPC overhead — e.g. the round-5 full train step: 311 ms wall,
164 ms device (the rest is marshalling of the ~540-leaf param trees).
"""

import collections
import glob
import gzip
import json
import sys


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    paths = sorted(glob.glob(f"{root}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        sys.exit(f"no trace under {root}")
    d = json.load(gzip.open(paths[-1]))
    evs = d["traceEvents"]
    pids, tids = {}, {}
    for e in evs:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e["tid"])] = e["args"].get("name", "")
    dev_pids = [p for p, n in pids.items() if "TPU" in n or "GPU" in n]
    dur, cnt = collections.Counter(), collections.Counter()
    groups = collections.Counter()
    for e in evs:
        if e.get("ph") == "X" and "dur" in e and e["pid"] in dev_pids:
            tname = tids.get((e["pid"], e["tid"]), str(e["tid"]))
            groups[tname] += e["dur"]
            if tname.startswith("XLA Op"):
                dur[e["name"]] += e["dur"]
                cnt[e["name"]] += 1
    print(paths[-1])
    for g, t in groups.most_common():
        print(f"  {g}: {t / 1e3:.1f} ms")
    tot = sum(dur.values())
    print(f"XLA op total: {tot / 1e3:.1f} ms")
    for name, t in dur.most_common(top_n):
        print(f"{t / 1e3:8.2f} ms x{cnt[name]:5d}  {name[:100]}")


if __name__ == "__main__":
    main()
