"""Summarize a jax.profiler perfetto trace by XLA op, no tensorboard.

Usage: python benchmarks/trace_summary.py /tmp/nt_profile [top_n]

Finds the newest plugins/profile/*/ *.trace.json.gz under the directory,
aggregates device-lane event durations by (fused) op name, and prints
the top-N with total microseconds and % of device time.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys


def load_trace(root: str) -> dict:
    paths = glob.glob(
        os.path.join(root, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        raise SystemExit(f"no trace.json.gz under {root}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        return json.load(f)


GROUPS = [
    ("fusion", re.compile(r"^(loop_|input_)?fusion")),
    ("dot/conv", re.compile(r"^(dot|convolution|cublas|custom-call.*dot)")),
    ("dynamic-slice/update", re.compile(r"^dynamic[-_](slice|update)")),
    ("copy/transpose", re.compile(r"^(copy|transpose|bitcast)")),
    ("reduce", re.compile(r"^(reduce|all-reduce)")),
]


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/nt_profile"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    tr = load_trace(root)
    events = tr.get("traceEvents", [])

    # Identify device lanes: process names containing TPU/device XLA Ops.
    pid_name = {}
    tid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_name[(e["pid"], e["tid"])] = e["args"].get("name", "")

    dev_pids = {
        pid
        for pid, name in pid_name.items()
        if "TPU" in name or "/device:" in name or "Device" in name
    }

    tot = 0.0
    by_name = collections.Counter()
    counts = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        lane = tid_name.get((e["pid"], e["tid"]), "")
        if "step" in lane.lower():
            continue  # steps lane duplicates op lanes
        dur = float(e.get("dur", 0.0))
        name = e.get("name", "?")
        by_name[name] += dur
        counts[name] += 1
        tot += dur

    print(f"device total: {tot/1e3:.2f} ms across "
          f"{sum(counts.values())} events\n")
    print(f"{'us_total':>10}  {'%':>5}  {'n':>6}  name")
    for name, dur in by_name.most_common(top_n):
        print(f"{dur:10.0f}  {100*dur/tot:5.1f}  {counts[name]:6d}  "
              f"{name[:110]}")

    agg = collections.Counter()
    for name, dur in by_name.items():
        for g, pat in GROUPS:
            if pat.search(name):
                agg[g] += dur
                break
        else:
            agg["other"] += dur
    print("\nby group:")
    for g, dur in agg.most_common():
        print(f"  {g:22s} {dur/1e3:9.2f} ms  {100*dur/tot:5.1f}%")


if __name__ == "__main__":
    main()
