"""Summarize a jax.profiler trace: device self-time by op, grouped by kind.

Usage: python scripts/trace_breakdown.py <trace_dir> [n_reps]

Reads the ``*.trace.json.gz`` under ``<trace_dir>/plugins/profile/*/``
(Chrome trace-viewer format that jax.profiler always emits), sums event
durations on the TPU op lanes (pid/tid named like "/device:TPU:* XLA Ops"),
and prints total device busy time per rep, the top ops by self time, and a
coarse grouping by op kind. This is the measurement behind
docs/PERFORMANCE.md's per-frame breakdown tables.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

KIND_PATTERNS = [
    ("gather/slice", re.compile(r"gather|dynamic.slice", re.I)),
    ("matmul/conv (MXU)", re.compile(r"^(fusion\.)?(dot|conv)|%dot|%conv", re.I)),
    ("scatter", re.compile(r"scatter", re.I)),
    ("sort/topk", re.compile(r"sort|top-k|topk", re.I)),
    ("reduce", re.compile(r"reduce", re.I)),
    ("copy/transpose", re.compile(r"copy|transpose|bitcast", re.I)),
    ("fusion (elementwise)", re.compile(r"fusion|add|mul|tanh|exp|select", re.I)),
]


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/split_trace"
    n_reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True))
    if not paths:
        raise SystemExit(f"no .trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]

    # map (pid, tid) -> lane name; find the TPU XLA-op lanes
    names = {}
    pid_names = {}
    for ev in events:
        if ev.get("ph") == "M":
            if ev.get("name") == "thread_name":
                names[(ev["pid"], ev["tid"])] = ev["args"]["name"]
            elif ev.get("name") == "process_name":
                pid_names[ev["pid"]] = ev["args"]["name"]

    def lane_of(ev):
        tname = names.get((ev.get("pid"), ev.get("tid")), "")
        pname = pid_names.get(ev.get("pid"), "")
        return f"{pname}/{tname}"

    # collect TPU op-lane events; the Chrome trace nests while-loop bodies
    # as overlapping X events on the same tid, so EXCLUSIVE self-time must
    # subtract each event's children (else parents double-count)
    op_events = []
    module_total = 0.0
    lanes_seen = defaultdict(float)
    src_of = {}
    for ev in events:
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        lane = lane_of(ev)
        lanes_seen[lane] += ev["dur"]
        if "TPU" not in lane:
            continue
        low = lane.lower()
        if "xla op" in low:
            op_events.append((ev["ts"], ev["ts"] + ev["dur"], ev["name"]))
            src = ev.get("args", {}).get("source", "")
            if src:
                src_of[ev["name"]] = src
        elif "xla module" in low:
            module_total += ev["dur"]

    if not op_events:
        print("lanes found:")
        for lane, d in sorted(lanes_seen.items(), key=lambda kv: -kv[1])[:15]:
            print(f"  {d / 1e3:9.2f} ms  {lane}")
        raise SystemExit("no TPU op lane matched; see lanes above")

    # exclusive self-time: line-sweep assigning each instant to the DEEPEST
    # covering event (children preempt their parents)
    pts = []
    for i, (ts, te, name) in enumerate(op_events):
        pts.append((ts, 0, i))
        pts.append((te, 1, i))
    pts.sort(key=lambda p: (p[0], p[1]))
    op_self = defaultdict(float)
    active = []  # stack of event indices (deepest = last)
    last_t = None
    for t, kind, i in pts:
        if active and last_t is not None and t > last_t:
            op_self[op_events[active[-1]][2]] += t - last_t
        if kind == 0:
            active.append(i)
        else:
            if i in active:
                active.remove(i)
        last_t = t

    total = sum(op_self.values())
    print(f"device busy: {module_total / 1e3 / n_reps:.2f} ms/rep "
          f"(XLA Modules lane); op-exclusive sum {total / 1e3 / n_reps:.2f} "
          f"ms/rep ({n_reps} reps)")
    print("\ntop 30 ops by self time (ms/rep):")
    for name, t in sorted(op_self.items(), key=lambda kv: -kv[1])[:30]:
        src = src_of.get(name, "")
        print(f"  {t / 1e3 / n_reps:8.3f}  {name[:60]:60s} {src[-55:]}")

    by_src = defaultdict(float)
    for name, t in op_self.items():
        by_src[src_of.get(name, "?")] += t
    print("\nby source line (ms/rep, top 25):")
    for src, t in sorted(by_src.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {t / 1e3 / n_reps:8.3f}  {src[-80:]}")

    kinds = defaultdict(float)
    for name, t in op_self.items():
        for kname, pat in KIND_PATTERNS:
            if pat.search(name):
                kinds[kname] += t
                break
        else:
            kinds["other"] += t
    print("\nby kind (ms/rep):")
    for kname, t in sorted(kinds.items(), key=lambda kv: -kv[1]):
        print(f"  {t / 1e3 / n_reps:8.2f}  {kname}")


if __name__ == "__main__":
    main()
