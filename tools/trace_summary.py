"""Summarize a jax.profiler trace: top ops by total TPU time.

    python tools/trace_summary.py /tmp/vqgnn_trace [N]

Finds the newest *.trace.json.gz under the dir, sums event durations per op
name on device tracks (pid name containing 'TPU'/'device'), prints the top N.
"""

import collections
import glob
import gzip
import json
import os
import sys


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vqgnn_trace"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    paths = glob.glob(os.path.join(root, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        sys.exit(f"no trace.json.gz under {root}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    # map pid -> process name
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")

    device_pids = {
        pid for pid, name in pid_name.items()
        if "TPU" in name or "device" in name.lower() or "/device" in name
    }
    if not device_pids:  # fall back to all pids
        device_pids = set(pid_name)

    per_op = collections.defaultdict(float)
    per_op_n = collections.defaultdict(int)
    per_src = collections.defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        if name.startswith("jit_") or name.isdigit():
            continue  # enclosing program / step markers, not leaf ops
        dur = e.get("dur", 0) / 1e3  # us -> ms
        args = e.get("args", {})
        src = args.get("source", "?")
        cat = args.get("hlo_category", "")
        tf_op = args.get("tf_op", "").split("/")[-1].rstrip(":")
        per_op[name] += dur
        per_op_n[name] += 1
        per_src[f"{src}  [{tf_op}] {cat}"] += dur
        total += dur

    print(f"trace: {path}")
    print(f"total device time: {total:.1f} ms over {sum(per_op_n.values())} events")
    print(f"\n--- by source line ---\n{'ms':>10}  source")
    for src, ms in sorted(per_src.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{ms:10.2f}  {src[:140]}")
    print(f"\n--- by op ---\n{'ms':>10}  {'n':>5}  op")
    for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{ms:10.2f}  {per_op_n[name]:5d}  {name[:110]}")


if __name__ == "__main__":
    main()
