#!/usr/bin/env python
"""Summarize a jax.profiler trace: top device ops by total duration.

Parses the Chrome-trace export (`*.trace.json.gz`) the profiler writes next
to the xplane file — the tensorboard profile plugin in this image has a
protobuf version mismatch, the JSON trace does not.

Usage: python scripts/trace_topops.py /tmp/trace_dir [N] [name_filter]
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict


def main():
    trace_dir = sys.argv[1]
    topn = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    filt = sys.argv[3] if len(sys.argv) > 3 else None
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    assert paths, f"no trace.json.gz under {trace_dir}"
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)

    events = trace["traceEvents"]
    # device lanes: process names containing 'TPU' (XLA Ops threads)
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "tpu" in n.lower()}
    agg = defaultdict(float)
    cnt = defaultdict(int)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        if filt and filt not in name:
            continue
        agg[name] += e.get("dur", 0.0)      # microseconds
        cnt[name] += 1
    total = sum(agg.values())
    print(f"device total (sum of op durations): {total / 1e3:.2f} ms "
          f"across the whole trace")
    for name, us in sorted(agg.items(), key=lambda kv: -kv[1])[:topn]:
        print(f"{us / 1e3:9.2f} ms {100 * us / total:5.1f}% x{cnt[name]:<4d}"
              f" {name[:110]}")


if __name__ == "__main__":
    main()
