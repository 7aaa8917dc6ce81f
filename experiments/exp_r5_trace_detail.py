"""Inspect an existing trace dir: top individual ops with their HLO names
and source attributions (finer than exp_trace_eval's aggregation)."""

import glob
import gzip
import json
import sys
from collections import defaultdict

logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace_eval"
files = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
with gzip.open(files[0], "rt") as f:
    data = json.load(f)
events = data.get("traceEvents", [])
pid_names = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pid_names[e["pid"]] = e["args"].get("name", "")

durs = defaultdict(float)
meta = {}
for e in events:
    if e.get("ph") != "X":
        continue
    pname = pid_names.get(e.get("pid"), "")
    if "TPU" not in pname and "tpu" not in pname:
        continue
    name = e.get("name", "")
    if name.startswith("jit_") or "XLA Modules" in pname:
        continue
    d = e.get("dur", 0) / 1e3
    durs[name] += d
    a = e.get("args", {}) or {}
    meta[name] = (a.get("tf_op") or a.get("source") or "")[:110]

for k, v in sorted(durs.items(), key=lambda kv: -kv[1])[:45]:
    print(f"{v/3:9.3f} ms  {k:28s} {meta.get(k, '')}")
