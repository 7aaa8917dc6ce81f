"""Round 5: itemize the train trace's glue / cotangent-add / pool
buckets — the 35 + 11 + 9 ms the roofline says must shrink by
elimination.  Reads the trace exp_trace_train.py leaves in
/tmp/jax_trace_train."""

import glob
import gzip
import json
import re
import sys
from collections import defaultdict

BUCKETS = ("glue", "cotangent add", "pool", "affine")


def bucket(name, a):
    src = str(a.get("tf_op") or "")
    if re.search(r'(tr_fwd|tr_dx|tr_dxfold|tr_dw)_c\d+x\d+o\d+', name):
        return 'CT'
    if 'g_eff' in name:
        return 'CT g_eff'
    if 'pool' in name:
        return 'pool'
    if 'affine_relu' in name:
        return 'affine'
    if 'conv1x1_prelu' in name:
        return 'outconv'
    if ('up2_ct' in name or 'upsample' in name or 'lerp' in name
            or 'w2x' in name):
        return 'ct-upsample'
    if "convolution" in a.get("hlo_category", ""):
        return 'XLA conv'
    if 'reduce_window' in src:
        return 'pool'
    if 'add_any' in src:
        return 'cotangent add'
    return 'glue'


def main():
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace_train"
    files = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    with gzip.open(files[0]) as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_names, tid_names = {}, {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pid_names[e["pid"]] = e["args"].get("name", "")
            if e.get("name") == "thread_name":
                tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    steps, ops = [], {}
    for e in events:
        if e.get("ph") != "X":
            continue
        if pid_names.get(e.get("pid")) != "/device:TPU:0":
            continue
        tn = tid_names.get((e.get("pid"), e.get("tid")))
        if tn == "Steps":
            steps.append(e.get("dur", 0) / 1e3)
        if tn != "XLA Ops":
            continue
        n = e["name"]
        if n not in ops:
            ops[n] = [0.0, e.get("args", {}) or {}]
        ops[n][0] += e.get("dur", 0) / 1e3

    nsteps = max(len(steps), 1)
    per_bucket = defaultdict(list)
    for n, (d, a) in ops.items():
        per_bucket[bucket(n, a)].append((d / nsteps, n, a))
    for b in BUCKETS:
        rows = sorted(per_bucket.get(b, []), reverse=True)
        print(f"==== {b}: {sum(r[0] for r in rows):.2f} ms, "
              f"{len(rows)} ops ====")
        for d, n, a in rows[:25]:
            by = float(a.get("bytes_accessed", 0) or 0) / 1e9
            src = str(a.get("tf_op") or "")[:70]
            shape = str(a.get("shape") or "")[:40]
            print(f"  {d:6.2f} ms {by:6.2f} GB  {n[:60]:60s} {src} {shape}")
        print()


if __name__ == "__main__":
    main()
