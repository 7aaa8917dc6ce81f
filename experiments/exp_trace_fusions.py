"""Disaggregate the train-step 'fusion'/'copy' trace buckets via HLO.

Reuses the trace at /tmp/jax_trace_named (exp_trace_named.py) but keeps
every fusion.N / copy.N name distinct, then compiles the same train step
and maps each name to its HLO computation root + operand shapes.
"""

import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import functools
import jax

from mimo_unet_tpu.tasks import MimoUnetTask

STEPS = 3


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    logdir = "/tmp/jax_trace_named"
    files = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    with gzip.open(files[0], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    durs = defaultdict(float)
    for e in events:
        if e.get("ph") != "X":
            continue
        if "TPU" not in pid_names.get(e.get("pid"), ""):
            continue
        if "XLA Ops" not in tid_names.get((e.get("pid"), e.get("tid")), ""):
            continue
        name = e.get("name", "")
        if not (name.startswith("fusion") or name.startswith("copy")
                or name.startswith("convolution")):
            continue
        durs[name] += e.get("dur", 0.0)

    # compile the step and fetch HLO
    task = MimoUnetTask(
        in_channels=3, out_channels=2, num_subnetworks=2,
        filter_base_count=21, loss="laplace_nll", seed=0,
        compute_dtype="bfloat16")
    state = task.init_state(steps_per_epoch=1000)
    tx = task.make_optimizer(steps_per_epoch=1000)
    batch = {
        "image": jax.random.uniform(jax.random.key(1), (b, 256, 256, 3)),
        "label": jax.random.uniform(jax.random.key(2), (b, 256, 256, 1)),
    }
    rngk = jax.random.key(0)
    train_step = jax.jit(
        functools.partial(task.train_step, tx, with_outputs=False))
    txt = train_step.lower(state, batch, rngk).compile().as_text()

    # index fusion bodies: name -> (root line, biggest shapes)
    info = {}
    cur = None
    body = []
    for line in txt.splitlines():
        m = re.match(r"^%?([\w.-]+)\s+\([^)]*\)\s*->", line.strip())
        if line.startswith("%fused_computation") or (
                " { " in line and line.lstrip().startswith("%")):
            pass
        fm = re.search(r"(fusion[\w.]*|copy[\w.]*)\s*=\s*(\S+)\s+fusion\(",
                       line)
        cm = re.search(r"([\w.-]*copy[\w.]*)\s*=\s*(\S+)\s+copy\(", line)
        km = re.search(r"calls=%?([\w.-]+)", line)
        if fm:
            info[fm.group(1)] = {"shape": fm.group(2),
                                 "calls": km.group(1) if km else "",
                                 "meta": line.strip()[:400]}
        elif cm:
            info[cm.group(1)] = {"shape": cm.group(2), "calls": "",
                                 "meta": line.strip()[:400]}

    # computation bodies: map name -> set of interesting ops
    comp_ops = defaultdict(set)
    cur = None
    for line in txt.splitlines():
        m = re.match(r"^%([\w.-]+)", line)
        if m and "{" in line:
            cur = m.group(1)
        elif cur:
            for op in ("convolution", "dot", "reduce-window", "scatter",
                       "reduce(", "transpose", "reverse", "pad(",
                       "dynamic-slice", "iota", "rng"):
                if op in line:
                    comp_ops[cur].add(op.rstrip("("))
            if line.startswith("}"):
                cur = None

    rows = sorted(durs.items(), key=lambda kv: -kv[1])
    total = sum(durs.values())
    print(f"fusion+copy+conv total: {total / 1e3 / STEPS:.2f} ms/step")
    for k, v in rows[:40]:
        ms = v / 1e3 / STEPS
        if ms < 0.3:
            continue
        i = info.get(k, {})
        ops = ",".join(sorted(comp_ops.get(i.get("calls", ""), set())))
        meta = i.get("meta", "")
        src = ""
        sm = re.search(r'op_name="([^"]*)"', meta)
        if sm:
            src = sm.group(1)[-90:]
        print(f"{ms:8.3f}  {k[:24]:24s} {i.get('shape', '?')[:28]:28s} "
              f"[{ops[:40]}] {src}")


if __name__ == "__main__":
    main()
