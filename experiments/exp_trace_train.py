"""Capture a jax.profiler trace of one train step and summarize op costs."""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import functools
import jax
import jax.numpy as jnp

from mimo_unet_tpu.tasks import MimoUnetTask


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 64
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

    # warm / compile
    st = jax.device_put(state)
    for _ in range(2):
        st, logs, _ = train_step(st, batch, rngk)
        float(logs["train_loss"])

    logdir = "/tmp/jax_trace_train"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    for _ in range(3):
        st, logs, _ = train_step(st, batch, rngk)
    float(logs["train_loss"])
    jax.profiler.stop_trace()

    files = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    print("trace files:", files, flush=True)
    if not files:
        return
    with gzip.open(files[0], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # find TPU device track(s): pids with names containing 'TPU' and ops
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    durs = defaultdict(float)
    srcs = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "tpu" not in pname:
            continue
        name = e.get("name", "")
        # skip the enclosing step markers
        if name.startswith("jit_") or "XLA Modules" in pname:
            continue
        d = e.get("dur", 0) / 1e3  # us -> ms
        key = name.split(".")[0][:60]
        durs[key] += d
        args_d = e.get("args", {}) or {}
        tf = args_d.get("tf_op") or args_d.get("source") or ""
        if tf:
            srcs[str(tf)[:90]] += d
        total += d
    print(f"total op time: {total:.1f} ms (3 steps)", flush=True)
    for k, v in sorted(durs.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{v/3:9.2f} ms  {k}", flush=True)
    if srcs:
        print("---- by source ----")
        for k, v in sorted(srcs.items(), key=lambda kv: -kv[1])[:40]:
            print(f"{v/3:9.2f} ms  {k}", flush=True)


if __name__ == "__main__":
    main()
