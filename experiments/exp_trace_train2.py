"""Finer-grained train-step trace: top individual ops with full names.

Reuses the exp_trace_train protocol but prints the top events keyed by
(op name, source) so copies/fusions without tf_op attribution are still
distinguishable by their HLO instruction name.
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import functools
import jax

from mimo_unet_tpu.tasks import MimoUnetTask


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
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

    st = jax.device_put(state)
    for _ in range(2):
        st, logs, _ = train_step(st, batch, rngk)
        float(logs["train_loss"])

    logdir = "/tmp/jax_trace_train2"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    for _ in range(3):
        st, logs, _ = train_step(st, batch, rngk)
    float(logs["train_loss"])
    jax.profiler.stop_trace()

    files = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace")
        return
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
    seen_tracks = set()
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "tpu" not in pname:
            continue
        tname = tid_names.get((e.get("pid"), e.get("tid")), "")
        # only count one op track (XLA Ops), not step/module duplicates
        if "XLA Ops" not in tname and "Ops" not in tname:
            continue
        seen_tracks.add((pname, tname))
        name = e.get("name", "")
        if name.startswith("jit_"):
            continue
        args_d = e.get("args", {}) or {}
        tf = args_d.get("tf_op") or args_d.get("source") or ""
        key = f"{name[:70]} | {str(tf)[:70]}"
        durs[key] += e.get("dur", 0) / 1e3
    print("tracks:", seen_tracks)
    total = sum(durs.values())
    print(f"total op time/step: {total/3:.1f} ms")
    for k, v in sorted(durs.items(), key=lambda kv: -kv[1])[:60]:
        print(f"{v/3:9.2f} ms  {k}", flush=True)


if __name__ == "__main__":
    main()
