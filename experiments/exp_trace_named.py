"""Per-kernel train-step trace using pallas_call name= attribution.

Aggregates TPU op-track events by the custom-call / fusion name so every
CT kernel (named tr_fwd/tr_dx/tr_dxfold/tr_dw/dc_/affine_relu/g_eff/
conv1x1/maxpool_ct) gets its own line; XLA convs and fusions keep their
HLO names.  Prints a table of ms/step sorted descending.
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

    logdir = "/tmp/jax_trace_named"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    for _ in range(STEPS):
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
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "tpu" not in pname:
            continue
        tname = tid_names.get((e.get("pid"), e.get("tid")), "")
        if "XLA Ops" not in tname:
            continue
        name = e.get("name", "")
        # strip trailing .N / numeric suffixes for grouping
        key = re.sub(r"[._]\d+$", "", name)
        durs[key] += e.get("dur", 0.0)
        total += e.get("dur", 0.0)

    rows = sorted(durs.items(), key=lambda kv: -kv[1])
    print(f"total device op time: {total / 1e3 / STEPS:.2f} ms/step")
    print(f"{'ms/step':>9}  {'%':>5}  name")
    for k, v in rows:
        ms = v / 1e3 / STEPS
        if ms < 0.15:
            continue
        print(f"{ms:9.3f}  {100 * v / total:5.1f}  {k[:100]}")


if __name__ == "__main__":
    main()
