"""Capture a jax.profiler trace of the eval forward (B=128) and summarize
per-op costs with source attribution — data for the inference roofline
table (docs/PERFORMANCE.md round 3)."""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import jax
import jax.numpy as jnp

from mimo_unet_tpu.tasks import MimoUnetTask
from mimo_unet_tpu.transforms import compute_uncertainties, repeat_subnetworks


def main():
    b = 128
    task = MimoUnetTask(
        in_channels=3, out_channels=2, num_subnetworks=2,
        filter_base_count=21, loss="laplace_nll", seed=0,
        compute_dtype="bfloat16")
    state = task.init_state(steps_per_epoch=1)

    @jax.jit
    def infer(params, model_state, image):
        x = repeat_subnetworks(image, task.num_subnetworks)
        (p1, p2), _ = task.forward(params, model_state, x, train=False)
        mean, ale, epi = compute_uncertainties(task.loss_fn, p1, p2)
        return mean.mean() + ale.mean() + epi.mean()

    x = jax.random.uniform(jax.random.key(0), (b, 256, 256, 3), jnp.float32)
    args = (state.params, state.model_state, x)
    for _ in range(2):
        float(infer(*args))

    logdir = "/tmp/jax_trace_eval"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    r = None
    for _ in range(3):
        r = infer(*args)
    float(r)
    jax.profiler.stop_trace()

    files = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace produced")
        return
    with gzip.open(files[0], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    durs = defaultdict(float)
    src = defaultdict(float)
    total = 0.0
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
        durs[name.split(".")[0][:70]] += d
        args_d = e.get("args", {}) or {}
        tf = args_d.get("tf_op") or args_d.get("source") or ""
        if tf:
            src[str(tf)[:90]] += d
        total += d
    print(f"total op time: {total/3:.1f} ms/exec", flush=True)
    print("---- by op name ----")
    for k, v in sorted(durs.items(), key=lambda kv: -kv[1])[:45]:
        print(f"{v/3:9.2f} ms  {k}", flush=True)
    if src:
        print("---- by source ----")
        for k, v in sorted(src.items(), key=lambda kv: -kv[1])[:35]:
            print(f"{v/3:9.2f} ms  {k}", flush=True)


if __name__ == "__main__":
    main()
