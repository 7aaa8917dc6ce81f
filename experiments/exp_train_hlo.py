"""Dump the optimized HLO of the train step and summarize copies.

Finds the `copy.N` instructions the profiler shows as unattributed and
prints their shapes/layouts so the relayout source can be located.
"""

import os
import re
import sys

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
    lowered = train_step.lower(state, batch, rngk)
    compiled = lowered.compile()
    txt = compiled.as_text()
    pat = sys.argv[2] if len(sys.argv) > 2 else r"copy\.4"
    rx = re.compile(pat)
    for line in txt.splitlines():
        s = line.strip()
        if rx.search(s.split(" = ")[0] if " = " in s else s):
            print(s[:240])


if __name__ == "__main__":
    main()
