"""End-to-end inference throughput: CT fast path vs XLA path (flagship
config: NYUv2 MIMO S=2, fbc=21, 256x256, bf16)."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import jax
import jax.numpy as jnp

from mimo_unet_tpu.tasks import MimoUnetTask
from mimo_unet_tpu.transforms import compute_uncertainties, repeat_subnetworks
import dataclasses


def timed_throughput(fn, args, batch_size, reps=20):
    float(fn(*args))

    def run_k(k):
        t0 = time.perf_counter()
        r = None
        for _ in range(k):
            r = fn(*args)
        float(r)
        return time.perf_counter() - t0

    run_k(2)
    t1 = min(run_k(1) for _ in range(3))
    tk = min(run_k(reps + 1) for _ in range(2))
    return batch_size / ((tk - t1) / reps)


def main():
    for ct in ("off", "auto"):
        task = MimoUnetTask(
            in_channels=3, out_channels=2, num_subnetworks=2,
            filter_base_count=21, loss="laplace_nll", seed=0,
            compute_dtype="bfloat16", ct_kernels=ct,
        )
        state = task.init_state(steps_per_epoch=1)
        loss_fn = task.loss_fn

        @jax.jit
        def infer(params, model_state, image):
            x = repeat_subnetworks(image, task.num_subnetworks)
            (p1, p2), _ = task.forward(params, model_state, x, train=False)
            mean, ale, epi = compute_uncertainties(loss_fn, p1, p2)
            return mean.mean() + ale.mean() + epi.mean()

        for bsz in (128,):
            x = jax.random.uniform(jax.random.key(0), (bsz, 256, 256, 3),
                                   jnp.float32)
            tput = timed_throughput(
                infer, (state.params, state.model_state, x), bsz)
            print(f"ct={ct} B={bsz}: {tput:.1f} patches/s", flush=True)


if __name__ == "__main__":
    main()
