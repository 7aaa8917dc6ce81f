"""Quick full train-step throughput on the current backend (B=64,128)."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import jax
import jax.numpy as jnp

from mimo_unet_tpu.tasks import MimoUnetTask


def main():
    task = MimoUnetTask(
        in_channels=3, out_channels=2, num_subnetworks=2,
        filter_base_count=21, loss="laplace_nll", seed=0,
        compute_dtype="bfloat16")
    tx = task.make_optimizer(steps_per_epoch=1000)
    train_step = jax.jit(
        functools.partial(task.train_step, tx, with_outputs=False),
        donate_argnums=(0,))

    for b in (64, 128):
        batch = {
            "image": jax.random.uniform(jax.random.key(1), (b, 256, 256, 3)),
            "label": jax.random.uniform(jax.random.key(2), (b, 256, 256, 1)),
        }
        rngk = jax.random.key(0)
        carry = {"s": jax.device_put(task.init_state(steps_per_epoch=1000))}

        def step_scalar(_):
            new_state, logs, _ = train_step(carry["s"], batch, rngk)
            carry["s"] = new_state
            return logs["train_loss"]

        float(step_scalar(0))

        def run_k(k):
            t0 = time.perf_counter()
            r = None
            for _ in range(k):
                r = step_scalar(0)
            float(r)
            return time.perf_counter() - t0

        run_k(2)
        t1 = min(run_k(1) for _ in range(3))
        tk = min(run_k(21) for _ in range(2))
        per = (tk - t1) / 20
        print(f"B={b}: {per * 1e3:.1f} ms/step, {b / per:.1f} img/s")


if __name__ == "__main__":
    main()
