"""Round-4 cheap sweeps: (a) inference/train batch sizes beyond the
bench's {32,64,128}, (b) decoder eval kernel tile height forced past the
estimator's pick (the compile probe now makes deeper tiles safe to try).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import functools

import jax
import jax.numpy as jnp

from mimo_unet_tpu.tasks import MimoUnetTask
from mimo_unet_tpu.train.profiling import timed_per_exec


def main():
    task = MimoUnetTask(
        in_channels=3, out_channels=2, num_subnetworks=2,
        filter_base_count=21, loss="laplace_nll", seed=0,
        compute_dtype="bfloat16")
    state = task.init_state(steps_per_epoch=1000)

    from mimo_unet_tpu.transforms import (compute_uncertainties,
                                           repeat_subnetworks)

    @jax.jit
    def infer(params, model_state, x):
        xt = repeat_subnetworks(x, task.num_subnetworks)
        (p1, p2), _ = task.forward(params, model_state, xt, train=False)
        mean, ale, epi = compute_uncertainties(task.loss_fn, p1, p2)
        return mean.mean() + ale.mean() + epi.mean()

    print("---- inference batch sweep ----")
    for b in (96, 112, 128, 144, 160, 192):
        x = jax.random.uniform(jax.random.key(0), (b, 256, 256, 3))
        t = timed_per_exec(
            lambda: infer(state.params, state.model_state, x), reps=30)
        print(f"B={b:4d}: {b / t:8.1f} patches/s  ({t * 1e3:.2f} ms)")

    print("---- train batch sweep ----")
    tx = task.make_optimizer(steps_per_epoch=1000)
    for b in (96, 128, 160, 192):
        train_step = jax.jit(
            functools.partial(task.train_step, tx, with_outputs=False),
            donate_argnums=(0,))
        batch = {
            "image": jax.random.uniform(jax.random.key(1), (b, 256, 256, 3)),
            "label": jax.random.uniform(jax.random.key(2), (b, 256, 256, 1)),
        }
        carry = {"s": jax.device_put(task.init_state(steps_per_epoch=1000))}
        rngk = jax.random.key(0)

        def step_scalar(_):
            ns, logs, _ = train_step(carry["s"], batch, rngk)
            carry["s"] = ns
            return logs["train_loss"]

        try:
            t = timed_per_exec(lambda: step_scalar(0), reps=12)
            print(f"B={b:4d}: {b / t:8.1f} img/s  ({t * 1e3:.2f} ms)")
        except Exception as e:  # noqa: BLE001
            print(f"B={b:4d}: FAILED {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
