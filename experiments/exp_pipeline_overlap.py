"""VERDICT item 8: prove the input pipeline does not starve the chip.

Feeds real h5-sized NYUv2 batches (640x480 uint8-scale images resident in
host RAM, as data/nyuv2.py loads them) through the flagship train step at
B=64/256px, comparing:
  * chip-only: batches pre-staged on device (upper bound)
  * prefetch:  host batching + crop + prefetch_to_device(size=2)
  * naive:     host batching + synchronous device_put per step
  * uint8+prefetch: host keeps raw uint8 (data/core.py device_normalize
    runs /255 on device) — 4x less host copy and H2D transfer
Measures wall-clock per step over an epoch-ish stretch.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import functools
import numpy as np
import jax
import jax.numpy as jnp

from mimo_unet_tpu.data.core import ArrayDataset, iterate_batches, prefetch_to_device
from mimo_unet_tpu.tasks import MimoUnetTask


def main():
    b, hw = 64, 256
    n_images = 512  # host-resident like depth_train.h5 in RAM
    rng = np.random.default_rng(0)
    images = rng.random((n_images, 480, 640, 3), np.float32)
    labels = rng.random((n_images, 480, 640, 1), np.float32)

    def crop(batch):
        # random-crop-to-256 stand-in for patch extraction (host-side)
        y0 = rng.integers(0, 480 - hw)
        x0 = rng.integers(0, 640 - hw)
        return {
            "image": batch["image"][:, y0:y0 + hw, x0:x0 + hw],
            "label": batch["label"][:, y0:y0 + hw, x0:x0 + hw],
        }

    ds = ArrayDataset({"image": images, "label": labels})

    task = MimoUnetTask(in_channels=3, out_channels=2, num_subnetworks=2,
                        filter_base_count=21, loss="laplace_nll", seed=0,
                        compute_dtype="bfloat16")
    tx = task.make_optimizer(steps_per_epoch=100)
    state = jax.device_put(task.init_state(steps_per_epoch=100))
    step = jax.jit(functools.partial(task.train_step, tx, with_outputs=False),
                   donate_argnums=(0,))
    rngk = jax.random.key(0)

    # compile once
    warm = crop(next(iterate_batches(ds, b, shuffle=False)))
    state, logs, _ = step(state, warm, rngk)
    float(logs["train_loss"])

    n_steps = n_images // b * 4

    def run_chip_only():
        nonlocal state
        dev_batch = jax.device_put(warm)
        t0 = time.perf_counter()
        logs = None
        for _ in range(n_steps):
            state, logs, _ = step(state, dev_batch, rngk)
        float(logs["train_loss"])
        return (time.perf_counter() - t0) / n_steps

    def host_iter():
        for k in range(n_steps):
            it = iterate_batches(ds, b, shuffle=True, seed=k, drop_last=True)
            for batch in it:
                yield crop(batch)

    def take(gen, n):
        for _, item in zip(range(n), gen):
            yield item

    def run_prefetch():
        nonlocal state
        t0 = time.perf_counter()
        logs = None
        for batch in prefetch_to_device(take(host_iter(), n_steps), size=2):
            state, logs, _ = step(state, batch, rngk)
        float(logs["train_loss"])
        return (time.perf_counter() - t0) / n_steps

    def run_naive():
        nonlocal state
        t0 = time.perf_counter()
        logs = None
        for batch in take(host_iter(), n_steps):
            state, logs, _ = step(state, jax.device_put(batch), rngk)
        float(logs["train_loss"])
        return (time.perf_counter() - t0) / n_steps

    # uint8 variant: same frames staged as uint8, normalized on device
    ds_u8 = ArrayDataset({
        "image": (images * 255).astype(np.uint8),
        "label": (labels * 255).astype(np.uint8),
    })

    def host_iter_u8():
        for k in range(n_steps):
            it = iterate_batches(ds_u8, b, shuffle=True, seed=k,
                                 drop_last=True)
            for batch in it:
                yield crop(batch)

    def run_prefetch_u8():
        nonlocal state
        t0 = time.perf_counter()
        logs = None
        for batch in prefetch_to_device(take(host_iter_u8(), n_steps),
                                        size=2):
            state, logs, _ = step(state, batch, rngk)
        float(logs["train_loss"])
        return (time.perf_counter() - t0) / n_steps

    t_chip = run_chip_only()
    t_pref = run_prefetch()
    t_naive = run_naive()
    # compile for the uint8 batch signature happens on first step
    t_u8 = run_prefetch_u8()
    t_u8 = run_prefetch_u8()
    print(f"chip-only: {t_chip*1e3:.1f} ms/step ({b/t_chip:.0f} img/s)",
          flush=True)
    print(f"prefetch : {t_pref*1e3:.1f} ms/step ({b/t_pref:.0f} img/s, "
          f"overhead {(t_pref/t_chip-1)*100:.1f}%)", flush=True)
    print(f"naive    : {t_naive*1e3:.1f} ms/step ({b/t_naive:.0f} img/s, "
          f"overhead {(t_naive/t_chip-1)*100:.1f}%)", flush=True)
    print(f"uint8+prefetch: {t_u8*1e3:.1f} ms/step ({b/t_u8:.0f} img/s, "
          f"overhead {(t_u8/t_chip-1)*100:.1f}%)", flush=True)


if __name__ == "__main__":
    main()
