"""Measure ensemble inference latency (TPU).

Mirrors the reference protocol (reference scripts/test/
measure_inference_speed.py:22-47: 10 warm-up passes, 1000 timed reps with a
device sync, mean/std ms printed) adapted to this platform: some PJRT
relays return from block_until_ready early, so timing uses chained
dispatch with scalar materialization (see bench.py).
"""

import os
import sys
import time
from argparse import ArgumentParser

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")


def main(args):
    import jax
    import jax.numpy as jnp

    from mimo_unet_tpu.models.ensemble import Ensemble

    model = Ensemble(
        checkpoint_paths=args.model_checkpoint_paths,
        monte_carlo_steps=args.monte_carlo_steps,
        return_raw_predictions=False,
    )

    @jax.jit
    def infer(x):
        mean, ale, epi = model(x)
        return mean.mean() + ale.mean() + epi.mean()

    dummy = jax.random.normal(
        jax.random.key(0), (1, args.height, args.width, args.in_channels)
    )
    # warm-up (reference: 10 passes)
    for _ in range(10):
        r = infer(dummy)
    float(r)

    repetitions = args.repetitions
    timings = np.zeros(repetitions)
    for rep in range(repetitions):
        t0 = time.perf_counter()
        float(infer(dummy))
        timings[rep] = (time.perf_counter() - t0) * 1000.0

    print(f"mean: {timings.mean():.3f} ms, std: {timings.std():.3f} ms")

    # differential per-exec estimate (relay-latency corrected)
    def run_k(k):
        t0 = time.perf_counter()
        for _ in range(k):
            r = infer(dummy)
        float(r)
        return time.perf_counter() - t0

    t1 = min(run_k(1) for _ in range(3))
    t21 = min(run_k(21) for _ in range(2))
    per_exec = (t21 - t1) / 20 * 1000
    print(f"per-exec (relay-corrected): {per_exec:.3f} ms")


if __name__ == "__main__":
    parser = ArgumentParser()
    parser.add_argument("--model_checkpoint_paths", nargs="+", type=str, required=True)
    parser.add_argument("--monte_carlo_steps", type=int, default=0)
    parser.add_argument("--device", type=str, default="tpu")  # compat, unused
    parser.add_argument("--in_channels", type=int, required=True)
    parser.add_argument("--height", type=int, required=True)
    parser.add_argument("--width", type=int, required=True)
    parser.add_argument("--repetitions", type=int, default=1000)
    main(parser.parse_args())
