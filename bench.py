"""Benchmark: 256x256 patches/sec/chip, NYUv2-depth MIMO M=2 inference.

Protocol mirrors the reference's measure_inference_speed.py (reference:
scripts/test/measure_inference_speed.py:25-47 — warm-up passes then timed
reps with device sync) scaled to TPU batch sizes.  The driver target
(BASELINE.json north_star) is >=5000 256x256 patches/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from mimo_unet_tpu.tasks import MimoUnetTask
    from mimo_unet_tpu.transforms import compute_uncertainties, repeat_subnetworks

    task = MimoUnetTask(
        in_channels=3,
        out_channels=2,
        num_subnetworks=2,
        filter_base_count=21,
        loss="laplace_nll",
        seed=0,
        compute_dtype="bfloat16",
    )
    state = task.init_state(steps_per_epoch=1)
    loss_fn = task.loss_fn

    @jax.jit
    def infer(params, model_state, image):
        x = repeat_subnetworks(image, task.num_subnetworks)
        (p1, p2), _ = task.forward(params, model_state, x, train=False)
        mean, ale, epi = compute_uncertainties(loss_fn, p1, p2)
        # reduce to a scalar on device so materializing the result costs ~0
        return mean.mean() + ale.mean() + epi.mean()

    def timed_throughput(batch_size: int) -> float:
        """Differential protocol: on this platform block_until_ready can
        return before execution finishes, so time K chained-dispatch calls
        with one scalar materialization and subtract the 1-call baseline
        (fixed relay/transfer latency cancels out)."""
        x = jax.random.uniform(
            jax.random.key(0), (batch_size, 256, 256, 3), jnp.float32
        )
        float(infer(state.params, state.model_state, x))  # compile + warm

        def run_k(k: int) -> float:
            t0 = time.perf_counter()
            r = None
            for _ in range(k):
                r = infer(state.params, state.model_state, x)
            float(r)  # materialize: true end-to-end sync
            return time.perf_counter() - t0

        run_k(2)  # warm the dispatch/transfer path
        reps = 20
        t1 = min(run_k(1) for _ in range(3))
        tk = min(run_k(reps + 1) for _ in range(2))
        per_exec = (tk - t1) / reps
        return batch_size / per_exec

    best = 0.0
    best_bs = 0
    for batch_size in (32, 64, 128):
        throughput = timed_throughput(batch_size)
        if throughput > best:
            best, best_bs = throughput, batch_size

    target = 5000.0
    print(
        json.dumps(
            {
                "metric": "nyuv2_mimo_m2_256px_inference_patches_per_sec_per_chip",
                "value": round(best, 1),
                "unit": f"patches/sec/chip (best batch={best_bs}, bf16)",
                "vs_baseline": round(best / target, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
