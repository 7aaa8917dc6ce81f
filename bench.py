"""Benchmark: 256x256 patches/sec/chip, NYUv2-depth MIMO M=2 train + infer.

Protocol mirrors the reference's measure_inference_speed.py (reference:
scripts/test/measure_inference_speed.py:25-47 — warm-up passes then timed
reps with device sync) scaled to TPU batch sizes.  The driver target
(BASELINE.json north_star) is >=5000 256x256 patches/sec/chip (train+infer).

Prints one JSON line per metric ({"metric", "value", "unit",
"vs_baseline"}).  Each section prints its line the moment it completes and
is isolated in try/except — a failure in a later section (e.g. a train
compile OOM, the round-3 failure mode) cannot erase the earlier numbers.
The headline inference line embeds train_patches_per_sec as an extra key
so single-line consumers still see both numbers.
"""

import json
import os
import sys
import time
import traceback

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

TARGET = 5000.0

# XLA cost-analysis FLOP counts for the flagship graph (docs/PERFORMANCE.md
# "XLA cost analysis") and the v5e bf16 peak, so every bench line carries
# sustained TF/s + MFU and rounds are judged against the hardware ceiling,
# not just each other.
GFLOP_PER_IMG_INFER = 32.5
GFLOP_PER_IMG_TRAIN = 97.0
PEAK_TFLOPS = 197.0  # TPU v5e bf16


def _mfu(images_per_sec: float, gflop_per_img: float) -> dict:
    tf = images_per_sec * gflop_per_img / 1e3
    return {"sustained_tflops": round(tf, 1),
            "mfu": round(tf / PEAK_TFLOPS, 4)}


def _emit(payload):
    print(json.dumps(payload), flush=True)


def _section(name):
    """Decorator: run a bench section, swallow+report failures."""

    def deco(fn):
        def run(*args, **kwargs):
            try:
                return fn(*args, **kwargs)
            except Exception:
                print(f"[bench] section {name!r} FAILED:", file=sys.stderr)
                traceback.print_exc()
                return None

        return run

    return deco


def main():
    import functools

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

    def timed_throughput(fn, args, batch_size: int, reps: int = 20) -> float:
        """Differential protocol: on this platform block_until_ready can
        return before execution finishes, so time K chained-dispatch calls
        with one scalar materialization and subtract the 1-call baseline
        (fixed relay/transfer latency cancels out)."""
        float(fn(*args))  # compile + warm

        def run_k(k: int) -> float:
            t0 = time.perf_counter()
            r = None
            for _ in range(k):
                r = fn(*args)
            float(r)  # materialize: true end-to-end sync
            return time.perf_counter() - t0

        run_k(2)  # warm the dispatch/transfer path
        t1 = min(run_k(1) for _ in range(3))
        tk = min(run_k(reps + 1) for _ in range(2))
        per_exec = (tk - t1) / reps
        return batch_size / per_exec

    # ----------------------------------------------------------- inference
    @_section("inference")
    def bench_inference():
        best, best_bs = 0.0, 0
        for batch_size in (32, 64, 128):
            x = jax.random.uniform(
                jax.random.key(0), (batch_size, 256, 256, 3), jnp.float32
            )
            throughput = timed_throughput(
                infer, (state.params, state.model_state, x), batch_size
            )
            if throughput > best:
                best, best_bs = throughput, batch_size
        return best, best_bs

    infer_res = bench_inference()
    if infer_res:
        best, best_bs = infer_res
        _emit(
            {
                "metric": "nyuv2_mimo_m2_256px_inference_patches_per_sec_per_chip",
                "value": round(best, 1),
                "unit": f"patches/sec/chip (best batch={best_bs}, bf16)",
                "vs_baseline": round(best / TARGET, 4),
                **_mfu(best, GFLOP_PER_IMG_INFER),
            }
        )

    # --------------------------------------------------------------- train
    # one full optimization step (fwd+bwd+Adam+loss buffer), the reference
    # training configuration: batch 64, laplace NLL (Readme.md:61-79)
    tx = task.make_optimizer(steps_per_epoch=1000)
    train_step = jax.jit(
        functools.partial(task.train_step, tx, with_outputs=False),
        donate_argnums=(0,),
    )

    @_section("train")
    def bench_train():
        from mimo_unet_tpu.train.capacity import make_train_step

        train_best, train_best_bs = 0.0, 0
        # B=192 exceeds HBM with full residual saving; the capacity
        # ladder (train/capacity.py) compiles it via remat instead of a
        # try/except dropping it from the sweep.
        for batch_size in (64, 128, 192):
            batch = {
                "image": jax.random.uniform(
                    jax.random.key(1), (batch_size, 256, 256, 3), jnp.float32
                ),
                "label": jax.random.uniform(
                    jax.random.key(2), (batch_size, 256, 256, 1), jnp.float32
                ),
            }
            rngk = jax.random.key(0)
            carry = {"s": jax.device_put(task.init_state(steps_per_epoch=1000))}
            step, task_used = make_train_step(
                task, tx, carry["s"], batch, rngk
            )

            def step_scalar(_unused):
                new_state, logs, _ = step(carry["s"], batch, rngk)
                carry["s"] = new_state
                return logs["train_loss"]

            tput = timed_throughput(step_scalar, (0,), batch_size)
            print(f"[bench] train B={batch_size} remat={task_used.remat}: "
                  f"{tput:.1f} img/s", file=sys.stderr)
            if tput > train_best:
                train_best, train_best_bs = tput, batch_size
        return train_best, train_best_bs

    train_res = bench_train()
    if train_res:
        train_best, train_best_bs = train_res
        _emit(
            {
                "metric": "nyuv2_mimo_m2_256px_train_patches_per_sec_per_chip",
                "value": round(train_best, 1),
                "unit": f"patches/sec/chip (fwd+bwd+opt, best batch={train_best_bs}, bf16)",
                "vs_baseline": round(train_best / TARGET, 4),
                **_mfu(train_best, GFLOP_PER_IMG_TRAIN),
            }
        )

    # ------------------------------------------------------ real-data train
    # End-to-end truth (VERDICT r2 item 5): NYUv2-shaped h5 on disk
    # (640x480 uint8 frames, the real archives' schema and dtype) -> uint8
    # host staging -> background prefetch -> jitted train step, timed over
    # whole epochs including every host-side cost on this single-core host.
    # 640-wide frames run the CT kernels for in_conv/decoder with the
    # down1 NHWC fallback (models/fast_path.py, w % 128 eligibility).
    @_section("real-data train")
    def bench_real_data():
        import numpy as np

        fix_dir = "/tmp/bench_nyu"
        fix_path = os.path.join(fix_dir, "depth_train.h5")
        n_frames, fh, fw = 192, 480, 640
        if not os.path.exists(fix_path):
            import h5py

            os.makedirs(fix_dir, exist_ok=True)
            rng_np = np.random.default_rng(0)
            with h5py.File(fix_path, "w") as f:
                img = rng_np.integers(
                    0, 255, (n_frames, fh, fw, 3), dtype=np.uint8
                )
                f.create_dataset("image", data=img)
                f.create_dataset(
                    "depth",
                    data=img.mean(axis=-1, keepdims=True).astype(np.uint8),
                )

        from mimo_unet_tpu.data.core import (
            DeviceDataset,
            iterate_batches,
            iterate_index_batches,
            prefetch_to_device,
        )
        from mimo_unet_tpu.data.nyuv2 import load_nyuv2_depth

        real_ds = load_nyuv2_depth(fix_path, host_dtype="uint8")
        # B=16: the 640x480 train step at B=32 needs 16.1G HBM (15.75G chip)
        # with the round-3 deep-tile kernels; throughput is host-bound on
        # this single-core box, so halving the batch costs ~nothing.
        real_bs = 16
        rngk = jax.random.key(0)

        def run_epoch(epoch, chunk=1):
            t0 = time.perf_counter()
            seen = 0
            logs = None
            batches = prefetch_to_device(
                iterate_batches(
                    real_ds, real_bs, shuffle=True, drop_last=True,
                    seed=0, epoch=epoch,
                ),
                chunk=chunk,
            )
            st = run_epoch.state
            for batch in batches:
                st, logs, _ = train_step(st, batch, rngk)
                seen += real_bs
            run_epoch.state = st
            float(logs["train_loss"])  # true end-to-end sync
            return seen / (time.perf_counter() - t0)

        run_epoch.state = jax.device_put(task.init_state(steps_per_epoch=1000))
        run_epoch(0)  # compile + warm
        host_fed_runs = [run_epoch(e) for e in (1, 2, 3)]
        host_fed_tput = max(host_fed_runs)
        # chunked uploads (--host_chunk): one device_put per `chunk` steps
        # amortizes the relay's per-transfer serialization
        chunked_runs = [run_epoch(e, chunk=8) for e in (4, 5, 6)]
        host_chunk_tput = max(chunked_runs)

        # Device-resident dataset (--device_cache): the whole uint8 train
        # split is staged into HBM once; each step's batch gather happens
        # on-chip inside the jitted step, so per-step host work is drawing
        # indices.
        dev_ds = DeviceDataset(real_ds)

        def _cached_step(st, data, idx, rngk):
            batch = {k: jnp.take(v, idx, axis=0) for k, v in data.items()}
            return task.train_step(tx, st, batch, rngk, with_outputs=False)

        cached_step = jax.jit(_cached_step, donate_argnums=(0,))

        def run_epoch_cached(epoch):
            t0 = time.perf_counter()
            seen = 0
            logs = None
            st = run_epoch_cached.state
            for idx in iterate_index_batches(
                len(dev_ds), real_bs, shuffle=True, drop_last=True,
                seed=0, epoch=epoch,
            ):
                st, logs, _ = cached_step(st, dev_ds.data, idx, rngk)
                seen += real_bs
            run_epoch_cached.state = st
            float(logs["train_loss"])  # true end-to-end sync
            return seen / (time.perf_counter() - t0)

        run_epoch_cached.state = jax.device_put(
            task.init_state(steps_per_epoch=1000)
        )
        run_epoch_cached(0)  # compile + warm
        real_tput = max(run_epoch_cached(e) for e in (1, 2, 3))
        patch_equiv = fh * fw / (256.0 * 256.0)
        _emit(
            {
                "metric": "nyuv2_mimo_m2_realdata_640x480_train_img_per_sec",
                "value": round(real_tput, 1),
                "unit": (
                    f"whole 640x480 frames/sec, h5->one-time HBM staging->"
                    f"on-chip gather (--device_cache)->train step, batch "
                    f"{real_bs}, bf16"
                ),
                "vs_baseline": round(real_tput * patch_equiv / TARGET, 4),
                "patch_equiv_per_sec": round(real_tput * patch_equiv, 1),
                "host_fed_img_per_sec": round(host_fed_tput, 1),
                "host_fed_runs": [round(v, 1) for v in host_fed_runs],
                "host_chunk8_img_per_sec": round(host_chunk_tput, 1),
                "host_chunk8_runs": [round(v, 1) for v in chunked_runs],
            }
        )

    bench_real_data()

    # re-emit the headline inference line LAST with the train number
    # embedded, so single-line consumers (the driver takes the last parsed
    # line) always see the headline even if a later section failed
    if infer_res:
        best, best_bs = infer_res
        payload = {
            "metric": "nyuv2_mimo_m2_256px_inference_patches_per_sec_per_chip",
            "value": round(best, 1),
            "unit": f"patches/sec/chip (best batch={best_bs}, bf16)",
            "vs_baseline": round(best / TARGET, 4),
            **_mfu(best, GFLOP_PER_IMG_INFER),
        }
        if train_res:
            payload["train_patches_per_sec"] = round(train_res[0], 1)
            payload["train_batch"] = train_res[1]
            payload["train_mfu"] = _mfu(train_res[0], GFLOP_PER_IMG_TRAIN)["mfu"]
        _emit(payload)


if __name__ == "__main__":
    main()
