"""Throughput for every BASELINE.json config (VERDICT r2 item 6).

One JSON line per config: 256x256 patches/sec/chip for inference and one
full train step, same differential timing protocol as bench.py.  Results
are tabled in docs/PERFORMANCE.md.

Configs (BASELINE.json "configs"):
  1. NYUv2 M=1 fbc=21 laplace
  2. NYUv2 M=2 fbc=21 laplace (flagship — bench.py's headline)
  3. SEN12TP NDVI M=2 fbc=30, 2 inputs (VV+VH), patch 256
  4. MC-dropout variant (core/encoder/decoder dropout 0.1): eval with
     live spatial dropout masks (reference Readme.md:82), MC=5 folded
     into the batch
  5. M=3 / M=4 scaled MIMO fbc=30, gaussian vs laplace
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import jax
import jax.numpy as jnp


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


def bench_config(name, task, *, bs_infer=128, bs_train=128, mc=0,
                 train=True):
    from mimo_unet_tpu.transforms import (
        compute_uncertainties, repeat_subnetworks)

    state = task.init_state(steps_per_epoch=1000)
    loss_fn = task.loss_fn
    cin = task.in_channels
    s_eff = task.num_subnetworks * max(1, mc)

    @jax.jit
    def infer(params, model_state, image, key):
        # MC passes fold into the batch: tile the image mc times and run
        # one forward with live dropout (models/ensemble.py strategy —
        # dropout masks are per-sample, so tiled rows are independent
        # MC samples); predictions refold onto the subnetwork axis
        b = image.shape[0]
        x = repeat_subnetworks(image, task.num_subnetworks)
        if mc:
            x = jnp.concatenate([x] * mc, axis=0)
        (p1, p2), _ = task.forward(
            params, model_state, x, train=False,
            rng=key, mc_dropout=bool(mc))
        if mc:
            def fold(p):
                p = p.reshape((mc, b) + p.shape[1:])
                return jnp.moveaxis(p, 0, 1).reshape(
                    (b, mc * p.shape[2]) + p.shape[3:])
            p1, p2 = fold(p1), fold(p2)
        mean, ale, epi = compute_uncertainties(loss_fn, p1, p2)
        return mean.mean() + ale.mean() + epi.mean()

    x = jax.random.uniform(jax.random.key(0), (bs_infer, 256, 256, cin))
    key = jax.random.key(1)
    t_inf = timed_throughput(
        infer, (state.params, state.model_state, x, key), bs_infer)

    t_train = None
    if train:
        tx = task.make_optimizer(steps_per_epoch=1000)
        tstate = jax.device_put(task.init_state(steps_per_epoch=1000))
        train_step = jax.jit(
            partial(task.train_step, tx, with_outputs=False),
            donate_argnums=(0,))
        batch = {
            "image": jax.random.uniform(
                jax.random.key(1), (bs_train, 256, 256, cin)),
            "label": jax.random.uniform(
                jax.random.key(2),
                (bs_train, 256, 256, task.out_channels // 2)),
        }
        carry = {"s": tstate}

        def step_scalar(_):
            new_state, logs, _ = train_step(carry["s"], batch, jax.random.key(0))
            carry["s"] = new_state
            return logs["train_loss"]

        t_train = timed_throughput(step_scalar, (0,), bs_train)

    line = {
        "metric": name,
        "infer_patches_per_sec": round(t_inf, 1),
        "infer_batch": bs_infer,
    }
    if mc:
        line["mc_steps"] = mc
        line["effective_forward_width"] = s_eff
    if t_train is not None:
        line["train_patches_per_sec"] = round(t_train, 1)
        line["train_batch"] = bs_train
    print(json.dumps(line), flush=True)


def main():
    from mimo_unet_tpu.tasks import MimoUnetTask

    only = sys.argv[1:]  # e.g. `exp_bench_configs.py cfg3 cfg4` reruns a subset

    def want(name):
        return not only or any(name.startswith(o) for o in only)

    mk = dict(in_channels=3, out_channels=2, loss="laplace_nll", seed=0,
              compute_dtype="bfloat16")

    # 1. M=1
    if want("cfg1"):
        bench_config(
            "cfg1_nyuv2_m1_fbc21_laplace",
            MimoUnetTask(num_subnetworks=1, filter_base_count=21, **mk))

    # 2. M=2 flagship
    if want("cfg2"):
        bench_config(
            "cfg2_nyuv2_m2_fbc21_laplace_flagship",
            MimoUnetTask(num_subnetworks=2, filter_base_count=21, **mk))

    # 3. SEN12TP NDVI: 2 inputs (VV+VH), 1 target x 2 params, fbc=30
    # (bs_train=64: the fbc=30 train step at B=128 exhausts v5e HBM)
    if want("cfg3"):
        bench_config(
            "cfg3_sen12tp_ndvi_m2_fbc30_patch256",
            MimoUnetTask(in_channels=2, out_channels=2, num_subnetworks=2,
                         filter_base_count=30, loss="laplace_nll", seed=0,
                         compute_dtype="bfloat16"),
            bs_train=64)

    # 4. MC-dropout recipe (reference Readme.md:82), MC=5 eval with live
    # spatial dropout — runs the CT fast path with per-(image, channel)
    # mask scales since round 3
    if want("cfg4"):
        bench_config(
            "cfg4_nyuv2_m2_mcdropout0.1_mc5_eval",
            MimoUnetTask(num_subnetworks=2, filter_base_count=21,
                         encoder_dropout_rate=0.1, core_dropout_rate=0.1,
                         decoder_dropout_rate=0.1, **mk),
            bs_infer=32, mc=5, train=False)
        # ...and its training step (spatial dropout active in train -> XLA
        # path; B=64 — the XLA train path at B=128 exhausts v5e HBM)
        bench_config(
            "cfg4_nyuv2_m2_mcdropout0.1_train",
            MimoUnetTask(num_subnetworks=2, filter_base_count=21,
                         encoder_dropout_rate=0.1, core_dropout_rate=0.1,
                         decoder_dropout_rate=0.1, **mk),
            bs_infer=128, bs_train=64)

    # 5. scaled MIMO: M=3 gaussian, M=4 laplace, fbc=30
    if want("cfg5a"):
        bench_config(
            "cfg5a_nyuv2_m3_fbc30_gaussian",
            MimoUnetTask(in_channels=3, out_channels=2, num_subnetworks=3,
                         filter_base_count=30, loss="gaussian_nll", seed=0,
                         compute_dtype="bfloat16"),
            bs_infer=64, bs_train=64)
    if want("cfg5b"):
        # bs_train=32: the M=4 fbc=30 train step at B=64 exhausts v5e HBM
        bench_config(
            "cfg5b_nyuv2_m4_fbc30_laplace",
            MimoUnetTask(in_channels=3, out_channels=2, num_subnetworks=4,
                         filter_base_count=30, loss="laplace_nll", seed=0,
                         compute_dtype="bfloat16"),
            bs_infer=64, bs_train=32)


if __name__ == "__main__":
    main()
