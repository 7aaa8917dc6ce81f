"""Round-5 eval-path verification: CT fast path vs XLA path numerics on
the real chip (max rel err must stay in the bf16 fused-pair class), plus
end-to-end throughput.  Run after any eval-kernel change."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mimo_unet_tpu.models import mimo_unet_apply, mimo_unet_init
from mimo_unet_tpu.tasks import MimoUnetTask
from mimo_unet_tpu.transforms import compute_uncertainties, repeat_subnetworks


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
    task = MimoUnetTask(
        in_channels=3, out_channels=2, num_subnetworks=2,
        filter_base_count=21, loss="laplace_nll", seed=0,
        compute_dtype="bfloat16", ct_kernels="auto",
    )
    state = task.init_state(steps_per_epoch=1)
    cfg = task.model_config
    cfg_off = dataclasses.replace(cfg, ct_kernels="off")

    # ---- numerics: CT vs XLA on a small batch -----------------------------
    x5 = jax.random.uniform(jax.random.key(3), (4, 2, 256, 256, 3))
    out_ct, _ = jax.jit(lambda p, s, v: mimo_unet_apply(
        p, s, v, cfg, train=False))(state.params, state.model_state, x5)
    out_off, _ = jax.jit(lambda p, s, v: mimo_unet_apply(
        p, s, v, cfg_off, train=False))(state.params, state.model_state, x5)
    a, b = np.asarray(out_ct, np.float32), np.asarray(out_off, np.float32)
    err = np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9)
    print(f"CT-vs-XLA eval max rel err: {err:.2e}", flush=True)
    # the bf16 fused-pair rounding class: the per-kernel tests allow
    # atol=3e-2..5e-2 of scale (tests/test_ct_conv.py); round-5 baseline
    # on this metric measured 3.2e-2 both with and without the W-pool
    # kernel (verify_wpool_tpu.py: bitwise-identical paths)
    assert err < 5e-2, err
    assert np.all(np.isfinite(a))

    # ---- throughput --------------------------------------------------------
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
        print(f"eval B={bsz}: {tput:.1f} patches/s", flush=True)


if __name__ == "__main__":
    main()
