"""Spatial (2-D mesh) partitioning on the real chip — VERDICT r2 item 8.

Only one physical TPU is available on this testbed, so this measures what
a single chip CAN establish about the batch x spatial sharding of the
256-px flagship (the multi-device execution itself is validated on the
8-device CPU mesh: tests/test_parallel.py + dryrun MULTICHIP artifacts):

1. **On-chip equivalence**: the spatially-annotated program (jit with
   ``image_sharding`` in_shardings over a 1x1 2-D mesh) must produce the
   unsharded forward's exact outputs on TPU hardware.  This compiles and
   runs the same GSPMD-partitioned HLO path the multi-chip mesh uses.
2. **Shard-shape scaling projection**: per-device compute at spatial=k is
   the forward at H/k rows (+1 halo row per 3x3 conv boundary, exchanged
   over ICI).  Timing the forward at H=256/128/64 bounds the compute-side
   parallel efficiency; the halo bytes per step (sum over stages of
   2 rows x W x C x B x 2 bytes) bound the ICI cost at the v5e's ~45 GB/s
   per-link ICI.

Run (TPU): python experiments/exp_spatial_tpu.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import jax
import jax.numpy as jnp
import numpy as np

from mimo_unet_tpu.parallel.mesh import (
    image_sharding, make_mesh_2d, replicated_sharding)
from mimo_unet_tpu.tasks import MimoUnetTask
from mimo_unet_tpu.transforms import repeat_subnetworks


def timed(fn, *args, reps=10):
    r = fn(*args)
    float(jnp.sum(r[:1, :1, :1].astype(jnp.float32))
          if hasattr(r, "ndim") else r)

    def run_k(k):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = fn(*args)
        float(jnp.sum(out.reshape(-1)[:1].astype(jnp.float32)))
        return time.perf_counter() - t0

    run_k(2)
    t1 = min(run_k(1) for _ in range(3))
    tk = min(run_k(reps + 1) for _ in range(2))
    return (tk - t1) / reps


def main():
    # XLA path: the CT kernels gate off under a spatial mesh by design
    task = MimoUnetTask(
        in_channels=3, out_channels=2, num_subnetworks=2,
        filter_base_count=21, loss="laplace_nll", seed=0,
        compute_dtype="bfloat16", ct_kernels="off",
    )
    state = task.init_state(steps_per_epoch=1)
    b = 32
    x = jax.random.uniform(jax.random.key(0), (b, 256, 256, 3), jnp.float32)
    xs = repeat_subnetworks(x, task.num_subnetworks)

    def fwd(params, model_state, xs):
        (p1, p2), _ = task.forward(params, model_state, xs, train=False)
        return p1

    # ---- 1. equivalence of the spatially-annotated program on-chip ----
    mesh = make_mesh_2d(1, 1)
    shard = image_sharding(mesh, rank=5)
    repl = replicated_sharding(mesh)
    f_plain = jax.jit(fwd)
    f_spatial = jax.jit(fwd, in_shardings=(repl, repl, shard))
    ref = f_plain(state.params, state.model_state, xs)
    got = f_spatial(state.params, state.model_state,
                    jax.device_put(xs, shard))
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    print(f"spatial(1x1) vs unsharded on TPU: max|diff| = {err:.3e}")
    assert err == 0.0, err

    # ---- 2. shard-shape scaling: per-device work at spatial=k ----
    base = None
    for k in (1, 2, 4):
        hk = 256 // k
        xk = jax.random.uniform(jax.random.key(1), (b, 2, hk, 256, 3))
        tk = timed(jax.jit(fwd), state.params, state.model_state,
                   jax.device_put(xk)) * 1e3
        if base is None:
            base = tk
        eff = base / (k * tk)
        print(f"spatial={k}: per-device H={hk} fwd {tk:7.2f} ms  "
              f"compute-side parallel efficiency {eff * 100:5.1f}%")

    # halo bytes per forward (2 boundary rows per conv stage, bf16)
    f, s_ = 21, 2
    stages = [  # (H, W, C) of each 3x3 conv input at B images
        (256, 256, 3), (256, 256, f), (128, 128, f), (128, 128, 2 * f),
        (64, 64, 2 * f * s_), (64, 64, 4 * f * s_),
        (32, 32, 4 * f * s_), (32, 32, 8 * f * s_),
        (16, 16, 8 * f * s_), (16, 16, 8 * f * s_),
        (32, 32, 12 * f * s_), (32, 32, 4 * f * s_),
        (64, 64, 6 * f * s_), (64, 64, 2 * f * s_),
        (128, 128, 3 * f * s_), (128, 128, f * s_),
        (256, 256, f + 2 * f * s_ // 2), (256, 256, f),
    ]
    halo = sum(2 * wd * c * 2 for (_, wd, c) in stages) * b * s_
    print(f"halo bytes per fwd step (B={b}, both subnets): "
          f"{halo / 1e6:.1f} MB -> ~{halo / 45e9 * 1e3:.2f} ms at 45 GB/s ICI")


if __name__ == "__main__":
    main()
