"""Probe: 2D channel-major layout [C, B*H*W] — blocks become pure 2D
[C, th*W] slabs on a 1D grid.  Does this reach the ~650 GB/s that
[rows, ncols] 2D blocks achieve, vs ~330 for 3D [1, C, th*W] blocks?"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C, H, W, B = 64, 256, 256, 64


def timed(fn, *args, reps=20):
    r = fn(*args)
    jax.block_until_ready(r)

    def run_k(k):
        t0 = time.perf_counter()
        r = None
        for _ in range(k):
            r = fn(*args)
        float(jnp.sum(r[:1, :2].astype(jnp.float32)))
        return time.perf_counter() - t0

    run_k(2)
    t1 = min(run_k(1) for _ in range(3))
    tk = min(run_k(reps + 1) for _ in range(2))
    return (tk - t1) / reps


def main():
    x = jax.random.normal(jax.random.key(0), (C, B * H * W),
                          jnp.float32).astype(jnp.bfloat16)

    for th, variant in [(16, "blocked"), (64, "blocked"),
                        (16, "elem_overlap"), (64, "elem_overlap")]:
        n = B * H // th  # tiles across the fused batch*H dim
        if variant == "blocked":
            in_spec = pl.BlockSpec((C, th * W), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)

            def kern(x_ref, o_ref):
                o_ref[...] = x_ref[...]
            rows = th
        else:
            in_spec = pl.BlockSpec(
                (C, pl.Element((th + 8) * W, padding=(0, 8 * W))),
                lambda i: (0, pl.multiple_of(i * th * W, 128)),
                memory_space=pltpu.VMEM)

            def kern(x_ref, o_ref):
                o_ref[...] = x_ref[:, 4 * W:(4 + th) * W]
            rows = th + 8

        @jax.jit
        def run(a):
            return pl.pallas_call(
                kern,
                grid=(n,),
                in_specs=[in_spec],
                out_specs=pl.BlockSpec((C, th * W), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((C, B * H * W), a.dtype),
            )(a)

        try:
            t = timed(run, x)
            rgb = n * C * rows * W * 2 / 1e9
            wgb = C * B * H * W * 2 / 1e9
            print(f"2D {variant} th={th}: {t*1e3:.2f} ms  read {rgb/t:.0f} "
                  f"GB/s  combined {(rgb+wgb)/t:.0f} GB/s", flush=True)
        except Exception as e:
            print(f"2D {variant} th={th}: ERROR {str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
