"""Measure achievable HBM bandwidth: XLA copy/add vs Pallas blocked copies
at different block sizes."""

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


GB = 1e9


def main():
    n_rows, n_cols = 4096, 65536  # 512 MB bf16
    x = jax.random.normal(jax.random.key(0), (n_rows, n_cols),
                          jnp.float32).astype(jnp.bfloat16)
    nbytes = x.size * 2

    add1 = jax.jit(lambda a: a + 1)
    t = timed(add1, x)
    print(f"xla add1 (r+w): {t*1e3:.2f} ms  {2*nbytes/t/GB:.0f} GB/s",
          flush=True)

    t = timed(jax.jit(lambda a: a[:, :-2] + a[:, 2:]), x)
    print(f"xla shift-add (2r+w): {t*1e3:.2f} ms  {3*nbytes/t/GB:.0f} GB/s",
          flush=True)

    def k_copy(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1

    for rows in (8, 16, 32):
        @jax.jit
        def prun(a, rows=rows):
            return pl.pallas_call(
                k_copy,
                grid=(n_rows // rows,),
                in_specs=[pl.BlockSpec((rows, n_cols), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((rows, n_cols), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((n_rows, n_cols), a.dtype),
            )(a)
        try:
            t = timed(prun, x)
            blk = rows * n_cols * 2 / 1e6
            print(f"pallas add1 block={rows}x{n_cols} ({blk:.0f}MB): "
                  f"{t*1e3:.2f} ms  {2*nbytes/t/GB:.0f} GB/s", flush=True)
        except Exception as e:
            print(f"pallas rows={rows}: ERROR {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
