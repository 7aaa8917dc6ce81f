"""Micro-bench: which in-kernel matmul formulation does Mosaic lower fast?

Isolates the conv kernel's inner dots from pipeline/DMA: a single VMEM
input block per step, grid of identical steps, measuring achieved TF/s.

Forms:
  dot3d_scratch : 9x dot_general([C,M], [C,R,W]) += into f32 scratch
  dot3d_value   : same but accumulated as a value (vregs/spill)
  dot2d         : 9x dot_general([C,M], [C,RW]) += (rhs pre-flattened)
  dot2d_bigk    : 1x dot_general([9C,M], [9C,RW]) (im2col-shaped operands)
"""

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

C, M, R, W = 63, 31, 34, 256
RW = R * W
STEPS = 256


def timed(fn, *args, reps=10):
    r = fn(*args)
    float(jnp.sum(r[:2, :2].astype(jnp.float32)))

    def run_k(k):
        t0 = time.perf_counter()
        r = None
        for _ in range(k):
            r = fn(*args)
        float(jnp.sum(r[:2, :2].astype(jnp.float32)))
        return time.perf_counter() - t0

    run_k(2)
    t1 = min(run_k(1) for _ in range(3))
    tk = min(run_k(reps + 1) for _ in range(2))
    return (tk - t1) / reps


def bench(name, kernel, in_shape, out_shape, scratch_shapes, flops_per_step):
    x = jax.random.normal(jax.random.key(0), in_shape, jnp.float32).astype(
        jnp.bfloat16)
    w = jax.random.normal(jax.random.key(1), (9 * C, M), jnp.float32).astype(
        jnp.bfloat16) * 0.1

    @jax.jit
    def run(x, w):
        return pl.pallas_call(
            kernel,
            grid=(STEPS,),
            in_specs=[
                pl.BlockSpec(in_shape, lambda i: (0,) * len(in_shape),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((9 * C, M), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(out_shape, lambda i: (0,) * len(out_shape),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            scratch_shapes=scratch_shapes,
            interpret=False,
        )(x, w)

    try:
        t = timed(run, x, w)
        tf = flops_per_step * STEPS / t / 1e12
        print(f"{name}: {t*1e3:.2f} ms  {tf:.1f} TF/s", flush=True)
    except Exception as e:
        msg = str(e).split(chr(10))[0][:160]
        print(f"{name}: ERROR {type(e).__name__}: {msg}", flush=True)


def k_dot3d_scratch(x_ref, w_ref, o_ref, acc):
    acc[...] = jnp.zeros_like(acc)
    for t in range(9):
        acc[...] += jax.lax.dot_general(
            w_ref[t * C:(t + 1) * C], x_ref[...],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[...] = acc[...]


def k_dot3d_value(x_ref, w_ref, o_ref):
    acc = jnp.zeros((M, R, W), jnp.float32)
    for t in range(9):
        acc += jax.lax.dot_general(
            w_ref[t * C:(t + 1) * C], x_ref[...],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[...] = acc


def k_dot2d(x_ref, w_ref, o_ref, acc):
    acc[...] = jnp.zeros_like(acc)
    for t in range(9):
        acc[...] += jax.lax.dot_general(
            w_ref[t * C:(t + 1) * C], x_ref[...],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[...] = acc[...]


def k_dot2d_bigk(x_ref, w_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        w_ref[...], x_ref[...],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def k_copy_then_bigk(x_ref, w_ref, o_ref, col):
    # simulate im2col: 9 shifted copies (here: same src) then one big dot
    for t in range(9):
        col[t * C:(t + 1) * C] = x_ref[0:C]
    o_ref[...] = jax.lax.dot_general(
        w_ref[...], col[...],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def k_reshape_probe(x_ref, w_ref, o_ref):
    # can Mosaic reshape a 3D VMEM value [C,R,W] -> [C, R*W]?
    x2 = x_ref[...].reshape(C, RW)
    o_ref[...] = jax.lax.dot_general(
        w_ref[0:C], x2,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def main():
    f9 = 2 * 9 * C * M * RW
    bench("dot3d_scratch", k_dot3d_scratch, (C, R, W), (M, R, W),
          [pltpu.VMEM((M, R, W), jnp.float32)], f9)
    bench("dot3d_value", k_dot3d_value, (C, R, W), (M, R, W), [], f9)
    bench("dot2d", k_dot2d, (C, RW), (M, RW),
          [pltpu.VMEM((M, RW), jnp.float32)], f9)
    bench("dot2d_bigk", k_dot2d_bigk, (9 * C, RW), (M, RW), [], f9)
    bench("copy_then_bigk", k_copy_then_bigk, (9 * C, RW), (M, RW),
          [pltpu.VMEM((9 * C, RW), jnp.bfloat16)], f9)
    bench("reshape_probe", k_reshape_probe, (C, R, W), (M, RW), [], f9 / 9)


if __name__ == "__main__":
    main()
