"""Probe input-DMA throughput for Blocked vs Element block specs.

Kernel = copy a th*W-row slice of the input block to the output.  Measures
effective HBM read bandwidth per variant (decoder-ish shape, B=64).

Variants:
  blocked        : Blocked (1, C, th*W), non-overlapping
  elem_nopad     : Element, non-overlapping, no padding
  elem_overlap   : Element (th+8 rows), overlapping windows, no padding
                   (array carries 12 junk rows so reads stay in bounds)
  elem_pad       : Element (th+8 rows), overlapping, padding=(0, 8W)
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

C, H, W, B, TH = 63, 256, 256, 64, 16
C2 = 64


def timed(fn, *args, reps=20):
    r = fn(*args)
    jax.block_until_ready(r)

    def run_k(k):
        t0 = time.perf_counter()
        r = None
        for _ in range(k):
            r = fn(*args)
        float(jnp.sum(r[0, 0, :2].astype(jnp.float32)))
        return time.perf_counter() - t0

    run_k(2)
    t1 = min(run_k(1) for _ in range(3))
    tk = min(run_k(reps + 1) for _ in range(2))
    return (tk - t1) / reps


def k_copy(x_ref, o_ref, *, off):
    o_ref[0] = x_ref[0, :, off * W:(off + TH) * W]


def k_copy_blocked(x_ref, o_ref):
    o_ref[0] = x_ref[0]


def make(variant, c=C):
    C = c
    if variant == "blocked":
        rows = TH
        in_spec = pl.BlockSpec((1, C, TH * W), lambda b, i: (b, 0, i),
                               memory_space=pltpu.VMEM)
        kern = k_copy_blocked
        pad_rows = 0
    elif variant == "elem_nopad":
        rows = TH
        in_spec = pl.BlockSpec(
            (pl.Element(1), pl.Element(C), pl.Element(TH * W)),
            lambda b, i: (b, 0, pl.multiple_of(i * TH * W, 128)),
            memory_space=pltpu.VMEM)
        kern = functools.partial(k_copy, off=0)
        pad_rows = 0
    elif variant == "elem_overlap":
        rows = TH + 8
        in_spec = pl.BlockSpec(
            (pl.Element(1), pl.Element(C), pl.Element((TH + 8) * W)),
            lambda b, i: (b, 0, pl.multiple_of(i * TH * W, 128)),
            memory_space=pltpu.VMEM)
        kern = functools.partial(k_copy, off=4)
        pad_rows = 12
    elif variant == "elem_pad":
        rows = TH + 8
        in_spec = pl.BlockSpec(
            (pl.Element(1), pl.Element(C),
             pl.Element((TH + 8) * W, padding=(0, 8 * W))),
            lambda b, i: (b, 0, pl.multiple_of(i * TH * W, 128)),
            memory_space=pltpu.VMEM)
        kern = functools.partial(k_copy, off=4)
        pad_rows = 4

    @jax.jit
    def run(x):
        xf = x.reshape(B, C, H * W)
        if pad_rows:
            xf = jnp.concatenate(
                [xf, xf[:, :, :pad_rows * W]], axis=-1)
        return pl.pallas_call(
            kern,
            grid=(B, H // TH),
            in_specs=[in_spec],
            out_specs=pl.BlockSpec((1, C, TH * W), lambda b, i: (b, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, C, H * W), x.dtype),
        )(xf)

    return run


def main():
    global TH
    for th in (16, 32, 64, 128):
        TH = th
        x = jax.random.normal(jax.random.key(0), (B, 64, H, W),
                              jnp.float32).astype(jnp.bfloat16)
        print(f"-- TH={th}", flush=True)
        run_variants(x, 64)


def run_variants(x, c):
    C = c
    for variant in ("blocked", "elem_overlap"):
        try:
            fn = make(variant, c)
            t = timed(fn, x)
            rows = TH + 8 if "overlap" in variant or variant == "elem_pad" else TH
            gb = B * (H // TH) * C * rows * W * 2 / 1e9
            wgb = B * C * H * W * 2 / 1e9
            print(f"C={c} {variant}: {t*1e3:.2f} ms  read {gb/t:.0f} GB/s "
                  f"combined {(gb+wgb)/t:.0f} GB/s", flush=True)
        except Exception as e:
            msg = str(e).split(chr(10))[0][:150]
            print(f"{variant}: ERROR {type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()
