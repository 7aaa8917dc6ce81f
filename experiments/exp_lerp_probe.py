"""Probe the Mosaic primitives the in-kernel H-lerp upsample fusion needs:

  (a) in-kernel dynamic `pl.ds` on the lane dim with x256 scalar offsets
      derived from program_id arithmetic,
  (b) scalar integer // and % on traced scalars inside the kernel,
  (c) f32 scalar->vector broadcast multiply.

The fused kernel will build full-res ext rows of the upsampled skip
branch from a half-res slab: row r of the x2 column = (1-f) * half[lo] +
f * half[lo+1] with lo = floor(r*(h2-1)/(h-1)) and f the fractional part
(align-corners x2, reference components.py:78 Upsample(align_corners=True)).

Run (TPU): python experiments/exp_lerp_probe.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def main():
    h2, w, c = 8, 256, 8
    h = 2 * h2
    th = 4
    n_tiles = h // th

    x_half = jax.random.normal(jax.random.key(0), (c, h2 * w), jnp.float32)

    def kernel(xh_ref, out_ref):
        i = pl.program_id(0)
        for j in range(th):
            r = i * th + j  # full-res row index
            num = r * (h2 - 1)
            lo = num // (h - 1)
            lo = jnp.minimum(lo, h2 - 2)
            f = (num - lo * (h - 1)).astype(jnp.float32) / float(h - 1)
            a = xh_ref[:, pl.ds(pl.multiple_of(lo * w, 128), w)]
            b = xh_ref[:, pl.ds(pl.multiple_of(lo * w + w, 128), w)]
            out_ref[:, j * w:(j + 1) * w] = a * (1.0 - f) + b * f

    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((c, h2 * w), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((c, th * w), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, h * w), jnp.float32),
    )(x_half)

    # reference: align-corners x2 on the row dim
    xr = np.asarray(x_half).reshape(c, h2, w)
    pos = np.arange(h) * (h2 - 1) / (h - 1)
    lo = np.minimum(pos.astype(int), h2 - 2)
    f = (pos - lo)[None, :, None]
    ref = xr[:, lo] * (1 - f) + xr[:, lo + 1] * f
    got = np.asarray(out).reshape(c, h, w)
    err = np.abs(got - ref).max()
    print("max err:", err)
    assert err < 1e-5, err
    print("OK: dynamic lane ds + scalar // % + broadcast mul all lower")


if __name__ == "__main__":
    main()
