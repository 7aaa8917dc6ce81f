"""Attack the core's HBM-bound glue (profile: exp_core_ops.py).

Targets, from the per-op table (B=128, flagship):
  * up{1,2,3}.up+pad+cat: 14.1 ms combined at ~150 GB/s
  * down2.pool: 1.9 ms at 228 GB/s
  * up3.conv2 (84->42 @128^2): 5.1 ms at 25.9 TF/s (42 of 128 lanes)

Variants measured in isolation; winners get integrated and re-measured
end-to-end (micro-wins do not compose on this compiler — PERFORMANCE.md
finding 5).
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from mimo_unet_tpu.ops.conv import reflect_pad1
from mimo_unet_tpu.ops.resize import (
    _interp_matrix, _reflect_extend, upsample_bilinear_x2_align_corners)
from mimo_unet_tpu.ops import max_pool_2x2


def timed(fn, *args, reps=20):
    r = fn(*args)
    leaf = jax.tree.leaves(r)[0]
    float(jnp.sum(leaf.reshape(-1)[:2].astype(jnp.float32)))

    def run_k(k):
        t0 = time.perf_counter()
        r = None
        for _ in range(k):
            r = fn(*args)
        leaf = jax.tree.leaves(r)[0]
        float(jnp.sum(leaf.reshape(-1)[:2].astype(jnp.float32)))
        return time.perf_counter() - t0

    run_k(2)
    t1 = min(run_k(1) for _ in range(3))
    tk = min(run_k(reps + 1) for _ in range(2))
    return (tk - t1) / reps


def main():
    b = 128
    cdt = jnp.bfloat16
    k = jax.random.key(0)

    # ---------------- up3 glue variants (84ch 64^2 -> padded concat 130^2) --
    cu, cs_ = 84, 84
    x = jax.random.normal(k, (b, 64, 64, cu)).astype(cdt)
    skip = jax.random.normal(k, (b, 128, 128, cs_)).astype(cdt)

    base = jax.jit(lambda a, c: jnp.concatenate(
        [reflect_pad1(c), upsample_bilinear_x2_align_corners(a, pad_output=True)],
        axis=-1))
    print(f"up3 glue base (H-mm, W-mm, cat): {timed(base, x, skip)*1e3:.2f} ms",
          flush=True)

    # V1: W matmul first, then H
    mh = jnp.asarray(_reflect_extend(_interp_matrix(64, 128))).astype(cdt)
    mw = jnp.asarray(_reflect_extend(_interp_matrix(64, 128))).astype(cdt)

    def up_wfirst(a):
        y = jnp.einsum("pw,bhwc->bhpc", mw, a)
        return jnp.einsum("oh,bhpc->bopc", mh, y)

    v1 = jax.jit(lambda a, c: jnp.concatenate(
        [reflect_pad1(c), up_wfirst(a)], axis=-1))
    print(f"up3 glue v1 (W-mm first):        {timed(v1, x, skip)*1e3:.2f} ms",
          flush=True)

    # V2: no concat — emit the two parts separately (consumer = split conv)
    v2 = jax.jit(lambda a, c: (reflect_pad1(c),
                               upsample_bilinear_x2_align_corners(
                                   a, pad_output=True)))
    print(f"up3 glue v2 (no concat):         {timed(v2, x, skip)*1e3:.2f} ms",
          flush=True)

    # V3: dot_general with explicit batch dims for the W step
    def up_dg(a):
        y = jnp.einsum("oh,bhwc->bowc", mh, a)  # H step as before
        # W step: [b, oh, w, c] x [w, p] contracting w => [b, oh, c, p]?
        z = lax.dot_general(y, mw.T,
                            dimension_numbers=(((2,), (0,)), ((), ())))
        # z: [b, oh, c, p] -> [b, oh, p, c]
        return jnp.swapaxes(z, -1, -2)

    v3 = jax.jit(lambda a, c: jnp.concatenate(
        [reflect_pad1(c), up_dg(a)], axis=-1))
    print(f"up3 glue v3 (dg + swap):         {timed(v3, x, skip)*1e3:.2f} ms",
          flush=True)

    # ---------------- split conv1: conv(cat) vs conv_a + conv_b ------------
    mid = 84
    wfull = (jax.random.normal(k, (3, 3, cs_ + cu, mid)) * 0.1).astype(cdt)

    def conv(xp, w):
        return lax.conv_general_dilated(
            xp, w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(cdt)

    cat_conv = jax.jit(lambda a, c: conv(
        jnp.concatenate(
            [reflect_pad1(c),
             upsample_bilinear_x2_align_corners(a, pad_output=True)],
            axis=-1), wfull))
    print(f"up3 cat+conv1 (base):            {timed(cat_conv, x, skip)*1e3:.2f} ms",
          flush=True)

    wa, wb = wfull[:, :, :cs_], wfull[:, :, cs_:]
    split_conv = jax.jit(lambda a, c: conv(reflect_pad1(c), wa) + conv(
        upsample_bilinear_x2_align_corners(a, pad_output=True), wb))
    print(f"up3 split conv1 (no cat):        {timed(split_conv, x, skip)*1e3:.2f} ms",
          flush=True)

    # ---------------- pool variants -----------------------------------------
    xp = jax.random.normal(k, (b, 128, 128, 84)).astype(cdt)
    p0 = jax.jit(max_pool_2x2)
    print(f"pool base (reduce_window/custom):{timed(p0, xp)*1e3:.2f} ms",
          flush=True)

    def pool_strided(v):
        a = jnp.maximum(v[:, 0::2, 0::2], v[:, 0::2, 1::2])
        bq = jnp.maximum(v[:, 1::2, 0::2], v[:, 1::2, 1::2])
        return jnp.maximum(a, bq)

    p1 = jax.jit(pool_strided)
    print(f"pool strided slices:             {timed(p1, xp)*1e3:.2f} ms",
          flush=True)

    def pool_reshape(v):
        bb, hh, ww, cc = v.shape
        r = v.reshape(bb, hh // 2, 2, ww // 2, 2, cc)
        return r.max(axis=(2, 4))

    p2 = jax.jit(pool_reshape)
    print(f"pool reshape-max:                {timed(p2, xp)*1e3:.2f} ms",
          flush=True)

    # ---------------- up3.conv2 (84 -> 42 @128^2) variants -------------------
    xin = jax.random.normal(k, (b, 128, 128, 84)).astype(cdt)
    w42 = (jax.random.normal(k, (3, 3, 84, 42)) * 0.1).astype(cdt)

    c0 = jax.jit(lambda v: conv(reflect_pad1(v), w42))
    print(f"up3.conv2 base (42 out):         {timed(c0, xin)*1e3:.2f} ms",
          flush=True)

    for oc_pad in (48, 64, 128):
        wp = jnp.zeros((3, 3, 84, oc_pad), cdt).at[..., :42].set(w42)
        cpd = jax.jit(lambda v, wp=wp: conv(reflect_pad1(v), wp))
        print(f"up3.conv2 padded out={oc_pad}:       "
              f"{timed(cpd, xin)*1e3:.2f} ms", flush=True)

    # feature-group trick: NCHW-ish dimension numbers
    wt = jnp.transpose(w42, (3, 2, 0, 1))  # OIHW
    def conv_nchw(v):
        vt = jnp.transpose(v, (0, 3, 1, 2))
        y = lax.conv_general_dilated(
            jnp.pad(vt, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="reflect"),
            wt, (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32).astype(cdt)
        return jnp.transpose(y, (0, 2, 3, 1))
    c2 = jax.jit(conv_nchw)
    print(f"up3.conv2 NCHW round-trip:       {timed(c2, xin)*1e3:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
