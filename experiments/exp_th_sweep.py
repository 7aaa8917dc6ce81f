"""Tile-height sweep + combine-select variants for the CT eval kernels.

exp_kernel_attrib.py found (a) a ~2.5-5 us/tile fixed cost dominating the
kernels ("y1_only" floors: in_conv 6.3 ms / down1 4.2 / decoder 10.1 at
B=128 while HBM floors are <1 ms), and (b) jnp.where edge selects costing
up to 3.8 ms/stage.  This experiment:

  1. sweeps th (tile height) upward — fewer, deeper tiles amortize the
     per-tile cost; VMEM permitting (th=64 for in_conv/down1, th=32 is
     already the decoder's pick);
  2. times a select-free combine: where(mask, a, b) -> b + maskf*(a-b)
     with an f32 0/1 mask (multiplicative blend), in case Mosaic lowers
     vector select slowly.

Run (TPU): python experiments/exp_th_sweep.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import jax
import jax.numpy as jnp

from mimo_unet_tpu.ops.pallas import ct_conv
from mimo_unet_tpu.ops.pallas.ct_conv import (
    align8, fused_double_conv_ct, pack_w3x3)

B, S, H, W, F = 128, 2, 256, 256, 21
N = S * B


def timed(fn, reps=8):
    r = fn()
    float(jnp.sum(jnp.asarray(r)[:1, :1].astype(jnp.float32)))

    def run_k(k):
        t0 = time.perf_counter()
        r = None
        for _ in range(k):
            r = fn()
        float(jnp.sum(jnp.asarray(r)[:1, :1].astype(jnp.float32)))
        return time.perf_counter() - t0

    run_k(2)
    t1 = min(run_k(1) for _ in range(3))
    tk = min(run_k(reps + 1) for _ in range(2))
    return (tk - t1) / reps


_orig_combine = ct_conv._combine_dx


def _combine_blend(y_ref, mpad, m, w, lanes, s_ref, b_ref, interpret):
    """Edge fixes as multiplicative 0/1 blends instead of vector select."""
    first, last = ct_conv._edge_masks(w, lanes)
    ff = first.astype(jnp.float32)
    lf = last.astype(jnp.float32)
    y0 = y_ref[0:m, 0:lanes]
    y1 = y_ref[mpad:mpad + m, 0:lanes]
    y2 = y_ref[2 * mpad:2 * mpad + m, 0:lanes]
    lp = ct_conv._roll(y0, 1, interpret)
    lm = ct_conv._roll(y0, -1, interpret)
    rp = ct_conv._roll(y2, -1, interpret)
    rm = ct_conv._roll(y2, 1, interpret)
    left = lp + ff * (lm - lp)
    right = rp + lf * (rm - rp)
    out = (left + y1 + right) * s_ref[0:m] + b_ref[0:m]
    return jnp.maximum(out, 0.0)


def main():
    key = jax.random.key(0)
    cdt = jnp.bfloat16
    cin, f = 3, F
    fa = align8(f)

    x = jax.random.normal(key, (cin, N * H * W), jnp.float32).astype(cdt)
    w1p = jnp.stack([pack_w3x3(
        [jax.random.normal(jax.random.key(g), (3, 3, cin, f)) * 0.1])
        for g in range(S)])
    w2p = jnp.stack([pack_w3x3(
        [jax.random.normal(jax.random.key(9 + g), (3, 3, f, f)) * 0.1])
        for g in range(S)])
    s1 = jnp.ones((S, f)); sh1 = jnp.zeros((S, f))

    def run_inconv(th):
        @jax.jit
        def r(x):
            y, hp = fused_double_conv_ct(
                x, w1p, s1, sh1, w2p, s1, sh1,
                h=H, w=W, th=th, c1=cin, m=f, o=f, emit_hpool=True)
            return y
        return lambda: r(x)

    f2 = 2 * F
    h2, w2_ = H // 2, W // 2
    xp = jax.random.normal(key, (fa, N * h2 * w2_), jnp.float32).astype(cdt)
    w3p = jnp.stack([pack_w3x3(
        [jax.random.normal(jax.random.key(g), (3, 3, fa, f2)) * 0.1])
        for g in range(S)])
    w4p = jnp.stack([pack_w3x3(
        [jax.random.normal(jax.random.key(7 + g), (3, 3, f2, f2)) * 0.1])
        for g in range(S)])
    s3 = jnp.ones((S, f2)); sh3 = jnp.zeros((S, f2))

    def run_down1(th):
        @jax.jit
        def r(xp):
            return fused_double_conv_ct(
                xp, w3p, s3, sh3, w4p, s3, sh3,
                h=h2, w=w2_, th=th, c1=fa, m=f2, o=f2)
        return lambda: r(xp)

    c_up = 2 * F * S // 2
    c_up_a = align8(c_up)
    mid = (F + c_up) // 2
    oc, oca = 2, 8
    x1s = jax.random.normal(key, (fa, N * H * W), jnp.float32).astype(cdt)
    xup = jax.random.normal(key, (c_up_a, B * H * W), jnp.float32).astype(cdt)
    wd1 = jnp.stack([pack_w3x3(
        [jax.random.normal(jax.random.key(g), (3, 3, fa, mid)) * 0.1,
         jax.random.normal(jax.random.key(5 + g), (3, 3, c_up_a, mid)) * 0.1])
        for g in range(S)])
    wd2 = jnp.stack([pack_w3x3(
        [jax.random.normal(jax.random.key(11 + g), (3, 3, mid, F)) * 0.1])
        for g in range(S)])
    sm = jnp.ones((S, mid)); shm = jnp.zeros((S, mid))
    so = jnp.ones((S, F)); sho = jnp.zeros((S, F))
    wo = jnp.zeros((S, F, oca)).at[:, :, :oc].set(
        jax.random.normal(jax.random.key(3), (S, F, oc)) * 0.1)
    bo = jnp.zeros((S, oca))

    def run_dec(th):
        @jax.jit
        def r(x1s, xup):
            return fused_double_conv_ct(
                x1s, wd1, sm, shm, wd2, so, sho,
                h=H, w=W, th=th, c1=fa, m=mid, o=F,
                x2=xup, c2=c_up_a, n2_images=B, wo=wo, bo=bo)
        return lambda: r(x1s, xup)

    stages = [
        ("in_conv", run_inconv, (32, 64, 128)),
        ("down1", run_down1, (32, 64)),
        ("decoder", run_dec, (16, 32, 64)),
    ]
    for name, mk, ths in stages:
        for variant, comb in (("sel", _orig_combine), ("blend", _combine_blend)):
            ct_conv._combine_dx = comb
            try:
                for th in ths:
                    try:
                        t = timed(mk(th)) * 1e3
                        print(f"{name:10s} {variant:6s} th={th:<4d} {t:7.2f} ms",
                              flush=True)
                    except Exception as e:
                        print(f"{name:10s} {variant:6s} th={th:<4d} "
                              f"ERROR {str(e)[:100]}", flush=True)
            finally:
                ct_conv._combine_dx = _orig_combine


if __name__ == "__main__":
    main()
