"""Attribute time inside the production CT eval kernels (round 3).

The eval stage budget (docs/PERFORMANCE.md) says the three CT kernel
stages cost in_conv ~9 ms, down1 ~5 ms, decoder ~13.3 ms at B=128 while
their HBM floors are <1 ms — so the kernels are compute-bound, but on
*what*?  This experiment times the production `fused_double_conv_ct` at
the flagship shapes, then re-times it with pieces of the per-tile work
ablated (monkeypatched `_combine_dx` variants, since the dx-plane combine
with its lane rolls + edge selects is the prime suspect):

  full       : production kernel
  no_select  : combine without the reflect-edge jnp.where fixes
  no_roll    : (y0 + y1 + y2)*s + b — no rolls, no selects
  y1_only    : y1*s + b — no plane adds at all (measures the dot + copies)

The deltas attribute per-tile time to rolls / selects / plane adds.
Wrong math is fine — identical memory traffic and dot shapes.

Also times the decoder's standalone CT upsample (matmul form) and its two
einsum halves, for the upsample-fusion decision.

Run (TPU): python experiments/exp_kernel_attrib.py
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
    align8, fused_double_conv_ct, pack_w3x3, pick_th)

B, S, H, W, F = 128, 2, 256, 256, 21
N = S * B


def timed(fn, *args, reps=10):
    r = fn(*args)
    jnp.asarray(r).block_until_ready() if False else None
    float(jnp.sum(jnp.asarray(r)[:1, :1].astype(jnp.float32)))

    def run_k(k):
        t0 = time.perf_counter()
        r = None
        for _ in range(k):
            r = fn(*args)
        float(jnp.sum(jnp.asarray(r)[:1, :1].astype(jnp.float32)))
        return time.perf_counter() - t0

    run_k(2)
    t1 = min(run_k(1) for _ in range(3))
    tk = min(run_k(reps + 1) for _ in range(2))
    return (tk - t1) / reps


# ---------------------------------------------------------------- variants
_orig_combine = ct_conv._combine_dx


def _combine_no_select(y_ref, mpad, m, w, lanes, s_ref, b_ref, interpret):
    y0 = y_ref[0:m, 0:lanes]
    y1 = y_ref[mpad:mpad + m, 0:lanes]
    y2 = y_ref[2 * mpad:2 * mpad + m, 0:lanes]
    out = (ct_conv._roll(y0, 1, interpret) + y1
           + ct_conv._roll(y2, -1, interpret)) * s_ref[0:m] + b_ref[0:m]
    return jnp.maximum(out, 0.0)


def _combine_no_roll(y_ref, mpad, m, w, lanes, s_ref, b_ref, interpret):
    y0 = y_ref[0:m, 0:lanes]
    y1 = y_ref[mpad:mpad + m, 0:lanes]
    y2 = y_ref[2 * mpad:2 * mpad + m, 0:lanes]
    out = (y0 + y1 + y2) * s_ref[0:m] + b_ref[0:m]
    return jnp.maximum(out, 0.0)


def _combine_y1_only(y_ref, mpad, m, w, lanes, s_ref, b_ref, interpret):
    y1 = y_ref[mpad:mpad + m, 0:lanes]
    return jnp.maximum(y1 * s_ref[0:m] + b_ref[0:m], 0.0)


VARIANTS = [
    ("full", _orig_combine),
    ("no_select", _combine_no_select),
    ("no_roll", _combine_no_roll),
    ("y1_only", _combine_y1_only),
]


def bench_stage(name, make_call):
    base = None
    for vname, comb in VARIANTS:
        ct_conv._combine_dx = comb
        try:
            t = timed(make_call(), reps=8) * 1e3
        except Exception as e:
            print(f"{name:10s} {vname:10s} ERROR {str(e)[:120]}", flush=True)
            continue
        finally:
            ct_conv._combine_dx = _orig_combine
        if base is None:
            base = t
        print(f"{name:10s} {vname:10s} {t:7.2f} ms  (delta {base - t:+6.2f})",
              flush=True)


def main():
    key = jax.random.key(0)
    cdt = jnp.bfloat16

    # ---- in_conv: cin=3 -> 21 -> 21 at 256^2, fused H-pool ---------------
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

    def mk_inconv():
        th = pick_th(H, W, cin, 0, f, f, fa)

        @jax.jit
        def run(x):
            y, hp = fused_double_conv_ct(
                x, w1p, s1, sh1, w2p, s1, sh1,
                h=H, w=W, th=th, c1=cin, m=f, o=f, emit_hpool=True)
            return y
        return lambda: run(x)

    bench_stage("in_conv", mk_inconv)

    # ---- down1: 24 -> 42 -> 42 at 128^2 ----------------------------------
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

    def mk_down1():
        th = pick_th(h2, w2_, fa, 0, f2, f2, align8(f2))

        @jax.jit
        def run(xp):
            return fused_double_conv_ct(
                xp, w3p, s3, sh3, w4p, s3, sh3,
                h=h2, w=w2_, th=th, c1=fa, m=f2, o=f2)
        return lambda: run(xp)

    bench_stage("down1", mk_down1)

    # ---- decoder: (24 skip + 48 up) -> 31 -> 21 -> 1x1(2) at 256^2 --------
    c_up = 2 * F * S // 2  # 42
    c_up_a = align8(c_up)
    mid = (F + c_up) // 2  # 31
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

    def mk_dec():
        th = pick_th(H, W, fa, c_up_a, mid, F, oca)

        @jax.jit
        def run(x1s, xup):
            return fused_double_conv_ct(
                x1s, wd1, sm, shm, wd2, so, sho,
                h=H, w=W, th=th, c1=fa, m=mid, o=F,
                x2=xup, c2=c_up_a, n2_images=B, wo=wo, bo=bo)
        return lambda: run(x1s, xup)

    bench_stage("decoder", mk_dec)

    # ---- upsample halves (matmul form) ------------------------------------
    from mimo_unet_tpu.models.fast_path import _upsample_ct_x2
    from mimo_unet_tpu.ops.resize import _interp_matrix

    hq, wq = H // 4, W // 4  # core output resolution 64^2 -> decoder 128^2?
    # decoder upsample at the flagship: core out [b, 128, 128, 42] -> 256^2
    hc, wc = H // 2, W // 2
    xu = jax.random.normal(key, (c_up_a, B * hc * wc), jnp.float32).astype(cdt)

    t = timed(jax.jit(lambda v: _upsample_ct_x2(v, B, hc, wc)), xu) * 1e3
    print(f"upsample   full       {t:7.2f} ms", flush=True)

    mh = jnp.asarray(_interp_matrix(hc, 2 * hc)).astype(cdt)
    mw = jnp.asarray(_interp_matrix(wc, 2 * wc)).astype(cdt)

    @jax.jit
    def h_only(v):
        x4 = v.reshape(c_up_a, B, hc, wc)
        return jnp.einsum("oh,cnhw->cnow", mh, x4).reshape(c_up_a, -1)

    @jax.jit
    def w_only(v):
        x4 = v.reshape(c_up_a, B, hc, wc)
        return jnp.einsum("pw,cnhw->cnhp", mw, x4).reshape(c_up_a, -1)

    t = timed(h_only, xu) * 1e3
    print(f"upsample   h_einsum   {t:7.2f} ms", flush=True)
    t = timed(w_only, xu) * 1e3
    print(f"upsample   w_einsum   {t:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
