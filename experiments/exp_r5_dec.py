"""Round 5: attribute time inside the PRODUCTION decoder kernel config
(x2_half_h + group_minor + fused 1x1), the biggest eval roofline row
(13.5 ms measured vs 7.3 attainable at B=128).

Variants:
  full        : production kernel (x2_half_h staging lerp in the column build)
  no_select   : combine without reflect-edge jnp.where fixes
  no_roll     : (y0+y1+y2)*s+b — no rolls/selects
  y1_only     : y1*s+b — no plane adds (dot + copies only)
  fullres_x2  : same kernel fed the full-res x2 (no staging lerp; includes
                the standalone W+H upsample cost for comparison)
  lerp_only   : x2_half_h kernel with the dots ablated? (not possible
                cheaply) — instead: staging loop cost = full - fullres_x2
                at equal memory traffic minus slab delta.

Run (TPU): python experiments/exp_r5_dec.py
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
    float(jnp.sum(jnp.asarray(fn(*args))[:1, :1].astype(jnp.float32)))

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


def main():
    key = jax.random.key(0)
    cdt = jnp.bfloat16
    fa = align8(F)
    c_up = 2 * F * S // 2  # 42
    c_up_a = align8(c_up)  # 48
    mid = (F + c_up) // 2  # 31
    oc, oca = 2, 8
    h2, w2 = H // 2, W // 2

    x1s = jax.random.normal(key, (fa, N * H * W), jnp.float32).astype(cdt)
    # x2 in production arrives W-upsampled half-H: [c_up_a, B*h2*W]
    xup_hh = jax.random.normal(
        key, (c_up_a, B * h2 * W), jnp.float32).astype(cdt)
    xup_full = jax.random.normal(
        key, (c_up_a, B * H * W), jnp.float32).astype(cdt)
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

    th_hh = pick_th(H, W, fa, c_up_a, mid, F, oca, x2_half_h=True)
    th_fr = pick_th(H, W, fa, c_up_a, mid, F, oca)
    print(f"th production(x2_half_h)={th_hh}  fullres={th_fr}", flush=True)

    @jax.jit
    def run_hh(x1s, xup):
        return fused_double_conv_ct(
            x1s, wd1, sm, shm, wd2, so, sho,
            h=H, w=W, th=th_hh, c1=fa, m=mid, o=F,
            x2=xup, c2=c_up_a, n2_images=B, x2_half_h=True,
            wo=wo, bo=bo, group_minor=True)

    @jax.jit
    def run_fr(x1s, xup):
        return fused_double_conv_ct(
            x1s, wd1, sm, shm, wd2, so, sho,
            h=H, w=W, th=th_fr, c1=fa, m=mid, o=F,
            x2=xup, c2=c_up_a, n2_images=B,
            wo=wo, bo=bo, group_minor=True)

    for vname, comb in [("full", _orig_combine),
                        ("no_select", _combine_no_select),
                        ("no_roll", _combine_no_roll),
                        ("y1_only", _combine_y1_only)]:
        ct_conv._combine_dx = comb
        try:
            t = timed(run_hh, x1s, xup_hh, reps=8) * 1e3
            print(f"dec_hh    {vname:10s} {t:7.2f} ms", flush=True)
        finally:
            ct_conv._combine_dx = _orig_combine

    t = timed(run_fr, x1s, xup_full, reps=8) * 1e3
    print(f"dec_fullres full      {t:7.2f} ms (excl. H-upsample pass)",
          flush=True)

    # standalone W-half upsample (the production pre-pass)
    from mimo_unet_tpu.ops.pallas.ct_resize import (upsample_w2x_ct,
                                                    upsample_w2x_ct_supported)
    xq = jax.random.normal(
        key, (c_up_a, B * h2 * w2), jnp.float32).astype(cdt)
    assert upsample_w2x_ct_supported(c_up_a, B * h2, w2)
    t = timed(jax.jit(
        lambda v: upsample_w2x_ct(v, B * h2, w2)), xq, reps=8) * 1e3
    print(f"w2x_up    standalone  {t:7.2f} ms", flush=True)

    # group_minor ablation on production
    @jax.jit
    def run_hh_nogm(x1s, xup):
        return fused_double_conv_ct(
            x1s, wd1, sm, shm, wd2, so, sho,
            h=H, w=W, th=th_hh, c1=fa, m=mid, o=F,
            x2=xup, c2=c_up_a, n2_images=B, x2_half_h=True,
            wo=wo, bo=bo, group_minor=False)

    t = timed(run_hh_nogm, x1s, xup_hh, reps=8) * 1e3
    print(f"dec_hh    no_gminor   {t:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
