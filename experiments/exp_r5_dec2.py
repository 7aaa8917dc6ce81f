"""Round 5: decompose the production decoder kernel's 14.9 ms into
dot1 / dot2 / column-build / x2-staging buckets by ablating each piece
(numerics intentionally wrong in ablated variants; timing only).

FLOP math says dot1+dot2+out at the 127 TF/s big-K ceiling cost ~7.6 ms,
so ~7 ms should be in-VMEM copies (the 3x dy column builds) + staging.

Run (TPU): python experiments/exp_r5_dec2.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from mimo_unet_tpu.ops.pallas import ct_conv
from mimo_unet_tpu.ops.pallas.ct_conv import (
    align8, _build_cols, _combine_dx, fused_double_conv_ct, pack_w3x3,
    pick_th)

B, S, H, W, F = 128, 2, 256, 256, 21
N = S * B

ABLATE = set()


def _make_kernel_ablated(*, th, w, c1, c2, m, o, out_c, fuse_out,
                         emit_hpool, tpi, bt2, out_dtype, interpret,
                         w_img=None, group_minor_g=0, gt=0, x2_half=0):
    r1 = th + 2
    w_img = w_img or w
    c1a = align8(c1)
    c2a = align8(c2) if c2 else 0
    cp = c1a + c2a
    ma, oa = align8(m), align8(o)
    h = tpi * th
    ab = frozenset(ABLATE)

    def kernel(*refs):
        refs = list(refs)
        x1_ref = refs.pop(0)
        x2_ref = refs.pop(0) if c2 else None
        (w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
         wo_ref, bo_ref, out_ref) = refs[:9]
        if x2_half:
            col, ys, mid, x2s = refs[-4:]
        else:
            col, ys, mid = refs[-3:]
        i = pl.program_id(0)
        if group_minor_g:
            i = (i % group_minor_g) * gt + i // group_minor_g
        first_img = (i % tpi) == 0
        last_img = (i % tpi) == tpi - 1

        if "cols1" in ab:
            # one dy copy only (1/3 of the x1 column build)
            col[cp + 0:cp + c1] = x1_ref[:, 2 * w:(2 + r1) * w]
        elif "nocols" not in ab:
            _build_cols(col, x1_ref, cp=cp, base=0, c=c1, w=w, th=th,
                        clamped=i == 0, first_img=first_img,
                        last_img=last_img, i=i)
        if c2:
            if x2_half:
                h2 = x2_half
                pos = i % bt2
                i_loc = pos % tpi
                r_start = jnp.where(pos == 0, 0, i_loc * th - 4)
                base = jnp.maximum(
                    (i_loc * th - 4) * (h2 - 1) // (h - 1), 0)
                if "nolerp" in ab:
                    # bulk copy instead of the 40-row lerp loop
                    for rep in range(2):
                        x2s[:, rep * (th // 2 + 4) * w:
                            (rep * (th // 2 + 4) + th // 2 + 4) * w] = (
                            x2_ref[:, 0:(th // 2 + 4) * w])
                elif "nostage" not in ab:
                    for j in range(th + 8):
                        r = jnp.clip(r_start + j, 0, h - 1)
                        num = r * (h2 - 1)
                        lo = jnp.minimum(num // (h - 1), h2 - 2)
                        f = ((num - lo * (h - 1)).astype(jnp.float32)
                             / float(h - 1))
                        sl = lo - base
                        a = x2_ref[:, pl.ds(pl.multiple_of(sl * w, 128), w)]
                        b = x2_ref[:, pl.ds(
                            pl.multiple_of((sl + 1) * w, 128), w)]
                        x2s[:, j * w:(j + 1) * w] = (
                            a.astype(jnp.float32) * (1.0 - f)
                            + b.astype(jnp.float32) * f).astype(x2s.dtype)
                x2_src = x2s
            else:
                x2_src = x2_ref
            if "cols1" in ab:
                col[cp + c1a:cp + c1a + c2] = x2_src[:, 0:r1 * w]
            elif "nocols" not in ab:
                _build_cols(col, x2_src, cp=cp, base=c1a, c=c2, w=w, th=th,
                            clamped=(i % bt2) == 0, first_img=first_img,
                            last_img=last_img, i=i)

        if "nodot1" in ab:
            ys[0:3 * ma, :] = col[0:3 * ma, :].astype(jnp.float32)
        else:
            ys[0:3 * ma, :] = jax.lax.dot_general(
                w1_ref[:], col[0:3 * cp, :],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        mid[...] = _combine_dx(
            ys, ma, m, w_img, r1 * w, s1_ref, b1_ref,
            interpret).astype(mid.dtype)

        @pl.when(first_img)
        def _():
            mid[:, 0:w] = mid[:, 2 * w:3 * w]

        @pl.when(last_img)
        def _():
            mid[:, (r1 - 1) * w:r1 * w] = mid[:, (r1 - 3) * w:(r1 - 2) * w]

        if "nocols2" not in ab:
            for dy in range(3):
                col[dy * ma:dy * ma + m, 0:th * w] = mid[:, dy * w:
                                                         (dy + th) * w]
                if ma > m:
                    col[dy * ma + m:(dy + 1) * ma, 0:th * w] = jnp.zeros(
                        (ma - m, th * w), col.dtype)

        if "nodot2" in ab:
            ys[0:3 * oa, 0:th * w] = col[0:3 * oa, 0:th * w].astype(
                jnp.float32)
        else:
            ys[0:3 * oa, 0:th * w] = jax.lax.dot_general(
                w2_ref[:], col[0:3 * ma, 0:th * w],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        y2 = _combine_dx(ys, oa, o, w_img, th * w, s2_ref, b2_ref,
                         interpret)
        if fuse_out:
            out_ref[...] = (jax.lax.dot_general(
                wo_ref[:], y2.astype(out_dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
                + bo_ref[:]).astype(out_dtype)
        else:
            y2b = y2.astype(out_dtype)
            out_ref[0:o, :] = y2b
            if out_c > o:
                out_ref[o:out_c, :] = jnp.zeros((out_c - o, th * w),
                                                out_dtype)

    return kernel


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


def main():
    key = jax.random.key(0)
    cdt = jnp.bfloat16
    fa = align8(F)
    c_up = 2 * F * S // 2
    c_up_a = align8(c_up)
    mid_c = (F + c_up) // 2
    oc, oca = 2, 8
    h2 = H // 2

    x1s = jax.random.normal(key, (fa, N * H * W), jnp.float32).astype(cdt)
    xup_hh = jax.random.normal(
        key, (c_up_a, B * h2 * W), jnp.float32).astype(cdt)
    wd1 = jnp.stack([pack_w3x3(
        [jax.random.normal(jax.random.key(g), (3, 3, fa, mid_c)) * 0.1,
         jax.random.normal(jax.random.key(5 + g),
                           (3, 3, c_up_a, mid_c)) * 0.1])
        for g in range(S)])
    wd2 = jnp.stack([pack_w3x3(
        [jax.random.normal(jax.random.key(11 + g), (3, 3, mid_c, F)) * 0.1])
        for g in range(S)])
    sm = jnp.ones((S, mid_c)); shm = jnp.zeros((S, mid_c))
    so = jnp.ones((S, F)); sho = jnp.zeros((S, F))
    wo = jnp.zeros((S, F, oca)).at[:, :, :oc].set(
        jax.random.normal(jax.random.key(3), (S, F, oc)) * 0.1)
    bo = jnp.zeros((S, oca))
    th_hh = pick_th(H, W, fa, c_up_a, mid_c, F, oca, x2_half_h=True)

    orig = ct_conv._make_kernel
    ct_conv._make_kernel = _make_kernel_ablated
    try:
        for name, flags in [
            ("full", set()),
            ("nodot1", {"nodot1"}),
            ("nodot2", {"nodot2"}),
            ("nodots", {"nodot1", "nodot2"}),
            ("cols1", {"cols1"}),
            ("nocols", {"nocols"}),
            ("nocols2", {"nocols2"}),
            ("nolerp", {"nolerp"}),
            ("nostage", {"nostage"}),
            ("bare", {"nodot1", "nodot2", "nocols", "nocols2", "nostage"}),
        ]:
            ABLATE.clear()
            ABLATE.update(flags)

            def run(x1s, xup):
                return fused_double_conv_ct(
                    x1s, wd1, sm, shm, wd2, so, sho,
                    h=H, w=W, th=th_hh, c1=fa, m=mid_c, o=F,
                    x2=xup, c2=c_up_a, n2_images=B, x2_half_h=True,
                    wo=wo, bo=bo, group_minor=True)

            t = timed(jax.jit(run), x1s, xup_hh, reps=8) * 1e3
            print(f"dec_hh  {name:10s} {t:7.2f} ms", flush=True)
    finally:
        ct_conv._make_kernel = orig


if __name__ == "__main__":
    main()
