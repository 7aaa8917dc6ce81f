"""Per-kernel tile-height sweep for the CT train conv family.

pick_th_train returns one th (<=16) gated by the dx kernel's VMEM
footprint, and the bwd rule further clamps th to 16 — but the fwd and dw
kernels have much smaller footprints and could run deeper tiles.  This
sweeps th independently for fwd / dx / dw at each of the six flagship
production conv shapes (B=128, 256px, S=2) to size the per-kernel win.

Run (TPU): python experiments/exp_train_th.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import jax
import jax.numpy as jnp

from mimo_unet_tpu.ops.pallas.ct_conv import align8, pack_w3x3
from mimo_unet_tpu.ops.pallas import ct_train
from mimo_unet_tpu.ops.pallas.ct_train import _conv_fwd, _conv_dx, _conv_dw

B, S, F = 128, 2, 21
N = S * B


def timed(fn, reps=8):
    r = fn()
    r0 = r[0] if isinstance(r, tuple) else r
    float(jnp.sum(jnp.asarray(r0)[:1, :1].astype(jnp.float32)))

    def run_k(k):
        t0 = time.perf_counter()
        r = None
        for _ in range(k):
            r = fn()
        r0 = r[0] if isinstance(r, tuple) else r
        float(jnp.sum(jnp.asarray(r0)[:1, :1].astype(jnp.float32)))
        return time.perf_counter() - t0

    run_k(2)
    t1 = min(run_k(1) for _ in range(3))
    tk = min(run_k(reps + 1) for _ in range(2))
    return (tk - t1) / reps


def sweep(name, h, w, c1, c2, o, n2, prologue):
    key = jax.random.key(0)
    cdt = jnp.bfloat16
    c1a = align8(c1)
    c2a = align8(c2) if c2 else 0
    cp = c1a + c2a
    oa = align8(o)
    n_l = N
    x1 = jax.random.normal(key, (c1a if prologue else c1, n_l * h * w),
                           jnp.float32).astype(cdt)
    # fwd/dw take the raw (c1) input; build both
    x1_raw = x1[:c1]
    x2 = (jax.random.normal(key, (c2, n2 * h * w), jnp.float32).astype(cdt)
          if c2 else None)
    blocks = [jax.random.normal(jax.random.key(1), (3, 3, c1, o)) * 0.1]
    if c2:
        blocks.append(
            jax.random.normal(jax.random.key(2), (3, 3, c2, o)) * 0.1)
    wp = jnp.stack([pack_w3x3(blocks) for _ in range(S)])
    if prologue:
        scale = jnp.ones((S, cp, 1), jnp.float32)
        shift = jnp.zeros((S, cp, 1), jnp.float32)
    else:
        scale = shift = None
    scale_k = scale if prologue else jnp.ones((S, cp, 1), jnp.float32)
    shift_k = shift if prologue else jnp.zeros((S, cp, 1), jnp.float32)
    g = jax.random.normal(key, (oa, n_l * h * w), jnp.float32).astype(cdt)

    def transpose_pack(wg):
        out = jnp.zeros((3 * oa, 3 * cp), wg.dtype)
        for dy in range(3):
            for dxw in range(3):
                blk = wg[dy * cp:(dy + 1) * cp, dxw * oa:(dxw + 1) * oa]
                out = out.at[dy * oa:(dy + 1) * oa,
                             dxw * cp:(dxw + 1) * cp].set(blk.T)
        return out

    wtp = jnp.stack([transpose_pack(wp[i]) for i in range(S)])
    if prologue:
        from mimo_unet_tpu.ops.pallas.ct_train import _pad_rows
        x1p = _pad_rows(x1_raw, align8(c1))
        x2p = _pad_rows(x2, align8(c2)) if c2 else None
    else:
        x1p = x2p = None

    for th in (16, 32, 64):
        if h % th:
            continue
        def fwd_f(x1_raw, x2, wp, scale, shift, th=th):
            return _conv_fwd(
                x1_raw, x2, wp, scale, shift, h=h, w=w, th=th, c1=c1,
                c2=c2, o=o, n2_images=n2, prologue=prologue,
                interpret=False)[0]

        def dx_f(g, x1p, x2p, wtp, scale_k, shift_k, th=th):
            return _conv_dx(
                g, x1p, x2p, wtp, scale_k, shift_k, h=h, w=w, th=th, c1=c1,
                c2=c2, o=o, prologue=prologue, interpret=False,
                out_dtype=cdt)[0]

        def dw_f(g, x1_raw, x2, scale_k, shift_k, th=th):
            return _conv_dw(
                g, x1_raw, x2, scale_k, shift_k, h=h, w=w, th=th, c1=c1,
                c2=c2, o=o, n2_images=n2, prologue=prologue,
                interpret=False)

        for kname, f, args in (
            ("fwd", fwd_f, (x1_raw, x2, wp, scale_k, shift_k)),
            ("dx ", dx_f, (g, x1p, x2p, wtp, scale_k, shift_k)),
            ("dw ", dw_f, (g, x1_raw, x2, scale_k, shift_k)),
        ):
            try:
                jf = jax.jit(f)
                t = timed(lambda: jf(*args)) * 1e3
                print(f"{name:12s} {kname} th={th:<3d} {t:7.2f} ms",
                      flush=True)
            except Exception as e:
                print(f"{name:12s} {kname} th={th:<3d} ERROR {str(e)[:90]}",
                      flush=True)


def main():
    f, fa = F, align8(F)
    f2, f2a = 2 * F, align8(2 * F)
    c_up = 2 * F * S // 2
    c_up_a = align8(c_up)
    mid = (F + c_up) // 2
    mid_a = align8(mid)
    sweep("inconv.c1", 256, 256, 3, 0, f, 0, False)
    sweep("inconv.c2", 256, 256, fa, 0, f, 0, True)
    sweep("down1.c1", 128, 128, fa, 0, f2, 0, False)
    sweep("down1.c2", 128, 128, f2a, 0, f2, 0, True)
    sweep("dec.c1", 256, 256, fa, c_up_a, mid, B, False)
    sweep("dec.c2", 256, 256, mid_a, 0, f, 0, True)


if __name__ == "__main__":
    main()
