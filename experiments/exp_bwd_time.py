"""Time the train conv kernels (fwd/dx/dw) standalone at model shapes."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import jax
import jax.numpy as jnp

from mimo_unet_tpu.ops.pallas.ct_conv import align8, pack_w3x3
from mimo_unet_tpu.ops.pallas import ct_train as T


def timed(fn, *args, reps=10):
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
    # model shapes at B=64 (n = s*b = 128)
    shapes = [
        ("inconv_c1", 3, 0, 21, 256, 256, 128, 0, 2, False),
        ("inconv_c2", 24, 0, 21, 256, 256, 128, 0, 2, True),
        ("down1_c1", 24, 0, 42, 128, 128, 128, 0, 2, False),
        ("dec_c1", 24, 48, 31, 256, 256, 128, 64, 2, False),
        ("dec_c2", 32, 0, 21, 256, 256, 128, 0, 2, True),
    ]
    th = 16
    for name, c1, c2, o, h, w, n, n2, groups, prologue in shapes:
        ks = jax.random.split(jax.random.key(0), 5)
        x1 = jax.random.normal(ks[0], (c1, n * h * w), jnp.float32).astype(
            jnp.bfloat16)
        x2 = None
        if c2:
            x2 = jax.random.normal(ks[1], (c2, n2 * h * w),
                                   jnp.float32).astype(jnp.bfloat16)
        c1a, c2a = align8(c1), (align8(c2) if c2 else 0)
        cp = c1a + c2a
        oa = align8(o)
        cin = c1 + (c2 or 0)
        wconv = jax.random.normal(ks[2], (groups, 3, 3, cin, o)) * 0.1

        def pack(wg):
            if c2:
                b1 = jnp.zeros((3, 3, c1a, o)).at[:, :, :c1].set(wg[:, :, :c1])
                b2 = jnp.zeros((3, 3, c2a, o)).at[:, :, :c2].set(wg[:, :, c1:])
                return pack_w3x3([b1, b2])
            wide = jnp.zeros((3, 3, c1a, o)).at[:, :, :c1].set(wg)
            return pack_w3x3([wide])

        wp = jnp.stack([pack(wconv[g]) for g in range(groups)]).astype(
            jnp.bfloat16)
        sc = jnp.ones((groups, cp, 1)) if prologue else None
        sh = jnp.zeros((groups, cp, 1)) if prologue else None
        sck = sc if prologue else jnp.ones((groups, cp, 1))
        shk = sh if prologue else jnp.zeros((groups, cp, 1))

        c1k = c1a if True else c1  # kernels consume aligned rows
        x1k = jnp.concatenate(
            [x1, jnp.zeros((c1a - c1, x1.shape[1]), x1.dtype)], axis=0
        ) if c1a != c1 else x1
        x2k = x2
        if c2 and c2a != c2:
            x2k = jnp.concatenate(
                [x2, jnp.zeros((c2a - c2, x2.shape[1]), x2.dtype)], axis=0)

        fwd = jax.jit(lambda a, b2: T._conv_fwd(
            a, b2, wp, sck, shk, h=h, w=w, th=th, c1=c1a, c2=c2a, o=o,
            n2_images=n2, prologue=prologue, interpret=False))
        t_f = timed(fwd, x1k, x2k) if c2 else timed(
            jax.jit(lambda a: T._conv_fwd(
                a, None, wp, sck, shk, h=h, w=w, th=th, c1=c1a, c2=0, o=o,
                n2_images=0, prologue=prologue, interpret=False)), x1k)

        g = jax.random.normal(ks[3], (oa, n * h * w), jnp.float32).astype(
            jnp.bfloat16)

        def tp(wg):
            out = jnp.zeros((3 * oa, 3 * cp), wg.dtype)
            for dy in range(3):
                for dxw in range(3):
                    blk = wg[dy * cp:(dy + 1) * cp, dxw * oa:(dxw + 1) * oa]
                    out = out.at[dy * oa:(dy + 1) * oa,
                                 dxw * cp:(dxw + 1) * cp].set(blk.T)
            return out

        wtp = jnp.stack([tp(wp[g_]) for g_ in range(groups)])
        x1p = x1k if prologue else None
        x2p = x2k if (prologue and c2) else None

        dxf = jax.jit(lambda gg, a, b2: T._conv_dx(
            gg, a, b2, wtp, sck, shk, h=h, w=w, th=th, c1=c1a, c2=c2a, o=o,
            prologue=prologue, interpret=False, out_dtype=jnp.bfloat16))
        t_dx = timed(dxf, g, x1p, x2p)

        dwf = jax.jit(lambda gg, a, b2: T._conv_dw(
            gg, a, b2, sck, shk, h=h, w=w, th=th, c1=c1a, c2=c2a, o=o,
            n2_images=n2, prologue=prologue, interpret=False))
        t_dw = timed(dwf, g, x1k, x2k)

        print(f"{name}: fwd {t_f*1e3:.1f} ms  dx {t_dx*1e3:.1f} ms  "
              f"dw {t_dw*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
