"""Fused DoubleConv v3: fully-2D channel-transposed (CT) layout.

Arrays are [C, N*H*W] (channels in sublanes, everything else flattened in
lanes).  2D blocks DMA at full HBM speed on this chip (853 GB/s combined vs
~330 for [1, C, thW] 3D blocks — exp_dma2d.py).  Grid is 1D over
(N*H // th) tiles; th divides H so each tile sits inside one image.  Image
boundaries get reflect fixes via predicated copies; tile 0 builds its
column buffer from a clamped slab with shifted offsets.

Optionally fuses the 1x1 out-conv (decoder epilogue), output channels
padded to 8.

Run: python experiments/exp_ct_dc.py [cpu]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

ON_CPU = "cpu" in sys.argv[1:]
if ON_CPU:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if ON_CPU:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = ON_CPU


def _align8(n):
    return (n + 7) // 8 * 8


def _roll(v, shift):
    if INTERPRET:
        return jnp.roll(v, shift, axis=-1)
    return pltpu.roll(v, shift % v.shape[-1], axis=v.ndim - 1)


def _combine_dx(y_ref, mpad, m, w, lanes, s_ref, b_ref):
    """y_ref [3*mpad+, N+] f32 planes -> relu((y0<<1+y1+y2>>1)*s+b) [m, lanes]."""
    j = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1)
    first = (j & (w - 1)) == 0
    last = (j & (w - 1)) == (w - 1)
    y0 = y_ref[0:m, 0:lanes]
    y1 = y_ref[mpad:mpad + m, 0:lanes]
    y2 = y_ref[2 * mpad:2 * mpad + m, 0:lanes]
    left = jnp.where(first, _roll(y0, -1), _roll(y0, 1))
    right = jnp.where(last, _roll(y2, 1), _roll(y2, -1))
    out = (left + y1 + right) * s_ref[0:m] + b_ref[0:m]
    return jnp.maximum(out, 0.0)


def make_kernel(th, w, h, c, m, o, fuse_out, out_dtype):
    r1 = th + 2
    ca, ma, oa = _align8(c), _align8(m), _align8(o)
    tpi = h // th  # tiles per image

    def kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
               wo_ref, out_ref, col, ys, mid):
        i = pl.program_id(0)
        first_img = (i % tpi) == 0
        last_img = (i % tpi) == tpi - 1

        # ---- col for conv1: part dy position p holds flat row it-2+dy+p
        @pl.when(i > 0)
        def _():
            # slab row s = flat row i*th - 4 + s
            for dy in range(3):
                col[dy * ca:dy * ca + c] = (
                    x_ref[:, (2 + dy) * w:(2 + dy + r1) * w])

        @pl.when(i == 0)
        def _():
            # clamped slab: slab row s = flat row s; copy in-bounds tails
            # (uncovered positions only feed rows overwritten below)
            col[0:c, 2 * w:r1 * w] = x_ref[:, 0:(r1 - 2) * w]
            col[ca:ca + c, w:r1 * w] = x_ref[:, 0:(r1 - 1) * w]
            col[2 * ca:2 * ca + c, 0:r1 * w] = x_ref[:, 0:r1 * w]

        if ca > c:
            for dy in range(3):
                col[dy * ca + c:(dy + 1) * ca] = jnp.zeros(
                    (ca - c, r1 * w), col.dtype)

        # conv1 input row -1 of this image (part dy=0, position 1) must be
        # reflect row 1 = flat row i*th + 1 = slab row 5 (tile 0: row 1)
        @pl.when(jnp.logical_and(first_img, i > 0))
        def _():
            col[0:c, w:2 * w] = x_ref[:, 5 * w:6 * w]

        @pl.when(i == 0)
        def _():
            col[0:c, w:2 * w] = x_ref[:, w:2 * w]

        # conv1 input row H (part dy=2, position th) -> reflect row H-2 =
        # flat row i*th + th - 2 = slab row th+2 (tile 0: row th-2)
        @pl.when(jnp.logical_and(last_img, i > 0))
        def _():
            col[2 * ca:2 * ca + c, th * w:(th + 1) * w] = (
                x_ref[:, (th + 2) * w:(th + 3) * w])

        @pl.when(jnp.logical_and(last_img, i == 0))
        def _():
            col[2 * ca:2 * ca + c, th * w:(th + 1) * w] = (
                x_ref[:, (th - 2) * w:(th - 1) * w])

        ys[0:3 * ma, :] = jax.lax.dot_general(
            w1_ref[:], col[0:3 * ca, :],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        mid[...] = _combine_dx(
            ys, ma, m, w, r1 * w, s1_ref, b1_ref).astype(mid.dtype)

        # mid rows are ext rows [it-1, it+th+1) of this image
        @pl.when(first_img)
        def _():
            mid[:, 0:w] = mid[:, 2 * w:3 * w]

        @pl.when(last_img)
        def _():
            mid[:, (r1 - 1) * w:r1 * w] = mid[:, (r1 - 3) * w:(r1 - 2) * w]

        # ---- conv2 (reuses col/ys prefixes)
        for dy in range(3):
            col[dy * ma:dy * ma + m, 0:th * w] = mid[:, dy * w:(dy + th) * w]
            if ma > m:
                col[dy * ma + m:(dy + 1) * ma, 0:th * w] = jnp.zeros(
                    (ma - m, th * w), col.dtype)

        ys[0:3 * oa, 0:th * w] = jax.lax.dot_general(
            w2_ref[:], col[0:3 * ma, 0:th * w],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        y2 = _combine_dx(ys, oa, o, w, th * w, s2_ref, b2_ref)
        if fuse_out:
            out_ref[...] = jax.lax.dot_general(
                wo_ref[:], y2.astype(out_dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(out_dtype)
        else:
            out_ref[0:o, :] = y2.astype(out_dtype)
            if oa > o:
                out_ref[o:oa, :] = jnp.zeros((oa - o, th * w), out_dtype)

    return kernel


def pack_w(wconv):
    _, _, c, m = wconv.shape
    ca, ma = _align8(c), _align8(m)
    out = jnp.zeros((3 * ca, 3 * ma), wconv.dtype)
    for dy in range(3):
        for dx in range(3):
            out = out.at[dy * ca:dy * ca + c, dx * ma:dx * ma + m].set(
                wconv[dy, dx])
    return out


def _padcol(v, n):
    out = jnp.zeros((n, 1), jnp.float32)
    return out.at[:v.shape[0], 0].set(v.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("th", "h", "w", "fuse_out"))
def dc_ct(x, w1, s1, b1, w2, s2, b2, wo=None, *, th, h, w, fuse_out=False):
    """x: [C, N*H*W] CT layout.  Returns [align8(O or OC), N*H*W]."""
    c, total = x.shape
    n_rows = total // w
    m, o = w1.shape[3], w2.shape[3]
    f32 = jnp.float32
    ca, ma, oa = _align8(c), _align8(m), _align8(o)
    if fuse_out:
        oc = wo.shape[3]
        oca = _align8(oc)
        wop = jnp.zeros((oa, oca), jnp.float32)
        wop = wop.at[:o, :oc].set(wo.reshape(o, oc))
        # transposed for dot: [o rows contract, oca out]
        wop = wop.astype(jnp.bfloat16)
        out_c = oca
    else:
        wop = jnp.zeros((oa, 8), jnp.bfloat16)
        out_c = oa
    kern = make_kernel(th, w, h, c, m, o, fuse_out, x.dtype)
    n_tiles = n_rows // th
    out = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(c), pl.Element((th + 8) * w, padding=(0, 8 * w))),
                lambda i: (0, pl.multiple_of(
                    jnp.maximum(i * th - 4, 0) * w, 128)),
                memory_space=pltpu.VMEM,
            ),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec(
            (out_c, th * w), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((out_c, total), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((3 * max(ca, ma), (th + 2) * w), x.dtype),  # col
            pltpu.VMEM((3 * max(ma, oa), (th + 2) * w), f32),      # ys
            pltpu.VMEM((m, (th + 2) * w), x.dtype),                # mid
        ],
        interpret=INTERPRET,
    )(x,
      pack_w(w1).astype(x.dtype),
      _padcol(s1, ma), _padcol(b1, ma),
      pack_w(w2).astype(x.dtype),
      _padcol(s2, oa), _padcol(b2, oa),
      wop)
    return out


# --------------------------------------------------------------------------


def xla_ref(x_nhwc, w1, s1, b1, w2, s2, b2):
    from mimo_unet_tpu.ops.conv import reflect_pad1
    from jax import lax

    def conv(x, wt):
        return lax.conv_general_dilated(
            reflect_pad1(x), wt, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    y = conv(x_nhwc, w1.astype(x_nhwc.dtype))
    y = jnp.maximum(y * s1 + b1, 0).astype(x_nhwc.dtype)
    y = conv(y, w2.astype(y.dtype))
    return jnp.maximum(y * s2 + b2, 0).astype(x_nhwc.dtype)


def timed(fn, *args, reps=20):
    r = fn(*args)
    jax.block_until_ready(r)

    def run_k(k):
        t0 = time.perf_counter()
        r = None
        for _ in range(k):
            r = fn(*args)
        float(jnp.sum(r[:1, :2].astype(jnp.float32)))
        return time.perf_counter() - t0

    run_k(2)
    t1 = min(run_k(1) for _ in range(3))
    tk = min(run_k(reps + 1) for _ in range(2))
    return (tk - t1) / reps


def main():
    key = jax.random.key(0)
    shapes = [
        ("decoder_up4", 64, 63, 31, 21, 256, 256),
        ("encoder_inconv", 64, 3, 21, 21, 256, 256),
        ("encoder_down1", 64, 21, 42, 42, 128, 128),
    ]
    for name, bsz, c, m, o, h, w in shapes:
        if ON_CPU:
            bsz = 3
        ks = jax.random.split(key, 8)
        x = jax.random.normal(ks[0], (bsz, h, w, c), jnp.float32)
        w1 = jax.random.normal(ks[1], (3, 3, c, m), jnp.float32) * 0.1
        s1 = jax.random.uniform(ks[2], (m,), jnp.float32, 0.5, 1.5)
        b1 = jax.random.normal(ks[3], (m,)) * 0.1
        w2 = jax.random.normal(ks[4], (3, 3, m, o), jnp.float32) * 0.1
        s2 = jax.random.uniform(ks[5], (o,), jnp.float32, 0.5, 1.5)
        b2 = jax.random.normal(ks[6], (o,)) * 0.1

        x_bf = x.astype(jnp.bfloat16)
        xct = jnp.moveaxis(x_bf, -1, 0).reshape(c, bsz * h * w)
        ref = jnp.moveaxis(xla_ref(x_bf, w1, s1, b1, w2, s2, b2), -1, 0)
        ref = ref.reshape(o, bsz * h * w)

        for th in (16, 32):
            if h % th:
                continue
            try:
                out = dc_ct(xct, w1, s1, b1, w2, s2, b2, th=th, h=h, w=w)
                out = out[:o]
                err = float(jnp.max(jnp.abs(
                    out.astype(jnp.float32) - ref.astype(jnp.float32))))
                scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) or 1.0
                ok = err / scale < 3e-2
                print(f"{name} ct th={th}: relerr={err/scale:.2e} "
                      f"{'OK' if ok else 'FAIL'}", flush=True)
                if not ON_CPU:
                    fn = functools.partial(dc_ct, th=th, h=h, w=w)
                    t = timed(fn, xct, w1, s1, b1, w2, s2, b2)
                    gflop = 2 * 9 * (c * m + m * o) * h * w * bsz / 1e9
                    print(f"{name} ct th={th}: {t*1e3:.2f} ms  "
                          f"{gflop/t/1e3:.1f} TF/s", flush=True)
            except Exception as e:
                msg = str(e).split(chr(10))[0][:200]
                print(f"{name} ct th={th}: ERROR {type(e).__name__}: {msg}",
                      flush=True)


if __name__ == "__main__":
    main()
