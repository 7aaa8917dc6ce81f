"""Fused DoubleConv v2: flattened-spatial channel-major Pallas kernel.

Layout: x [B, C, H*W] (the natural contiguous view of [B, C, H, W]) — W
rides lanes in 128-aligned blocks, so dy shifts are aligned lane-block
copies and dx shifts become single-lane rolls on the *output*.

Per conv: build col [3C, rows*W] from 3 dy-shifted aligned copies, then ONE
big-K dot [3C, 3M]^T x [3C, rows*W] -> [3M, rows*W] (measured ~127 TF/s for
big-K 2D dots on v5e), then combine the 3 dx planes with lane rolls +
reflect-boundary masks.  Reflect padding never materializes: W edges are
fixed by masked rolls, H edges by in-kernel row copies on boundary tiles.
Channel counts are padded to sublane multiples (8) inside the packed
weights so every VMEM copy is aligned.

Run: python experiments/exp_flat_dc.py [cpu]
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
    """Lane roll on the minor axis: out[..., j] = v[..., j - shift]."""
    if INTERPRET:
        return jnp.roll(v, shift, axis=-1)
    return pltpu.roll(v, shift % v.shape[-1], axis=v.ndim - 1)


def _combine_dx(y_ref, mpad, m, w, s_ref, b_ref, out_dtype):
    """y_ref: [3*mpad, N] f32 tap planes (dx=0,1,2) -> [M, N] relu(affine).

    out[j] = y0[j-1] + y1[j] + y2[j+1], with reflect fixes at row edges:
    col 0 uses y0[1], col W-1 uses y2[W-2] (j indexes flattened rows of
    width w, so edges are j%w==0 / j%w==w-1).
    """
    n = y_ref.shape[1]
    j = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    first = (j & (w - 1)) == 0
    last = (j & (w - 1)) == (w - 1)
    y0 = y_ref[0:m]
    y1 = y_ref[mpad:mpad + m]
    y2 = y_ref[2 * mpad:2 * mpad + m]
    left = jnp.where(first, _roll(y0, -1), _roll(y0, 1))
    right = jnp.where(last, _roll(y2, 1), _roll(y2, -1))
    out = (left + y1 + right) * s_ref[:] + b_ref[:]
    return jnp.maximum(out, 0.0).astype(out_dtype)


def _kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref, out_ref,
            col1, y1s, mid, col2, y2s, *, th, w, c, m, o, out_dtype):
    """Tile i: output rows [i*th, i*th + th) of image b (flattened lanes).

    x_ref slab: [1, C, (th+8)*W] = image rows [i*th-4, i*th+th+4); slab row
    s holds image row i*th - 4 + s (OOB rows are Element-padding junk; every
    junk-dependent intermediate row is overwritten with its reflect value).

    col part dy, position p (of th+2) holds image row i*th - 2 + dy + p, so
    mid ext row e (= image mid row i*th - 1 + e) contracts parts at p = e.
    """
    i = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    r1 = th + 2  # conv1 output rows: mid ext rows [i*th-1, i*th+th+1)
    ca, ma = _align8(c), _align8(m)

    # ---- col1: 3 dy-shifted aligned copies (+ zeroed sublane pad rows)
    for dy in range(3):
        col1[dy * ca:dy * ca + c] = x_ref[0, :, (2 + dy) * w:(2 + dy + r1) * w]
        if ca > c:
            col1[dy * ca + c:(dy + 1) * ca] = jnp.zeros(
                (ca - c, r1 * w), col1.dtype)
    # tile 0: image row -1 (part dy=0, position 1) -> reflect row 1 (slab 5)
    @pl.when(i == 0)
    def _():
        col1[0:c, w:2 * w] = x_ref[0, :, 5 * w:6 * w]
    # last tile: image row H (part dy=2, position th) -> reflect row H-2
    # (slab row th+2)
    @pl.when(i == n_tiles - 1)
    def _():
        col1[2 * ca:2 * ca + c, th * w:(th + 1) * w] = (
            x_ref[0, :, (th + 2) * w:(th + 3) * w])

    y1s[...] = jax.lax.dot_general(
        w1_ref[:], col1[...],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    mid[...] = _combine_dx(y1s, ma, m, w, s1_ref, b1_ref, mid.dtype)

    # mid rows are ext rows [it-1, it+th+1); boundary reflect fixes:
    @pl.when(i == 0)
    def _():
        mid[:, 0:w] = mid[:, 2 * w:3 * w]

    @pl.when(i == n_tiles - 1)
    def _():
        mid[:, (r1 - 1) * w:r1 * w] = mid[:, (r1 - 3) * w:(r1 - 2) * w]

    # ---- conv2 ------------------------------------------------------------
    for dy in range(3):
        col2[dy * ma:dy * ma + m] = mid[:, dy * w:(dy + th) * w]
        if ma > m:
            col2[dy * ma + m:(dy + 1) * ma] = jnp.zeros(
                (ma - m, th * w), col2.dtype)

    y2s[...] = jax.lax.dot_general(
        w2_ref[:], col2[...],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = _combine_dx(y2s, _align8(o), o, w, s2_ref, b2_ref, out_dtype)


def pack_w(wconv):
    """[3, 3, C, M] HWIO -> [3*align8(C), 3*align8(M)]: block (dy, dx) at
    [dy*ca:(dy*ca+C), dx*ma:(dx*ma+M)], zeros in the alignment pad."""
    import numpy as np

    _, _, c, m = wconv.shape
    ca, ma = _align8(c), _align8(m)
    out = jnp.zeros((3 * ca, 3 * ma), wconv.dtype)
    for dy in range(3):
        for dx in range(3):
            out = out.at[dy * ca:dy * ca + c, dx * ma:dx * ma + m].set(
                wconv[dy, dx])
    return out


@functools.partial(jax.jit, static_argnames=("th",))
def fused_double_conv_flat(x, w1, s1, b1, w2, s2, b2, *, th=32):
    """x: [B, C, H, W] raw channel-major.  relu(a2(conv2(relu(a1(conv1)))))
    with reflect padding semantics; returns [B, O, H, W]."""
    bsz, c, h, w = x.shape
    m, o = w1.shape[3], w2.shape[3]
    assert h % th == 0 and (w & (w - 1)) == 0 and w % 128 == 0
    f32 = jnp.float32
    ca, ma, oa = _align8(c), _align8(m), _align8(o)
    xf = x.reshape(bsz, c, h * w)
    # top-junk layout: 4 junk rows above the image (Mosaic supports only
    # HIGH Element padding, so the low halo comes from the array itself)
    xf = jnp.concatenate([xf[:, :, :4 * w], xf], axis=-1)
    grid = (bsz, h // th)
    kern = functools.partial(
        _kernel, th=th, w=w, c=c, m=m, o=o, out_dtype=x.dtype)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(c),
                 pl.Element((th + 8) * w, padding=(0, 8 * w))),
                lambda b, i: (b, 0, pl.multiple_of(i * th * w, 128)),
                memory_space=pltpu.VMEM,
            ),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(
            (pl.Element(1), pl.Element(o), pl.Element(th * w)),
            lambda b, i: (b, 0, pl.multiple_of(i * th * w + 4 * w, 128)),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, o, (h + 4) * w), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((3 * ca, (th + 2) * w), x.dtype),   # col1
            pltpu.VMEM((3 * ma, (th + 2) * w), f32),       # y1s
            pltpu.VMEM((m, (th + 2) * w), x.dtype),        # mid
            pltpu.VMEM((3 * ma, th * w), x.dtype),         # col2
            pltpu.VMEM((3 * oa, th * w), f32),             # y2s
        ],
        interpret=INTERPRET,
    )(xf, pack_w(w1).astype(x.dtype),
      s1.reshape(m, 1).astype(f32), b1.reshape(m, 1).astype(f32),
      pack_w(w2).astype(x.dtype),
      s2.reshape(o, 1).astype(f32), b2.reshape(o, 1).astype(f32))
    return out[:, :, 4 * w:].reshape(bsz, o, h, w)


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
        float(jnp.sum(r[0, 0, :2, :2].astype(jnp.float32)))
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
            bsz = 2
        ks = jax.random.split(key, 8)
        x = jax.random.normal(ks[0], (bsz, h, w, c), jnp.float32)
        w1 = jax.random.normal(ks[1], (3, 3, c, m), jnp.float32) * 0.1
        s1 = jax.random.uniform(ks[2], (m,), jnp.float32, 0.5, 1.5)
        b1 = jax.random.normal(ks[3], (m,)) * 0.1
        w2 = jax.random.normal(ks[4], (3, 3, m, o), jnp.float32) * 0.1
        s2 = jax.random.uniform(ks[5], (o,), jnp.float32, 0.5, 1.5)
        b2 = jax.random.normal(ks[6], (o,)) * 0.1

        x_bf = x.astype(jnp.bfloat16)
        xcm = jnp.moveaxis(x_bf, -1, 1)
        ref = jnp.moveaxis(xla_ref(x_bf, w1, s1, b1, w2, s2, b2), -1, 1)

        for th in (16, 32):
            if h % th:
                continue
            try:
                out = fused_double_conv_flat(
                    xcm, w1, s1, b1, w2, s2, b2, th=th)
                err = float(jnp.max(jnp.abs(
                    out.astype(jnp.float32) - ref.astype(jnp.float32))))
                scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) or 1.0
                ok = err / scale < 3e-2
                print(f"{name} flat th={th}: relerr={err/scale:.2e} "
                      f"{'OK' if ok else 'FAIL'}", flush=True)
                if not ON_CPU:
                    fn = functools.partial(fused_double_conv_flat, th=th)
                    t = timed(fn, xcm, w1, s1, b1, w2, s2, b2)
                    gflop = 2 * 9 * (c * m + m * o) * h * w * bsz / 1e9
                    print(f"{name} flat th={th}: {t*1e3:.2f} ms  "
                          f"{gflop/t/1e3:.1f} TF/s", flush=True)
            except Exception as e:
                msg = str(e).split(chr(10))[0][:200]
                print(f"{name} flat th={th}: ERROR {type(e).__name__}: {msg}",
                      flush=True)


if __name__ == "__main__":
    main()
