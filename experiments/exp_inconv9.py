"""Nine-tap conv1 variant of the fused DoubleConv for tiny c1 (in_conv).

The production kernel's conv1 for the 3-channel network input runs a
K=24 dot (3 dy parts x align8(3) channels) and then pays the f32
plane combine (4 rolls + 2 selects per tap plane).  With c1 this small
the dx shifts can instead happen on the *input* rows: take the slab in
f32 (rolls are 32-bit only), build 9 (dy, dx) column parts of c1a rows
each, and run ONE K=9*c1a=72 dot straight to the conv1 output — no
combine at all, and a 3x smaller f32 ys scratch.  conv2 is unchanged.

Validates against the production fused_double_conv_ct (interpret on CPU,
compiled on TPU) and times both at the flagship in_conv shape.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mimo_unet_tpu.ops.pallas.ct_conv import (
    _build_cols, _combine_dx, _edge_masks, _padcol, _roll, _use_interpret,
    align8, fused_double_conv_ct, pack_w3x3, pick_th)


def pack_w3x3_9(w1, dtype=jnp.bfloat16):
    """[3, 3, c1, m] -> [9*align8(c1), align8(m)] for the nine-tap dot."""
    _, _, c1, m = w1.shape
    c1a, ma = align8(c1), align8(m)
    out = jnp.zeros((9 * c1a, ma), dtype)
    for dy in range(3):
        for dx in range(3):
            out = out.at[(dy * 3 + dx) * c1a:(dy * 3 + dx) * c1a + c1,
                         :m].set(w1[dy, dx].astype(dtype))
    return out


def _kernel9(x_ref, w9_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
             out_ref, hp_ref, xdy, col, ys1, ys2, mid, *,
             th, w, c1, m, o, tpi, emit_hpool, out_dtype, interpret):
    r1 = th + 2
    c1a = align8(c1)
    ma, oa = align8(m), align8(o)
    i = pl.program_id(0)
    first_img = (i % tpi) == 0
    last_img = (i % tpi) == tpi - 1

    # dy-shifted f32 input rows (same slab logic as the production kernel)
    _build_cols(xdy, x_ref, cp=c1, base=0, c=c1, w=w, th=th,
                clamped=i == 0, first_img=first_img, last_img=last_img, i=i)

    first, last = _edge_masks(w, r1 * w)
    for dy in range(3):
        xr = xdy[dy * c1:(dy + 1) * c1]
        left = jnp.where(first, _roll(xr, -1, interpret),
                         _roll(xr, 1, interpret))
        right = jnp.where(last, _roll(xr, 1, interpret),
                          _roll(xr, -1, interpret))
        for dx, v in ((0, left), (1, xr), (2, right)):
            base = (dy * 3 + dx) * c1a
            col[base:base + c1, :] = v.astype(col.dtype)
            if c1a > c1:
                col[base + c1:base + c1a, :] = jnp.zeros(
                    (c1a - c1, r1 * w), col.dtype)

    ys1[...] = jax.lax.dot_general(
        w9_ref[:], col[0:9 * c1a, :],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    mid[...] = jnp.maximum(
        ys1[0:m, :] * s1_ref[0:m] + b1_ref[0:m], 0.0).astype(mid.dtype)

    @pl.when(first_img)
    def _():
        mid[:, 0:w] = mid[:, 2 * w:3 * w]

    @pl.when(last_img)
    def _():
        mid[:, (r1 - 1) * w:r1 * w] = mid[:, (r1 - 3) * w:(r1 - 2) * w]

    for dy in range(3):
        col[dy * ma:dy * ma + m, 0:th * w] = mid[:, dy * w:(dy + th) * w]
        if ma > m:
            col[dy * ma + m:(dy + 1) * ma, 0:th * w] = jnp.zeros(
                (ma - m, th * w), col.dtype)

    ys2[0:3 * oa, 0:th * w] = jax.lax.dot_general(
        w2_ref[:], col[0:3 * ma, 0:th * w],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y2 = _combine_dx(ys2, oa, o, w, th * w, s2_ref, b2_ref, interpret)
    y2b = y2.astype(out_dtype)
    out_ref[0:o, :] = y2b
    if oa > o:
        out_ref[o:oa, :] = jnp.zeros((oa - o, th * w), out_dtype)
    if emit_hpool:
        hm = jnp.maximum(y2, _roll(y2, th * w - w, interpret))
        hm = hm.astype(out_dtype)
        hp_ref[0:o, :] = jnp.concatenate(
            [hm[:, r * w:(r + 1) * w] for r in range(0, th, 2)], axis=1)
        if oa > o:
            hp_ref[o:oa, :] = jnp.zeros((oa - o, th * w // 2), out_dtype)


def fused_dc9(x1f32, w1, s1, sh1, w2p, s2, sh2, *, h, w, th, c1, m, o,
              emit_hpool=False, interpret=None):
    if interpret is None:
        interpret = _use_interpret()
    total = x1f32.shape[1]
    n_tiles = total // (w * th)
    tpi = h // th
    c1a, ma, oa = align8(c1), align8(m), align8(o)
    w9 = pack_w3x3_9(w1)

    kern = functools.partial(
        _kernel9, th=th, w=w, c1=c1, m=m, o=o, tpi=tpi,
        emit_hpool=emit_hpool, out_dtype=jnp.bfloat16, interpret=interpret)
    if not emit_hpool:
        def kern_nohp(x_ref, w9r, s1r, b1r, w2r, s2r, b2r, out_ref,
                      xdy, col, ys1, ys2, mid):
            kern(x_ref, w9r, s1r, b1r, w2r, s2r, b2r, out_ref, None,
                 xdy, col, ys1, ys2, mid)
        body = kern_nohp
    else:
        body = kern

    x_spec = pl.BlockSpec(
        (pl.Element(c1), pl.Element((th + 8) * w, padding=(0, 8 * w))),
        lambda i: (0, pl.multiple_of(
            jnp.maximum((i % n_tiles) * th - 4, 0) * w, 128)),
        memory_space=pltpu.VMEM)

    def vspec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    in_specs = [x_spec, vspec(w9.shape), vspec((ma, 1)), vspec((ma, 1)),
                vspec(w2p.shape), vspec((oa, 1)), vspec((oa, 1))]
    operands = [x1f32, w9, _padcol(s1[None], ma)[0], _padcol(sh1[None], ma)[0],
                w2p, _padcol(s2[None], oa)[0], _padcol(sh2[None], oa)[0]]

    out_specs = [pl.BlockSpec((oa, th * w), lambda i: (0, i),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((oa, total), jnp.bfloat16)]
    if emit_hpool:
        out_specs.append(pl.BlockSpec((oa, th * w // 2), lambda i: (0, i),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((oa, total // 2), jnp.bfloat16))

    r1w = (th + 2) * w
    out = pl.pallas_call(
        body,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=tuple(out_specs) if emit_hpool else out_specs[0],
        out_shape=tuple(out_shape) if emit_hpool else out_shape[0],
        scratch_shapes=[
            pltpu.VMEM((3 * c1, r1w), jnp.float32),        # xdy
            pltpu.VMEM((max(9 * c1a, 3 * ma), r1w), jnp.bfloat16),  # col
            pltpu.VMEM((ma, r1w), jnp.float32),            # ys1
            pltpu.VMEM((3 * oa, r1w), jnp.float32),        # ys2
            pltpu.VMEM((m, r1w), jnp.bfloat16),            # mid
        ],
        interpret=interpret,
    )(*operands)
    return out


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
    b, s, f = 128, 2, 21
    h = w = 256
    n = s * b
    c1 = 3
    ks = jax.random.split(jax.random.key(0), 4)
    x = jax.random.normal(ks[0], (c1, n * h * w)) * 0.5
    w1 = jax.random.normal(ks[1], (3, 3, c1, f)) * 0.2
    w2 = jax.random.normal(ks[2], (3, 3, f, f)) * 0.2
    s1 = jnp.ones(f) * 1.1
    sh1 = jnp.ones(f) * 0.03
    s2 = jnp.ones(f) * 0.9
    sh2 = jnp.ones(f) * -0.02

    w1p = pack_w3x3([w1])[None]
    w2p = pack_w3x3([w2])
    fa = align8(f)
    xb = x.astype(jnp.bfloat16)
    xf = x.astype(jnp.float32)

    for hp in (True, False):
        th_ref = pick_th(h, w, c1, 0, f, f, fa, emit_hpool=hp)
        ref_fn = jax.jit(functools.partial(
            fused_double_conv_ct, h=h, w=w, th=th_ref, c1=c1, m=f, o=f,
            emit_hpool=hp))
        ref = ref_fn(xb, w1p, s1[None], sh1[None], w2p[None], s2[None],
                     sh2[None])
        for th9 in (32, 64):
            fn9 = jax.jit(functools.partial(
                fused_dc9, h=h, w=w, th=th9, c1=c1, m=f, o=f, emit_hpool=hp))
            try:
                out = fn9(xf, w1, s1, sh1, w2p, s2, sh2)
            except Exception as e:
                print(f"hp={hp} th9={th9}: ERROR {str(e)[:90]}")
                continue
            r0 = ref[0] if hp else ref
            o0 = out[0] if hp else out
            scale = float(jnp.max(jnp.abs(r0.astype(jnp.float32))))
            err = float(jnp.max(jnp.abs(
                r0.astype(jnp.float32) - o0.astype(jnp.float32)))) / scale
            t_ref = timed(ref_fn, xb, w1p, s1[None], sh1[None], w2p[None],
                          s2[None], sh2[None])
            t9 = timed(fn9, xf, w1, s1, sh1, w2p, s2, sh2)
            print(f"hp={hp} th_ref={th_ref} ref={t_ref*1e3:.2f} ms | "
                  f"th9={th9} nine={t9*1e3:.2f} ms  relerr={err:.2e}")


if __name__ == "__main__":
    main()
