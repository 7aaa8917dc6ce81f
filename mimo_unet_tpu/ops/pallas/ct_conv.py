"""Fused DoubleConv Pallas kernel in the channel-transposed (CT) layout.

This is the production TPU fast path for the U-Net's high-resolution,
small-channel stages (per-subnetwork encoders and decoders — reference
mimo/models/mimo_components/components.py:8-33, model.py:119-175,246-297),
where NHWC XLA convolutions waste most of the machine: with C in {3..63}
the lane dimension is nearly empty, so both the MXU contraction and every
HBM transfer run at a fraction of peak.

Layout: activations are [C, N*H*W] — channels ride sublanes, batch x
spatial flattened into lanes.  Measured on v5e (experiments/exp_dma2d.py):
2D blocks in this layout DMA at ~850 GB/s combined, vs ~330 GB/s for
3D [1, C, th*W] blocks and ~170 GB/s with unaligned channel counts.

Per 3x3 conv (reflect padding, torch semantics):
  * a column buffer is built from 3 dy-shifted *aligned* lane-block copies
    (rows are W lanes apart, W % 128 == 0), giving contraction depth 3*C;
  * ONE 2D dot [3Cp, 3Mp]^T x [3Cp, rows*W] -> [3Mp, rows*W] runs on the
    MXU at big-K efficiency (127 TF/s measured for K~512);
  * the three dx tap planes are combined with single-lane rolls + masked
    edge fixes (reflect), so reflect padding never materializes;
  * BatchNorm (eval) + bias fold into a per-channel affine epilogue, ReLU
    fused.  conv1 -> affine -> relu -> conv2 -> affine -> relu [-> 1x1
    out-conv] all happen in VMEM; the intermediate never touches HBM.

Halo handling is BlockSpec-only (pl.Element overlapping windows with high
padding) — manual make_async_copy DMA crashes this testbed's worker.
Tile 0 reads a clamped slab and rebuilds its column windows with shifted
offsets; every value influenced by out-of-image junk is overwritten with
its reflect-correct source before use.

Supports:
  * grouped weights (leading [G] axis) for the vmapped subnetwork stacks —
    tiles select their group in the BlockSpec index map;
  * a second input with its own (smaller) batch period, fusing the
    skip/upsample channel concat of the ``Up`` block (reference
    components.py:119) without materializing it;
  * a fused 1x1 out-conv epilogue (reference components.py:123-129).

Numerics: operands bf16, MXU accumulates f32, dx-plane combine in f32 —
same rounding class as the XLA bf16 conv path (one extra bf16 round at the
conv1->conv2 boundary); verified ≤6e-3 relative vs the f32 torch-parity
oracle (tests/test_ct_conv.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def align8(n: int) -> int:
    return (n + 7) // 8 * 8


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _roll(v, shift, interpret):
    if interpret:
        return jnp.roll(v, shift, axis=-1)
    return pltpu.roll(v, shift % v.shape[-1], axis=v.ndim - 1)


def _edge_masks(w: int, lanes: int):
    """(first-col, last-col) [1, lanes] masks of each W-wide row."""
    j = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1)
    if w & (w - 1) == 0:
        jm = j & (w - 1)
    else:
        jm = jax.lax.rem(j, w)
    return jm == 0, jm == (w - 1)


def _combine_dx(y_ref, mpad, m, w, lanes, s_ref, b_ref, interpret):
    """Tap planes [3*mpad, >=lanes] f32 -> relu((y0<<1 + y1 + y2>>1)*s + b).

    out[j] = y0[j-1] + y1[j] + y2[j+1]; at the first/last column of each
    W-wide row the rolled-in neighbor is replaced by the reflect value
    (col 0 uses y0[1], col W-1 uses y2[W-2]).
    """
    first, last = _edge_masks(w, lanes)
    y0 = y_ref[0:m, 0:lanes]
    y1 = y_ref[mpad:mpad + m, 0:lanes]
    y2 = y_ref[2 * mpad:2 * mpad + m, 0:lanes]
    left = jnp.where(first, _roll(y0, -1, interpret), _roll(y0, 1, interpret))
    right = jnp.where(last, _roll(y2, 1, interpret), _roll(y2, -1, interpret))
    out = (left + y1 + right) * s_ref[0:m] + b_ref[0:m]
    return jnp.maximum(out, 0.0)


def _build_cols(col, x_ref, *, cp, base, c, w, th, clamped, first_img,
                last_img, i, q0=0, length=None):
    """Write input ``x_ref``'s slab into its column segment.

    Column part dy (rows [dy*cp + base, dy*cp + base + c)) position p of
    th+2 must hold the input's flat row i*th - 2 + dy + p.  The generic
    slab starts at flat row i*th - 4 (slab row s = flat row i*th - 4 + s);
    a clamped slab (tile at flat row 0) starts at 0.  Positions sourced
    from other images / out of bounds are fixed to their reflect rows.

    ``q0``/``length``: build only GLOBAL positions [q0, q0+length) of the
    th+2, written at col positions [0, length) — the sub-tile chunking
    that lets th=64 run with th=32-sized column scratches (fewer grid
    steps amortize the per-step fixed cost).  q0=0/length=th+2 is the
    whole tile.  Reflect fixes apply only when their position falls in
    the window (q0==0 holds position 1; the window containing position
    th gets the row-H fix).
    """
    r1 = th + 2
    length = r1 if length is None else length
    q1 = q0 + length

    def _rd(v):
        # allow a bf16 slab feeding an f32 column scratch (the nine-tap
        # kernel rolls on f32 planes but the HBM slab stays bf16 — half
        # the input DMA bytes; exact upcast)
        return v if v.dtype == col.dtype else v.astype(col.dtype)

    @pl.when(jnp.logical_not(clamped))
    def _():
        for dy in range(3):
            col[dy * cp + base:dy * cp + base + c, 0:length * w] = _rd(
                x_ref[:, (2 + dy + q0) * w:(2 + dy + q0 + length) * w])

    if q0 == 0:
        @pl.when(clamped)
        def _():
            # slab row s = flat row s; copy in-bounds tails (uncovered
            # positions feed only rows that are overwritten below)
            col[base:base + c, 2 * w:length * w] = _rd(
                x_ref[:, 0:(length - 2) * w])
            col[cp + base:cp + base + c, w:length * w] = _rd(
                x_ref[:, 0:(length - 1) * w])
            col[2 * cp + base:2 * cp + base + c, 0:length * w] = _rd(
                x_ref[:, 0:length * w])

        # image row -1 (part dy=0 position 1) -> reflect row 1 = flat row
        # i*th + 1 = slab row 5 (clamped: slab row 1)
        @pl.when(jnp.logical_and(first_img, jnp.logical_not(clamped)))
        def _():
            col[base:base + c, w:2 * w] = _rd(x_ref[:, 5 * w:6 * w])

        @pl.when(clamped)
        def _():
            col[base:base + c, w:2 * w] = _rd(x_ref[:, w:2 * w])
    else:
        # interior chunk: clamped slab starts at flat row 0, so position
        # q0+j reads slab row q0+j-2+dy instead of q0+j+2+dy
        @pl.when(clamped)
        def _():
            for dy in range(3):
                col[dy * cp + base:dy * cp + base + c, 0:length * w] = _rd(
                    x_ref[:, (q0 - 2 + dy) * w:(q0 - 2 + dy + length) * w])

    if q0 <= th < q1:
        j = th - q0
        # image row H (part dy=2 position th) -> reflect row H-2 = flat
        # row i*th + th - 2 = slab row th+2 (clamped: slab row th-2)
        @pl.when(jnp.logical_and(last_img, jnp.logical_not(clamped)))
        def _():
            col[2 * cp + base:2 * cp + base + c, j * w:(j + 1) * w] = _rd(
                x_ref[:, (th + 2) * w:(th + 3) * w])

        @pl.when(jnp.logical_and(last_img, clamped))
        def _():
            col[2 * cp + base:2 * cp + base + c, j * w:(j + 1) * w] = _rd(
                x_ref[:, (th - 2) * w:(th - 1) * w])


def _make_kernel(*, th, w, c1, c2, m, o, out_c, fuse_out, emit_hpool,
                 tpi, bt2, out_dtype, interpret, w_img=None,
                 group_minor_g=0, gt=0, x2_half=0, sub=1):
    r1 = th + 2
    tc = th // sub  # chunk rows (col/ys scratches sized for tc, not th)
    w_img = w_img or w
    c1a = align8(c1)
    c2a = align8(c2) if c2 else 0
    cp = c1a + c2a
    ma, oa = align8(m), align8(o)
    h = tpi * th

    def kernel(*refs):
        refs = list(refs)
        x1_ref = refs.pop(0)
        x2_ref = refs.pop(0) if c2 else None
        (w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
         wo_ref, bo_ref, out_ref) = refs[:9]
        hp_ref = refs[9] if emit_hpool else None
        if x2_half:
            col, ys, mid, x2s = refs[-4:]
        else:
            col, ys, mid = refs[-3:]
        i = pl.program_id(0)
        if group_minor_g:
            # group-minor grid ((tile, group) adjacent): consecutive steps
            # share the x2 block, so Pallas skips its re-DMA per group
            i = (i % group_minor_g) * gt + i // group_minor_g
        first_img = (i % tpi) == 0
        last_img = (i % tpi) == tpi - 1

        if c2 and x2_half:
            # H-half of the bilinear x2 upsample fused into the column
            # build: x2_ref is the W-upsampled HALF-res slab; stage the
            # tile's full-res ext rows as per-row lerps (align-corners
            # weights computed exactly from integer scalars, matching
            # ops/resize.py _align_corners_tables), then feed the
            # staging buffer through the unchanged _build_cols.
            h2 = x2_half
            pos = i % bt2
            i_loc = pos % tpi
            r_start = jnp.where(pos == 0, 0, i_loc * th - 4)
            base = jnp.maximum((i_loc * th - 4) * (h2 - 1) // (h - 1), 0)
            for j in range(th + 8):
                r = jnp.clip(r_start + j, 0, h - 1)
                num = r * (h2 - 1)
                lo = jnp.minimum(num // (h - 1), h2 - 2)
                f = ((num - lo * (h - 1)).astype(jnp.float32)
                     / float(h - 1))
                sl = lo - base
                a = x2_ref[:, pl.ds(pl.multiple_of(sl * w, 128), w)]
                b = x2_ref[:, pl.ds(pl.multiple_of((sl + 1) * w, 128), w)]
                x2s[:, j * w:(j + 1) * w] = (
                    a.astype(jnp.float32) * (1.0 - f)
                    + b.astype(jnp.float32) * f).astype(x2s.dtype)

        # sub-tile chunk loop: chunk 0 produces mid positions [0, tc+2),
        # chunk s>0 positions [s*tc+2, (s+1)*tc+2); conv2's chunk s needs
        # mid [s*tc, (s+1)*tc+2) — exactly what conv1 has produced so far,
        # so conv1/conv2 interleave per chunk and col/ys stay chunk-sized
        # (th=64 fits VMEM with th=32 scratch sizes; sub=1 is the
        # original whole-tile kernel)
        for s in range(sub):
            q0 = 0 if s == 0 else s * tc + 2
            ln = (tc + 2) if s == 0 else tc
            _build_cols(col, x1_ref, cp=cp, base=0, c=c1, w=w, th=th,
                        clamped=i == 0, first_img=first_img,
                        last_img=last_img, i=i, q0=q0, length=ln)
            if c1a > c1:
                for dy in range(3):
                    col[dy * cp + c1:dy * cp + c1a, 0:ln * w] = jnp.zeros(
                        (c1a - c1, ln * w), col.dtype)
            if c2:
                x2_src = x2s if x2_half else x2_ref
                _build_cols(col, x2_src, cp=cp, base=c1a, c=c2, w=w, th=th,
                            clamped=(i % bt2) == 0, first_img=first_img,
                            last_img=last_img, i=i, q0=q0, length=ln)
                if c2a > c2:
                    for dy in range(3):
                        col[dy * cp + c1a + c2:(dy + 1) * cp, 0:ln * w] = (
                            jnp.zeros((c2a - c2, ln * w), col.dtype))

            ys[0:3 * ma, 0:ln * w] = jax.lax.dot_general(
                w1_ref[:], col[0:3 * cp, 0:ln * w],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            mid[:, q0 * w:(q0 + ln) * w] = _combine_dx(
                ys, ma, m, w_img, ln * w, s1_ref, b1_ref,
                interpret).astype(mid.dtype)

            # mid rows are conv2-input ext rows [i*th-1, i*th+th+1)
            if s == 0:
                @pl.when(first_img)
                def _():
                    mid[:, 0:w] = mid[:, 2 * w:3 * w]

            if s == sub - 1:
                @pl.when(last_img)
                def _():
                    mid[:, (r1 - 1) * w:r1 * w] = mid[:, (r1 - 3) * w:
                                                      (r1 - 2) * w]

            o0 = s * tc
            for dy in range(3):
                col[dy * ma:dy * ma + m, 0:tc * w] = mid[
                    :, (o0 + dy) * w:(o0 + dy + tc) * w]
                if ma > m:
                    col[dy * ma + m:(dy + 1) * ma, 0:tc * w] = jnp.zeros(
                        (ma - m, tc * w), col.dtype)

            ys[0:3 * oa, 0:tc * w] = jax.lax.dot_general(
                w2_ref[:], col[0:3 * ma, 0:tc * w],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            y2 = _combine_dx(ys, oa, o, w_img, tc * w, s2_ref, b2_ref,
                             interpret)
            osl = slice(o0 * w, (o0 + tc) * w)
            if fuse_out:
                out_ref[:, osl] = (jax.lax.dot_general(
                    wo_ref[:], y2.astype(out_dtype),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                    + bo_ref[:]).astype(out_dtype)
            else:
                y2b = y2.astype(out_dtype)
                out_ref[0:o, osl] = y2b
                if out_c > o:
                    out_ref[o:out_c, osl] = jnp.zeros((out_c - o, tc * w),
                                                      out_dtype)
                if emit_hpool:
                    # H-half of the 2x2 maxpool that follows this
                    # DoubleConv in a Down block (reference
                    # components.py:48): row pairs within the chunk (tc
                    # even, tiles never straddle images).  Rolls must stay
                    # f32 (Mosaic: no sub-32-bit rotate); max commutes
                    # with the monotone bf16 rounding, so this equals
                    # pooling the bf16 output.
                    hm = jnp.maximum(y2, _roll(y2, tc * w - w, interpret))
                    hm = hm.astype(out_dtype)
                    hp_ref[0:o, o0 * w // 2:(o0 + tc) * w // 2] = (
                        jnp.concatenate(
                            [hm[:, r * w:(r + 1) * w]
                             for r in range(0, tc, 2)], axis=1))
                    if out_c > o:
                        hp_ref[o:out_c, o0 * w // 2:(o0 + tc) * w // 2] = (
                            jnp.zeros((out_c - o, tc * w // 2), out_dtype))

    return kernel


def _make_kernel9(*, th, w, c1, m, o, emit_hpool, tpi, gt, out_dtype,
                  interpret, sub=1):
    """Nine-tap conv1 variant for tiny c1 (the network in_conv, c1 <= 8).

    The standard kernel's conv1 at c1=3 runs a K=24 dot then pays the f32
    tap-plane combine (4 rolls + 2 selects on [m, (th+2)*w] planes).  Here
    the dx shifts happen on the *input* rows instead — the slab arrives
    f32 (Mosaic rolls are 32-bit only), 9 (dy, dx) column parts of
    align8(c1) rows are built with input-side reflect fixes, and ONE
    K=9*align8(c1) dot lands directly on the conv1 output: no combine,
    and a 3x smaller f32 ys scratch for conv1.  Measured at the flagship
    in_conv shape: 10.4 -> 8.9 ms (experiments/exp_inconv9.py).  conv2 is
    identical to the standard kernel.  Numerics: same rounding class (one
    dot accumulation order change, <=5e-3 relative of max)."""
    r1 = th + 2
    tc = th // sub
    c1a = align8(c1)
    ma, oa = align8(m), align8(o)

    def kernel(*refs):
        refs = list(refs)
        x_ref = refs.pop(0)
        (w9_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref, out_ref) = refs[:7]
        hp_ref = refs[7] if emit_hpool else None
        xdy, col, ys1, ys2, mid = refs[-5:]
        i = pl.program_id(0)
        first_img = (i % tpi) == 0
        last_img = (i % tpi) == tpi - 1

        for s in range(sub):
            q0 = 0 if s == 0 else s * tc + 2
            ln = (tc + 2) if s == 0 else tc
            _build_cols(xdy, x_ref, cp=c1, base=0, c=c1, w=w, th=th,
                        clamped=i == 0, first_img=first_img,
                        last_img=last_img, i=i, q0=q0, length=ln)

            first, last = _edge_masks(w, ln * w)
            for dy in range(3):
                xr = xdy[dy * c1:(dy + 1) * c1, 0:ln * w]
                left = jnp.where(first, _roll(xr, -1, interpret),
                                 _roll(xr, 1, interpret))
                right = jnp.where(last, _roll(xr, 1, interpret),
                                  _roll(xr, -1, interpret))
                for dx, v in ((0, left), (1, xr), (2, right)):
                    base = (dy * 3 + dx) * c1a
                    col[base:base + c1, 0:ln * w] = v.astype(col.dtype)
                    if c1a > c1:
                        col[base + c1:base + c1a, 0:ln * w] = jnp.zeros(
                            (c1a - c1, ln * w), col.dtype)

            ys1[:, 0:ln * w] = jax.lax.dot_general(
                w9_ref[:], col[0:9 * c1a, 0:ln * w],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            mid[:, q0 * w:(q0 + ln) * w] = jnp.maximum(
                ys1[0:m, 0:ln * w] * s1_ref[0:m] + b1_ref[0:m],
                0.0).astype(mid.dtype)

            if s == 0:
                @pl.when(first_img)
                def _():
                    mid[:, 0:w] = mid[:, 2 * w:3 * w]

            if s == sub - 1:
                @pl.when(last_img)
                def _():
                    mid[:, (r1 - 1) * w:r1 * w] = mid[:, (r1 - 3) * w:
                                                      (r1 - 2) * w]

            o0 = s * tc
            for dy in range(3):
                col[dy * ma:dy * ma + m, 0:tc * w] = mid[
                    :, (o0 + dy) * w:(o0 + dy + tc) * w]
                if ma > m:
                    col[dy * ma + m:(dy + 1) * ma, 0:tc * w] = jnp.zeros(
                        (ma - m, tc * w), col.dtype)

            ys2[0:3 * oa, 0:tc * w] = jax.lax.dot_general(
                w2_ref[:], col[0:3 * ma, 0:tc * w],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            y2 = _combine_dx(ys2, oa, o, w, tc * w, s2_ref, b2_ref,
                             interpret)
            y2b = y2.astype(out_dtype)
            osl = slice(o0 * w, (o0 + tc) * w)
            out_ref[0:o, osl] = y2b
            if oa > o:
                out_ref[o:oa, osl] = jnp.zeros((oa - o, tc * w), out_dtype)
            if emit_hpool:
                hm = jnp.maximum(y2, _roll(y2, tc * w - w, interpret))
                hm = hm.astype(out_dtype)
                hp_ref[0:o, o0 * w // 2:(o0 + tc) * w // 2] = (
                    jnp.concatenate([hm[:, r * w:(r + 1) * w]
                                     for r in range(0, tc, 2)], axis=1))
                if oa > o:
                    hp_ref[o:oa, o0 * w // 2:(o0 + tc) * w // 2] = (
                        jnp.zeros((oa - o, tc * w // 2), out_dtype))

    return kernel


def pack_w3x3_9(w1: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """[3, 3, c1, m] -> [9*align8(c1), align8(m)] for the nine-tap dot:
    tap (dy, dx) lands at rows [(dy*3+dx)*c1a, +c1), zeros in pads."""
    _, _, c1, m = w1.shape
    c1a, ma = align8(c1), align8(m)
    out = jnp.zeros((9 * c1a, ma), dtype)
    for dy in range(3):
        for dx in range(3):
            out = out.at[(dy * 3 + dx) * c1a:(dy * 3 + dx) * c1a + c1,
                         :m].set(w1[dy, dx].astype(dtype))
    return out


def estimate_vmem9(th, w, c1, m, o, emit_hpool=False, sub=1) -> int:
    """Scoped-VMEM estimate for the nine-tap kernel (see estimate_vmem)."""
    c1a, ma, oa = align8(c1), align8(m), align8(o)
    r1w = (th + 2) * w
    cw = (th // sub + 2) * w
    xdy = 3 * c1 * cw * 4
    col = max(9 * c1a, 3 * ma) * cw * 2
    ys = (ma + 3 * oa) * cw * 4
    mid = m * r1w * 2
    slabs = 2 * c1 * (th + 8) * w * 2  # bf16 slab (upcast in VMEM)
    out = 2 * oa * th * w * 2
    temps = 3 * max(ma, oa) * cw * 4
    hpool = (2 * oa * (th // 2) * w * 2 + oa * (th // sub) * w * 4
             if emit_hpool else 0)
    return xdy + col + ys + mid + slabs + out + temps + hpool


def _probe_build9(th, w, c1, m, o, emit_hpool, sub=1):
    """Batch-minimal (2 groups x 1 image) but VMEM-exact probe call for
    the nine-tap kernel — see ops/pallas/probe.py."""
    import functools

    h, g = 2 * th, 2
    ma, oa = align8(m), align8(o)
    S = jax.ShapeDtypeStruct
    f32 = jnp.float32
    fn = functools.partial(
        fused_double_conv9_ct, h=h, w=w, th=th, c1=c1, m=m, o=o, sub=sub,
        emit_hpool=emit_hpool, interpret=False)
    args = (S((c1, g * h * w), jnp.bfloat16), S((g, 3, 3, c1, m), f32),
            S((g, m), f32), S((g, m), f32),
            S((g, 3 * ma, 3 * oa), f32), S((g, o), f32), S((g, o), f32))
    return fn, args


def pick_th9(h: int, w: int, c1: int, m: int, o: int,
             budget: int = 15 * 2 ** 20, emit_hpool: bool = False
             ) -> Optional[tuple]:
    from mimo_unet_tpu.ops.pallas.probe import probe_fits, probing_enabled

    do_probe = probing_enabled()
    gate = int(budget * 1.15) if do_probe else budget
    for th, sub in ((64, 1), (64, 2), (64, 4), (64, 8),
                    (32, 1), (32, 2), (16, 1), (8, 1)):
        if h % th == 0 and (th // sub) % 2 == 0 and estimate_vmem9(
                th, w, c1, m, o, emit_hpool, sub=sub) <= gate:
            if not do_probe or probe_fits(
                    f"dc9:th{th}.{sub}:w{w}:c{c1}m{m}o{o}"
                    f":hp{int(emit_hpool)}",
                    lambda: _probe_build9(th, w, c1, m, o, emit_hpool,
                                          sub)):
                return th, sub
    return None


def fused_double_conv9_ct(
    x1: jax.Array,
    w1: jax.Array,
    s1: jax.Array,
    sh1: jax.Array,
    w2p: jax.Array,
    s2: jax.Array,
    sh2: jax.Array,
    *,
    h: int,
    w: int,
    th: int,
    c1: int,
    m: int,
    o: int,
    emit_hpool: bool = False,
    sub: int = 1,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Nine-tap fused DoubleConv for c1 <= 8 (see _make_kernel9).

    x1:    [c1, N*H*W] CT activations — bf16 preferred (the slab upcasts
           into the f32 column scratch in VMEM, so the in-kernel dx rolls
           stay 32-bit while the HBM slab reads half the bytes; an f32
           input also works)
    w1:    [G, 3, 3, c1, m] raw conv1 weights (packed per group here)
    s1/sh1/s2/sh2: [G, m] / [G, o] folded affines; w2p as pack_w3x3.
    Returns like fused_double_conv_ct (bf16, align8 pads zero).
    """
    if interpret is None:
        interpret = _use_interpret()
    if isinstance(th, tuple):  # pick_th9 returns (th, sub)
        th, sub = th
    assert th % sub == 0 and (th // sub) % 2 == 0, (th, sub)
    total = x1.shape[1]
    n_tiles = total // (w * th)
    tpi = h // th
    g = w1.shape[0]
    gt = n_tiles // g
    c1a, ma, oa = align8(c1), align8(m), align8(o)
    w9 = jnp.stack([pack_w3x3_9(w1[i]) for i in range(g)])

    kern = _make_kernel9(th=th, w=w, c1=c1, m=m, o=o,
                         emit_hpool=emit_hpool, tpi=tpi, gt=gt, sub=sub,
                         out_dtype=jnp.bfloat16, interpret=interpret)

    x_spec = pl.BlockSpec(
        (pl.Element(c1), pl.Element((th + 8) * w, padding=(0, 8 * w))),
        lambda i: (0, pl.multiple_of(
            jnp.maximum((i % n_tiles) * th - 4, 0) * w, 128)),
        memory_space=pltpu.VMEM)

    def gspec(shape):
        return pl.BlockSpec((None,) + shape,
                            lambda i: (i // gt,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    in_specs = [x_spec, gspec(w9.shape[1:]), gspec((ma, 1)), gspec((ma, 1)),
                gspec(w2p.shape[1:]), gspec((oa, 1)), gspec((oa, 1))]
    operands = [x1, w9, _padcol(s1, ma), _padcol(sh1, ma),
                w2p.astype(jnp.bfloat16), _padcol(s2, oa), _padcol(sh2, oa)]

    out_specs = pl.BlockSpec((oa, th * w), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((oa, total), jnp.bfloat16)
    if emit_hpool:
        out_specs = (out_specs,
                     pl.BlockSpec((oa, th * w // 2), lambda i: (0, i),
                                  memory_space=pltpu.VMEM))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((oa, total // 2), jnp.bfloat16))

    r1w = (th + 2) * w
    cw = (th // sub + 2) * w
    return pl.pallas_call(
        kern,
        name=(f"dc9_c{c1}m{m}o{o}_th{th}w{w}"
              + (f"s{sub}" if sub > 1 else "")),
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((3 * c1, cw), jnp.float32),
            pltpu.VMEM((max(9 * c1a, 3 * ma), cw), jnp.bfloat16),
            pltpu.VMEM((ma, cw), jnp.float32),
            pltpu.VMEM((3 * oa, cw), jnp.float32),
            pltpu.VMEM((m, r1w), jnp.bfloat16),
        ],
        interpret=interpret,
    )(*operands)


def pack_w3x3(blocks: Sequence[jax.Array], dtype=jnp.bfloat16) -> jax.Array:
    """Pack HWIO 3x3 weights into the CT kernel layout [3*sum(ca), 3*ma].

    ``blocks`` are per-input weight slices [3, 3, c_j, M] in concat order;
    block (dy, dx) of input j lands at rows [dy*cp + base_j, +c_j), cols
    [dx*ma, +M), zeros in every alignment pad (pad channels must be exact
    zeros so junk-free math survives zero-padded activations).
    """
    m = blocks[0].shape[3]
    ma = align8(m)
    cas = [align8(b.shape[2]) for b in blocks]
    cp = sum(cas)
    out = jnp.zeros((3 * cp, 3 * ma), dtype)
    for dy in range(3):
        for dx in range(3):
            base = 0
            for b, ca in zip(blocks, cas):
                c = b.shape[2]
                out = out.at[
                    dy * cp + base:dy * cp + base + c,
                    dx * ma:dx * ma + m].set(b[dy, dx].astype(dtype))
                base += ca
    return out


def fold_bn_eval(conv_bias: jax.Array, bn_params: dict,
                 bn_state: dict, eps: float = 1e-5) -> Tuple[jax.Array, jax.Array]:
    """Fold conv bias + eval-mode BatchNorm into (scale, shift) f32.

    y = ((conv + b) - mean) * gamma/sqrt(var+eps) + beta
      = conv * scale + shift, scale = gamma*rsqrt(var+eps),
      shift = beta + (b - mean) * scale.
    (Matches ops/norm.py batch_norm eval branch.)
    """
    inv = jax.lax.rsqrt(bn_state["var"].astype(jnp.float32) + eps)
    scale = inv * bn_params["scale"].astype(jnp.float32)
    shift = (bn_params["bias"].astype(jnp.float32)
             + (conv_bias.astype(jnp.float32)
                - bn_state["mean"].astype(jnp.float32)) * scale)
    return scale, shift


def _padcol(v: jax.Array, n: int) -> jax.Array:
    """[G, k] f32 -> [G, n, 1] zero-padded per-channel column vectors."""
    g, k = v.shape
    out = jnp.zeros((g, n, 1), jnp.float32)
    return out.at[:, :k, 0].set(v.astype(jnp.float32))


def estimate_vmem(th, w, c1, c2, m, o, out_c, emit_hpool=False,
                  x2_half_h=False, sub=1) -> int:
    """Rough VMEM bytes for buffer-fit gating.

    Includes a term for Mosaic's vector-temporary stack in the combine
    (~3 f32 planes of (th+2)*w lanes): the in_conv kernel at th=64
    measured 16.08 MiB real scoped usage against a 9.8 MiB buffer-only
    estimate — the temporaries are the difference (compile log, round 3).
    ``emit_hpool`` adds the H-pool output block and its roll/max temps.
    ``sub``: in-kernel chunk count — col/ys/temps scale with the chunk
    rows (th/sub + 2), only mid/slabs/out with th.
    """
    cp = align8(c1) + (align8(c2) if c2 else 0)
    ma, oa = align8(m), align8(o)
    r1w = (th + 2) * w
    cw = (th // sub + 2) * w  # chunk lanes for col/ys/temps
    col = 3 * max(cp, ma) * cw * 2
    ys = 3 * max(ma, oa) * cw * 4
    mid = m * r1w * 2
    if x2_half_h and c2:
        # x2 slab halves (th/2+6 of th+8 rows) but adds the full-res lerp
        # staging scratch plus its f32 lerp temporaries (~2 planes)
        slabs = (2 * c1 * (th + 8) * w * 2
                 + 2 * c2 * (th // 2 + 6) * w * 2
                 + c2 * (th + 8) * w * 2)
        ys += 2 * c2 * w * 4
    else:
        slabs = 2 * (c1 + (c2 or 0)) * (th + 8) * w * 2
    out = 2 * out_c * th * w * 2
    temps = 3 * max(ma, oa) * cw * 4
    # narrow first inputs measure one extra temporary plane: in_conv
    # (c1=3) at th=64, w=256, no hpool ran 16.08 MiB real vs 14.67 MiB
    # estimated (experiments/exp_kernel_attrib.py OOM, round 3)
    if align8(c1) < 16:
        temps += max(ma, oa) * cw * 4
    hpool = (2 * out_c * (th // 2) * w * 2 + oa * (th // sub) * w * 4
             if emit_hpool else 0)
    return col + ys + mid + slabs + out + temps + hpool


def pick_th(h: int, w: int, c1: int, c2: int, m: int, o: int, out_c: int,
            budget: int = 15 * 2 ** 20, emit_hpool: bool = False,
            x2_half_h: bool = False) -> Optional[tuple]:
    """Deepest fitting tile first: the kernels carry a per-GRID-STEP fixed
    cost (~2-4 us measured by full ablation, experiments/exp_r5_dec2.py —
    grid sequencing + DMA issue latency), so fewer, deeper tiles win when
    VMEM allows — measured th=32 -> 64 on down1: 4.65 -> 4.08 ms at B=128
    (experiments/exp_th_sweep.py).  Rungs are (th, sub) pairs: sub>1
    splits the tile into in-kernel chunks so col/ys stay chunk-sized —
    e.g. (64, 2) runs half the grid steps of (32, 1) with the same big
    scratches.  Returns (th, sub) or None.  The budget tracks the 16 MiB
    scoped limit with the temporary-stack term above keeping real usage
    under it; every estimator-accepted rung is compile-probe verified."""
    from mimo_unet_tpu.ops.pallas.probe import probe_fits, probing_enabled

    do_probe = probing_enabled()
    # with the probe as authority, the estimator only pre-filters: allow a
    # margin so borderline rungs (the flagship decoder at (64, 2) sits
    # ~10% over the byte model) get their one cached probe compile instead
    # of a silent rejection; estimator-only flows keep the strict budget
    gate = int(budget * 1.15) if do_probe else budget
    for th, sub in ((64, 1), (64, 2), (64, 4), (64, 8),
                    (32, 1), (32, 2), (16, 1), (8, 1)):
        if h % th == 0 and (th // sub) % 2 == 0 and estimate_vmem(
                th, w, c1, c2, m, o, out_c, emit_hpool,
                x2_half_h=x2_half_h, sub=sub) <= gate:
            if not do_probe or probe_fits(
                    f"dc:th{th}.{sub}:w{w}:c{c1}x{c2}m{m}o{o}oc{out_c}"
                    f":hp{int(emit_hpool)}:hh{int(x2_half_h)}",
                    lambda: _probe_build_eval(
                        th, w, c1, c2, m, o, out_c, emit_hpool,
                        x2_half_h, sub)):
                return th, sub
    return None


def _probe_build_eval(th, w, c1, c2, m, o, out_c, emit_hpool, x2_half_h,
                      sub=1):
    """Batch-minimal (2 groups x 1 image, 1 x2 image) but VMEM-exact
    probe call for the fused DoubleConv kernel.  ``fuse_out`` is implied
    by out_c != align8(o) (every call site fusing the 1x1 out-conv passes
    its aligned width); group_minor / group_rows_out / w_img are pure
    index-map variations with identical allocations."""
    h, g = 2 * th, 2
    cp1 = align8(c1) + (align8(c2) if c2 else 0)
    ma, oa = align8(m), align8(o)
    fuse_out = out_c != oa
    S = jax.ShapeDtypeStruct
    bf, f32 = jnp.bfloat16, jnp.float32
    kwargs = dict(h=h, w=w, th=th, c1=c1, m=m, o=o, sub=sub,
                  emit_hpool=emit_hpool, interpret=False)
    if c2:
        kwargs.update(c2=c2, n2_images=1, x2_half_h=x2_half_h)
    x1 = S((c1, g * h * w), bf)
    parts = [x1, S((g, 3 * cp1, 3 * ma), f32),
             S((g, m), f32), S((g, m), f32),
             S((g, 3 * ma, 3 * oa), f32), S((g, o), f32), S((g, o), f32)]

    def fn(x1_, w1p_, s1_, sh1_, w2p_, s2_, sh2_, *rest):
        extra = dict(kwargs)
        rest = list(rest)
        if c2:
            extra["x2"] = rest.pop(0)
        if fuse_out:
            extra["wo"] = rest.pop(0)
            extra["bo"] = rest.pop(0)
        return fused_double_conv_ct(
            x1_, w1p_, s1_, sh1_, w2p_, s2_, sh2_, **extra)

    if c2:
        n2_rows = (h // 2) if x2_half_h else h
        parts.append(S((c2, n2_rows * w), bf))
    if fuse_out:
        parts.append(S((g, o, out_c), bf))
        parts.append(S((g, out_c), f32))
    return fn, tuple(parts)


def fused_double_conv_ct(
    x1: jax.Array,
    w1p: jax.Array,
    s1: jax.Array,
    sh1: jax.Array,
    w2p: jax.Array,
    s2: jax.Array,
    sh2: jax.Array,
    *,
    h: int,
    w: int,
    th: int,
    c1: int,
    m: int,
    o: int,
    x2: Optional[jax.Array] = None,
    c2: int = 0,
    n2_images: int = 0,
    wo: Optional[jax.Array] = None,
    bo: Optional[jax.Array] = None,
    emit_hpool: bool = False,
    group_rows_out: bool = False,
    w_img: Optional[int] = None,
    group_minor: bool = False,
    x2_half_h: bool = False,
    sub: int = 1,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """relu(bn2(conv2(relu(bn1(conv1(cat(x1, x2))))))) [-> 1x1 conv].

    x1:  [c1, N*H*W] CT activations (N images, h % th == 0, w % 128 == 0)
    x2:  optional [c2, n2_images*H*W] second concat input; its images
         repeat with period n2_images (N % n2_images == 0) — fuses the
         Up-block skip concat without materializing it
    w1p: [G, 3*(c1a+c2a), 3*ma] packed conv1 weights (pack_w3x3 per group)
    s1/sh1: [G, m] folded affine (fold_bn_eval)
    w2p: [G, 3*ma, 3*oa] packed conv2 weights; s2/sh2: [G, o]
    wo/bo: optional [G, o, oca] / [G, oc] fused 1x1 out-conv (+bias)
    Returns [align8(o) or align8(oc), N*H*W]; pad channels are zeros
    (exact), real channels first.  With ``emit_hpool`` (incompatible with
    ``wo``), additionally returns the H-halved max ([out_c, N*(H/2)*W]) —
    the row half of the Down block's 2x2 maxpool, so only the cheap W-pair
    max remains outside.

    ``w_img``: true image width when several images are packed per
    128-lane row (w = k * w_img, the packed row stride) — dy shifts and
    tile sizing use ``w``; the dx-combine reflect-edge masks use
    ``w_img``, so column reflect stays per-image.  Rows of a packed group
    must hold the SAME row index of k different images.

    ``group_rows_out``: write group g's output into row block g instead of
    interleaving groups along lanes — shape [G*out_c, (N/G)*H*W].  Pure
    index-map change (no extra copies); gives consumers that concatenate
    the subnetwork axis into channels (the shared core's input / up3 skip)
    their layout for free.

    ``x2_half_h``: x2 arrives at HALF height [c2, n2_images*(H/2)*W] with
    only the W-half of its bilinear x2 upsample applied; the H-half
    (align-corners row lerp, reference components.py:78
    Upsample(align_corners=True)) happens inside the column builder from
    a half-res slab — the full-res upsampled tensor never exists in HBM.
    """
    if interpret is None:
        interpret = _use_interpret()
    if isinstance(th, tuple):  # pick_th returns (th, sub)
        th, sub = th
    total = x1.shape[1]
    n_rows = total // w
    assert h % th == 0 and w % 128 == 0
    assert th % sub == 0 and (th // sub) % 2 == 0, (th, sub)
    n_tiles = n_rows // th
    tpi = h // th
    g = w1p.shape[0]
    gt = n_tiles // g  # tiles per group
    fuse_out = wo is not None
    ma, oa = align8(m), align8(o)
    if fuse_out:
        oc = bo.shape[1]
        out_c = align8(oc)
    else:
        out_c = oa
        wo = jnp.zeros((g, o, 8), x1.dtype)
        bo = jnp.zeros((g, 8), jnp.float32)
    oca = wo.shape[2]

    assert not (emit_hpool and fuse_out)
    group_minor = group_minor and c2 and g > 1
    bt2 = (n2_images * tpi) if c2 else 1
    kern = _make_kernel(th=th, w=w, c1=c1, c2=c2, m=m, o=o, out_c=out_c,
                        fuse_out=fuse_out, emit_hpool=emit_hpool,
                        tpi=tpi, bt2=bt2, w_img=w_img,
                        group_minor_g=g if group_minor else 0, gt=gt,
                        x2_half=(h // 2) if x2_half_h else 0, sub=sub,
                        out_dtype=x1.dtype, interpret=interpret)

    if group_minor:
        def _tile(i):
            return (i % g) * gt + i // g

        def _grp(i):
            return i % g

        def _x2pos(i):
            return (i // g) % bt2
    else:
        def _tile(i):
            return i

        def _grp(i):
            return i // gt

        def _x2pos(i):
            return i % bt2

    def x_spec(c, period_tiles, pos_fn):
        return pl.BlockSpec(
            (pl.Element(c), pl.Element((th + 8) * w, padding=(0, 8 * w))),
            lambda i: (0, pl.multiple_of(
                jnp.maximum((pos_fn(i) % period_tiles) * th - 4, 0) * w,
                128)),
            memory_space=pltpu.VMEM,
        )

    in_specs = [x_spec(c1, n_tiles, _tile)]
    operands = [x1]
    if c2:
        if x2_half_h:
            # half-res slab: sources for full-res ext rows [t*th-4,
            # t*th+th+4) of image ``img`` start at half row lo(t*th-4)
            # (clamped to the image start); the window is th/2+6 rows
            h2 = h // 2
            assert x2.shape[1] == n2_images * h2 * w

            def x2_map(i):
                pos = _x2pos(i)
                i_loc = pos % tpi
                img = pos // tpi
                base = jnp.maximum(
                    (i_loc * th - 4) * (h2 - 1) // (h - 1), 0)
                return (0, pl.multiple_of((img * h2 + base) * w, 128))

            in_specs.append(pl.BlockSpec(
                (pl.Element(c2),
                 pl.Element((th // 2 + 6) * w, padding=(0, 8 * w))),
                x2_map, memory_space=pltpu.VMEM))
        else:
            in_specs.append(x_spec(c2, bt2, _x2pos))
        operands.append(x2)

    def gspec(ndim_shape):
        return pl.BlockSpec(
            (None,) + ndim_shape, lambda i: (_grp(i),) + (0,) * len(ndim_shape),
            memory_space=pltpu.VMEM)

    in_specs += [
        gspec(w1p.shape[1:]),
        gspec((ma, 1)), gspec((ma, 1)),
        gspec(w2p.shape[1:]),
        gspec((oa, 1)), gspec((oa, 1)),
        gspec(wo.shape[1:]),
        gspec((oca, 1)),
    ]
    operands += [
        w1p.astype(x1.dtype),
        _padcol(s1, ma), _padcol(sh1, ma),
        w2p.astype(x1.dtype),
        _padcol(s2, oa), _padcol(sh2, oa),
        wo.astype(x1.dtype),
        _padcol(bo, oca),
    ]

    cp = align8(c1) + (align8(c2) if c2 else 0)
    if group_rows_out:
        omap = lambda i: (_grp(i), _tile(i) % gt)  # noqa: E731
        rows, cols = g * out_c, total // g
    else:
        omap = lambda i: (0, _tile(i))  # noqa: E731
        rows, cols = out_c, total
    out_specs = pl.BlockSpec((out_c, th * w), omap, memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((rows, cols), x1.dtype)
    if emit_hpool:
        out_specs = (out_specs,
                     pl.BlockSpec((out_c, th * w // 2), omap,
                                  memory_space=pltpu.VMEM))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((rows, cols // 2), x1.dtype))
    return pl.pallas_call(
        kern,
        name=(f"dc_c{c1}x{c2}m{m}o{o}_th{th}w{w}"
              + (f"s{sub}" if sub > 1 else "")),
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((3 * max(cp, ma), (th // sub + 2) * w), x1.dtype),
            pltpu.VMEM((3 * max(ma, oa), (th // sub + 2) * w), jnp.float32),
            pltpu.VMEM((m, (th + 2) * w), x1.dtype),
        ] + ([pltpu.VMEM((c2, (th + 8) * w), x1.dtype)]
             if (c2 and x2_half_h) else []),
        interpret=interpret,
    )(*operands)
