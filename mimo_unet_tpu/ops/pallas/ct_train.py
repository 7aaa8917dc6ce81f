"""Training-mode CT conv kernels with a custom VJP.

Training cannot reuse the eval fused DoubleConv (ops/pallas/ct_conv.py):
train-mode BatchNorm (reference components.py:24,27 -> torch BatchNorm2d
training semantics, see ops/norm.py) normalizes each conv's output with
*global batch* statistics, so the second conv cannot start until the first
conv's full output statistics exist.  Instead each 3x3 conv is one kernel:

  conv3x3_ct_train(x, wp, scale, shift) ->
      (y_raw [Oa, N*H*W], sum [G, Oa, 1], sumsq [G, Oa, 1])

  * optional prologue: z = relu(x*scale + shift) applied to the input slab
    in VMEM (the previous conv's BatchNorm affine, whose scale/shift are
    computed in XLA from that conv's returned statistics) — the normalized
    activation never round-trips HBM;
  * conv: the eval kernel's column build (3 aligned dy copies, reflect
    fixes) + one big-K dot + rolled dx-plane combine, but *no* epilogue
    affine — y_raw is the raw conv output (bias excluded; it folds into
    the XLA-side statistics/affine math, which keeps the kernel linear in
    w and x);
  * per-group (subnetwork) sum / sum-of-squares accumulated across grid
    tiles for the BatchNorm batch statistics.

The custom VJP is two more kernels:

  * dx: the transpose of reflect-pad + conv is a zero-pad "full" conv with
    transposed taps plus *additive* reflect folds — the same masked-roll
    machinery with two extra fold terms per axis (col build carries dy and
    the H folds as in-column adds; dx-plane combine carries the W folds);
    the prologue's relu/affine backward (and its dscale/dshift channel
    reductions) fuse into the same kernel.
  * dw: the forward column build (recomputing z from x) contracted against
    three masked-roll variants of the cotangent over the huge flattened
    lane axis (K = N*H*W per tile), accumulated per group.

sum/sumsq are ordinary differentiable outputs: JAX feeds their cotangents
back through the VJP (g_eff = dy + dsum + 2*y_raw*dsumsq), which is exactly
the gradient path through the batch statistics that torch's BatchNorm
training backward computes.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mimo_unet_tpu.ops.pallas.ct_conv import (
    align8,
    _edge_masks,
    _roll,
    _use_interpret,
    pack_w3x3,
)


# ---------------------------------------------------------------------------
# forward


def _norm_th(th):
    """Normalize a tile pick to (th, sub) — int means sub=1."""
    return th if isinstance(th, tuple) else (th, 1)


def _build_train_cols(col, x_ref, z_of, *, cp, base, c, w, th, clamped,
                      first_img, last_img, q0=0, ln=None):
    """Chunked column build shared by the train fwd/dw kernels.

    Positions [q0, q0+ln) of the tile's th are written at col lane rows
    [0, ln*w): part dy position p holds input flat row i*th - 1 + dy +
    q0 + p (generic slab row 3+dy+q0+p; clamped slab — tile 0 — row
    q0+p-1+dy).  Reflect-row fixes (image row -1 -> row 1, row H -> row
    H-2) apply only when their position falls inside the window.
    q0=0/ln=th is the original whole-tile build; sub-tile chunks let
    th=64 run with chunk-sized col/ys scratches (the per-grid-step fixed
    cost amortizes over the deeper tile — same scheme as the eval
    kernels' (th, sub) rungs, ct_conv.py _build_cols)."""
    ln = th if ln is None else ln
    q1 = q0 + ln

    @pl.when(jnp.logical_not(clamped))
    def _():
        for dy in range(3):
            col[dy * cp + base:dy * cp + base + c, 0:ln * w] = z_of(
                x_ref[:, (3 + dy + q0) * w:(3 + dy + q0 + ln) * w])

    if q0 == 0:
        @pl.when(clamped)
        def _():
            # slab row s = flat row s; part dy covers rows [dy-1, dy-1+ln)
            col[base:base + c, w:ln * w] = z_of(x_ref[:, 0:(ln - 1) * w])
            col[cp + base:cp + base + c, 0:ln * w] = z_of(
                x_ref[:, 0:ln * w])
            col[2 * cp + base:2 * cp + base + c, 0:ln * w] = z_of(
                x_ref[:, w:(ln + 1) * w])

        # input row -1 (part dy=0 position 0) -> reflect row 1
        @pl.when(jnp.logical_and(first_img, jnp.logical_not(clamped)))
        def _():
            col[base:base + c, 0:w] = z_of(x_ref[:, 5 * w:6 * w])

        @pl.when(clamped)
        def _():
            col[base:base + c, 0:w] = z_of(x_ref[:, w:2 * w])
    else:
        @pl.when(clamped)
        def _():
            for dy in range(3):
                col[dy * cp + base:dy * cp + base + c, 0:ln * w] = z_of(
                    x_ref[:, (q0 - 1 + dy) * w:(q0 - 1 + dy + ln) * w])

    if q0 <= th - 1 < q1:
        j = th - 1 - q0
        # input row H (part dy=2 position th-1) -> reflect row H-2
        @pl.when(jnp.logical_and(last_img, jnp.logical_not(clamped)))
        def _():
            col[2 * cp + base:2 * cp + base + c, j * w:(j + 1) * w] = z_of(
                x_ref[:, (th + 2) * w:(th + 3) * w])

        @pl.when(jnp.logical_and(last_img, clamped))
        def _():
            col[2 * cp + base:2 * cp + base + c, j * w:(j + 1) * w] = z_of(
                x_ref[:, (th - 2) * w:(th - 1) * w])


def _fwd_kernel_maker(*, th, w, c1, c2, o, tpi, bt2, gt, prologue, out_dtype,
                      interpret, x2_half=0, sub=1):
    """Single 3x3 reflect conv over th output rows; col part dy position
    p (of th) holds input flat row i*th - 1 + dy + p.

    ``x2_half``: H/2 — x2 arrives at half height with only the W-half of
    its bilinear x2 upsample applied; the H row lerp is staged in VMEM
    (same math as fused_double_conv_ct(x2_half_h), ct_conv.py).

    ``sub``: in-kernel chunk count — col/ys are sized for tc = th/sub
    rows; each chunk builds, dots, combines and emits its tc rows, with
    the statistics accumulating across chunks (f32 add order differs
    from sub=1 by the partial-sum split only)."""
    c1a = align8(c1)
    c2a = align8(c2) if c2 else 0
    cp = c1a + c2a
    oa = align8(o)
    h = tpi * th
    tc = th // sub

    def z_maker(sc, sh, c):
        def z_of(v):
            if not prologue:
                return v
            a = v.astype(jnp.float32) * sc[0:c] + sh[0:c]
            return jnp.maximum(a, 0.0).astype(v.dtype)
        return z_of

    def kernel(*refs):
        refs = list(refs)
        x1_ref = refs.pop(0)
        x2_ref = refs.pop(0) if c2 else None
        if x2_half:
            x2s = refs.pop()
        w_ref, sc_ref, sh_ref, y_ref, sum_ref, ssq_ref, col, ys = refs
        i = pl.program_id(0)
        first_img = (i % tpi) == 0
        last_img = (i % tpi) == tpi - 1

        if c2 and x2_half:
            _stage_x2_half(x2_ref, x2s, i, th=th, w=w, tpi=tpi,
                           bt2=bt2, h=h, h2=x2_half)
            x2_ref = x2s

        @pl.when((i % gt) == 0)
        def _():
            sum_ref[...] = jnp.zeros_like(sum_ref)
            ssq_ref[...] = jnp.zeros_like(ssq_ref)

        for s_ in range(sub):
            q0 = s_ * tc
            _build_train_cols(
                col, x1_ref, z_maker(sc_ref, sh_ref, c1), cp=cp, base=0,
                c=c1, w=w, th=th, clamped=i == 0, first_img=first_img,
                last_img=last_img, q0=q0, ln=tc)
            if c1a > c1:
                for dy in range(3):
                    col[dy * cp + c1:dy * cp + c1a] = jnp.zeros(
                        (c1a - c1, tc * w), col.dtype)
            if c2:
                _build_train_cols(
                    col, x2_ref, z_maker(sc_ref, sh_ref, c2), cp=cp,
                    base=c1a, c=c2, w=w, th=th, clamped=(i % bt2) == 0,
                    first_img=first_img, last_img=last_img, q0=q0, ln=tc)
                if c2a > c2:
                    for dy in range(3):
                        col[dy * cp + c1a + c2:(dy + 1) * cp] = jnp.zeros(
                            (c2a - c2, tc * w), col.dtype)

            ys[...] = jax.lax.dot_general(
                w_ref[:], col[...],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

            first, last = _edge_masks(w, tc * w)
            y0 = ys[0:o, :]
            y1 = ys[oa:oa + o, :]
            y2 = ys[2 * oa:2 * oa + o, :]
            left = jnp.where(first, _roll(y0, -1, interpret),
                             _roll(y0, 1, interpret))
            right = jnp.where(last, _roll(y2, 1, interpret),
                              _roll(y2, -1, interpret))
            y = left + y1 + right
            yc = y.astype(out_dtype)
            y_ref[0:o, q0 * w:(q0 + tc) * w] = yc
            if oa > o:
                y_ref[o:oa, q0 * w:(q0 + tc) * w] = jnp.zeros(
                    (oa - o, tc * w), out_dtype)

            # statistics of the *cast* output (what the XLA BatchNorm
            # reads)
            yf = yc.astype(jnp.float32)
            sum_ref[0:o, :] += jnp.sum(yf, axis=1, keepdims=True)
            ssq_ref[0:o, :] += jnp.sum(yf * yf, axis=1, keepdims=True)

    return kernel


def _x_spec(c, th, w, period_tiles):
    return pl.BlockSpec(
        (pl.Element(c), pl.Element((th + 8) * w, padding=(0, 8 * w))),
        lambda i: (0, pl.multiple_of(
            jnp.maximum((i % period_tiles) * th - 4, 0) * w, 128)),
        memory_space=pltpu.VMEM,
    )


def _x2_half_spec(c, th, w, tpi, bt2, h, h2):
    """Half-height x2 slab: the (th/2+6)-row window whose rows lerp into
    the tile's (th+8) full-res ext rows (same window math as the eval
    kernel's x2_map, ct_conv.py fused_double_conv_ct)."""

    def x2_map(i):
        pos = i % bt2
        i_loc = pos % tpi
        img = pos // tpi
        base = jnp.maximum((i_loc * th - 4) * (h2 - 1) // (h - 1), 0)
        return (0, pl.multiple_of((img * h2 + base) * w, 128))

    return pl.BlockSpec(
        (pl.Element(c), pl.Element((th // 2 + 6) * w, padding=(0, 8 * w))),
        x2_map, memory_space=pltpu.VMEM)


def _stage_x2_half(x2_ref, x2s, i, *, th, w, tpi, bt2, h, h2):
    """Fill ``x2s`` with the tile's (th+8) full-res ext rows by row-lerping
    the half-height W-upsampled slab (align-corners weights from exact
    integer scalars — identical rounding to upsample2x_ct's forward, so
    the composed path is bitwise-equal to feeding the full-res tensor)."""
    pos = i % bt2
    i_loc = pos % tpi
    r_start = jnp.where(pos == 0, 0, i_loc * th - 4)
    base = jnp.maximum((i_loc * th - 4) * (h2 - 1) // (h - 1), 0)
    for j in range(th + 8):
        r = jnp.clip(r_start + j, 0, h - 1)
        num = r * (h2 - 1)
        lo = jnp.minimum(num // (h - 1), h2 - 2)
        f = (num - lo * (h - 1)).astype(jnp.float32) / float(h - 1)
        sl = lo - base
        a = x2_ref[:, pl.ds(pl.multiple_of(sl * w, 128), w)]
        b = x2_ref[:, pl.ds(pl.multiple_of((sl + 1) * w, 128), w)]
        x2s[:, j * w:(j + 1) * w] = (
            a.astype(jnp.float32) * (1.0 - f)
            + b.astype(jnp.float32) * f).astype(x2s.dtype)


def _gspec(shape, gt):
    return pl.BlockSpec(
        (None,) + shape, lambda i: (i // gt,) + (0,) * len(shape),
        memory_space=pltpu.VMEM)


def _conv_fwd(x1, x2, wp, scale, shift, *, h, w, th, c1, c2, o, n2_images,
              prologue, interpret, x2_half_h=False):
    th, sub = _norm_th(th)
    tc = th // sub
    total = x1.shape[1]
    n_tiles = total // (w * th)
    tpi = h // th
    g = wp.shape[0]
    gt = n_tiles // g
    oa = align8(o)
    c1a = align8(c1)
    cp = c1a + (align8(c2) if c2 else 0)
    bt2 = (n2_images * tpi) if c2 else 1
    h2 = h // 2
    kern = _fwd_kernel_maker(
        th=th, w=w, c1=c1, c2=c2, o=o, tpi=tpi, bt2=bt2, gt=gt,
        prologue=prologue, out_dtype=x1.dtype, interpret=interpret,
        x2_half=h2 if (c2 and x2_half_h) else 0, sub=sub)

    in_specs = [_x_spec(c1, th, w, n_tiles)]
    operands = [x1]
    if c2:
        if x2_half_h:
            assert x2.shape[1] == n2_images * h2 * w
            in_specs.append(_x2_half_spec(c2, th, w, tpi, bt2, h, h2))
        else:
            in_specs.append(_x_spec(c2, th, w, bt2))
        operands.append(x2)
    in_specs += [
        _gspec(wp.shape[1:], gt),
        _gspec(scale.shape[1:], gt),
        _gspec(shift.shape[1:], gt),
    ]
    operands += [wp.astype(x1.dtype), scale, shift]

    y, s, q = pl.pallas_call(
        kern,
        name=f"tr_fwd_c{c1}x{c2}o{o}_th{th}w{w}"
             f"{f's{sub}' if sub > 1 else ''}"
             f"{'hh' if (c2 and x2_half_h) else ''}",
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((oa, th * w), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, oa, 1), lambda i: (i // gt, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, oa, 1), lambda i: (i // gt, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((oa, total), x1.dtype),
            jax.ShapeDtypeStruct((g, oa, 1), jnp.float32),
            jax.ShapeDtypeStruct((g, oa, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((3 * cp, tc * w), x1.dtype),
            pltpu.VMEM((3 * oa, tc * w), jnp.float32),
        ] + ([pltpu.VMEM((c2, (th + 8) * w), x1.dtype)]
             if (c2 and x2_half_h) else []),
        interpret=interpret,
    )(*operands)
    return y, s[:, :o, 0], q[:, :o, 0]


# ---------------------------------------------------------------------------
# backward: dx (+ prologue backward, dscale/dshift)


def _dx_kernel_maker(*, th, w, c1, c2, o, tpi, bt2, gt, prologue, out_dtype,
                     interpret, chunks=None, fold_grp=0, sub=1):
    """dz = transpose of (reflect-pad + 3x3 conv) applied to g, then the
    prologue's relu/affine backward.  g col part dy position p (of th+2)
    holds g flat row i*th + p - dy (zero outside the image, with the
    reflect folds added in-column).

    ``fold_grp`` > 0 switches to the period-fold grid (see _conv_dx): the
    grid is (n2_tiles, grp) with the group axis minor, the x2 cotangent
    rows accumulate across the grp repetitions in an f32 scratch (bf16
    round-trip per step — bitwise the external slice-add fold) and are
    written once per tile to a separate [c2a, n2_total] output.  Requires
    prologue=False (the only train case with c2 — decoder conv1).

    ``sub``: in-kernel chunk count — chunk s computes dz rows
    [s*tc, (s+1)*tc) from col positions [s*tc, s*tc+tc+2) (two-row
    overlap re-read between chunks), with col/ys sized for tc+2 rows.
    Edge zeros and the in-column reflect folds apply in EVERY chunk
    whose window contains their position."""
    c1a = align8(c1)
    c2a = align8(c2) if c2 else 0
    cp = c1a + c2a
    oa = align8(o)
    r1 = th + 2
    tc = th // sub
    ln = tc + 2  # col positions per chunk
    chunks = chunks or ((0, cp),)
    fold = fold_grp > 0
    assert not (fold and prologue)

    def kernel(*refs):
        refs = list(refs)
        g_ref = refs.pop(0)
        x1_ref = refs.pop(0) if prologue else None
        x2_ref = refs.pop(0) if (prologue and c2) else None
        if fold:
            (wt_ref, sc_ref, sh_ref, dx_ref, dx2_ref, dsc_ref, dsh_ref,
             col, ys, acc) = refs
            t_id = pl.program_id(0)
            r_id = pl.program_id(1)
            i = r_id * gt + t_id
        else:
            wt_ref, sc_ref, sh_ref, dx_ref, dsc_ref, dsh_ref, col, ys = refs
            i = pl.program_id(0)
        first_img = (i % tpi) == 0
        last_img = (i % tpi) == tpi - 1

        if prologue:
            @pl.when((i % gt) == 0)
            def _():
                dsc_ref[...] = jnp.zeros_like(dsc_ref)
                dsh_ref[...] = jnp.zeros_like(dsh_ref)
        else:
            @pl.when(i == 0)
            def _():
                dsc_ref[...] = jnp.zeros_like(dsc_ref)
                dsh_ref[...] = jnp.zeros_like(dsh_ref)

        first, last = _edge_masks(w, ln * w)
        is1 = _col_eq(w, ln * w, 1)
        isw2 = _col_eq(w, ln * w, w - 2)
        zero = jnp.zeros((1, 1), jnp.float32)

        for s_ in range(sub):
            q0 = s_ * tc  # global col position of chunk window start

            # ---- col: g parts (generic slab row = 4 + p - dy)
            @pl.when(i > 0)
            def _(q0=q0):
                for dy in range(3):
                    col[dy * oa:(dy + 1) * oa, 0:ln * w] = (
                        g_ref[:, (4 - dy + q0) * w:(4 - dy + q0 + ln) * w])

            if q0 == 0:
                @pl.when(i == 0)
                def _():
                    # clamped slab: slab row s = flat row s
                    col[0:oa, 0:ln * w] = g_ref[:, 0:ln * w]
                    col[oa:2 * oa, w:ln * w] = g_ref[:, 0:(ln - 1) * w]
                    col[2 * oa:3 * oa, 2 * w:ln * w] = g_ref[
                        :, 0:(ln - 2) * w]
            else:
                @pl.when(i == 0)
                def _(q0=q0):
                    for dy in range(3):
                        col[dy * oa:(dy + 1) * oa, 0:ln * w] = (
                            g_ref[:, (q0 - dy) * w:(q0 - dy + ln) * w])

            # zero-pad edges: g rows outside this image contribute nothing
            if q0 == 0:
                @pl.when(first_img)
                def _():
                    col[oa:2 * oa, 0:w] = jnp.zeros((oa, w),
                                                    col.dtype)  # dy=1 p=0
                    col[2 * oa:3 * oa, 0:2 * w] = jnp.zeros(
                        (oa, 2 * w), col.dtype)                 # dy=2 p<2

            if q0 <= th < q0 + ln:  # positions th / th+1 in-window
                j = th - q0
                @pl.when(last_img)
                def _(j=j):
                    col[0:oa, j * w:ln * w] = jnp.zeros(
                        (oa, (ln - j) * w), col.dtype)
                    if j + 1 < ln:
                        col[oa:2 * oa, (j + 1) * w:ln * w] = jnp.zeros(
                            (oa, (ln - j - 1) * w), col.dtype)

            # reflect folds (H): dz row 1 += w[0]^T g[row 0]; row H-2 +=
            # w[2]^T g[row H-1] -> in-column adds at part0 p=2 / part2
            # p=th-1 (in every chunk window containing the position)
            if q0 <= 2 < q0 + ln:
                j = 2 - q0
                @pl.when(jnp.logical_and(first_img, i > 0))
                def _(j=j):
                    col[0:oa, j * w:(j + 1) * w] += g_ref[:, 4 * w:5 * w]

                @pl.when(i == 0)
                def _(j=j):
                    col[0:oa, j * w:(j + 1) * w] += g_ref[:, 0:w]

            if q0 <= th - 1 < q0 + ln:
                j = th - 1 - q0
                @pl.when(jnp.logical_and(last_img, i > 0))
                def _(j=j):
                    col[2 * oa:3 * oa, j * w:(j + 1) * w] += (
                        g_ref[:, (th + 3) * w:(th + 4) * w])

                @pl.when(jnp.logical_and(last_img, i == 0))
                def _(j=j):
                    col[2 * oa:3 * oa, j * w:(j + 1) * w] += (
                        g_ref[:, (th - 1) * w:th * w])

            # ---- W combine with zero edges + reflect folds, on chunk
            # planes.  ``chunks`` splits the dz channel rows so the f32 ys
            # scratch holds 3*cps rows instead of 3*cp — wide stages
            # (decoder conv1, cp=72) then fit a deeper tile.  The permuted
            # wt operand holds chunk ch's three dy parts contiguously
            # (see _conv_dx).
            woff = 0
            osl_g = slice(q0 * w, (q0 + tc) * w)  # output lanes of chunk
            for c0, cps in chunks:
                ys[0:3 * cps, :] = jax.lax.dot_general(
                    wt_ref[:, woff:woff + 3 * cps], col[...],
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                woff += 3 * cps
                v0 = ys[0:cps, :]
                v1 = ys[cps:2 * cps, :]
                v2 = ys[2 * cps:3 * cps, :]
                dz_full = (
                    jnp.where(last, zero, _roll(v0, -1, interpret))
                    + v1
                    + jnp.where(first, zero, _roll(v2, 1, interpret))
                    + jnp.where(is1, _roll(v0, 1, interpret), zero)
                    + jnp.where(isw2, _roll(v2, -1, interpret), zero)
                )
                dz = dz_full[:, w:(tc + 1) * w]

                if prologue:
                    # prologue inputs arrive as SEPARATE x1/x2 blocks
                    # (rows [0, c1a) from x1, [c1a, cp) from x2) —
                    # materializing the tiled concat in HBM cost ~4 GB of
                    # traffic per step at the flagship decoder.  Chunks
                    # may span the boundary: apply the relu/affine
                    # backward per row segment.
                    segs = []
                    if c0 < c1a:
                        segs.append((c0, min(c0 + cps, c1a), x1_ref, 0))
                    if c2 and c0 + cps > c1a:
                        segs.append((max(c0, c1a), c0 + cps, x2_ref, c1a))
                    for lo, hi, ref, off in segs:
                        xv = ref[lo - off:hi - off, osl_g].astype(
                            jnp.float32)
                        scs = sc_ref[lo:hi]
                        a = xv * scs + sh_ref[lo:hi]
                        da = jnp.where(a > 0.0, dz[lo - c0:hi - c0], 0.0)
                        dx_ref[lo:hi, osl_g] = (da * scs).astype(out_dtype)
                        dsc_ref[lo:hi] += jnp.sum(da * xv, axis=1,
                                                  keepdims=True)
                        dsh_ref[lo:hi] += jnp.sum(da, axis=1,
                                                  keepdims=True)
                elif fold:
                    lo1, hi1 = c0, min(c0 + cps, c1a)
                    if hi1 > lo1:
                        dx_ref[lo1:hi1, osl_g] = dz[
                            lo1 - c0:hi1 - c0].astype(out_dtype)
                    lo2, hi2 = max(c0, c1a), c0 + cps
                    if hi2 > lo2:
                        val = dz[lo2 - c0:hi2 - c0].astype(
                            out_dtype).astype(jnp.float32)

                        @pl.when(r_id == 0)
                        def _(val=val, lo2=lo2, hi2=hi2, osl_g=osl_g):
                            acc[lo2 - c1a:hi2 - c1a, osl_g] = val

                        @pl.when(r_id > 0)
                        def _(val=val, lo2=lo2, hi2=hi2, osl_g=osl_g):
                            acc[lo2 - c1a:hi2 - c1a, osl_g] += val
                else:
                    dx_ref[c0:c0 + cps, osl_g] = dz.astype(out_dtype)

        if fold:
            @pl.when(r_id == fold_grp - 1)
            def _():
                dx2_ref[...] = acc[...].astype(out_dtype)

    return kernel


def _col_eq(w, lanes, value):
    j = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1)
    if w & (w - 1) == 0:
        return (j & (w - 1)) == value
    return jax.lax.rem(j, w) == value


def _dx_chunks(cp: int, split: bool):
    """Channel-row chunks for the dz combine.  Split halves the f32 ys
    scratch (3*cps rows instead of 3*cp) so wide stages fit deeper tiles;
    chunk sizes stay sublane multiples and >= 32 to keep the dot's M
    dimension MXU-worthy."""
    if not split or cp < 64:
        return ((0, cp),)
    half = (cp // 2 + 7) // 8 * 8
    return ((0, half), (half, cp - half))


def _conv_dx(g, x1, x2, wtp, scale, shift, *, h, w, th, c1, c2, o, prologue,
             interpret, out_dtype, split=False, fold_n2_total=None):
    """g [oa_, N*H*W] -> d(concat input) [cp, N*H*W] (+dscale/dshift).

    Prologue inputs come as separate aligned-row blocks: x1 [c1a, total]
    and (when c2) x2 [c2a, n2_total] with its tile period — the concat
    never materializes.

    ``fold_n2_total`` (requires c2, no prologue, reps == groups) switches
    to the period-fold form: returns (dx1 [c1a, total], dx2 [c2a,
    n2_total], dsc, dsh) with the x2 cotangent summed over its tile
    repetitions inside the kernel — the tiled [c2a, total] cotangent
    never lands in HBM (1.6 GB write + 1.6 GB read per step at the
    flagship decoder, plus the external slice-add pass)."""
    th, sub = _norm_th(th)
    tc = th // sub
    total = g.shape[1]
    n_tiles = total // (w * th)
    tpi = h // th
    grp = wtp.shape[0]
    gt = n_tiles // grp
    c1a = align8(c1)
    cp = c1a + (align8(c2) if c2 else 0)
    oa = align8(o)
    fold = fold_n2_total is not None
    if fold:
        assert c2 and not prologue
        assert total // fold_n2_total == grp
        assert gt == fold_n2_total // (w * th)
    chunks = _dx_chunks(cp, split)
    if len(chunks) > 1:
        # permute wt output columns (wtp is [G, 3oa, 3cp]) so each chunk's
        # three dy parts are contiguous
        parts = []
        for c0, cps in chunks:
            for dy in range(3):
                parts.append(wtp[:, :, dy * cp + c0:dy * cp + c0 + cps])
        wtp = jnp.concatenate(parts, axis=2)
    kern = _dx_kernel_maker(
        th=th, w=w, c1=c1, c2=c2, o=o, tpi=tpi, bt2=1, gt=gt,
        prologue=prologue, out_dtype=out_dtype, interpret=interpret,
        chunks=chunks, fold_grp=grp if fold else 0, sub=sub)

    if fold:
        return _conv_dx_fold_call(
            kern, g, wtp, scale, shift, th=th, w=w, c1a=c1a,
            c2a=align8(c2), cp=cp, oa=oa, grp=grp, gt=gt, total=total,
            n2_total=fold_n2_total, out_dtype=out_dtype,
            interpret=interpret, chunks=chunks, sub=sub)

    in_specs = [_x_spec(oa, th, w, n_tiles)]
    operands = [g]
    if prologue:
        in_specs.append(pl.BlockSpec((c1a, th * w), lambda i: (0, i),
                                     memory_space=pltpu.VMEM))
        operands.append(x1)
        if c2:
            n2_tiles = x2.shape[1] // (th * w)
            in_specs.append(pl.BlockSpec(
                (align8(c2), th * w), lambda i: (0, i % n2_tiles),
                memory_space=pltpu.VMEM))
            operands.append(x2)
    in_specs += [
        _gspec(wtp.shape[1:], gt),
        _gspec(scale.shape[1:], gt),
        _gspec(shift.shape[1:], gt),
    ]
    operands += [wtp.astype(g.dtype), scale, shift]

    dx, dsc, dsh = pl.pallas_call(
        kern,
        name=f"tr_dx_c{c1a}x{c2 and align8(c2)}o{oa}_th{th}w{w}"
             f"{f's{sub}' if sub > 1 else ''}",
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((cp, th * w), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, cp, 1), lambda i: (i // gt, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, cp, 1), lambda i: (i // gt, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((cp, total), out_dtype),
            jax.ShapeDtypeStruct((grp, cp, 1), jnp.float32),
            jax.ShapeDtypeStruct((grp, cp, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((3 * oa, (tc + 2) * w), g.dtype),
            pltpu.VMEM((3 * max(c for _, c in chunks), (tc + 2) * w),
                       jnp.float32),
        ],
        interpret=interpret,
    )(*operands)
    return dx, dsc[..., 0], dsh[..., 0]


def _conv_dx_fold_call(kern, g, wtp, scale, shift, *, th, w, c1a, c2a, cp,
                       oa, grp, gt, total, n2_total, out_dtype, interpret,
                       chunks, sub=1):
    """pallas_call plumbing for the period-fold dx grid: (n2_tiles, grp)
    with the group axis minor, so the dx2 output block and its f32
    accumulator stay resident across the grp repetitions of each tile."""
    n2t = gt

    def g_map(t, r):
        return (0, pl.multiple_of(
            jnp.maximum((r * n2t + t) * th - 4, 0) * w, 128))

    g_spec = pl.BlockSpec(
        (pl.Element(oa), pl.Element((th + 8) * w, padding=(0, 8 * w))),
        g_map, memory_space=pltpu.VMEM)

    def p_spec(shape):
        return pl.BlockSpec((None,) + shape, lambda t, r: (r, 0, 0),
                            memory_space=pltpu.VMEM)

    dx1, dx2, dsc, dsh = pl.pallas_call(
        kern,
        name=f"tr_dxfold_c{c1a}x{c2a}o{oa}_th{th}w{w}"
             f"{f's{sub}' if sub > 1 else ''}",
        grid=(n2t, grp),
        in_specs=[g_spec, p_spec(wtp.shape[1:]), p_spec(scale.shape[1:]),
                  p_spec(shift.shape[1:])],
        out_specs=(
            pl.BlockSpec((c1a, th * w), lambda t, r: (0, r * n2t + t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c2a, th * w), lambda t, r: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, cp, 1), lambda t, r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, cp, 1), lambda t, r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((c1a, total), out_dtype),
            jax.ShapeDtypeStruct((c2a, n2_total), out_dtype),
            jax.ShapeDtypeStruct((grp, cp, 1), jnp.float32),
            jax.ShapeDtypeStruct((grp, cp, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((3 * oa, (th // sub + 2) * w), g.dtype),
            pltpu.VMEM((3 * max(c for _, c in chunks), (th // sub + 2) * w),
                       jnp.float32),
            pltpu.VMEM((c2a, th * w), jnp.float32),
        ],
        interpret=interpret,
    )(g, wtp.astype(g.dtype), scale, shift)
    return dx1, dx2, dsc[..., 0], dsh[..., 0]


# ---------------------------------------------------------------------------
# backward: dw


def _dw_kernel_maker(*, th, w, c1, c2, o, tpi, bt2, gt, prologue, interpret,
                     x2_half=0, sub=1):
    c1a = align8(c1)
    c2a = align8(c2) if c2 else 0
    cp = c1a + c2a
    oa = align8(o)
    h = tpi * th
    tc = th // sub

    def z_maker(sc, sh, c):
        def z_of(v):
            if not prologue:
                return v
            a = v.astype(jnp.float32) * sc[0:c] + sh[0:c]
            return jnp.maximum(a, 0.0).astype(v.dtype)
        return z_of

    def kernel(*refs):
        refs = list(refs)
        x1_ref = refs.pop(0)
        x2_ref = refs.pop(0) if c2 else None
        if x2_half:
            x2s = refs.pop()
        g_ref, sc_ref, sh_ref, dw_ref, col, gv = refs
        i = pl.program_id(0)
        first_img = (i % tpi) == 0
        last_img = (i % tpi) == tpi - 1

        if c2 and x2_half:
            _stage_x2_half(x2_ref, x2s, i, th=th, w=w, tpi=tpi,
                           bt2=bt2, h=h, h2=x2_half)
            x2_ref = x2s

        @pl.when((i % gt) == 0)
        def _():
            dw_ref[...] = jnp.zeros_like(dw_ref)

        for s_ in range(sub):
            q0 = s_ * tc
            _build_train_cols(
                col, x1_ref, z_maker(sc_ref, sh_ref, c1), cp=cp, base=0,
                c=c1, w=w, th=th, clamped=i == 0, first_img=first_img,
                last_img=last_img, q0=q0, ln=tc)
            if c1a > c1:
                for dy in range(3):
                    col[dy * cp + c1:dy * cp + c1a] = jnp.zeros(
                        (c1a - c1, tc * w), col.dtype)
            if c2:
                _build_train_cols(
                    col, x2_ref, z_maker(sc_ref, sh_ref, c2), cp=cp,
                    base=c1a, c=c2, w=w, th=th, clamped=(i % bt2) == 0,
                    first_img=first_img, last_img=last_img, q0=q0, ln=tc)
                if c2a > c2:
                    for dy in range(3):
                        col[dy * cp + c1a + c2:(dy + 1) * cp] = jnp.zeros(
                            (c2a - c2, tc * w), col.dtype)

            # the three dx-variants of g (transpose of the fwd W-combine)
            gval = g_ref[:, q0 * w:(q0 + tc) * w].astype(jnp.float32)
            first, last = _edge_masks(w, tc * w)
            is1 = _col_eq(w, tc * w, 1)
            isw2 = _col_eq(w, tc * w, w - 2)
            zero = jnp.zeros((1, 1), jnp.float32)
            g0 = (jnp.where(last, zero, _roll(gval, -1, interpret))
                  + jnp.where(is1, _roll(gval, 1, interpret), zero))
            g2 = (jnp.where(first, zero, _roll(gval, 1, interpret))
                  + jnp.where(isw2, _roll(gval, -1, interpret), zero))
            gv[0:oa, :] = g0.astype(gv.dtype)
            gv[oa:2 * oa, :] = gval.astype(gv.dtype)
            gv[2 * oa:3 * oa, :] = g2.astype(gv.dtype)

            # dw[dy, dx] += col_part_dy . g_variant_dx over the lane axis
            dw_ref[...] += jax.lax.dot_general(
                col[...], gv[...],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

    return kernel


def _conv_dw(g, x1, x2, scale, shift, *, h, w, th, c1, c2, o, n2_images,
             prologue, interpret, x2_half_h=False):
    """Returns dwp [G, 3cp, 3oa] f32 (packed layout, same as pack_w3x3...
    but with dx blocks along columns in units of align8(o))."""
    th, sub = _norm_th(th)
    tc = th // sub
    total = g.shape[1]
    n_tiles = total // (w * th)
    tpi = h // th
    c1a = align8(c1)
    cp = c1a + (align8(c2) if c2 else 0)
    oa = align8(o)
    grp = scale.shape[0]
    gt = n_tiles // grp
    bt2 = (n2_images * tpi) if c2 else 1
    h2 = h // 2
    kern = _dw_kernel_maker(
        th=th, w=w, c1=c1, c2=c2, o=o, tpi=tpi, bt2=bt2, gt=gt,
        prologue=prologue, interpret=interpret,
        x2_half=h2 if (c2 and x2_half_h) else 0, sub=sub)

    in_specs = [_x_spec(c1, th, w, n_tiles)]
    operands = [x1]
    if c2:
        if x2_half_h:
            assert x2.shape[1] == n2_images * h2 * w
            in_specs.append(_x2_half_spec(c2, th, w, tpi, bt2, h, h2))
        else:
            in_specs.append(_x_spec(c2, th, w, bt2))
        operands.append(x2)
    in_specs += [
        pl.BlockSpec((oa, th * w), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        _gspec(scale.shape[1:], gt),
        _gspec(shift.shape[1:], gt),
    ]
    operands += [g, scale, shift]

    dwp = pl.pallas_call(
        kern,
        name=f"tr_dw_c{c1}x{c2}o{o}_th{th}w{w}"
             f"{f's{sub}' if sub > 1 else ''}"
             f"{'hh' if (c2 and x2_half_h) else ''}",
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((None, 3 * cp, 3 * oa),
                               lambda i: (i // gt, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grp, 3 * cp, 3 * oa), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((3 * cp, tc * w), x1.dtype),
            pltpu.VMEM((3 * oa, tc * w), x1.dtype),
        ] + ([pltpu.VMEM((c2, (th + 8) * w), x1.dtype)]
             if (c2 and x2_half_h) else []),
        interpret=interpret,
    )(*operands)
    return dwp


def _estimate_vmem_kind(kind: str, th: int, w: int, c1: int, c2: int,
                        o: int, x2_half_h: bool = False,
                        sub: int = 1) -> int:
    """Rough scoped-VMEM bytes for one train kernel at tile height ``th``.
    The dx backward kernel dominates: its f32 plane scratch spans 3*cp
    rows of (th+2)*w lanes, plus double-buffered in/out slabs.  (Measured
    anchors: decoder conv1 dx at cp=72, oa=32, th=16, w=640 allocates
    20.99 MiB against the 16 MiB scoped limit; at w=256 the same stage
    compiles at th=16 and fails at th=32, and dec conv2 dx fails at th=64
    — all correctly predicted by these formulas.)

    fwd and dw additionally carry Mosaic's vector-temporary stack for
    their f32 combines (rolls/wheres on [o, th*w] planes; the fwd stats
    passes add yf/yf*yf planes): in_conv conv2 fwd at th=32, w=640
    measured 17.67 MiB real scoped usage against the 13.2 MiB buffer-only
    estimate — ~2.3 extra f32 output planes; budgeted as 3."""
    cp = align8(c1) + (align8(c2) if c2 else 0)
    oa = align8(o)
    tc = th // sub  # chunk rows (col/ys/gv/temps scale with tc)
    if kind in ("dx", "dx_split", "dx_fold", "dx_fold_split"):
        c2w = (tc + 2) * w  # chunk column lanes
        cps = (max(c for _, c in _dx_chunks(cp, True))
               if kind.endswith("_split") else cp)
        base = (3 * oa * c2w * 2        # g column scratch (bf16)
                + 3 * cps * c2w * 4     # dx plane scratch (f32)
                + 2 * cp * th * w * 4   # dx out block, double-buffered
                + 2 * oa * (th + 6) * w * 2  # g in slab, double-buffered
                + 2 * cp * th * w * 2)  # x1 prologue slab, double-buffered
        if kind.startswith("dx_fold"):
            # fold has no prologue slab but carries the f32 x2 accumulator
            base += align8(c2) * th * w * 4 - 2 * cp * th * w * 2
        return base
    temps = 3 * oa * tc * w * 4  # combine/stats vector temporaries (f32)
    c2a = align8(c2) if c2 else 0
    if x2_half_h and c2:
        # x2 slab halves (th/2+6 of th+8 rows) but adds the full-res lerp
        # staging scratch plus its f32 lerp temporaries (~2 planes) —
        # same accounting as ct_conv.estimate_vmem(x2_half_h)
        slabs = (2 * (cp - c2a) * (th + 6) * w * 2
                 + 2 * c2a * (th // 2 + 6) * w * 2
                 + c2a * (th + 8) * w * 2)
        temps += 2 * c2a * w * 4
    else:
        slabs = 2 * cp * (th + 6) * w * 2
    if kind == "fwd":
        return (3 * cp * tc * w * 2 + 3 * oa * tc * w * 4
                + slabs + 2 * oa * th * w * 2 + temps)
    return (3 * cp * tc * w * 2 + 3 * oa * tc * w * 2
            + slabs + 2 * oa * th * w * 2 + temps)


def estimate_vmem_train(th: int, w: int, c1: int, c2: int, o: int) -> int:
    return max(_estimate_vmem_kind(k, th, w, c1, c2, o)
               for k in ("dx", "fwd", "dw"))


# Per-kernel tile ladders (experiments/exp_train_th.py, B=128 flagship):
# the kernels carry a per-tile fixed cost, so deeper tiles win until VMEM
# runs out — dx gains the most (inconv.c1 dx 3.79 -> 1.92 ms at th=64),
# and fwd wins at 64 wherever it fits (inconv.c1 4.86 -> 4.42, down1.c1
# 2.73 -> 1.66; the stages where 64 regressed are exactly the ones the
# VMEM estimate rejects).  Round 5: rungs are (th, sub) pairs for fwd/dw
# — sub>1 splits the tile into in-kernel chunks with chunk-sized col/ys
# scratches (the eval kernels' scheme, ct_conv.py), so th=64 runs where
# only th=32 scratches fit.  dw's plain th=64 measured non-monotone
# (down1 and dec.c2 preferred 16-32 even where 64 fit — VMEM-pressure
# spills), so its ladder leads with the chunked (64, 2) instead.
_TH_LADDER = {
    # fwd: (64, 4)'s chunk overhead loses to a plain th=32 (decoder fwd
    # measured 7.94 vs 7.46 ms at B=128), so the quartered rung sits
    # below (32, 1)
    "fwd": ((64, 1), (64, 2), (32, 1), (64, 4), (32, 2), (16, 1), (8, 1),
            (4, 1)),
    "dw": ((64, 2), (64, 4), (32, 1), (32, 2), (16, 1), (8, 1), (4, 1)),
    # dx: no (64, 1) rung — it passes the standalone probe at exactly the
    # 16 MiB line but OOMs by ~20 KB inside the full train graph (probe
    # context can under-measure marginal stack use); the chunked (64, 2)
    # reaches the same tile depth with half the col/ys footprint
    "dx": ((64, 2), (32, 1), (32, 2), (16, 1), (8, 1), (4, 1)),
    "dx_split": ((64, 2), (32, 1), (32, 2), (16, 1), (8, 1), (4, 1)),
    "dx_fold": ((64, 2), (32, 1), (32, 2), (16, 1), (8, 1), (4, 1)),
    "dx_fold_split": ((64, 2), (32, 1), (32, 2), (16, 1), (8, 1), (4, 1)),
}


def _probe_build_kind(kind: str, th: int, w: int, c1: int, c2: int,
                      o: int, prologue: bool, x2_half_h: bool = False):
    """(fn, ShapeDtypeStruct args) for compile-probing one train kernel.

    Probe shapes are batch-minimal (2 groups, one image per group, one
    x2 image) but VMEM-exact: every block and scratch allocation in the
    train kernels depends only on th/w/channel counts — the batch size
    changes the grid length, never a per-tile allocation.  ``h = 2*th``
    keeps two tiles per image so the clamped/unclamped column paths both
    compile.  ``th`` may be a (th, sub) rung — the sub flows through to
    the kernel wrappers."""
    h = 2 * _norm_th(th)[0]
    grp = 2
    c1a = align8(c1)
    c2a = align8(c2) if c2 else 0
    cp = c1a + c2a
    oa = align8(o)
    bf, f32 = jnp.bfloat16, jnp.float32
    total = grp * h * w
    n2_total = h * w
    S = jax.ShapeDtypeStruct
    x1 = S((c1, total), bf)
    x2 = S((c2, n2_total // 2 if x2_half_h else n2_total), bf) if c2 else None
    sc = S((grp, cp, 1), f32)
    sh = S((grp, cp, 1), f32)
    if kind == "fwd":
        wp = S((grp, 3 * cp, 3 * oa), f32)
        fn = functools.partial(
            _conv_fwd, h=h, w=w, th=th, c1=c1, c2=c2, o=o,
            n2_images=1 if c2 else 0, prologue=prologue, interpret=False,
            x2_half_h=x2_half_h)
        return fn, (x1, x2, wp, sc, sh)
    if kind == "dw":
        g = S((oa, total), bf)
        fn = functools.partial(
            _conv_dw, h=h, w=w, th=th, c1=c1, c2=c2, o=o,
            n2_images=1 if c2 else 0, prologue=prologue, interpret=False,
            x2_half_h=x2_half_h)
        return fn, (g, x1, x2, sc, sh)
    # dx family
    g = S((oa, total), bf)
    wtp = S((grp, 3 * oa, 3 * cp), f32)
    split = kind.endswith("_split")
    fold = kind.startswith("dx_fold")
    fn = functools.partial(
        _conv_dx, h=h, w=w, th=th, c1=c1, c2=c2, o=o,
        prologue=prologue and not fold, interpret=False, out_dtype=bf,
        split=split, fold_n2_total=n2_total if fold else None)
    if fold:
        return fn, (g, None, None, wtp, sc, sh)
    x1p = S((c1a, total), bf) if prologue else None
    x2p = S((c2a, n2_total), bf) if (prologue and c2) else None
    return fn, (g, x1p, x2p, wtp, sc, sh)


def _probe_ok(kind: str, th, w: int, c1: int, c2: int, o: int,
              prologue: bool, x2_half_h: bool = False) -> bool:
    from mimo_unet_tpu.ops.pallas.probe import probe_fits, probing_enabled

    if not probing_enabled():
        return True
    thi, sub = _norm_th(th)
    # "tr2": probe results are only valid for the kernel code that was
    # probed — the round-5 chunk-loop restructure shifted Mosaic's stack
    # allocation by ~20 KB even at sub=1 (dec.c2 dx at th=64 crossed the
    # 16 MiB line with a stale "fits" cached under the old key), so the
    # version prefix retires every pre-chunking cache entry
    key = (f"tr2:{kind}:th{thi}{f'.{sub}' if sub > 1 else ''}:w{w}:"
           f"c{c1}x{c2}o{o}:p{int(prologue)}"
           f"{':hh1' if x2_half_h else ''}")
    return probe_fits(
        key, lambda: _probe_build_kind(kind, th, w, c1, c2, o, prologue,
                                       x2_half_h))


def pick_th_kind(kind: str, h: int, w: int, c1: int, c2: int, o: int,
                 budget: int = 15 * 2 ** 20, *,
                 prologue: bool = True, x2_half_h: bool = False
                 ) -> Optional[int]:
    """Deepest tile height of ``kind``'s ladder that divides ``h``, fits
    the scoped-VMEM estimate, AND (on TPU) compile-probes clean.

    The estimate orders the ladder and encodes measured perf preferences
    (it deliberately over-rejects tiles that fit but regress); the probe
    is the authority on "fits" — an estimator lie can cost a rung of
    perf but can no longer ship a kernel that fails to compile
    (VERDICT r3 item 2; two rounds of estimator-miss OOMs before it).
    Returns a (th, sub) rung (sub=1 unless the kind's ladder carries
    chunked rungs)."""
    for th, sub in _TH_LADDER[kind]:
        if x2_half_h and not (h % 2 == 0 and th // 2 + 6 <= h // 2):
            continue
        if h % th == 0 and _estimate_vmem_kind(
                kind, th, w, c1, c2, o, x2_half_h, sub=sub) <= budget:
            if _probe_ok(kind, (th, sub), w, c1, c2, o, prologue,
                         x2_half_h):
                return (th, sub)
    return None


def pick_th_kind_forced(kind: str, h: int, w: int, c1: int, c2: int,
                        o: int, th_cap: int, *,
                        prologue: bool = True,
                        x2_half_h: bool = False) -> int:
    """Fallback when the estimator rejects the whole ladder: the largest
    dividing rung <= min(th_cap, 16) that compile-probes clean.  Off-TPU
    this keeps the historical ``min(th_cap, 16)`` choice (ADVICE r3: the
    unprobed fallback could itself exceed scoped VMEM)."""
    cap = min(_norm_th(th_cap)[0], 16)
    from mimo_unet_tpu.ops.pallas.probe import probing_enabled

    if not probing_enabled():
        return (cap, 1)
    for th, sub in _TH_LADDER[kind]:
        if th <= cap and h % th == 0 and _probe_ok(
                kind, (th, sub), w, c1, c2, o, prologue, x2_half_h):
            return (th, sub)
    raise RuntimeError(
        f"no CT train {kind} tile compiles for w={w}, c1={c1}, c2={c2}, "
        f"o={o} — even th=4 exceeds scoped VMEM on this chip; the shape "
        "should have been rejected by ct_train_path_supported")


def pick_th_train(h: int, w: int, c1: int, c2: int, o: int,
                  budget: int = 15 * 2 ** 20, *,
                  prologue: bool = True,
                  x2_half_h: bool = False) -> Optional[int]:
    """Forward-kernel tile height (also the feasibility probe used by the
    fast-path gates: whenever the fwd kernel fits, the dx/dw ladders reach
    a fitting tile too — their th=4 footprints are strictly smaller)."""
    return pick_th_kind("fwd", h, w, c1, c2, o, budget, prologue=prologue,
                        x2_half_h=x2_half_h)


# ---------------------------------------------------------------------------
# custom-VJP composite


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11, 12, 13))
def conv3x3_ct_train(x1, x2, wp, scale, shift,
                     h, w, th, c1, c2, o, n2_images, interpret,
                     x2_half_h=False):
    """Differentiable train-mode CT conv (see module docstring).

    x1 [c1, N*H*W] bf16; x2 optional [c2, N2*H*W] (period N2) or None;
    wp [G, 3*cp, 3*align8(o)] packed (pack_w3x3, concat-order blocks);
    scale/shift [G, cp, 1] f32 prologue affine (pass scale=None for no
    prologue).  Returns (y_raw [align8(o), N*H*W], sum [G, o], sumsq
    [G, o]).

    ``x2_half_h``: x2 arrives at HALF height [c2, N2*(H/2)*W] with only
    the W-half of its bilinear x2 upsample applied (upsample_w2x_ct);
    the H row lerp is staged inside the fwd/dw kernels and the backward
    H-transposes the full-res x2 cotangent (lerp_h2x_transpose_ct) —
    the full-res upsampled tensor never exists in HBM.  Requires no
    prologue and the period-fold dx layout (x2 reps == groups).
    """
    prologue = scale is not None
    if scale is None:
        cp = align8(c1) + (align8(c2) if c2 else 0)
        g = wp.shape[0]
        scale = jnp.ones((g, cp, 1), jnp.float32)
        shift = jnp.zeros((g, cp, 1), jnp.float32)
    return _conv_fwd(x1, x2, wp, scale, shift, h=h, w=w, th=th, c1=c1,
                     c2=c2, o=o, n2_images=n2_images, prologue=prologue,
                     interpret=interpret, x2_half_h=x2_half_h)


def _train_fwd_rule(x1, x2, wp, scale, shift,
                    h, w, th, c1, c2, o, n2_images, interpret,
                    x2_half_h=False):
    out = conv3x3_ct_train(x1, x2, wp, scale, shift,
                           h, w, th, c1, c2, o, n2_images, interpret,
                           x2_half_h)
    return out, (x1, x2, wp, scale, shift, out[0])


def _train_bwd_rule(h, w, th, c1, c2, o, n2_images, interpret, x2_half_h,
                    res, cot):
    x1, x2, wp, scale, shift, y_raw = res
    dy, dsum, dssq = cot
    prologue = scale is not None
    grp = wp.shape[0]
    oa = align8(o)
    c1a = align8(c1)
    c2a = align8(c2) if c2 else 0
    cp = c1a + c2a
    total = x1.shape[1]
    n_per_g = total // grp  # lanes per group

    # fold the statistics cotangents into the conv-output cotangent:
    # sum = SUM y, sumsq = SUM y^2  =>  g_eff = dy + dsum + 2*y*dsumsq
    # (group-blocked; Pallas — the XLA reshape/broadcast form relayouts
    # the whole tensor, experiments/exp_glue_time.py)
    from mimo_unet_tpu.ops.pallas.ct_elem import g_eff_ct

    g_eff = g_eff_ct(dy, y_raw, dsum, dssq, o, grp, interpret)

    if scale is None:
        scale_k = jnp.ones((grp, cp, 1), jnp.float32)
        shift_k = jnp.zeros((grp, cp, 1), jnp.float32)
    else:
        scale_k, shift_k = scale, shift

    # transposed packed weights [G, 3oa, 3cp]: block (dy, dxw) = w[dy,dxw]^T
    def transpose_pack(wg):
        out = jnp.zeros((3 * oa, 3 * cp), wg.dtype)
        for dy in range(3):
            for dxw in range(3):
                blk = wg[dy * cp:(dy + 1) * cp, dxw * oa:(dxw + 1) * oa]
                out = out.at[dy * oa:(dy + 1) * oa,
                             dxw * cp:(dxw + 1) * cp].set(blk.T)
        return out

    wtp = jnp.stack([transpose_pack(wp[g]) for g in range(grp)])

    # prologue inputs for the dx kernel's relu/affine backward: separate
    # aligned-row blocks (x2 keeps its period inside the kernel) — tiling
    # + concatenating them in HBM cost ~4 GB of traffic per step at the
    # flagship decoder shape
    x1p = x2p = None
    if prologue:
        x1p = _pad_rows(x1, c1a)
        if c2 is not None and c2:
            x2p = _pad_rows(x2, c2a)

    # independent tile heights per backward kernel (the dx kernel's VMEM
    # footprint differs from dw's, and deeper dx tiles win big —
    # experiments/exp_train_th.py).  Wide stages (cp >= 64: decoder conv1)
    # additionally split the dz combine into two channel chunks when that
    # unlocks a deeper tile (halved f32 ys scratch — the dx pick for
    # dec.c1 moves 16 -> 32 at the flagship).
    cp_ = align8(c1) + (align8(c2) if c2 else 0)
    # period-fold dx (c2 without prologue, reps == groups — the train
    # decoder conv1): the kernel sums the x2 cotangent over its tile
    # repetitions in VMEM, so the tiled [c2a, total] cotangent and the
    # external slice-add fold never touch HBM
    n2_total = (2 * x2.shape[1] if (c2 and x2_half_h)
                else (x2.shape[1] if c2 else 0))
    fold_ok = bool(c2) and not prologue and total // n2_total == grp
    if x2_half_h:
        assert fold_ok, "x2_half_h needs no prologue and x2 reps == groups"
    kind_base = "dx_fold" if fold_ok else "dx"
    th_dx = (pick_th_kind(kind_base, h, w, c1, c2, o, prologue=prologue)
             or pick_th_kind_forced(kind_base, h, w, c1, c2, o, th,
                                    prologue=prologue))
    dx_split = False
    if cp_ >= 64:
        th_dxs = pick_th_kind(kind_base + "_split", h, w, c1, c2, o,
                              prologue=prologue)
        if th_dxs is not None and th_dxs[0] > th_dx[0]:
            th_dx, dx_split = th_dxs, True
    th_dw = (pick_th_kind("dw", h, w, c1, c2, o, prologue=prologue,
                          x2_half_h=x2_half_h)
             or pick_th_kind_forced("dw", h, w, c1, c2, o, th,
                                    prologue=prologue,
                                    x2_half_h=x2_half_h))
    if fold_ok:
        dx1_rows, dx2_rows_f, dsc, dsh = _conv_dx(
            g_eff, None, None, wtp, scale_k, shift_k, h=h, w=w, th=th_dx,
            c1=c1, c2=c2, o=o, prologue=False, interpret=interpret,
            out_dtype=x1.dtype, split=dx_split, fold_n2_total=n2_total)
    else:
        dxcat, dsc, dsh = _conv_dx(
            g_eff, x1p, x2p, wtp, scale_k, shift_k, h=h, w=w, th=th_dx,
            c1=c1, c2=c2, o=o, prologue=prologue, interpret=interpret,
            out_dtype=x1.dtype, split=dx_split)

    dwp = _conv_dw(
        g_eff, x1, x2, scale_k, shift_k, h=h, w=w, th=th_dw,
        c1=c1, c2=c2, o=o, n2_images=n2_images, prologue=prologue,
        interpret=interpret, x2_half_h=x2_half_h)
    # dw in packed layout: columns are in units of oa; wp columns are in
    # units of align8(o) == oa with 3 dx blocks — same layout; cast to wp
    dwp = dwp.astype(wp.dtype)

    if fold_ok:
        dx1 = dx1_rows[:c1]
        dx2 = dx2_rows_f[:c2]
        if x2_half_h:
            # transpose of the in-kernel H row lerp: full-res cotangent
            # -> half-height (the W-half transpose belongs to the
            # upsample_w2x_ct producer's own VJP)
            from mimo_unet_tpu.ops.pallas.ct_resize import (
                lerp_h2x_transpose_ct)

            dx2 = lerp_h2x_transpose_ct(dx2, n2_images, h // 2, w,
                                        dtype=x2.dtype,
                                        interpret=interpret)
    else:
        dx1 = dxcat[:c1]
        if c2:
            # sum the tiled x2 cotangent over its repetitions with
            # lane-aligned slice adds: the reshape([c2, reps, n2]) + reduce
            # form retiles the whole tensor to T(2,128) and costs ~17
            # ms/step at B=64 (profiler trace, docs/PERFORMANCE.md round
            # 3); slices on the lane axis keep T(8,128) and the adds fuse
            # to one memory-speed pass
            n2_total = x2.shape[1]
            reps = total // n2_total
            dx2_rows = dxcat[c1a:c1a + c2]
            dx2 = dx2_rows[:, :n2_total].astype(jnp.float32)
            for r in range(1, reps):
                dx2 = dx2 + dx2_rows[:, r * n2_total:(r + 1) * n2_total]
            dx2 = dx2.astype(x2.dtype)
        else:
            dx2 = None
    if prologue:
        dscale = dsc[:, :, None].astype(scale.dtype)
        dshift = dsh[:, :, None].astype(shift.dtype)
    else:
        dscale = None
        dshift = None
    return (dx1.astype(x1.dtype), dx2, dwp, dscale, dshift)


def _pad_rows(x, n):
    c = x.shape[0]
    if c == n:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((n - c, x.shape[1]), x.dtype)], axis=0)


conv3x3_ct_train.defvjp(_train_fwd_rule, _train_bwd_rule)
