"""Bilinear x2 align-corners upsample on CT activations, one Pallas pass.

The train decoder feeds the core's output through a x2 bilinear upsample
(reference mimo/models/mimo_components/components.py:78 —
``nn.Upsample(scale_factor=2, mode="bilinear", align_corners=True)``).
The matmul-einsum form (ops/resize.py) costs ~14 ms/step of the B=128
flagship train backward: XLA lowers the two einsums with full-tensor
layout copies (6.1 ms of raw ``copy`` ops in the round-3 trace) and the
cotangent contractions re-read the full-res tensor.

Here the whole op is one kernel each way:

* forward: read the half-res slab, W-upsample each half row with one
  [w2 -> w] interp-matrix dot (MXU), then lerp full-res rows from the
  staged W-upsampled rows with exact integer align-corners scalar
  arithmetic (the same row math as ``fused_double_conv_ct(x2_half_h)``).
* backward: H-transpose first — each half row accumulates its <=5
  contributing full-res cotangent rows with the transposed lerp weights
  — then one [w -> w2] dot per half row (the W-transpose).

Both are single memory-speed passes; no intermediate ever lands in HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mimo_unet_tpu.ops.pallas.ct_conv import _use_interpret
from mimo_unet_tpu.ops.resize import _interp_matrix


def upsample2x_ct_supported(c: int, n: int, h2: int, w2: int) -> bool:
    return (c % 8 == 0 and w2 % 128 == 0 and h2 % 2 == 0
            and _pick_thh(h2) is not None)


def _pick_thh(h2: int):
    """Half-res tile rows: fwd stages (thh+2) W-upsampled rows + the
    2*thh-row output block; bwd needs a (2*thh+7)-row full-res slab to
    fit inside one image (h2 >= thh + 4)."""
    for thh in (16, 8, 4, 2):
        if h2 % thh == 0 and h2 >= thh + 4:
            return thh
    return None


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def upsample2x_ct(x, n, h2, w2, interpret=None):
    """[c, n*h2*w2] -> [c, n*(2*h2)*(2*w2)] bilinear x2 align-corners."""
    return _up2_fwd_call(x, n, h2, w2, interpret)


def _up2_fwd_call(x, n, h2, w2, interpret):
    if interpret is None:
        interpret = _use_interpret()
    c = x.shape[0]
    h, w = 2 * h2, 2 * w2
    thh = _pick_thh(h2)
    th = 2 * thh
    tpi = h2 // thh  # tiles per image
    n_tiles = n * tpi
    mwt = jnp.asarray(_interp_matrix(w2, w).T)  # [w2, w]

    def _fwd_base(i_loc):
        # exact lo of the tile's first output row, clamped so the
        # (thh+2)-row slab stays inside the image
        lo_first = (i_loc * th) * (h2 - 1) // (h - 1)
        return jnp.maximum(jnp.minimum(lo_first, h2 - (thh + 2)), 0)

    def x_map(i):
        i_loc = i % tpi
        img = i // tpi
        return (0, pl.multiple_of((img * h2 + _fwd_base(i_loc)) * w2, 128))

    def kern(x_ref, mw_ref, y_ref, stage):
        i = pl.program_id(0)
        i_loc = i % tpi
        base = _fwd_base(i_loc)
        # W-upsample the slab rows (bf16 dot, f32 accum — matches the
        # einsum's operand dtype)
        for j in range(thh + 2):
            stage[:, j * w:(j + 1) * w] = jax.lax.dot_general(
                x_ref[:, j * w2:(j + 1) * w2], mw_ref[...],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(stage.dtype)
        # H-lerp output rows from the staged half rows
        for j in range(th):
            r = i_loc * th + j
            num = r * (h2 - 1)
            lo = jnp.minimum(num // (h - 1), h2 - 2)
            f = ((num - lo * (h - 1)).astype(jnp.float32) / float(h - 1))
            sl = lo - base
            a = stage[:, pl.ds(pl.multiple_of(sl * w, 128), w)]
            b = stage[:, pl.ds(pl.multiple_of((sl + 1) * w, 128), w)]
            y_ref[:, j * w:(j + 1) * w] = (
                a.astype(jnp.float32) * (1.0 - f)
                + b.astype(jnp.float32) * f).astype(y_ref.dtype)

    return pl.pallas_call(
        kern,
        name=f"up2_ct_c{c}_w{w2}",
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((pl.Element(c),
                          pl.Element((thh + 2) * w2, padding=(0, 2 * w2))),
                         x_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((w2, w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, th * w), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, n * h * w), x.dtype),
        scratch_shapes=[pltpu.VMEM((c, (thh + 2) * w), x.dtype)],
        interpret=interpret,
    )(x, mwt.astype(x.dtype))


def _up2_bwd_call(g, n, h2, w2, dtype, interpret):
    if interpret is None:
        interpret = _use_interpret()
    c = g.shape[0]
    h, w = 2 * h2, 2 * w2
    thh = _pick_thh(h2)
    tpi = h2 // thh
    n_tiles = n * tpi
    mw = jnp.asarray(_interp_matrix(w2, w))  # [w, w2]

    # full-res rows contributing to half row R: r with lo(r) in {R-1, R};
    # src step is (h2-1)/(h-1) < 0.5 so the window size is bounded by 5
    ntap = 5

    def g_map(i):
        i_loc = i % tpi
        img = i // tpi
        # smallest contributing full row for R = i_loc*thh is
        # ceil((R-1)*(h-1)/(h2-1)) >= 2*R - 3
        base = jnp.maximum(i_loc * thh * 2 - 3, 0)
        base = jnp.minimum(base, h - (2 * thh + 2 + ntap))
        return (0, pl.multiple_of((img * h + base) * w, 128))

    def kern(g_ref, mw_ref, dx_ref, acc):
        i = pl.program_id(0)
        i_loc = i % tpi
        base = jnp.maximum(i_loc * thh * 2 - 3, 0)
        base = jnp.minimum(base, h - (2 * thh + 2 + ntap))
        for j in range(thh):
            r_half = i_loc * thh + j
            v = jnp.zeros((c, w), jnp.float32)
            r0 = 2 * r_half - 2
            for t in range(ntap):
                r = r0 + t
                rc = jnp.clip(r, 0, h - 1)
                num = rc * (h2 - 1)
                lo = jnp.minimum(num // (h - 1), h2 - 2)
                f = ((num - lo * (h - 1)).astype(jnp.float32)
                     / float(h - 1))
                wt = jnp.where(lo == r_half, 1.0 - f,
                               jnp.where(lo + 1 == r_half, f, 0.0))
                wt = jnp.where((r >= 0) & (r <= h - 1), wt, 0.0)
                sl = jnp.maximum(rc - base, 0)
                row = g_ref[:, pl.ds(pl.multiple_of(sl * w, 128), w)]
                v = v + wt * row.astype(jnp.float32)
            acc[:, j * w:(j + 1) * w] = v.astype(acc.dtype)
        for j in range(thh):
            dx_ref[:, j * w2:(j + 1) * w2] = jax.lax.dot_general(
                acc[:, j * w:(j + 1) * w], mw_ref[...],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dx_ref.dtype)

    return pl.pallas_call(
        kern,
        name=f"up2_ct_bwd_c{c}_w{w2}",
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(c),
                 pl.Element((2 * thh + 2 + ntap) * w, padding=(0, 3 * w))),
                g_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((w, w2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, thh * w2), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, n * h2 * w2), dtype),
        scratch_shapes=[pltpu.VMEM((c, thh * w), g.dtype)],
        interpret=interpret,
    )(g, mw.astype(g.dtype))


def upsample_w2x_ct_supported(c: int, rows: int, w2: int) -> bool:
    return (w2 % 128 == 0 and _pick_tr(rows) is not None
            and c * _pick_tr(rows) * 3 * w2 * 2 * 4 <= 12 * 2 ** 20)


def _pick_tr(rows: int):
    for tr in (16, 8, 4, 2, 1):
        if rows % tr == 0:
            return tr
    return None


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def upsample_w2x_ct(x, rows, w2, interpret=None):
    """W-half only of the bilinear x2: [c, rows*w2] -> [c, rows*2*w2],
    one memory-speed Pallas pass.

    The einsum form (ops/resize.py mat_einsum via fast_path
    ``_upsample_ct_w2``) needs a [c, rows, w2] view of the flat lane
    axis, and XLA materializes the view change as full-tensor layout
    copies around the pallas consumers (~750 MiB of raw ``copy`` ops in
    the round-4 eval trace).  Flat-in/flat-out with the W-dot per row
    inside the kernel, none of those copies exist."""
    return _w2x_fwd_call(x, rows, w2, interpret)


def _w2x_fwd_call(x, rows, w2, interpret):
    if interpret is None:
        interpret = _use_interpret()
    c = x.shape[0]
    w = 2 * w2
    tr = _pick_tr(rows)
    mwt = jnp.asarray(_interp_matrix(w2, w).T)  # [w2, w]

    def kern(x_ref, mw_ref, y_ref):
        for j in range(tr):
            y_ref[:, j * w:(j + 1) * w] = jax.lax.dot_general(
                x_ref[:, j * w2:(j + 1) * w2], mw_ref[...],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(y_ref.dtype)

    return pl.pallas_call(
        kern,
        name=f"upw2_ct_c{c}_w{w2}",
        grid=(rows // tr,),
        in_specs=[
            pl.BlockSpec((c, tr * w2), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w2, w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, tr * w), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, rows * w), x.dtype),
        interpret=interpret,
    )(x, mwt.astype(x.dtype))


def _w2x_bwd_call(g, rows, w2, dtype, interpret):
    if interpret is None:
        interpret = _use_interpret()
    c = g.shape[0]
    w = 2 * w2
    tr = _pick_tr(rows)
    mw = jnp.asarray(_interp_matrix(w2, w))  # [w, w2]

    def kern(g_ref, mw_ref, dx_ref):
        for j in range(tr):
            dx_ref[:, j * w2:(j + 1) * w2] = jax.lax.dot_general(
                g_ref[:, j * w:(j + 1) * w], mw_ref[...],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dx_ref.dtype)

    return pl.pallas_call(
        kern,
        name=f"upw2_ct_bwd_c{c}_w{w2}",
        grid=(rows // tr,),
        in_specs=[
            pl.BlockSpec((c, tr * w), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, w2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, tr * w2), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, rows * w2), dtype),
        interpret=interpret,
    )(g, mw.astype(g.dtype))


def lerp_h2x_transpose_supported(c: int, n: int, h2: int, w: int) -> bool:
    thh = _pick_thh(h2)
    if w % 128 != 0 or h2 % 2 != 0 or thh is None:
        return False
    vmem = (c * (2 * thh + 2 + 5) * w * 2 * 2  # full-res slab (dbuf)
            + c * thh * w * 2 * 2)             # half-H out block (dbuf)
    return vmem <= 12 * 2 ** 20


def lerp_h2x_transpose_ct(g, n, h2, w, dtype=None, interpret=None):
    """Transpose of the H-half row lerp alone: full-res cotangent
    [c, n*(2*h2)*w] -> half-height [c, n*h2*w] (w is the FULL width —
    the W-half transpose is its consumer's job, upsample_w2x_ct's VJP).

    Same tap math as _up2_bwd_call (each half row accumulates its <=5
    contributing full-res rows with the transposed align-corners lerp
    weights); used by conv3x3_ct_train(x2_half_h=True)'s backward, where
    the conv kernels consumed the half-H slab directly (reference
    components.py:78 Upsample splits as W-dot then row lerp)."""
    if interpret is None:
        interpret = _use_interpret()
    c = g.shape[0]
    h = 2 * h2
    thh = _pick_thh(h2)
    tpi = h2 // thh
    n_tiles = n * tpi
    ntap = 5

    def g_map(i):
        i_loc = i % tpi
        img = i // tpi
        base = jnp.maximum(i_loc * thh * 2 - 3, 0)
        base = jnp.minimum(base, h - (2 * thh + 2 + ntap))
        return (0, pl.multiple_of((img * h + base) * w, 128))

    def kern(g_ref, dx_ref):
        i = pl.program_id(0)
        i_loc = i % tpi
        base = jnp.maximum(i_loc * thh * 2 - 3, 0)
        base = jnp.minimum(base, h - (2 * thh + 2 + ntap))
        for j in range(thh):
            r_half = i_loc * thh + j
            v = jnp.zeros((c, w), jnp.float32)
            r0 = 2 * r_half - 2
            for t in range(ntap):
                r = r0 + t
                rc = jnp.clip(r, 0, h - 1)
                num = rc * (h2 - 1)
                lo = jnp.minimum(num // (h - 1), h2 - 2)
                f = ((num - lo * (h - 1)).astype(jnp.float32)
                     / float(h - 1))
                wt = jnp.where(lo == r_half, 1.0 - f,
                               jnp.where(lo + 1 == r_half, f, 0.0))
                wt = jnp.where((r >= 0) & (r <= h - 1), wt, 0.0)
                sl = jnp.maximum(rc - base, 0)
                row = g_ref[:, pl.ds(pl.multiple_of(sl * w, 128), w)]
                v = v + wt * row.astype(jnp.float32)
            dx_ref[:, j * w:(j + 1) * w] = v.astype(dx_ref.dtype)

    return pl.pallas_call(
        kern,
        name=f"uph2_ct_bwd_c{c}_w{w}",
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(c),
                 pl.Element((2 * thh + 2 + ntap) * w, padding=(0, 3 * w))),
                g_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, thh * w), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, n * h2 * w), dtype or g.dtype),
        interpret=interpret,
    )(g)


def _w2x_fwd_rule(x, rows, w2, interpret):
    return _w2x_fwd_call(x, rows, w2, interpret), None


def _w2x_bwd_rule(rows, w2, interpret, res, g):
    del res
    return (_w2x_bwd_call(g, rows, w2, g.dtype, interpret),)


upsample_w2x_ct.defvjp(_w2x_fwd_rule, _w2x_bwd_rule)


def _up2_fwd_rule(x, n, h2, w2, interpret):
    # out dtype == in dtype, so the cotangent's dtype is the dx dtype;
    # no residuals needed
    return _up2_fwd_call(x, n, h2, w2, interpret), None


def _up2_bwd_rule(n, h2, w2, interpret, res, g):
    del res
    return (_up2_bwd_call(g, n, h2, w2, g.dtype, interpret),)


upsample2x_ct.defvjp(_up2_fwd_rule, _up2_bwd_rule)
