"""Elementwise CT-layout helper kernels with per-group channel parameters.

The train path needs two group-blocked elementwise maps over [C, N*H*W]
activations (N group-major):

  * affine_relu_ct: z = relu(y * scale_g + shift_g)   (+ custom VJP)
  * g_eff_ct:       g = dy + dsum_g + 2 * y * dsumsq_g

In XLA, selecting the per-group parameters requires reshaping the lane
axis to [C, G, N/G*H*W], which forces full-tensor relayouts (measured 46
ms / 18 ms per call at B=64 — experiments/exp_glue_time.py).  As Pallas
kernels the group index is just a BlockSpec index map and both run at
memory speed.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mimo_unet_tpu.ops.pallas.ct_conv import _roll, _use_interpret, align8


def _block_lanes(total: int, groups: int, rows: int) -> int:
    """Largest power-of-two lane block that divides the per-group extent
    and keeps all double-buffered operands within ~8 MB of VMEM."""
    per_g = total // groups
    budget = 8 * 2 ** 20
    bl = 1 << 17
    while bl > 128 and (per_g % bl or rows * bl * 2 * 6 > budget):
        bl >>= 1
    return bl


def _gparam_spec(shape, bpg):
    return pl.BlockSpec(
        (None,) + shape, lambda i: (i // bpg,) + (0,) * len(shape),
        memory_space=pltpu.VMEM)


def _elem_call(kern, operands, gparams, out_shapes, total, groups,
               rows_list, interpret, n_stats=0, stats_rows=0, bpg_out=None,
               name="ct_elem"):
    """Run ``kern`` over column blocks; operands are [rows, total] arrays,
    gparams [G, k, 1] per-group columns; optional accumulated stats
    outputs [G, stats_rows, 1]."""
    bl = _block_lanes(total, groups, max(rows_list))
    n_blocks = total // bl
    bpg = n_blocks // groups
    in_specs = [
        pl.BlockSpec((r, bl), lambda i: (0, i), memory_space=pltpu.VMEM)
        for r in rows_list
    ] + [_gparam_spec(p.shape[1:], bpg) for p in gparams]
    out_specs = []
    out_sh = []
    for r, dt in out_shapes:
        out_specs.append(pl.BlockSpec((r, bl), lambda i: (0, i),
                                      memory_space=pltpu.VMEM))
        out_sh.append(jax.ShapeDtypeStruct((r, total), dt))
    for _ in range(n_stats):
        out_specs.append(pl.BlockSpec(
            (None, stats_rows, 1), lambda i: (i // bpg, 0, 0),
            memory_space=pltpu.VMEM))
        out_sh.append(jax.ShapeDtypeStruct((groups, stats_rows, 1),
                                           jnp.float32))
    return pl.pallas_call(
        functools.partial(kern, bpg=bpg),
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=tuple(out_specs) if len(out_specs) > 1 else out_specs[0],
        out_shape=tuple(out_sh) if len(out_sh) > 1 else out_sh[0],
        interpret=interpret,
        name=name,
    )(*operands, *gparams)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def affine_relu_ct(y, scale, shift, c_real, groups, interpret):
    """[Ca, total] bf16, scale/shift [G, c_real, 1] f32 ->
    relu(y*scale + shift) with zero pad rows."""
    ca = y.shape[0]

    def kern(y_ref, sc_ref, sh_ref, z_ref, *, bpg):
        a = (y_ref[0:c_real, :].astype(jnp.float32) * sc_ref[0:c_real]
             + sh_ref[0:c_real])
        z_ref[0:c_real, :] = jnp.maximum(a, 0.0).astype(z_ref.dtype)
        if ca > c_real:
            z_ref[c_real:ca, :] = jnp.zeros(
                (ca - c_real, z_ref.shape[1]), z_ref.dtype)

    return _elem_call(kern, [y], [scale, shift], [(ca, y.dtype)],
                      y.shape[1], groups, [ca], interpret,
                      name=f"affine_relu_c{c_real}")


def _affine_relu_fwd(y, scale, shift, c_real, groups, interpret):
    z = affine_relu_ct(y, scale, shift, c_real, groups, interpret)
    return z, (y, scale, shift)


def _affine_relu_bwd(c_real, groups, interpret, res, dz):
    y, scale, shift = res
    ca = y.shape[0]

    def kern(dz_ref, y_ref, sc_ref, sh_ref, dy_ref, dsc_ref, dsh_ref, *,
             bpg):
        i = pl.program_id(0)
        yv = y_ref[0:c_real, :].astype(jnp.float32)
        a = yv * sc_ref[0:c_real] + sh_ref[0:c_real]
        da = jnp.where(a > 0.0, dz_ref[0:c_real, :].astype(jnp.float32), 0.0)
        dy_ref[0:c_real, :] = (da * sc_ref[0:c_real]).astype(dy_ref.dtype)
        if ca > c_real:
            dy_ref[c_real:ca, :] = jnp.zeros(
                (ca - c_real, dy_ref.shape[1]), dy_ref.dtype)

        @pl.when((i % bpg) == 0)
        def _():
            dsc_ref[...] = jnp.zeros_like(dsc_ref)
            dsh_ref[...] = jnp.zeros_like(dsh_ref)

        dsc_ref[0:c_real, :] += jnp.sum(da * yv, axis=1, keepdims=True)
        dsh_ref[0:c_real, :] += jnp.sum(da, axis=1, keepdims=True)

    dy, dsc, dsh = _elem_call(
        kern, [dz, y], [scale, shift], [(ca, y.dtype)],
        y.shape[1], groups, [ca, ca], interpret,
        n_stats=2, stats_rows=scale.shape[1],
        name=f"affine_relu_bwd_c{c_real}")
    return dy, dsc, dsh


affine_relu_ct.defvjp(_affine_relu_fwd, _affine_relu_bwd)


def g_eff_ct(dy, y, dsum, dsumsq, o_real, groups, interpret=None):
    """[Oa, total] cotangent fold: dy + dsum_g + 2*y*dsumsq_g (pad rows
    zero).  Plain function — used inside custom-VJP backward rules."""
    if interpret is None:
        interpret = _use_interpret()
    oa = y.shape[0]
    ds = dsum.astype(jnp.float32)[..., None]
    dq = dsumsq.astype(jnp.float32)[..., None]

    def kern(dy_ref, y_ref, ds_ref, dq_ref, g_ref, *, bpg):
        g = (dy_ref[0:o_real, :].astype(jnp.float32) + ds_ref[0:o_real]
             + 2.0 * y_ref[0:o_real, :].astype(jnp.float32)
             * dq_ref[0:o_real])
        g_ref[0:o_real, :] = g.astype(g_ref.dtype)
        if oa > o_real:
            g_ref[o_real:oa, :] = jnp.zeros(
                (oa - o_real, g_ref.shape[1]), g_ref.dtype)

    return _elem_call(kern, [dy, y], [ds, dq], [(oa, y.dtype)],
                      y.shape[1], groups, [oa, oa], interpret,
                      name=f"g_eff_c{o_real}")


# input lanes per selection-dot chunk: MXU beats per 128 output lanes
# scale linearly with the chunk width (K passes), so keep it minimal —
# 256 in gives 128-lane-aligned output writes at 2 K-passes per dot
_WPOOL_CW = 256


def _wpool_bl(c: int, total: int) -> int:
    """Output lane block for max_pool_w_ct (input block is 2x).  VMEM:
    double-buffered in (4*bl*c bytes bf16 with 2x pipelining) + out +
    per-chunk f32 temps; capped at 8192 to bound the in-kernel chunk
    unroll (64 iterations)."""
    bl = 1 << 13
    while bl > _WPOOL_CW // 2 and (
            total % bl or c * bl * (8 + 4) + c * _WPOOL_CW * 12
            > 10 * 2 ** 20):
        bl >>= 1
    return bl


def wpool_ct_supported(c: int, rows: int, w: int) -> bool:
    """max_pool_w_ct eligibility: the flat lane stream must pair cleanly
    within chunk boundaries (w % 128, chunk-divisible total) and a lane
    block must divide the output."""
    total = rows * w
    if w % 128 != 0 or total % _WPOOL_CW != 0:
        return False
    bl = _wpool_bl(c, total // 2)
    return (total // 2) % bl == 0 and bl % (_WPOOL_CW // 2) == 0


def max_pool_w_ct(x, rows, w, interpret=None):
    """W-pair max on CT activations: [C, rows*w] -> [C, rows*(w//2)].

    One memory-speed pass replacing the two-einsum + max ``_wpool_ct``
    form (eval roofline rows "down1 W-pool" 2.0 ms / "core CT pool"
    2.3 ms vs 0.7 / 0.6 attainable; the einsum pair reads x twice and
    round-trips both half tensors through HBM).  The flat-lane view: with
    even w, out position j (flat) = max(x[2j], x[2j+1]) regardless of row
    boundaries, so per input chunk two exact 0/1 selection dots (even /
    odd lanes) + an f32 max compact the pairs — no rolls (bf16 rotates
    are unsupported), no full-block f32 temporaries, bitwise-equal to
    reduce_window on the bf16 values.  Forward-only: the eval fast path
    never differentiates through it (FGSM uses ``ct_disabled``)."""
    if interpret is None:
        interpret = _use_interpret()
    c, total = x.shape
    assert total == rows * w and wpool_ct_supported(c, rows, w)
    out_total = total // 2
    bl = _wpool_bl(c, out_total)
    cw = _WPOOL_CW
    je = 2 * jnp.arange(cw // 2)
    sel_e = jnp.zeros((cw, cw // 2), x.dtype).at[
        je, jnp.arange(cw // 2)].set(1)
    sel_o = jnp.zeros((cw, cw // 2), x.dtype).at[
        je + 1, jnp.arange(cw // 2)].set(1)

    def kern(x_ref, se_ref, so_ref, y_ref):
        se, so = se_ref[...], so_ref[...]
        for kc in range(2 * bl // cw):
            xc = x_ref[:, kc * cw:(kc + 1) * cw]
            even = jax.lax.dot_general(
                xc, se, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            odd = jax.lax.dot_general(
                xc, so, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            y_ref[:, kc * (cw // 2):(kc + 1) * (cw // 2)] = (
                jnp.maximum(even, odd).astype(y_ref.dtype))

    return pl.pallas_call(
        kern,
        grid=(out_total // bl,),
        in_specs=[
            pl.BlockSpec((c, 2 * bl), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cw, cw // 2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cw, cw // 2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, bl), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, out_total), x.dtype),
        interpret=interpret,
        name=f"maxpool_w_ct_c{c}",
    )(x, sel_e, sel_o)


def _pool_tr(c: int, n: int, h: int, w: int, skip: bool = False):
    """Input-row-pair tile count for max_pool2x2_ct (None = no fit).

    ``skip``: the backward also streams the full-res skip cotangent
    block (see max_pool2x2_skip_ct) — one more double-buffered
    [c, 2*tr*w] input."""
    rows = n * h
    w2 = w // 2
    for tr in (64, 32, 16, 8, 4, 2, 1):
        if (rows // 2) % tr:
            continue
        vmem = ((c * 2 * tr * w * 2 + c * tr * w2 * 2) * 2
                + c * w * 4 * 6 + w * w2 * 4 * 2)
        if skip:
            vmem += c * 2 * tr * w * 2 * 2
        if vmem <= 8 * 2 ** 20:
            return tr
    return None


def pool_ct_supported(c: int, n: int, h: int, w: int) -> bool:
    """w down to 128 qualifies (the core-boundary 128x128 pool): blocks
    stay lane-block aligned as long as the out block tr*(w//2) is a
    multiple of 128, which the tr check enforces."""
    if w % 128 != 0 or h % 2 != 0:
        return False
    tr = _pool_tr(c, n, h, w)
    return tr is not None and (tr * (w // 2)) % 128 == 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def max_pool2x2_ct(x, n, h, w, interpret):
    """2x2/stride-2 max pool directly on the CT tiling:
    [C, n*h*w] -> [C, n*(h//2)*(w//2)].

    The 4D ``reshape + reduce_window`` form physically retiles the tensor
    on the way in and the cotangent on the way out (the channel-sublane
    [C, N] tiling vs the row-sublane 4D tiling — two 805 MB copies per
    step at the flagship encoder, train HLO copy.404/413).  Here H-pairs
    are adjacent w-lane blocks (max + lane roll) and the W-pair compress
    is an exact 0/1 selection dot, so the pool reads and writes the
    kernels' native layout at memory speed.  Gradient keeps the
    equality-mask semantics of ops/pooling.py max_pool_2x2 (reference
    MaxPool2d, components.py:48)."""
    c = x.shape[0]
    w2 = w // 2
    tr = _pool_tr(c, n, h, w)
    sel = jnp.zeros((w, w2), jnp.float32).at[
        2 * jnp.arange(w2), jnp.arange(w2)].set(1.0)

    def kern(x_ref, sel_ref, y_ref):
        sv = sel_ref[...]
        for k in range(tr):
            r0 = x_ref[:, (2 * k) * w:(2 * k + 1) * w].astype(jnp.float32)
            r1 = x_ref[:, (2 * k + 1) * w:(2 * k + 2) * w].astype(jnp.float32)
            hm = jnp.maximum(r0, r1)
            wm = jnp.maximum(hm, _roll(hm, -1, interpret))
            out = jax.lax.dot_general(
                wm, sv, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            y_ref[:, k * w2:(k + 1) * w2] = out.astype(y_ref.dtype)

    n_blocks = (n * h) // (2 * tr)
    return pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((c, 2 * tr * w), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, w2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, tr * w2), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, n * (h // 2) * w2), x.dtype),
        interpret=interpret,
        name=f"maxpool_ct_c{c}_w{w}",
    )(x, sel)


def _pool_ct_fwd(x, n, h, w, interpret):
    y = max_pool2x2_ct(x, n, h, w, interpret)
    return y, (x, y)


def _pool_bwd_call(g, x, y, gs, n, h, w, interpret):
    """Equality-mask pool backward on the CT tiling; with ``gs`` (the
    skip-branch cotangent for the pool INPUT) its add is fused into the
    same pass — the full-res add_any never exists."""
    c = x.shape[0]
    w2 = w // 2
    tr = _pool_tr(c, n, h, w, skip=gs is not None)
    up = jnp.zeros((w2, w), jnp.float32)
    up = up.at[jnp.arange(w2), 2 * jnp.arange(w2)].set(1.0)
    up = up.at[jnp.arange(w2), 2 * jnp.arange(w2) + 1].set(1.0)

    def kern(*refs):
        refs = list(refs)
        g_ref, x_ref, y_ref = refs[:3]
        refs = refs[3:]
        gs_ref = refs.pop(0) if gs is not None else None
        up_ref, gx_ref = refs
        uv = up_ref[...]
        for k in range(tr):
            yk = y_ref[:, k * w2:(k + 1) * w2].astype(jnp.float32)
            gk = g_ref[:, k * w2:(k + 1) * w2].astype(jnp.float32)
            y_up = jax.lax.dot_general(
                yk, uv, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            g_up = jax.lax.dot_general(
                gk, uv, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            for r in range(2):
                lo = (2 * k + r) * w
                xr = x_ref[:, lo:lo + w].astype(jnp.float32)
                gv = jnp.where(xr == y_up, g_up, 0.0)
                if gs_ref is not None:
                    gv = gv + gs_ref[:, lo:lo + w].astype(jnp.float32)
                gx_ref[:, lo:lo + w] = gv.astype(gx_ref.dtype)

    n_blocks = (n * h) // (2 * tr)
    half_spec = pl.BlockSpec((c, tr * w2), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    full_spec = pl.BlockSpec((c, 2 * tr * w), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    in_specs = [half_spec, full_spec, half_spec]
    operands = [g, x, y]
    if gs is not None:
        in_specs.append(full_spec)
        operands.append(gs)
    in_specs.append(pl.BlockSpec((w2, w), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM))
    operands.append(up)
    return pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=full_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
        name=f"maxpool_ct_bwd{'s' if gs is not None else ''}_c{c}_w{w}",
    )(*operands)


def _pool_ct_bwd(n, h, w, interpret, res, g):
    x, y = res
    return (_pool_bwd_call(g, x, y, None, n, h, w, interpret),)


max_pool2x2_ct.defvjp(_pool_ct_fwd, _pool_ct_bwd)


def pool_skip_ct_supported(c: int, n: int, h: int, w: int) -> bool:
    if not pool_ct_supported(c, n, h, w):
        return False
    tr = _pool_tr(c, n, h, w, skip=True)
    return tr is not None and (tr * (w // 2)) % 128 == 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def max_pool2x2_skip_ct(x, n, h, w, interpret):
    """(pooled, skip=x) pair for a tensor that feeds BOTH a 2x2 max pool
    and a skip connection (the Down block's DoubleConv output, reference
    components.py:44-49 + model.py's U-Net skips).  Forward is the plain
    pool plus an identity; the value is the backward: the skip branch's
    cotangent streams into the pool-backward kernel and the full-res
    cotangent add_any (3 HBM passes over [C, N*H*W] at the flagship
    encoder) never materializes."""
    return max_pool2x2_ct(x, n, h, w, interpret), x


def _pool_skip_fwd(x, n, h, w, interpret):
    y = max_pool2x2_ct(x, n, h, w, interpret)
    return (y, x), (x, y)


def _pool_skip_bwd(n, h, w, interpret, res, gs):
    x, y = res
    g_pool, g_skip = gs
    return (_pool_bwd_call(g_pool, x, y, g_skip, n, h, w, interpret),)


max_pool2x2_skip_ct.defvjp(_pool_skip_fwd, _pool_skip_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def conv1x1_ct(z, wo, bo, c_real, groups, interpret):
    """Grouped 1x1 conv on CT activations: [Ca, total] x [G, c_real, OCa]
    (+ bias [G, OCa, 1]) -> [OCa, total].

    The XLA einsum form needs the [C, G, n] lane reshape (12.5 ms fwd+bwd
    at B=64); here the group index is a BlockSpec map and each block is
    one dot.
    """
    oca = wo.shape[2]

    def kern(z_ref, wo_ref, bo_ref, out_ref, *, bpg):
        out_ref[...] = (jax.lax.dot_general(
            wo_ref[:], z_ref[0:c_real, :],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bo_ref[:]).astype(
                out_ref.dtype)

    return _elem_call(kern, [z], [wo.astype(z.dtype), bo], [(oca, z.dtype)],
                      z.shape[1], groups, [z.shape[0]], interpret,
                      name=f"conv1x1_c{c_real}")


def _conv1x1_fwd(z, wo, bo, c_real, groups, interpret):
    out = conv1x1_ct(z, wo, bo, c_real, groups, interpret)
    return out, (z, wo)


def _conv1x1_bwd(c_real, groups, interpret, res, g):
    z, wo = res
    ca = z.shape[0]
    oca = wo.shape[2]

    def kern(g_ref, z_ref, wo_ref, dz_ref, dwo_ref, dbo_ref, *, bpg):
        i = pl.program_id(0)
        gv = g_ref[...]
        dz_ref[0:c_real, :] = jax.lax.dot_general(
            wo_ref[:], gv, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dz_ref.dtype)
        if ca > c_real:
            dz_ref[c_real:ca, :] = jnp.zeros(
                (ca - c_real, dz_ref.shape[1]), dz_ref.dtype)

        @pl.when((i % bpg) == 0)
        def _():
            dwo_ref[...] = jnp.zeros_like(dwo_ref)
            dbo_ref[...] = jnp.zeros_like(dbo_ref)

        dwo_ref[...] += jax.lax.dot_general(
            z_ref[0:c_real, :], gv,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dbo_ref[...] += jnp.sum(gv.astype(jnp.float32), axis=1,
                                keepdims=True)

    bl = _block_lanes(z.shape[1], groups, ca)
    n_blocks = z.shape[1] // bl
    bpg = n_blocks // groups
    dz, dwo, dbo = pl.pallas_call(
        functools.partial(kern, bpg=bpg),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((oca, bl), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ca, bl), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            _gparam_spec(wo.shape[1:], bpg),
        ],
        out_specs=(
            pl.BlockSpec((ca, bl), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, c_real, oca), lambda i: (i // bpg, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, oca, 1), lambda i: (i // bpg, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((ca, z.shape[1]), z.dtype),
            jax.ShapeDtypeStruct((groups, c_real, oca), jnp.float32),
            jax.ShapeDtypeStruct((groups, oca, 1), jnp.float32),
        ),
        interpret=interpret,
        name=f"conv1x1_bwd_c{c_real}",
    )(g, z, wo.astype(z.dtype))
    return dz, dwo.astype(wo.dtype), dbo


conv1x1_ct.defvjp(_conv1x1_fwd, _conv1x1_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def conv1x1_prelu_ct(y, scale, shift, wo, bo, c_real, groups, interpret):
    """Grouped 1x1 conv with the preceding BatchNorm affine + ReLU folded
    in: out = wo^T . relu(y*scale + shift) + bo.

    Train-path fusion of ``affine_relu_ct`` + ``conv1x1_ct``: the
    activated tensor z never lands in HBM (two full-res passes saved
    forward, three backward at the flagship decoder).  z is computed in
    f32 and cast to ``y.dtype`` before the dot — bitwise the composed
    pair.  y [Ca, total]; scale/shift [G, Ca, 1] f32; wo [G, c_real,
    OCa]; bo [G, OCa, 1].  Returns [OCa, total].
    """
    oca = wo.shape[2]

    def kern(y_ref, sc_ref, sh_ref, wo_ref, bo_ref, out_ref, *, bpg):
        a = (y_ref[0:c_real, :].astype(jnp.float32) * sc_ref[0:c_real]
             + sh_ref[0:c_real])
        z = jnp.maximum(a, 0.0).astype(y_ref.dtype)
        out_ref[...] = (jax.lax.dot_general(
            wo_ref[:], z, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bo_ref[:]).astype(
                out_ref.dtype)

    return _elem_call(kern, [y], [scale, shift, wo.astype(y.dtype), bo],
                      [(oca, y.dtype)], y.shape[1], groups, [y.shape[0]],
                      interpret, name=f"conv1x1_prelu_c{c_real}")


def _conv1x1_prelu_fwd(y, scale, shift, wo, bo, c_real, groups, interpret):
    out = conv1x1_prelu_ct(y, scale, shift, wo, bo, c_real, groups,
                           interpret)
    return out, (y, scale, shift, wo)


def _conv1x1_prelu_bwd(c_real, groups, interpret, res, g):
    y, scale, shift, wo = res
    ca = y.shape[0]
    oca = wo.shape[2]
    sr = scale.shape[1]  # scale/shift rows (>= c_real, may be < ca)

    def kern(g_ref, y_ref, sc_ref, sh_ref, wo_ref, dy_ref, dwo_ref,
             dbo_ref, dsc_ref, dsh_ref, *, bpg):
        i = pl.program_id(0)
        gv = g_ref[...]
        yv = y_ref[0:c_real, :].astype(jnp.float32)
        a = yv * sc_ref[0:c_real] + sh_ref[0:c_real]
        z = jnp.maximum(a, 0.0).astype(y_ref.dtype)
        dz = jax.lax.dot_general(
            wo_ref[:], gv, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        da = jnp.where(a > 0.0, dz, 0.0)
        dy_ref[0:c_real, :] = (da * sc_ref[0:c_real]).astype(dy_ref.dtype)
        if ca > c_real:
            dy_ref[c_real:ca, :] = jnp.zeros(
                (ca - c_real, dy_ref.shape[1]), dy_ref.dtype)

        @pl.when((i % bpg) == 0)
        def _():
            dwo_ref[...] = jnp.zeros_like(dwo_ref)
            dbo_ref[...] = jnp.zeros_like(dbo_ref)
            dsc_ref[...] = jnp.zeros_like(dsc_ref)
            dsh_ref[...] = jnp.zeros_like(dsh_ref)

        dwo_ref[...] += jax.lax.dot_general(
            z, gv, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dbo_ref[...] += jnp.sum(gv.astype(jnp.float32), axis=1,
                                keepdims=True)
        dsc_ref[0:c_real, :] += jnp.sum(da * yv, axis=1, keepdims=True)
        dsh_ref[0:c_real, :] += jnp.sum(da, axis=1, keepdims=True)

    bl = _block_lanes(y.shape[1], groups, ca)
    n_blocks = y.shape[1] // bl
    bpg = n_blocks // groups
    dy, dwo, dbo, dsc, dsh = pl.pallas_call(
        functools.partial(kern, bpg=bpg),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((oca, bl), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ca, bl), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            _gparam_spec(scale.shape[1:], bpg),
            _gparam_spec(shift.shape[1:], bpg),
            _gparam_spec(wo.shape[1:], bpg),
        ],
        out_specs=(
            pl.BlockSpec((ca, bl), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, c_real, oca), lambda i: (i // bpg, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, oca, 1), lambda i: (i // bpg, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, sr, 1), lambda i: (i // bpg, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, sr, 1), lambda i: (i // bpg, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((ca, y.shape[1]), y.dtype),
            jax.ShapeDtypeStruct((groups, c_real, oca), jnp.float32),
            jax.ShapeDtypeStruct((groups, oca, 1), jnp.float32),
            jax.ShapeDtypeStruct((groups, sr, 1), jnp.float32),
            jax.ShapeDtypeStruct((groups, sr, 1), jnp.float32),
        ),
        interpret=interpret,
        name=f"conv1x1_prelu_bwd_c{c_real}",
    )(g, y, scale, shift, wo.astype(y.dtype))
    return (dy, dsc.astype(scale.dtype), dsh.astype(shift.dtype),
            dwo.astype(wo.dtype), dbo)


conv1x1_prelu_ct.defvjp(_conv1x1_prelu_fwd, _conv1x1_prelu_bwd)
