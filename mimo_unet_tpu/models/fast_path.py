"""CT-layout inference fast path for MimoUNet.

Runs the per-subnetwork encoders and decoders — the high-resolution,
small-channel stages where NHWC XLA convs waste the machine — through the
fused channel-transposed Pallas kernels (ops/pallas/ct_conv.py), keeping
the shared core (reference model.py:178-243) on the tuned NHWC XLA path
where channel counts are large enough to feed the MXU.

Activations in CT layout are [C_pad, N*H*W] with channels padded to
sublane multiples (pad channels exact zeros).  Subnetworks are folded
S-major into the image axis (N = S*B), matching the grouped-weight
selection in the kernel, and the Up-block's skip concat is fused into the
decoder kernel (two-input mode) instead of materializing the
[S*B, H, W, 63] tensor.

Eval-only: BatchNorm folds into the kernels' affine epilogues and dropout
is inactive, exactly the reference's inference configuration
(ensemble.py:46-49 eval()).  Training and MC-dropout fall back to the
reference NHWC path in models/mimo_unet.py.

Multi-device: ``pallas_call`` has no GSPMD partitioning rule, so when a
data-parallel mesh is active (parallel/mesh.py ct_mesh_scope) the kernel
sections run under ``jax.shard_map`` over the data axis.  Each device runs
the unmodified kernels on its local batch; the train path's BatchNorm
batch statistics are psum'd across the axis before the affine glue, which
reproduces the reference's single-device global-batch BN semantics
(reference components.py:24,27) at any device count.  The statistics
gradient path stays exact: shard_map's reverse transposes the psum, so the
custom VJP's dsum/dsumsq cotangents arrive replicated — the same
``g_eff = dy + dsum + 2y*dsumsq`` fold as on one chip.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from mimo_unet_tpu.models.mimo_unet import MimoUNetConfig, core_apply
from mimo_unet_tpu.ops.pallas.ct_conv import (
    align8,
    fold_bn_eval,
    fused_double_conv_ct,
    pack_w3x3,
    pick_th,
)
from mimo_unet_tpu.ops.resize import _interp_matrix

_WARNED: set = set()

# trace-time switch: the eval CT kernels carry no JVP rule, so code that
# differentiates *through* an eval forward (FGSM input gradients,
# eval/fgsm.py) must trace the XLA path instead.  The flag is consulted by
# the support gates at trace time, so wrapping just the jax.grad call in
# ``ct_disabled()`` is enough — the surrounding jitted program still runs
# its plain forwards on the CT kernels.
_CT_DISABLED = False


class ct_disabled:
    """Context manager: trace enclosed code with the CT fast path off."""

    def __enter__(self):
        global _CT_DISABLED
        self._prev = _CT_DISABLED
        _CT_DISABLED = True

    def __exit__(self, *exc):
        global _CT_DISABLED
        _CT_DISABLED = self._prev
        return False


def _warn_once(key: str, msg: str) -> None:
    if key not in _WARNED:
        _WARNED.add(key)
        print(f"[fast_path] {msg}")


def _active_ct_mesh(x_shape, gate_key: str):
    """(mesh, axis_name) when the CT sections must run under shard_map.

    Returns (None, None) for single-device execution.  Raises nothing —
    ineligible meshes are reported by the gates instead."""
    from mimo_unet_tpu.parallel.mesh import DATA_AXIS, current_ct_mesh

    mesh = current_ct_mesh()
    if mesh is None:
        return None, None
    d = dict(mesh.shape).get(DATA_AXIS, 1)
    if d <= 1:
        return None, None
    return mesh, DATA_AXIS


def _mesh_eligible(x_shape, gate_key: str) -> bool:
    """False when an active mesh exists that the CT path cannot serve
    (spatial partitioning, or a batch that doesn't divide the data axis)."""
    from mimo_unet_tpu.parallel.mesh import (
        DATA_AXIS,
        SPATIAL_AXIS,
        current_ct_mesh,
    )

    mesh = current_ct_mesh()
    if mesh is None:
        return True
    shape = dict(mesh.shape)
    if shape.get(SPATIAL_AXIS, 1) > 1:
        _warn_once(
            f"{gate_key}-spatial",
            "CT kernels disabled under a spatial (2-D) mesh; "
            "falling back to the XLA path",
        )
        return False
    d = shape.get(DATA_AXIS, 1)
    if d > 1 and x_shape[0] % d != 0:
        _warn_once(
            f"{gate_key}-divis",
            f"CT kernels disabled: batch {x_shape[0]} does not divide the "
            f"{d}-device data axis; falling back to the XLA path",
        )
        return False
    return True


def ct_fast_path_supported(
    cfg: MimoUNetConfig,
    x_shape: Tuple[int, ...],
    *,
    train: bool,
    mc_dropout: bool,
) -> bool:
    """True when the CT kernel path applies (see module docstring).

    MC dropout supports every reference site: center dropout lives in the
    XLA core, final dropout between the decoder kernel and the 1x1
    out-conv, and the spatial ``Dropout2d`` sites (the documented MC
    recipe ``encoder/core/decoder_dropout_rate 0.1``, reference
    Readme.md:82) as per-(image, channel) scales on the kernel outputs —
    keyed identically to the XLA path, so masks match it bitwise
    (tests/test_ct_conv.py)."""
    if cfg.ct_kernels == "off" or _CT_DISABLED:
        return False
    if cfg.ct_kernels != "force" and jax.default_backend() != "tpu":
        return False
    if train:
        return False
    if cfg.compute_dtype != "bfloat16" or cfg.mode != "bilinear":
        return False
    if len(x_shape) != 5:
        return False
    h, w = x_shape[2], x_shape[3]
    # every in-kernel lane offset is a multiple of w, so w % 128 == 0 keeps
    # them lane-block aligned (640 = 5*128: NYUv2 whole frames qualify);
    # down1 additionally needs the HALF width aligned — when it isn't
    # (640/2 = 320 = 2.5*128) the apply path runs down1 on the vmapped
    # NHWC XLA fallback between the CT in_conv and decoder kernels
    if w % 128 != 0 or h % 2 != 0:
        return False
    if not _mesh_eligible(x_shape, "eval"):
        return False
    f, s = cfg.filter_base_count, cfg.num_subnetworks
    fs = f * s
    cin = cfg.in_channels
    # per-stage tile fit, probed with the exact out_c values the apply path
    # uses: in_conv (cin -> f -> f), down1 (f -> 2f -> 2f at half
    # resolution, only when aligned), decoder (f + 2fs/2 -> ~in/2 -> f,
    # fused out-conv with align8(out_channels) — or align8(f) on the
    # mc-dropout final-dropout branch, which skips the fused 1x1)
    dec_c2 = 2 * fs // cfg.factor
    mid_c = (f + dec_c2) // 2  # decoder mid = in_channels // 2
    if mc_dropout and (cfg.final_dropout_rate > 0
                       or cfg.decoder_dropout_rate > 0):
        dec_out_c = align8(f)  # unfused-1x1 branch
    else:
        dec_out_c = align8(cfg.out_channels)
    if cin <= 8:
        from mimo_unet_tpu.ops.pallas.ct_conv import pick_th9
        in_ok = pick_th9(h, w, cin, f, f,
                         emit_hpool=_ct_down1_aligned(h, w)) is not None
    else:
        in_ok = pick_th(h, w, cin, 0, f, f, align8(f),
                        emit_hpool=_ct_down1_aligned(h, w)) is not None
    ok = (
        in_ok
        and pick_th(h, w, align8(f), align8(dec_c2),
                    mid_c, f, dec_out_c, x2_half_h=True) is not None
    )
    if ok and _ct_down1_aligned(h, w):
        ok = pick_th(h // 2, w // 2, align8(f), 0, 2 * f, 2 * f,
                     align8(2 * f)) is not None
    return ok


def _ct_down1_aligned(h: int, w: int) -> bool:
    """True when the half-resolution down1 stage can run its CT kernel
    (lane offsets inside the kernel are multiples of w//2)."""
    return (w // 2) % 128 == 0 and (h // 2) % 2 == 0


def _fold_dc(conv1, bn1_p, bn1_s, conv2, bn2_p, bn2_s, blocks_split=None):
    """Pack a DoubleConv's weights + fold eval BN, per group (leading S).

    Returns (w1p [G,3cp,3ma], s1, sh1, w2p, s2, sh2).  ``blocks_split``
    optionally splits conv1's input channels for the two-input kernel.
    """
    w1, b1 = conv1["w"], conv1["b"]
    w2, b2 = conv2["w"], conv2["b"]
    groups = w1.shape[0]
    s1, sh1 = fold_bn_eval(b1, bn1_p, bn1_s)
    s2, sh2 = fold_bn_eval(b2, bn2_p, bn2_s)

    def pack1(wg):
        if blocks_split is None:
            return pack_w3x3([wg])
        return pack_w3x3([wg[:, :, :blocks_split], wg[:, :, blocks_split:]])

    w1p = jnp.stack([pack1(w1[g]) for g in range(groups)])
    w2p = jnp.stack([pack_w3x3([w2[g]]) for g in range(groups)])
    return w1p, s1, sh1, w2p, s2, sh2


def _pool_ct(x: jax.Array, n: int, h: int, w: int) -> jax.Array:
    """2x2 max pool on CT activations [C, N*H*W] -> [C, N*(H/2)*(W/2)].

    reduce_window, deliberately: the W-selection-matmul + split-row-max
    form wins in isolation (~1.5 ms at [96, 128*128^2]) but LOSES fused
    into the eval graph (1835 -> 1790 patches/s, round 3) — XLA overlaps
    the reduce_window with the neighboring kernel stages."""
    c = x.shape[0]
    x4 = x.reshape(c, n, h, w)
    y = lax.reduce_window(x4, -jnp.inf, lax.max,
                          (1, 1, 2, 2), (1, 1, 2, 2), "VALID")
    return y.reshape(c, n * (h // 2) * (w // 2))


def _wpool_ct(x: jax.Array, w: int) -> jax.Array:
    """W-pair max on CT activations [C, rows*W] -> [C, rows*(W/2)].

    One-pass Pallas kernel when supported (round 5: the einsum form reads
    x twice and round-trips both half tensors — 2.0/2.3 ms measured vs
    ~0.7 attainable, eval roofline); falls back to 0/1 selection matmuls
    + elementwise max (MXU; ~3x faster than reduce_window on this chip —
    experiments/exp_pool2.py).  Both exact: selection copies values
    bit-for-bit."""
    import numpy as np

    c, total = x.shape
    rows = total // w
    from mimo_unet_tpu.ops.pallas.ct_elem import (max_pool_w_ct,
                                                  wpool_ct_supported)

    if wpool_ct_supported(c, rows, w):
        return max_pool_w_ct(x, rows, w)
    se = np.zeros((w, w // 2), np.float32)
    se[np.arange(0, w, 2), np.arange(w // 2)] = 1.0
    so = np.zeros((w, w // 2), np.float32)
    so[np.arange(1, w, 2), np.arange(w // 2)] = 1.0
    x3 = x.reshape(c, rows, w)
    even = jnp.einsum("crw,wv->crv", x3, jnp.asarray(se, x.dtype))
    odd = jnp.einsum("crw,wv->crv", x3, jnp.asarray(so, x.dtype))
    return jnp.maximum(even, odd).reshape(c, rows * (w // 2))


def _upsample_ct_x2(x: jax.Array, n: int, h: int, w: int) -> jax.Array:
    """Bilinear x2 align-corners on CT activations (matmul form with the
    layout-preserving VJP, see ops/resize.py mat_einsum)."""
    from mimo_unet_tpu.ops.resize import mat_einsum

    c = x.shape[0]
    x4 = x.reshape(c, n, h, w)
    mh = jnp.asarray(_interp_matrix(h, 2 * h)).astype(x.dtype)
    mw = jnp.asarray(_interp_matrix(w, 2 * w)).astype(x.dtype)
    y = mat_einsum("oh,cnhw->cnow", "oh,cnow->cnhw", mh, x4)
    y = mat_einsum("pw,cnow->cnop", "pw,cnop->cnow", mw, y)
    return y.reshape(c, n * 4 * h * w)


def _upsample_ct_w2(x: jax.Array, n: int, h: int, w: int,
                    interpret=None) -> jax.Array:
    """W-half only of the bilinear x2 on CT activations ([c, n*h*w] ->
    [c, n*h*2w]); the H-half runs inside the consuming kernel's column
    builder (``fused_double_conv_ct(x2_half_h=True)``) so the full-res
    upsampled tensor never lands in HBM.  Flat-lane Pallas pass when
    supported (the einsum form's [c, rows, w] view change cost ~750 MiB
    of XLA layout copies per eval step around the pallas consumers)."""
    from mimo_unet_tpu.ops.pallas.ct_resize import (upsample_w2x_ct,
                                                    upsample_w2x_ct_supported)

    c = x.shape[0]
    if upsample_w2x_ct_supported(c, n * h, w):
        return upsample_w2x_ct(x, n * h, w, interpret)
    from mimo_unet_tpu.ops.resize import mat_einsum

    x3 = x.reshape(c, n * h, w)
    mw = jnp.asarray(_interp_matrix(w, 2 * w)).astype(x.dtype)
    y = mat_einsum("pw,crw->crp", "pw,crp->crw", mw, x3)
    return y.reshape(c, n * h * 2 * w)


# ===========================================================================
# eval path sections (shard_map bodies; batch axis explicit at boundaries)


def _mc_scale_ct(key, rate, s, b, c, c_pad):
    """Per-(subnetwork, image, channel) Dropout2d scale in CT layout.

    Draws the masks exactly as the XLA path's ``dropout2d`` does — per
    subnetwork key, ``bernoulli(k, keep, (b, 1, 1, c))`` — so CT MC-dropout
    outputs match the NHWC path bitwise for a shared rng.  Returns
    [c_pad, s*b] f32 (0 or 1/keep; pad rows zero)."""
    keep = 1.0 - rate
    masks = jax.vmap(
        lambda k: jax.random.bernoulli(k, keep, (b, 1, 1, c))
    )(key)  # [s, b, 1, 1, c]
    scale = masks[:, :, 0, 0, :].astype(jnp.float32) / keep  # [s, b, c]
    scale_ct = jnp.transpose(scale, (2, 0, 1)).reshape(c, s * b)
    if c_pad != c:
        scale_ct = jnp.pad(scale_ct, ((0, c_pad - c), (0, 0)))
    return scale_ct


def _apply_mc_scale(x, scale_ct, hw):
    """Multiply CT activations [c, n*hw] by per-(channel, image) scales
    (f32 multiply, output dtype preserved — matches the XLA ``x / keep``
    to 1 ulp)."""
    c, total = x.shape
    n = scale_ct.shape[1]
    y = x.reshape(c, n, hw).astype(jnp.float32) * scale_ct[:, :, None]
    return y.astype(x.dtype).reshape(c, total)


def _mc_scale_ct_rows(key, rate, s, b, c, c_pad):
    """Dropout2d scales for the grouped-rows CT layout [s*c_pad, b*hw]
    (group g's channels in row block g).  Masks drawn exactly as
    ``_mc_scale_ct`` (the XLA path's per-subnetwork key order), reshaped
    to [s*c_pad, b]."""
    keep = 1.0 - rate
    masks = jax.vmap(
        lambda k: jax.random.bernoulli(k, keep, (b, 1, 1, c))
    )(key)  # [s, b, 1, 1, c]
    scale = jnp.transpose(
        masks[:, :, 0, 0, :].astype(jnp.float32) / keep, (0, 2, 1))
    if c_pad != c:
        scale = jnp.pad(scale, ((0, 0), (0, c_pad - c), (0, 0)))
    return scale.reshape(s * c_pad, b)


def _enc_eval_local(enc_p, enc_s, x, k_enc, *, cfg, mc_dropout, interpret,
                    axis, emit_pool_h=False):
    """Per-device eval encoder: x [b, S, H, W, Cin] ->
    (x1s [fa, S, b, H, W], x2ct [S*align8(2f), b*(H/2)*(W/2)]).

    x2ct is the grouped-rows CT layout (subnetwork g's channels in row
    block g, pad rows exact zeros) — the channel-concat the shared core
    consumes, emitted directly by the down1 kernel's output index map.

    With ``mc_dropout`` and a spatial encoder rate, the Dropout2d sites at
    each DoubleConv end (reference components.py:29) apply as per-(image,
    channel) scales on the kernel outputs — valid through the following
    max-pool because the scale is a nonnegative per-channel constant."""
    b, s, h, w, cin = x.shape
    f = cfg.filter_base_count
    fa = align8(f)
    n = s * b
    cdt = jnp.bfloat16

    mc_spatial = mc_dropout and cfg.encoder_dropout_rate > 0
    if mc_spatial:
        if axis is not None:
            k_enc = jax.random.fold_in(k_enc, lax.axis_index(axis))
        ks = jax.vmap(
            lambda k: tuple(jax.random.split(k))
        )(jax.random.split(k_enc, s))  # per-s (k1, k2), XLA-path order

    # ---- encoder in_conv: cin -> f -> f at (h, w) --------------------------
    down1_ct = _ct_down1_aligned(h, w)
    if cin <= 8:
        # nine-tap conv1 (no combine; f32 input for in-kernel dx rolls)
        from mimo_unet_tpu.ops.pallas.ct_conv import (
            fused_double_conv9_ct, pick_th9)

        ic = enc_p["in_conv"]
        # bf16 transpose (half the relayout + slab bytes of the round-3
        # f32 form); the kernel upcasts the slab into its f32 column
        # scratch — same values the XLA path convolves (x.astype(bf16))
        xct9 = jnp.transpose(
            x.astype(cdt), (4, 1, 0, 2, 3)).reshape(cin, -1)
        s1, sh1 = fold_bn_eval(ic["conv1"]["b"], ic["bn1"],
                               enc_s["in_conv"]["bn1"])
        s2, sh2 = fold_bn_eval(ic["conv2"]["b"], ic["bn2"],
                               enc_s["in_conv"]["bn2"])
        w2p = jnp.stack([pack_w3x3([ic["conv2"]["w"][g]]) for g in range(s)])
        out = fused_double_conv9_ct(
            xct9, ic["conv1"]["w"], s1, sh1, w2p, s2, sh2,
            h=h, w=w, th=pick_th9(h, w, cin, f, f, emit_hpool=down1_ct),
            c1=cin, m=f, o=f, emit_hpool=down1_ct, interpret=interpret,
        )
    else:
        xct = jnp.transpose(x.astype(cdt), (4, 1, 0, 2, 3)).reshape(cin, -1)
        w1p, s1, sh1, w2p, s2, sh2 = _fold_dc(
            enc_p["in_conv"]["conv1"], enc_p["in_conv"]["bn1"],
            enc_s["in_conv"]["bn1"],
            enc_p["in_conv"]["conv2"], enc_p["in_conv"]["bn2"],
            enc_s["in_conv"]["bn2"],
        )
        th = pick_th(h, w, cin, 0, f, f, fa, emit_hpool=down1_ct)
        out = fused_double_conv_ct(
            xct, w1p, s1, sh1, w2p, s2, sh2,
            h=h, w=w, th=th, c1=cin, m=f, o=f, emit_hpool=down1_ct,
            interpret=interpret,
        )  # x1s [fa, n*h*w] (decoder skip); hpooled = H-half of the pool
    h2, w2 = h // 2, w // 2
    f2 = 2 * f

    if down1_ct:
        # ---- down1 (CT): pool -> (f -> 2f -> 2f) at (h/2, w/2) -------------
        x1s, hpooled = out
        if mc_spatial:
            sc1 = _mc_scale_ct(ks[0], cfg.encoder_dropout_rate, s, b, f, fa)
            x1s = _apply_mc_scale(x1s, sc1, h * w)
            # scale commutes with the fused H-max (nonnegative per-channel
            # constant; bf16 rounding is monotone)
            hpooled = _apply_mc_scale(hpooled, sc1, (h // 2) * w)
        pooled = _wpool_ct(hpooled, w)  # [fa, n*h2*w2]
        d1c1, d1c2 = enc_p["down1"]["conv1"], enc_p["down1"]["conv2"]
        s1, sh1 = fold_bn_eval(d1c1["b"], enc_p["down1"]["bn1"],
                               enc_s["down1"]["bn1"])
        s2, sh2 = fold_bn_eval(d1c2["b"], enc_p["down1"]["bn2"],
                               enc_s["down1"]["bn2"])
        # ``pooled`` carries fa channels (pad rows exact zeros) so the slab
        # DMA stays sublane-aligned; widen conv1's inputs with zero rows
        def pack_down1(wg):
            wide = jnp.zeros((3, 3, fa, 2 * f), wg.dtype).at[:, :, :f].set(wg)
            return pack_w3x3([wide])

        w1p = jnp.stack([pack_down1(d1c1["w"][g]) for g in range(s)])
        w2p = jnp.stack([pack_w3x3([d1c2["w"][g]]) for g in range(s)])
        out1 = fused_double_conv_ct(
            pooled, w1p, s1, sh1, w2p, s2, sh2,
            h=h2, w=w2, th=pick_th(h2, w2, fa, 0, 2 * f, 2 * f,
                                   align8(2 * f), emit_hpool=emit_pool_h),
            c1=fa, m=2 * f, o=2 * f, group_rows_out=True,
            emit_hpool=emit_pool_h, interpret=interpret,
        )  # [s*align8(2f), b*h2*w2] (+ H-half of the core's down2 pool)
        x2ct, hp2 = out1 if emit_pool_h else (out1, None)
        f2a = align8(f2)
        if mc_spatial:
            sc2 = _mc_scale_ct_rows(ks[1], cfg.encoder_dropout_rate, s, b,
                                    f2, f2a)
            x2ct = _apply_mc_scale(x2ct, sc2, h2 * w2)
            if hp2 is not None:
                # scale commutes with the fused H-max (nonnegative
                # per-channel constant)
                hp2 = _apply_mc_scale(hp2, sc2, (h2 // 2) * w2)
    else:
        # ---- down1 (NHWC fallback): half width is not lane-block aligned
        # (e.g. 640/2 = 320) — run the vmapped XLA Down block instead
        # (reference model.py:167-173 down1s), then return to CT layout
        from mimo_unet_tpu.models.blocks import down_apply

        x1s = out
        if mc_spatial:
            sc1 = _mc_scale_ct(ks[0], cfg.encoder_dropout_rate, s, b, f, fa)
            x1s = _apply_mc_scale(x1s, sc1, h * w)
        x1_nhwc = jnp.transpose(
            x1s[:f].reshape(f, s, b, h, w), (1, 2, 3, 4, 0))  # [s,b,h,w,f]
        d1_keys = (ks[1] if mc_spatial
                   else jax.random.split(jax.random.key(0), s))

        def down1_one(p, st, xs, k):
            (x2, _), _ = down_apply(
                p, st, xs, train=False, compute_dtype=jnp.bfloat16,
                dropout_rate=cfg.encoder_dropout_rate if mc_spatial else 0.0,
                dropout_key=k, mc_dropout=mc_dropout)
            return x2

        x2 = jax.vmap(down1_one)(enc_p["down1"], enc_s["down1"], x1_nhwc,
                                 d1_keys)
        f2a = align8(f2)
        x2g = jnp.transpose(x2, (0, 4, 1, 2, 3))  # [s, 2f, b, h2, w2]
        if f2a != f2:
            x2g = jnp.pad(
                x2g, ((0, 0), (0, f2a - f2), (0, 0), (0, 0), (0, 0)))
        x2ct = x2g.reshape(s * f2a, b * h2 * w2)
        hp2 = None

    if emit_pool_h:
        return x1s.reshape(fa, s, b, h, w), x2ct, hp2
    return x1s.reshape(fa, s, b, h, w), x2ct


def _dec_eval_local(dec_p, dec_s, x1s5, x_up, k_dec, *, cfg, mc_dropout,
                    interpret, axis):
    """Per-device eval decoder from an NHWC core output: x1s5
    [fa, S, b, H, W], x_up [b, H/2, W/2, c_up] NHWC -> logits."""
    fa, s, b, h, w = x1s5.shape
    c_up = x_up.shape[-1]
    c_up_a = align8(c_up)
    xup_ct = jnp.transpose(x_up.astype(jnp.bfloat16), (3, 0, 1, 2))
    if c_up_a != c_up:
        xup_ct = jnp.pad(xup_ct, ((0, c_up_a - c_up), (0, 0), (0, 0), (0, 0)))
    return _dec_eval_core(dec_p, dec_s, x1s5, xup_ct.reshape(c_up_a, -1),
                          k_dec, cfg=cfg, mc_dropout=mc_dropout,
                          interpret=interpret, axis=axis)


def _dec_eval_ct_local(dec_p, dec_s, up3_p, up3_s, x1s5, xu2, x2ct, k_dec,
                       k_up3, *, cfg, mc_dropout, interpret, axis):
    """Per-device eval decoder with the core's up3 fused into the CT
    section (reference model.py:235-243 up3 + :246-297 decoders).

    up3 runs as the two-input CT kernel at (H/2, W/2): the skip is the
    encoder's grouped-rows x2ct (never transposed to NHWC), the upsampled
    branch is up2's NHWC output transposed at the cheap quarter
    resolution, and the output feeds the decoder in CT directly.  The
    up3-site Dropout2d (MC eval, reference components.py:29) applies as a
    per-(image, channel) scale on the kernel output."""
    fa, s, b, h, w = x1s5.shape
    f = cfg.filter_base_count
    f2 = 2 * f
    f2a = align8(f2)
    h2, w2 = h // 2, w // 2
    h4, w4 = h2 // 2, w2 // 2
    cdt = jnp.bfloat16

    c1w = up3_p["conv"]["conv1"]["w"]
    m3 = c1w.shape[-1]
    o3 = up3_p["conv"]["conv2"]["w"].shape[-1]
    c_skip = s * f2
    c_xu2 = c1w.shape[2] - c_skip
    c_upa3 = align8(c_xu2)
    s1, sh1 = fold_bn_eval(up3_p["conv"]["conv1"]["b"],
                           up3_p["conv"]["bn1"], up3_s["conv"]["bn1"])
    s2, sh2 = fold_bn_eval(up3_p["conv"]["conv2"]["b"],
                           up3_p["conv"]["bn2"], up3_s["conv"]["bn2"])
    # conv1 input order is [skip, upsampled] (reference components.py:119
    # cat([x2, x1])); the skip block widens to the grouped-rows layout
    # (zero rows at each group's pad positions)
    skip_w = jnp.zeros((3, 3, s * f2a, m3), c1w.dtype)
    for g in range(s):
        skip_w = skip_w.at[:, :, g * f2a:g * f2a + f2].set(
            c1w[:, :, g * f2:(g + 1) * f2])
    up_w = jnp.zeros((3, 3, c_upa3, m3), c1w.dtype).at[:, :, :c_xu2].set(
        c1w[:, :, c_skip:])
    w1p = pack_w3x3([skip_w, up_w])[None]
    w2p = pack_w3x3([up3_p["conv"]["conv2"]["w"]])[None]

    xu = jnp.transpose(xu2.astype(cdt), (3, 0, 1, 2)).reshape(c_xu2, -1)
    if c_upa3 != c_xu2:
        xu = jnp.pad(xu, ((0, c_upa3 - c_xu2), (0, 0)))
    xu = _upsample_ct_w2(xu, b, h4, w4)  # [c_upa3, b*h4*w2]; H-half in-kernel

    xup_ct = fused_double_conv_ct(
        x2ct, w1p, s1[None], sh1[None], w2p, s2[None], sh2[None],
        h=h2, w=w2, th=pick_th(h2, w2, s * f2a, c_upa3, m3, o3, align8(o3),
                               x2_half_h=True),
        c1=s * f2a, m=m3, o=o3,
        x2=xu, c2=c_upa3, n2_images=b, x2_half_h=True, interpret=interpret,
    )  # [align8(o3), b*h2*w2]

    if mc_dropout and cfg.core_dropout_rate > 0:
        if axis is not None:
            k_up3 = jax.random.fold_in(k_up3, lax.axis_index(axis))
        keep = 1.0 - cfg.core_dropout_rate
        mask = jax.random.bernoulli(k_up3, keep, (b, 1, 1, o3))
        sc = jnp.transpose(
            mask[:, 0, 0, :].astype(jnp.float32) / keep, (1, 0))
        sc = jnp.pad(sc, ((0, align8(o3) - o3), (0, 0)))
        xup_ct = _apply_mc_scale(xup_ct, sc, h2 * w2)

    return _dec_eval_core(dec_p, dec_s, x1s5, xup_ct, k_dec, cfg=cfg,
                          mc_dropout=mc_dropout, interpret=interpret,
                          axis=axis)


def _dec_eval_core(dec_p, dec_s, x1s5, xup_ct, k_dec, *, cfg, mc_dropout,
                   interpret, axis):
    """Per-device eval decoder: fused upsample-concat DoubleConv + 1x1
    out-conv.  x1s5 [fa, S, b, H, W], xup_ct [align8(c_up), b*(H/2)*(W/2)]
    CT (pad rows exact zeros) -> logits [b, S, H, W, out_channels] f32.

    MC-dropout sites (reference model.py:281, components.py:29): the
    spatial Dropout2d after the up4 DoubleConv applies as a per-(image,
    channel) scale between the fused kernel and the 1x1 out-conv; the
    elementwise final dropout likewise (they are mutually exclusive by
    config)."""
    fa, s, b, h, w = x1s5.shape
    f = cfg.filter_base_count
    h2, w2 = h // 2, w // 2
    cdt = jnp.bfloat16
    x1s = x1s5.reshape(fa, -1)

    conv1 = dec_p["up4"]["conv"]["conv1"]
    conv2 = dec_p["up4"]["conv"]["conv2"]
    bn1_p, bn2_p = dec_p["up4"]["conv"]["bn1"], dec_p["up4"]["conv"]["bn2"]
    bn1_s, bn2_s = dec_s["up4"]["conv"]["bn1"], dec_s["up4"]["conv"]["bn2"]
    mid_c = conv1["w"].shape[4]
    # real upsampled channel count comes from the weights — xup_ct arrives
    # align8'd with exact-zero pad channels
    c_up_real = conv1["w"].shape[3] - f
    c_up_a = align8(c_up_real)
    assert xup_ct.shape[0] == c_up_a, (xup_ct.shape, c_up_a)
    # W-half here; the H-half lerps inside the decoder kernel (x2_half_h)
    xup_ct = _upsample_ct_w2(xup_ct, b, h2, w2)

    s1, sh1 = fold_bn_eval(conv1["b"], bn1_p, bn1_s)
    s2, sh2 = fold_bn_eval(conv2["b"], bn2_p, bn2_s)

    # concat order is [skip(f), upsampled(c_up)] (reference
    # components.py:119: cat([x2, x1])); widen both blocks to their aligned
    # channel counts so the kernel's two-input column layout matches
    def pack_dec(wg):
        skip_blk = jnp.zeros((3, 3, fa, mid_c), wg.dtype).at[:, :, :f].set(
            wg[:, :, :f])
        up_blk = jnp.zeros((3, 3, c_up_a, mid_c), wg.dtype).at[
            :, :, :c_up_real].set(wg[:, :, f:])
        return pack_w3x3([skip_blk, up_blk])

    w1p = jnp.stack([pack_dec(conv1["w"][g]) for g in range(s)])
    w2p = jnp.stack([pack_w3x3([conv2["w"][g]]) for g in range(s)])

    outc = dec_p["outc"]
    oc = outc["w"].shape[4]
    oca = align8(oc)
    final_dropout = mc_dropout and cfg.final_dropout_rate > 0
    dec_spatial = mc_dropout and cfg.decoder_dropout_rate > 0
    if not (final_dropout or dec_spatial):
        wo = jnp.zeros((s, f, oca), jnp.float32).at[:, :, :oc].set(
            outc["w"][:, 0, 0])
        bo = jnp.zeros((s, oca), jnp.float32).at[:, :oc].set(outc["b"])
        out = fused_double_conv_ct(
            x1s, w1p, s1, sh1, w2p, s2, sh2,
            h=h, w=w, th=pick_th(h, w, fa, c_up_a, mid_c, f, oca,
                                 x2_half_h=True),
            c1=fa, m=mid_c, o=f,
            x2=xup_ct, c2=c_up_a, n2_images=b, x2_half_h=True,
            wo=wo, bo=bo, group_minor=True, interpret=interpret,
        )  # [oca, n*h*w]  (group-minor: shared x2 block DMA'd once)
    else:
        # a live dropout site sits between up4's DoubleConv and the
        # out-conv (final: reference model.py:281 elementwise; spatial:
        # components.py:29 Dropout2d at the DoubleConv end): run the
        # kernel without the fused 1x1, drop out, then the grouped 1x1
        # kernel.  Per-device masks must be independent under a mesh, so
        # the key is folded with the device index.
        from mimo_unet_tpu.ops.dropout import dropout as _dropout
        from mimo_unet_tpu.ops.pallas.ct_elem import conv1x1_ct

        if axis is not None:
            k_dec = jax.random.fold_in(k_dec, lax.axis_index(axis))
        y = fused_double_conv_ct(
            x1s, w1p, s1, sh1, w2p, s2, sh2,
            h=h, w=w, th=pick_th(h, w, fa, c_up_a, mid_c, f, align8(f),
                                 x2_half_h=True),
            c1=fa, m=mid_c, o=f,
            x2=xup_ct, c2=c_up_a, n2_images=b, x2_half_h=True,
            group_minor=True, interpret=interpret,
        )  # [fa, n*h*w]
        if dec_spatial:
            # per-s keys in the XLA path's order (decoder_one: k1 = the
            # Dropout2d site) so masks match the NHWC path bitwise
            ks = jax.vmap(
                lambda k: tuple(jax.random.split(k))
            )(jax.random.split(k_dec, s))
            sc = _mc_scale_ct(ks[0], cfg.decoder_dropout_rate, s, b, f, fa)
            y = _apply_mc_scale(y, sc, h * w)
        else:
            k_final = jax.random.fold_in(k_dec, 0)
            y = _dropout(y, cfg.final_dropout_rate, k_final,
                         deterministic=False)
        wo1 = jnp.zeros((s, f, oca)).at[:, :, :oc].set(outc["w"][:, 0, 0])
        bo1 = jnp.zeros((s, oca, 1)).at[:, :oc, 0].set(outc["b"])
        out = conv1x1_ct(y.astype(cdt), wo1, bo1, f, s, interpret)

    logits = out[:oc].reshape(oc, s, b, h, w)
    return jnp.transpose(logits, (2, 1, 3, 4, 0)).astype(jnp.float32)


def _ct_up3_ok(cfg: MimoUNetConfig, h: int, w: int) -> bool:
    """True when the core's up3 can run as the two-input CT kernel at
    (H/2, W/2): half resolution lane-block aligned and a fitting tile."""
    h2, w2 = h // 2, w // 2
    if w2 % 128 != 0 or h2 % 2 != 0:
        return False
    f, s = cfg.filter_base_count, cfg.num_subnetworks
    fs = f * s
    m3 = 2 * fs                      # up3 mid = 4fs // 2
    o3 = 2 * fs // cfg.factor        # up3 out
    c_rows = s * align8(2 * f)       # grouped-rows skip
    c_upa3 = align8(4 * fs // cfg.factor)  # up2 output channels
    return pick_th(h2, w2, c_rows, c_upa3, m3, o3, align8(o3),
                   x2_half_h=True) is not None


def _nhwc_from_x2ct(x2ct, s, f2, b, h2, w2):
    """Grouped-rows CT [s*align8(2f), b*h2*w2] -> NHWC channel concat
    [b, h2, w2, s*2f] (the shared core's input, reference model.py:178)."""
    f2a = align8(f2)
    t = jnp.transpose(x2ct.reshape(s, f2a, b, h2, w2), (2, 3, 4, 0, 1))
    return t[..., :f2].reshape(b, h2, w2, s * f2)


def _core_mid_eval(core_p, core_s, x3_in, cfg, rng, mc_dropout):
    """down2 (pool pre-applied) .. up2 of the shared core (eval), with
    core_apply's exact key order so MC masks match the XLA path bitwise.
    Returns (up2 output NHWC, up3's dropout key)."""
    from mimo_unet_tpu.models.blocks import double_conv_apply, down_apply, \
        up_apply
    from mimo_unet_tpu.ops.dropout import dropout as _dropout

    cdt = cfg._compute_dtype
    kc = jax.random.split(rng, 7)
    rate = cfg.core_dropout_rate
    x3, _ = double_conv_apply(
        core_p["down2"], core_s["down2"], x3_in, train=False,
        dropout_rate=rate, dropout_key=kc[0], mc_dropout=mc_dropout,
        compute_dtype=cdt)
    (x4, ind4), _ = down_apply(
        core_p["down3"], core_s["down3"], x3, train=False,
        use_pooling_indices=cfg.use_pooling_indices, dropout_rate=rate,
        dropout_key=kc[1], mc_dropout=mc_dropout, compute_dtype=cdt)
    (x5, ind5), _ = down_apply(
        core_p["down4"], core_s["down4"], x4, train=False,
        use_pooling_indices=cfg.use_pooling_indices, dropout_rate=rate,
        dropout_key=kc[2], mc_dropout=mc_dropout, compute_dtype=cdt)
    x5 = _dropout(x5, cfg.center_dropout_rate, kc[3],
                  deterministic=not mc_dropout)
    x_up, _ = up_apply(
        core_p["up1"], core_s["up1"], x5, x4, ind5, mode=cfg.mode,
        train=False, dropout_rate=rate, dropout_key=kc[4],
        mc_dropout=mc_dropout, compute_dtype=cdt, split_skip_conv=True)
    x_up, _ = up_apply(
        core_p["up2"], core_s["up2"], x_up, x3, ind4, mode=cfg.mode,
        train=False, dropout_rate=rate, dropout_key=kc[5],
        mc_dropout=mc_dropout, compute_dtype=cdt, split_skip_conv=True)
    return x_up, kc[6]


def mimo_unet_apply_ct(
    params: dict,
    state: dict,
    x: jax.Array,
    cfg: MimoUNetConfig,
    *,
    rng: Optional[jax.Array] = None,
    mc_dropout: bool = False,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, dict]:
    """Eval forward via CT kernels: [B,S,H,W,Cin] -> [B,S,H,W,Cout].

    Numerically equivalent to ``mimo_unet_apply(train=False)`` in bf16 up
    to one extra bf16 rounding per fused conv pair (tests/test_ct_conv.py).
    With ``mc_dropout`` the center/final dropout sites are live (reference
    ensemble.py:54-66); see ct_fast_path_supported.

    The core's up3 (reference model.py:235-243) joins the CT section when
    its half resolution is lane-block aligned (_ct_up3_ok): the skip stays
    in the encoder's grouped-rows CT output (down2 pools it in CT and only
    the quarter-resolution tensor is transposed to NHWC), and up3's output
    feeds the decoder in CT — the two full-resolution NHWC<->CT boundary
    transposes disappear.

    Under an active data-parallel mesh (parallel/mesh.py ct_mesh_scope)
    the encoder/decoder kernel sections run inside ``jax.shard_map`` over
    the data axis; the shared core stays on the GSPMD-partitioned XLA path
    between them.
    """
    b, s, h, w, cin = x.shape
    f = cfg.filter_base_count
    if rng is None:
        rng = jax.random.key(0)
    # same 3-way split as the XLA path (mimo_unet_apply), so MC-dropout
    # masks on every shared site match the NHWC path bitwise
    k_enc, k_core, k_dec = jax.random.split(rng, 3)
    mesh, axis = _active_ct_mesh(x.shape, "eval")

    f2 = 2 * f
    h2, w2 = h // 2, w // 2
    up3_ct = _ct_up3_ok(cfg, h, w)
    # when up3 runs in the CT section, the down1 kernel also emits the
    # H-half of the core's down2 pool (free in-kernel row max) so only
    # the W-pair selection max remains outside — replaces the 2x2
    # reduce_window on the full half-res tensor
    emit_ph = (up3_ct and _ct_down1_aligned(h, w)
               and pick_th(h2, w2, align8(f), 0, f2, f2, align8(f2),
                           emit_hpool=True) is not None)
    enc = partial(_enc_eval_local, cfg=cfg, mc_dropout=mc_dropout,
                  interpret=interpret, axis=axis, emit_pool_h=emit_ph)
    enc_out_specs = ((P(None, None, axis), P(None, axis), P(None, axis))
                     if emit_ph else (P(None, None, axis), P(None, axis)))
    if mesh is None:
        enc_out = enc(params["encoder"], state["encoder"], x, k_enc)
    else:
        enc_out = jax.shard_map(
            enc, mesh=mesh,
            in_specs=(P(), P(), P(axis), P()),
            out_specs=enc_out_specs,
            check_vma=False,
        )(params["encoder"], state["encoder"], x, k_enc)
    if emit_ph:
        x1s5, x2ct, hp2 = enc_out
    else:
        x1s5, x2ct = enc_out
        hp2 = None

    if up3_ct:
        # ---- core (up3 deferred to the CT decoder section) ------------------
        pooled = (_wpool_ct(hp2, w2) if hp2 is not None
                  else _pool_ct(x2ct, b, h2, w2))  # [s*f2a, b*h4*w4]
        x3_in = _nhwc_from_x2ct(pooled, s, f2, b, h2 // 2, w2 // 2)
        xu2, k_up3 = _core_mid_eval(params["core"], state["core"], x3_in,
                                    cfg, k_core, mc_dropout)
        dec = partial(_dec_eval_ct_local, cfg=cfg, mc_dropout=mc_dropout,
                      interpret=interpret, axis=axis)
        dec_args = (params["decoder"], state["decoder"],
                    params["core"]["up3"], state["core"]["up3"],
                    x1s5, xu2, x2ct, k_dec, k_up3)
        if mesh is None:
            logits = dec(*dec_args)
        else:
            logits = jax.shard_map(
                dec, mesh=mesh,
                in_specs=(P(), P(), P(), P(), P(None, None, axis), P(axis),
                          P(None, axis), P(), P()),
                out_specs=P(axis),
                check_vma=False,
            )(*dec_args)
        return logits, state

    # ---- core (NHWC): subnetwork-major channel concat ----------------------
    x2_concat = _nhwc_from_x2ct(x2ct, s, f2, b, h2, w2)
    # (Padding up3.conv2 to align8 out-channels — so the decoder's channel
    # pad disappears and the 42-of-128-lane conv fills lanes — saved 0.85 ms
    # in isolation but DID NOT compose end-to-end: 1703.7 -> 1702.2
    # patches/s, reverted.  experiments/exp_core_glue.py, PERFORMANCE.md.)
    x_up, _ = core_apply(
        params["core"], state["core"], x2_concat, cfg, train=False,
        rng=k_core, mc_dropout=mc_dropout, dropout_active=mc_dropout,
    )  # [b, h2, w2, 2fs/factor] NHWC

    dec = partial(_dec_eval_local, cfg=cfg, mc_dropout=mc_dropout,
                  interpret=interpret, axis=axis)
    if mesh is None:
        logits = dec(params["decoder"], state["decoder"], x1s5, x_up, k_dec)
    else:
        logits = jax.shard_map(
            dec, mesh=mesh,
            in_specs=(P(), P(), P(None, None, axis), P(axis), P()),
            out_specs=P(axis),
            check_vma=False,
        )(params["decoder"], state["decoder"], x1s5, x_up, k_dec)
    # eval mode: BatchNorm running stats are unchanged
    return logits, state


# ===========================================================================
# training fast path (CT train kernels, ops/pallas/ct_train.py)


def ct_train_path_supported(
    cfg: MimoUNetConfig,
    x_shape: Tuple[int, ...],
    *,
    train: bool,
    mc_dropout: bool,
) -> bool:
    """Train-mode analog of ct_fast_path_supported.

    Every reference dropout site is supported (since round 4): the
    spatial ``Dropout2d`` rates (encoder/decoder) fold into per-image
    BN-affine parameters (``relu(a)*m == relu(a*m)`` for the nonnegative
    inverted-dropout scale), the core/center sites live in the XLA core,
    and a live elementwise final dropout takes the unfused decoder
    out-conv route.  Only ``mc_dropout`` eval-with-dropout forwards are
    excluded (those go through ct_fast_path_supported instead)."""
    if not train or mc_dropout:
        return False
    if cfg.ct_kernels == "off":
        return False
    if cfg.ct_kernels != "force" and jax.default_backend() != "tpu":
        return False
    if cfg.compute_dtype != "bfloat16" or cfg.mode != "bilinear":
        return False
    # every dropout site is supported on the train path: encoder/decoder
    # Dropout2d folds into per-image affine params (relu(a)*m ==
    # relu(a*m) for the nonnegative inverted-dropout scale, so the
    # existing elementwise kernels run with groups=N), core/center sites
    # live in the XLA core, and the elementwise final dropout takes the
    # unfused decoder out-conv route
    if len(x_shape) != 5:
        return False
    h, w = x_shape[2], x_shape[3]
    # lane offsets inside the kernels are multiples of w: need
    # w % 128 == 0 and a viable tile height.  down1's CT kernels need the
    # HALF resolution aligned too (w % 256, h % 32); otherwise down1 falls
    # back to the vmapped NHWC XLA Down block (640x480 NYUv2 frames).
    if not (w % 128 == 0 and h % 16 == 0):
        return False
    if not _mesh_eligible(x_shape, "train"):
        return False
    # probe pick_th_train with the exact stage channel counts the apply
    # path uses (ADVICE r2: probe what you run) — wide stages step down to
    # th=8 (640px decoder conv1), and None means no tile fits at all
    from mimo_unet_tpu.ops.pallas.ct_train import pick_th_train

    f = cfg.filter_base_count
    fa, f2 = align8(f), 2 * f
    dec_c2 = 2 * f * cfg.num_subnetworks // cfg.factor
    mid_c = (f + dec_c2) // 2
    stages = [
        (h, w, cfg.in_channels, 0, f, False),     # in_conv conv1
        (h, w, fa, 0, f, True),                   # in_conv conv2
        (h, w, fa, align8(dec_c2), mid_c, False),  # decoder conv1
        (h, w, align8(mid_c), 0, f, True),        # decoder conv2
    ]
    if _ct_train_down1_aligned(h, w):
        stages += [(h // 2, w // 2, fa, 0, f2, False),   # down1 conv1
                   (h // 2, w // 2, align8(f2), 0, f2, True)]  # down1 conv2
    for st in stages:
        sh_, sw_, sc1, sc2, so, sp = st
        if pick_th_train(sh_, sw_, sc1, sc2, so, prologue=sp) is None:
            return False
        # backward reachability (ADVICE r3): the bwd rule must find a
        # compiling dx/dw tile too — pick-or-forced raises (TPU) or
        # returns the historical min(th,16) (off-TPU); any failure here
        # means the shape must take the XLA path
        from mimo_unet_tpu.ops.pallas.ct_train import (
            pick_th_kind, pick_th_kind_forced)

        # the c2 stage may take the fold or plain grid depending on the
        # runtime reps==groups condition — require both to be reachable
        kinds = (("dx_fold", "dx", "dw") if (sc2 and not sp)
                 else ("dx", "dw"))
        try:
            for k in kinds:
                if pick_th_kind(k, sh_, sw_, sc1, sc2, so,
                                prologue=sp) is None:
                    pick_th_kind_forced(k, sh_, sw_, sc1, sc2, so, 64,
                                        prologue=sp)
        except RuntimeError:
            return False
    if not _ct_train_down1_aligned(h, w):
        # the XLA fallback computes down1's BatchNorm batch statistics with
        # plain jnp reductions, which are per-device inside shard_map —
        # under a >1-device mesh only the fully-aligned CT path (psum'd
        # stats) preserves global-batch BN, so gate off instead
        mesh, _ = _active_ct_mesh(x_shape, "train")
        if mesh is not None:
            _warn_once(
                "train-mixed-mesh",
                f"CT train kernels disabled: {h}x{w} needs the down1 XLA "
                "fallback, which is not mesh-safe; using the XLA path",
            )
            return False
    return True


def _ct_train_down1_aligned(h: int, w: int) -> bool:
    return (w // 2) % 128 == 0 and (h // 2) % 16 == 0


def _bn_affine_from_stats(s, q, count, conv_b, bn_p, bn_s,
                          momentum=0.1, eps=1e-5):
    """Train-mode BatchNorm affine from kernel statistics (torch
    semantics, ops/norm.py): biased batch var normalizes, unbiased updates
    the running stats.  s/q [G, O] are sums of the *bias-free* conv
    output; the conv bias shifts the mean only.

    Returns (scale [G,O], shift [G,O], new_bn_state) — all differentiable
    except the state (which the caller threads as aux)."""
    mean_raw = s / count
    var = q / count - jnp.square(mean_raw)
    mean = mean_raw + conv_b.astype(jnp.float32)
    inv = jax.lax.rsqrt(var + eps)
    scale = bn_p["scale"].astype(jnp.float32) * inv
    shift = bn_p["bias"].astype(jnp.float32) - mean_raw * scale
    unbiased = var * (count / max(count - 1, 1))
    new_state = {
        "mean": (1 - momentum) * bn_s["mean"]
        + momentum * jax.lax.stop_gradient(mean),
        "var": (1 - momentum) * bn_s["var"]
        + momentum * jax.lax.stop_gradient(unbiased),
    }
    return scale, shift, new_state


def _prologue_cols(parts, cp):
    """Place per-block [G, c_j] vectors at their aligned offsets in a
    [G, cp, 1] prologue parameter array (pads zero)."""
    g = parts[0][0].shape[0]
    out = jnp.zeros((g, cp, 1), jnp.float32)
    base = 0
    for vec, c_real in parts:
        out = out.at[:, base:base + c_real, 0].set(
            vec.astype(jnp.float32))
        base += align8(c_real)
    return out


@jax.custom_vjp
def _max_pool_ct(x4):
    """[C, N, H, W] 2x2 max pool with the equality-mask VJP (the default
    reduce_window gradient lowers to slow select-and-scatter; see
    ops/pooling.py max_pool_2x2).  Forward stays reduce_window: the
    W-selection-matmul form measured 455 -> 452 img/s in the full train
    step (round 3) — XLA overlaps the window reduce with neighbors."""
    return lax.reduce_window(x4, -jnp.inf, lax.max,
                             (1, 1, 2, 2), (1, 1, 2, 2), "VALID")


def _max_pool_ct_fwd(x4):
    y = _max_pool_ct(x4)
    return y, (x4, y)


def _up2_ct(v):
    """[C, N, H2, W2] -> [C, N, 2*H2, 2*W2] nearest-up via exact 0/1
    selection matmuls (the reshape/broadcast form relayouts the tensor)."""
    import numpy as np

    c, n, h2, w2 = v.shape
    eh = np.zeros((h2, 2 * h2), np.float32)
    eh[np.arange(h2), 2 * np.arange(h2)] = 1.0
    eh[np.arange(h2), 2 * np.arange(h2) + 1] = 1.0
    ew = np.zeros((w2, 2 * w2), np.float32)
    ew[np.arange(w2), 2 * np.arange(w2)] = 1.0
    ew[np.arange(w2), 2 * np.arange(w2) + 1] = 1.0
    out = jnp.einsum("cnHW,Hh->cnhW", v, jnp.asarray(eh, v.dtype))
    return jnp.einsum("cnhW,Ww->cnhw", out, jnp.asarray(ew, v.dtype))


def _max_pool_ct_bwd(res, g):
    x4, y = res
    mask = (x4 == _up2_ct(y)).astype(g.dtype)
    gx = mask * _up2_ct(g)
    return (gx,)


_max_pool_ct.defvjp(_max_pool_ct_fwd, _max_pool_ct_bwd)


def _psum_stats(s, q, axis):
    """Cross-device reduction of the kernels' per-device BN sums.  The
    gradient path is exact: shard_map transposes the psum, so the custom
    VJP's statistics cotangents arrive replicated on every device."""
    if axis is None:
        return s, q
    return lax.psum(s, axis), lax.psum(q, axis)


def _drop_scales_sbc(keys, rate, b, c):
    """Per-(subnetwork, image, channel) inverted Dropout2d scales, drawn
    exactly as the XLA path's ``dropout2d`` (per-subnetwork key,
    ``bernoulli(k, keep, (b, 1, 1, c))``) so the masks match it bitwise.
    Returns [s, b, c] f32 (0 or 1/keep)."""
    keep = 1.0 - rate
    masks = jax.vmap(
        lambda k: jax.random.bernoulli(k, keep, (b, 1, 1, c))
    )(keys)
    return masks[:, :, 0, 0, :].astype(jnp.float32) / keep


def _per_image_affine(sc, sh, m):
    """Fold Dropout2d scales into the BN affine: with m >= 0,
    ``relu(y*sc + sh) * m == relu(y*(sc*m) + sh*m)`` — the dropout site
    costs nothing (the elementwise kernels just run with one parameter
    column per image instead of per group).  sc/sh [s, c] + m [s, b, c]
    -> ([s*b, c, 1], [s*b, c, 1]); gradients to sc/sh flow through the
    broadcast (autodiff sums over b)."""
    s, b, c = m.shape
    sci = (sc.astype(jnp.float32)[:, None, :] * m).reshape(s * b, c, 1)
    shi = (sh.astype(jnp.float32)[:, None, :] * m).reshape(s * b, c, 1)
    return sci, shi


def _enc_train_local(enc_p, enc_s, x, k_enc, *, cfg, cnt_full, cnt_half,
                     interpret, axis, bpool=False):
    """Per-device train encoder: x [b, S, H, W, Cin] ->
    (x1s [fa, S, b, H, W], x2s [f2a, S, b, H/2, W/2], new_enc_state).

    ``bpool``: also CT-pool the down1 output (the core boundary's 2x2 max
    pool, reference components.py:48 via the core's down2) with the up3
    skip cotangent fused into the pool backward, and return
    (x1s, x2s, x2p [f2a, S, b, H/4, W/4], new_enc) — x2s is then the
    pool's identity output, so routing the NHWC skip through it folds the
    skip add into the kernel (see max_pool2x2_skip_ct).

    ``cnt_full``/``cnt_half`` are GLOBAL per-group element counts (whole
    mesh batch), so the BatchNorm affines built from the psum'd statistics
    reproduce single-device global-batch normalization exactly."""
    from mimo_unet_tpu.ops.pallas.ct_elem import affine_relu_ct
    from mimo_unet_tpu.ops.pallas.ct_train import conv3x3_ct_train

    b, s, h, w, cin = x.shape
    f = cfg.filter_base_count
    fa = align8(f)
    f2 = 2 * f
    f2a = align8(f2)
    n = s * b
    from mimo_unet_tpu.ops.pallas.ct_train import pick_th_train
    cdt = jnp.bfloat16
    new_enc = {"in_conv": {}, "down1": {}}

    xct = jnp.transpose(x.astype(cdt), (4, 1, 0, 2, 3)).reshape(cin, -1)

    enc_rate = cfg.encoder_dropout_rate
    if enc_rate > 0:
        # per-device masks must be independent under a mesh (the XLA
        # path draws them on the global batch; see _enc_eval_local)
        if axis is not None:
            k_enc = jax.random.fold_in(k_enc, lax.axis_index(axis))
        ks = jax.vmap(
            lambda k: tuple(jax.random.split(k))
        )(jax.random.split(k_enc, s))  # per-s (k1, k2), XLA-path order

    def widen(wg, c_real, c_pad, m):
        return jnp.zeros((3, 3, c_pad, m), wg.dtype).at[:, :, :c_real].set(wg)

    def apply_affine(y, sc, sh, c_real, drop_key=None):
        if enc_rate > 0 and drop_key is not None:
            m = _drop_scales_sbc(drop_key, enc_rate, b, c_real)
            sci, shi = _per_image_affine(sc, sh, m)
            return affine_relu_ct(y, sci, shi, c_real, s * b, interpret)
        return affine_relu_ct(y, sc[..., None], sh[..., None], c_real, s,
                              interpret)

    # ---- encoder in_conv --------------------------------------------------
    ic = enc_p["in_conv"]
    w1p = jnp.stack([pack_w3x3([ic["conv1"]["w"][g]]) for g in range(s)])
    y1, s1, q1 = conv3x3_ct_train(
        xct, None, w1p.astype(cdt), None, None,
        h, w, pick_th_train(h, w, cin, 0, f, prologue=False),
        cin, 0, f, 0, interpret)
    s1, q1 = _psum_stats(s1, q1, axis)
    sc1, sh1, new_enc["in_conv"]["bn1"] = _bn_affine_from_stats(
        s1, q1, cnt_full, ic["conv1"]["b"], ic["bn1"], enc_s["in_conv"]["bn1"])

    w2p = jnp.stack([pack_w3x3([widen(ic["conv2"]["w"][g], f, fa, f)])
                     for g in range(s)])
    y2, s2, q2 = conv3x3_ct_train(
        y1, None, w2p.astype(cdt), _prologue_cols([(sc1, f)], fa),
        _prologue_cols([(sh1, f)], fa),
        h, w, pick_th_train(h, w, fa, 0, f, prologue=True),
        fa, 0, f, 0, interpret)
    s2, q2 = _psum_stats(s2, q2, axis)
    sc2, sh2, new_enc["in_conv"]["bn2"] = _bn_affine_from_stats(
        s2, q2, cnt_full, ic["conv2"]["b"], ic["bn2"], enc_s["in_conv"]["bn2"])

    # skip connection + pool input: z2 = relu(affine2(y2)), group-blocked
    # (the in_conv Dropout2d site folds into the affine — see
    # _per_image_affine)
    x1s = apply_affine(y2, sc2, sh2, f,
                       drop_key=ks[0] if enc_rate > 0 else None)
    h2, w2 = h // 2, w // 2

    if _ct_train_down1_aligned(h, w):
        # ---- down1 (CT kernels) --------------------------------------------
        from mimo_unet_tpu.ops.pallas.ct_elem import (max_pool2x2_ct,
                                                      max_pool2x2_skip_ct,
                                                      pool_ct_supported,
                                                      pool_skip_ct_supported)

        if pool_skip_ct_supported(fa, n, h, w):
            # pool in the CT tiling (the 4D reduce_window form retiles the
            # full-res tensor both ways — 2 x 805 MB copies at the
            # flagship), with the decoder-skip cotangent add fused into
            # the pool backward: rebinding x1s to the pair's identity
            # output routes its cotangent through the fused kernel
            pooled, x1s = max_pool2x2_skip_ct(x1s, n, h, w, interpret)
        elif pool_ct_supported(fa, n, h, w):
            pooled = max_pool2x2_ct(x1s, n, h, w, interpret)
        else:
            pooled = _max_pool_ct(x1s.reshape(fa, n, h, w)).reshape(fa, -1)
        d1 = enc_p["down1"]
        w3p = jnp.stack([pack_w3x3([widen(d1["conv1"]["w"][g], f, fa, f2)])
                         for g in range(s)])
        y3, s3, q3 = conv3x3_ct_train(
            pooled, None, w3p.astype(cdt), None, None,
            h2, w2, pick_th_train(h2, w2, fa, 0, f2, prologue=False),
            fa, 0, f2, 0,
            interpret)
        s3, q3 = _psum_stats(s3, q3, axis)
        sc3, sh3, new_enc["down1"]["bn1"] = _bn_affine_from_stats(
            s3, q3, cnt_half, d1["conv1"]["b"], d1["bn1"],
            enc_s["down1"]["bn1"])

        w4p = jnp.stack([pack_w3x3([widen(d1["conv2"]["w"][g], f2, f2a, f2)])
                         for g in range(s)]) if f2a != f2 else jnp.stack(
            [pack_w3x3([d1["conv2"]["w"][g]]) for g in range(s)])
        y4, s4, q4 = conv3x3_ct_train(
            y3, None, w4p.astype(cdt), _prologue_cols([(sc3, f2)], f2a),
            _prologue_cols([(sh3, f2)], f2a),
            h2, w2, pick_th_train(h2, w2, f2a, 0, f2, prologue=True),
            f2a, 0, f2, 0,
            interpret)
        s4, q4 = _psum_stats(s4, q4, axis)
        sc4, sh4, new_enc["down1"]["bn2"] = _bn_affine_from_stats(
            s4, q4, cnt_half, d1["conv2"]["b"], d1["bn2"],
            enc_s["down1"]["bn2"])
        x2s = apply_affine(y4, sc4, sh4, f2,
                           drop_key=ks[1] if enc_rate > 0 else None)
        if bpool:
            from mimo_unet_tpu.ops.pallas.ct_elem import max_pool2x2_skip_ct
            x2p, x2s = max_pool2x2_skip_ct(x2s, n, h2, w2, interpret)
            x2s5 = x2s.reshape(f2a, s, b, h2, w2)
            x2p5 = x2p.reshape(f2a, s, b, h2 // 2, w2 // 2)
            return (x1s.reshape(fa, s, b, h, w), x2s5, x2p5, new_enc)
        x2s5 = x2s.reshape(f2a, s, b, h2, w2)
    else:
        # ---- down1 (NHWC fallback, half width unaligned: 640x480 frames) ---
        # the vmapped XLA Down block with train-mode BatchNorm (global-batch
        # stats via jnp reductions — single-device only, see the gate)
        from mimo_unet_tpu.models.blocks import down_apply

        x1_nhwc = jnp.transpose(
            x1s.reshape(fa, s, b, h, w)[:f], (1, 2, 3, 4, 0))

        def down1_one(p, st, xs, k):
            (x2, _), new_st = down_apply(p, st, xs, train=True,
                                         compute_dtype=cdt,
                                         dropout_rate=enc_rate,
                                         dropout_key=k)
            return x2, new_st

        d1_keys = (ks[1] if enc_rate > 0
                   else jax.random.split(jax.random.key(0), s))
        x2, d1_state = jax.vmap(down1_one)(
            enc_p["down1"], enc_s["down1"], x1_nhwc, d1_keys)
        new_enc["down1"] = d1_state
        x2s5 = jnp.transpose(x2, (4, 0, 1, 2, 3))  # [2f, s, b, h2, w2]
        if f2a != f2:
            x2s5 = jnp.pad(
                x2s5, ((0, f2a - f2), (0, 0), (0, 0), (0, 0), (0, 0)))

    return x1s.reshape(fa, s, b, h, w), x2s5, new_enc


def _dec_train_local(dec_p, dec_s, x1s5, x_up, k_dec, *, cfg, cnt_full,
                     interpret, axis):
    """Per-device train decoder: (x1s [fa, S, b, H, W], x_up NHWC) ->
    (logits [b, S, H, W, out_channels] f32, new_dec_state)."""
    from mimo_unet_tpu.ops.pallas.ct_elem import conv1x1_prelu_ct
    from mimo_unet_tpu.ops.pallas.ct_train import conv3x3_ct_train

    fa, s, b, h, w = x1s5.shape
    f = cfg.filter_base_count
    h2, w2 = h // 2, w // 2
    from mimo_unet_tpu.ops.pallas.ct_train import pick_th_train
    cdt = jnp.bfloat16
    x1s = x1s5.reshape(fa, -1)
    new_dec = {"up4": {"conv": {}}}

    def widen(wg, c_real, c_pad, m):
        return jnp.zeros((3, 3, c_pad, m), wg.dtype).at[:, :, :c_real].set(wg)

    c_up = x_up.shape[-1]
    c_up_a = align8(c_up)
    xup_ct = jnp.transpose(x_up.astype(cdt), (3, 0, 1, 2))
    if c_up_a != c_up:
        xup_ct = jnp.pad(xup_ct, ((0, c_up_a - c_up), (0, 0), (0, 0), (0, 0)))
    from mimo_unet_tpu.ops.pallas.ct_resize import (
        lerp_h2x_transpose_supported, upsample2x_ct, upsample2x_ct_supported,
        upsample_w2x_ct, upsample_w2x_ct_supported)
    xup_flat = xup_ct.reshape(c_up_a, -1)

    up4 = dec_p["up4"]["conv"]
    mid_c = up4["conv1"]["w"].shape[4]
    import os

    # x2_half_h for TRAIN is a measured net loss on this testbed
    # (flagship B=128: 505.5 -> 499.3 img/s — the fwd/dw staging lerps
    # plus the backward's extra half-H full-W intermediate outweigh the
    # ~1.5 saved forward passes; docs/PERFORMANCE.md round 4).  The
    # kernel capability stays (bitwise parity-tested, and the eval path
    # shares the staging math) but the train gate is opt-in.
    half_want = os.environ.get("MIMO_CT_TRAIN_X2_HALF", "0") != "0"
    th_hh = (pick_th_train(h, w, fa, c_up_a, mid_c, prologue=False,
                           x2_half_h=True) if half_want else None)
    half_ok = half_want and (
        th_hh is not None
        and upsample_w2x_ct_supported(c_up_a, b * h2, w2)
        and lerp_h2x_transpose_supported(c_up_a, b, h2, w))
    if half_ok:
        from mimo_unet_tpu.ops.pallas.ct_train import pick_th_kind
        half_ok = pick_th_kind("dw", h, w, fa, c_up_a, mid_c,
                               prologue=False, x2_half_h=True) is not None
    if half_ok:
        # only the cheap W-half runs as a standalone pass (half-res
        # rows); the H row lerp is staged inside the train fwd/dw
        # kernels (x2_half_h) and the backward H-transposes the
        # full-res cotangent — the full-res upsampled tensor never
        # exists in HBM (saves its write + two full-res reads)
        xup_ct = upsample_w2x_ct(xup_flat, b * h2, w2, interpret)
    elif upsample2x_ct_supported(c_up_a, b, h2, w2):
        # one Pallas pass each way; the matmul-einsum form costs ~14 ms
        # of the B=128 flagship step in XLA layout copies
        xup_ct = upsample2x_ct(xup_flat, b, h2, w2, interpret)
    else:
        xup_ct = _upsample_ct_x2(xup_flat, b, h2, w2)

    def pack_dec(wg):
        skip_blk = widen(wg[:, :, :f], f, fa, mid_c)
        up_blk = widen(wg[:, :, f:], c_up, c_up_a, mid_c)
        return pack_w3x3([skip_blk, up_blk])

    w5p = jnp.stack([pack_dec(up4["conv1"]["w"][g]) for g in range(s)])
    y5, s5, q5 = conv3x3_ct_train(
        x1s, xup_ct, w5p.astype(cdt), None, None,
        h, w,
        th_hh if half_ok else pick_th_train(h, w, fa, c_up_a, mid_c,
                                            prologue=False),
        fa, c_up_a, mid_c, b,
        interpret, half_ok)
    s5, q5 = _psum_stats(s5, q5, axis)
    sc5, sh5, new_dec["up4"]["conv"]["bn1"] = _bn_affine_from_stats(
        s5, q5, cnt_full, up4["conv1"]["b"], up4["bn1"],
        dec_s["up4"]["conv"]["bn1"])

    mid_a = align8(mid_c)
    w6p = jnp.stack([pack_w3x3([widen(up4["conv2"]["w"][g], mid_c, mid_a, f)])
                     for g in range(s)])
    y6, s6, q6 = conv3x3_ct_train(
        y5, None, w6p.astype(cdt), _prologue_cols([(sc5, mid_c)], mid_a),
        _prologue_cols([(sh5, mid_c)], mid_a),
        h, w, pick_th_train(h, w, mid_a, 0, f, prologue=True),
        mid_a, 0, f, 0, interpret)
    s6, q6 = _psum_stats(s6, q6, axis)
    sc6, sh6, new_dec["up4"]["conv"]["bn2"] = _bn_affine_from_stats(
        s6, q6, cnt_full, up4["conv2"]["b"], up4["bn2"],
        dec_s["up4"]["conv"]["bn2"])

    # ---- out conv (1x1, per group), bn2 affine+relu folded in --------------
    # (the activated z6 never lands in HBM: conv1x1_prelu_ct recomputes
    # relu(y6*sc6+sh6) in VMEM both ways — 5 full-res passes saved)
    outc = dec_p["outc"]
    oc = outc["w"].shape[4]
    oca = align8(oc)
    wo = jnp.zeros((s, f, oca)).at[:, :, :oc].set(outc["w"][:, 0, 0])
    bo = jnp.zeros((s, oca, 1)).at[:, :oc, 0].set(outc["b"])
    dec_rate = cfg.decoder_dropout_rate
    fin_rate = cfg.final_dropout_rate
    n = s * b
    if (dec_rate > 0 or fin_rate > 0) and axis is not None:
        # per-device masks must be independent under a mesh
        k_dec = jax.random.fold_in(k_dec, lax.axis_index(axis))
    if dec_rate > 0:
        # up4's Dropout2d site (components.py:29, DoubleConv end) folds
        # into per-image affine params; wo/bo broadcast per image so the
        # fused kernel runs with groups=N (grads sum over b via autodiff)
        ks = jax.vmap(
            lambda k: tuple(jax.random.split(k))
        )(jax.random.split(k_dec, s))  # XLA decoder_one key order
        m6 = _drop_scales_sbc(ks[0], dec_rate, b, f)
        sc6i, sh6i = _per_image_affine(sc6, sh6, m6)
        wo_i = jnp.broadcast_to(wo[:, None], (s, b, f, oca)).reshape(
            n, f, oca)
        bo_i = jnp.broadcast_to(bo[:, None], (s, b, oca, 1)).reshape(
            n, oca, 1)
        logits_ct = conv1x1_prelu_ct(
            y6, sc6i, sh6i, wo_i, bo_i, f, n, interpret)  # [oca, n*h*w]
    elif fin_rate > 0:
        # elementwise final dropout sits between the relu and the 1x1
        # (reference model.py:281): unfused route.  The mask is drawn on
        # the CT layout, so its per-element pattern differs from the NHWC
        # path's draw (same deviation as the eval path; docs/MIGRATION.md)
        from mimo_unet_tpu.ops.dropout import dropout as _dropout
        from mimo_unet_tpu.ops.pallas.ct_elem import (affine_relu_ct,
                                                      conv1x1_ct)

        z6 = affine_relu_ct(y6, sc6[..., None], sh6[..., None], f, s,
                            interpret)
        z6 = _dropout(z6, fin_rate, jax.random.fold_in(k_dec, 0),
                      deterministic=False)
        logits_ct = conv1x1_ct(z6.astype(cdt), wo, bo, f, s, interpret)
    else:
        logits_ct = conv1x1_prelu_ct(
            y6, sc6[..., None], sh6[..., None], wo, bo, f, s,
            interpret)  # [oca, n*h*w]

    logits = logits_ct[:oc].reshape(oc, s, b, h, w)
    logits = jnp.transpose(logits, (2, 1, 3, 4, 0)).astype(jnp.float32)
    return logits, new_dec


def mimo_unet_apply_ct_train(
    params: dict,
    state: dict,
    x: jax.Array,
    cfg: MimoUNetConfig,
    *,
    rng: Optional[jax.Array] = None,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, dict]:
    """Train-mode forward via CT kernels: [B,S,H,W,Cin] -> logits, state.

    Encoder/decoder convs run as conv3x3_ct_train (custom VJP); BatchNorm
    batch statistics come back from the kernels and the affines are
    computed in differentiable XLA glue, so jax.grad of a loss on the
    output produces the same gradients as the reference NHWC path (bf16
    tolerance; tests/test_ct_train.py).

    Under an active data-parallel mesh the kernel sections run inside
    ``jax.shard_map`` with the BN statistics psum'd across the data axis
    (global-batch BN, matching the reference's single-device semantics —
    components.py:24,27); verified against the single-device result in
    tests/test_ct_mesh.py."""
    if interpret is None:
        from mimo_unet_tpu.ops.pallas.ct_conv import _use_interpret
        interpret = _use_interpret()
    b, s, h, w, cin = x.shape
    f = cfg.filter_base_count
    f2 = 2 * f
    mesh, axis = _active_ct_mesh(x.shape, "train")
    # GLOBAL per-group counts: the mesh-wide batch normalizes every group
    cnt_full = b * h * w
    cnt_half = b * (h // 2) * (w // 2)
    if rng is None:
        rng = jax.random.key(0)
    # the XLA path's key tree (mimo_unet_apply), so the Dropout2d masks
    # match it bitwise for a shared rng
    k_enc, k_core, k_dec = jax.random.split(rng, 3)

    # CT boundary pool: pool the down1 output (the core down2's 2x2 max
    # pool) in the kernels' native CT tiling, with up3's skip cotangent
    # fused into the pool backward (one kernel pass instead of
    # reduce_window fwd + eq-mask/add glue bwd at half resolution).
    from mimo_unet_tpu.ops.pallas.ct_elem import pool_skip_ct_supported
    b_local = b if mesh is None else b // mesh.shape[axis]
    f2a = align8(f2)
    bpool = (_ct_train_down1_aligned(h, w)
             and pool_skip_ct_supported(f2a, s * b_local, h // 2, w // 2))
    enc = partial(_enc_train_local, cfg=cfg, cnt_full=cnt_full,
                  cnt_half=cnt_half, interpret=interpret, axis=axis,
                  bpool=bpool)
    dec = partial(_dec_train_local, cfg=cfg, cnt_full=cnt_full,
                  interpret=interpret, axis=axis)
    # HBM capacity ladder (MimoUNetConfig.remat / train/capacity.py):
    # recompute the full-res encoder residuals — the dominant HBM term at
    # large batch — in the backward instead of saving them; "all" also
    # recomputes the decoder section (fwd-peak relief).  The custom-VJP
    # kernels replay identically, so numerics are unchanged.
    if cfg.remat in ("enc", "all"):
        enc = jax.checkpoint(enc)
    if cfg.remat == "all":
        dec = jax.checkpoint(dec)

    if mesh is None:
        enc_out = enc(params["encoder"], state["encoder"], x, k_enc)
    else:
        sharded = P(None, None, axis)
        out_specs = ((sharded, sharded, sharded, P()) if bpool
                     else (sharded, sharded, P()))
        enc_out = jax.shard_map(
            enc, mesh=mesh,
            in_specs=(P(), P(), P(axis), P()),
            out_specs=out_specs,
            check_vma=False,
        )(params["encoder"], state["encoder"], x, k_enc)
    if bpool:
        x1s5, x2s5, x2p5, new_enc = enc_out
    else:
        x1s5, x2s5, new_enc = enc_out
        x2p5 = None

    # ---- core (NHWC XLA, train) --------------------------------------------
    h2, w2 = h // 2, w // 2
    x2_concat = jnp.transpose(x2s5[:f2], (2, 3, 4, 1, 0)).reshape(
        b, h2, w2, s * f2)
    x2_pooled = None
    if x2p5 is not None:
        x2_pooled = jnp.transpose(x2p5[:f2], (2, 3, 4, 1, 0)).reshape(
            b, h2 // 2, w2 // 2, s * f2)

    def core_fn(cp, cs, xc, kc, xp):
        return core_apply(cp, cs, xc, cfg, train=True, rng=kc,
                          dropout_active=True, x2_pooled=xp)

    if cfg.remat == "all":
        core_fn = jax.checkpoint(core_fn)
    x_up, core_st = core_fn(params["core"], state["core"], x2_concat,
                            k_core, x2_pooled)

    if mesh is None:
        logits, new_dec = dec(params["decoder"], state["decoder"], x1s5,
                              x_up, k_dec)
    else:
        logits, new_dec = jax.shard_map(
            dec, mesh=mesh,
            in_specs=(P(), P(), P(None, None, axis), P(axis), P()),
            out_specs=(P(axis), P()),
            check_vma=False,
        )(params["decoder"], state["decoder"], x1s5, x_up, k_dec)

    new_state = {
        "encoder": {
            "in_conv": {"bn1": new_enc["in_conv"]["bn1"],
                        "bn2": new_enc["in_conv"]["bn2"]},
            "down1": {"bn1": new_enc["down1"]["bn1"],
                      "bn2": new_enc["down1"]["bn2"]},
        },
        "core": core_st,
        "decoder": {"up4": {"conv": new_dec["up4"]["conv"]}},
    }
    return logits, new_state
