"""CT-layout fused DoubleConv kernel and fast-path forward (interpret mode).

The kernel's reflect/boundary handling is intricate (rolled dx taps,
per-image reflect fixes, clamped tile 0), so it is verified against the
framework's own conv/norm ops, which are themselves torch-oracle-verified
(tests/test_ops.py, tests/test_model.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimo_unet_tpu.models.mimo_unet import (
    MimoUNetConfig,
    mimo_unet_apply,
    mimo_unet_init,
)
from mimo_unet_tpu.models.fast_path import (
    ct_fast_path_supported,
    mimo_unet_apply_ct,
)
from mimo_unet_tpu.ops.conv import reflect_pad1
from mimo_unet_tpu.ops.pallas.ct_conv import (
    align8,
    fold_bn_eval,
    fused_double_conv_ct,
    pack_w3x3,
)


def _xla_double_conv(x_nhwc, w1, s1, b1, w2, s2, b2):
    from jax import lax

    def conv(x, wt):
        return lax.conv_general_dilated(
            reflect_pad1(x), wt.astype(x.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    y = jnp.maximum(conv(x_nhwc, w1) * s1 + b1, 0).astype(x_nhwc.dtype)
    return jnp.maximum(conv(y, w2) * s2 + b2, 0).astype(x_nhwc.dtype)


def _mk(key, shape, scale=0.3):
    return jax.random.normal(key, shape, jnp.float32) * scale


class TestFusedDoubleConvCT:
    @pytest.mark.parametrize("c,m,o,h,w,n,th", [
        (5, 7, 6, 16, 256, 3, 8),     # odd channels, multi-image
        (12, 9, 11, 16, 256, 2, 16),  # single tile per image
        (3, 8, 8, 24, 384, 2, 8),     # non-pow2 W (384 = 3*128)
        (5, 7, 6, 16, 256, 3, (8, 2)),   # sub-tile chunked (tc=4)
        (12, 9, 11, 16, 256, 2, (16, 4)),  # 4 chunks of tc=4
    ])
    def test_matches_xla_reference(self, c, m, o, h, w, n, th):
        ks = jax.random.split(jax.random.key(0), 7)
        x = _mk(ks[0], (n, h, w, c), 1.0)
        w1, w2 = _mk(ks[1], (3, 3, c, m)), _mk(ks[2], (3, 3, m, o))
        s1 = jax.random.uniform(ks[3], (m,), minval=0.5, maxval=1.5)
        b1 = _mk(ks[4], (m,), 0.1)
        s2 = jax.random.uniform(ks[5], (o,), minval=0.5, maxval=1.5)
        b2 = _mk(ks[6], (o,), 0.1)

        x_bf = x.astype(jnp.bfloat16)
        ref = _xla_double_conv(x_bf, w1, s1, b1, w2, s2, b2)
        ref_ct = jnp.moveaxis(ref, -1, 0).reshape(o, -1)

        xct = jnp.moveaxis(x_bf, -1, 0).reshape(c, -1)
        w1p = pack_w3x3([w1])[None]
        w2p = pack_w3x3([w2])[None]
        out = fused_double_conv_ct(
            xct, w1p, s1[None], b1[None], w2p, s2[None], b2[None],
            h=h, w=w, th=th, c1=c, m=m, o=o, interpret=True)

        got = out[:o].astype(np.float32)
        want = ref_ct.astype(np.float32)
        scale = float(jnp.max(jnp.abs(want))) or 1.0
        np.testing.assert_allclose(got, want, atol=3e-2 * scale)
        # alignment-pad channels must be exact zeros
        if align8(o) > o:
            assert float(jnp.max(jnp.abs(out[o:]))) == 0.0
        if isinstance(th, tuple):
            # chunking changes scratch sizes, not dot contractions: the
            # sub>1 output must be BITWISE the whole-tile kernel's
            base = fused_double_conv_ct(
                xct, w1p, s1[None], b1[None], w2p, s2[None], b2[None],
                h=h, w=w, th=th[0], c1=c, m=m, o=o, interpret=True)
            assert bool(jnp.all(out == base))

    def test_grouped_weights_select_per_image_block(self):
        c, m, o, h, w, g, npg = 4, 6, 5, 16, 256, 2, 2
        ks = jax.random.split(jax.random.key(1), 3)
        x = _mk(ks[0], (g * npg, h, w, c), 1.0).astype(jnp.bfloat16)
        w1 = _mk(ks[1], (g, 3, 3, c, m))
        w2 = _mk(ks[2], (g, 3, 3, m, o))
        ones_m, zeros_m = jnp.ones((g, m)), jnp.zeros((g, m))
        ones_o, zeros_o = jnp.ones((g, o)), jnp.zeros((g, o))

        xct = jnp.moveaxis(x, -1, 0).reshape(c, -1)
        w1p = jnp.stack([pack_w3x3([w1[i]]) for i in range(g)])
        w2p = jnp.stack([pack_w3x3([w2[i]]) for i in range(g)])
        out = fused_double_conv_ct(
            xct, w1p, ones_m, zeros_m, w2p, ones_o, zeros_o,
            h=h, w=w, th=8, c1=c, m=m, o=o, interpret=True)

        for gi in range(g):
            sl = slice(gi * npg * h * w, (gi + 1) * npg * h * w)
            ref = _xla_double_conv(
                x[gi * npg:(gi + 1) * npg], w1[gi], jnp.ones(m), jnp.zeros(m),
                w2[gi], jnp.ones(o), jnp.zeros(o))
            ref_ct = jnp.moveaxis(ref, -1, 0).reshape(o, -1)
            scale = float(jnp.max(jnp.abs(ref_ct))) or 1.0
            np.testing.assert_allclose(
                out[:o, sl].astype(np.float32),
                ref_ct.astype(np.float32), atol=3e-2 * scale)

    @pytest.mark.parametrize("th", [8, (8, 2)])
    def test_two_input_concat_and_fused_outconv(self, th):
        c1r, c2r, m, o, oc, h, w, n = 5, 6, 7, 6, 2, 16, 256, 2
        c1a, c2a = align8(c1r), align8(c2r)
        ks = jax.random.split(jax.random.key(2), 6)
        xa = _mk(ks[0], (n, h, w, c1r), 1.0).astype(jnp.bfloat16)
        xb = _mk(ks[1], (n, h, w, c2r), 1.0).astype(jnp.bfloat16)
        w1 = _mk(ks[2], (3, 3, c1r + c2r, m))
        w2 = _mk(ks[3], (3, 3, m, o))
        wo = _mk(ks[4], (1, 1, o, oc))
        bo = _mk(ks[5], (oc,), 0.1)

        ref = _xla_double_conv(
            jnp.concatenate([xa, xb], axis=-1), w1, jnp.ones(m), jnp.zeros(m),
            w2, jnp.ones(o), jnp.zeros(o))
        ref = (jnp.einsum("nhwo,oc->nhwc", ref.astype(jnp.float32),
                          wo[0, 0]) + bo)
        ref_ct = jnp.moveaxis(ref.astype(jnp.bfloat16), -1, 0).reshape(oc, -1)

        # pad both inputs' channels to alignment (zeros), as the fast path does
        xa_p = jnp.concatenate(
            [xa, jnp.zeros(xa.shape[:-1] + (c1a - c1r,), xa.dtype)], -1)
        xb_p = jnp.concatenate(
            [xb, jnp.zeros(xb.shape[:-1] + (c2a - c2r,), xb.dtype)], -1)
        x1ct = jnp.moveaxis(xa_p, -1, 0).reshape(c1a, -1)
        x2ct = jnp.moveaxis(xb_p, -1, 0).reshape(c2a, -1)
        blk1 = jnp.zeros((3, 3, c1a, m)).at[:, :, :c1r].set(w1[:, :, :c1r])
        blk2 = jnp.zeros((3, 3, c2a, m)).at[:, :, :c2r].set(w1[:, :, c1r:])
        w1p = pack_w3x3([blk1, blk2])[None]
        w2p = pack_w3x3([w2])[None]
        wop = jnp.zeros((1, o, align8(oc))).at[0, :, :oc].set(wo[0, 0])
        bop = jnp.zeros((1, align8(oc))).at[0, :oc].set(bo)

        out = fused_double_conv_ct(
            x1ct, w1p, jnp.ones((1, m)), jnp.zeros((1, m)),
            w2p, jnp.ones((1, o)), jnp.zeros((1, o)),
            h=h, w=w, th=th, c1=c1a, m=m, o=o,
            x2=x2ct, c2=c2a, n2_images=n, wo=wop, bo=bop, interpret=True)

        scale = float(jnp.max(jnp.abs(ref_ct))) or 1.0
        np.testing.assert_allclose(
            out[:oc].astype(np.float32), ref_ct.astype(np.float32),
            atol=4e-2 * scale)

    def test_x2_with_smaller_batch_period_broadcasts(self):
        """x2 with n2 < n repeats its images with period n2 (the decoder's
        shared core output consumed by every subnetwork)."""
        c1r, c2r, m, o, h, w = 4, 4, 5, 5, 16, 256
        n, n2 = 4, 2
        ks = jax.random.split(jax.random.key(3), 4)
        xa = _mk(ks[0], (n, h, w, c1r), 1.0).astype(jnp.bfloat16)
        xb = _mk(ks[1], (n2, h, w, c2r), 1.0).astype(jnp.bfloat16)
        w1 = _mk(ks[2], (3, 3, c1r + c2r, m))
        w2 = _mk(ks[3], (3, 3, m, o))

        xb_full = jnp.concatenate([xb, xb], axis=0)
        ref = _xla_double_conv(
            jnp.concatenate([xa, xb_full], axis=-1), w1,
            jnp.ones(m), jnp.zeros(m), w2, jnp.ones(o), jnp.zeros(o))
        ref_ct = jnp.moveaxis(ref, -1, 0).reshape(o, -1)

        x1ct = jnp.moveaxis(xa, -1, 0).reshape(c1r, -1)
        x2ct = jnp.moveaxis(xb, -1, 0).reshape(c2r, -1)
        w1p = pack_w3x3([w1[:, :, :c1r], w1[:, :, c1r:]])[None]
        w2p = pack_w3x3([w2])[None]
        out = fused_double_conv_ct(
            x1ct, w1p, jnp.ones((1, m)), jnp.zeros((1, m)),
            w2p, jnp.ones((1, o)), jnp.zeros((1, o)),
            h=h, w=w, th=8, c1=c1r, m=m, o=o,
            x2=x2ct, c2=c2r, n2_images=n2, interpret=True)

        scale = float(jnp.max(jnp.abs(ref_ct))) or 1.0
        np.testing.assert_allclose(
            out[:o].astype(np.float32), ref_ct.astype(np.float32),
            atol=3e-2 * scale)


    @pytest.mark.parametrize("th", [8, (8, 2)])
    def test_x2_half_h_fused_lerp_matches_host_lerp(self, th):
        """``x2_half_h``: the H-half of the bilinear x2 upsample runs
        inside the column builder.  Feeding the standard kernel the
        host-computed equivalent (f32 align-corners row lerp of the bf16
        half-res rows, cast to bf16) must match to ~1 bf16 ulp of the
        output scale — the only divergence is the compiler contracting
        the lerp's mul+add into an FMA (numpy rounds the intermediate),
        which can flip a bf16 rounding or a relu threshold."""
        c1r, c2r, m, o, h, w = 8, 8, 5, 5, 32, 256
        n, n2 = 4, 2
        h2 = h // 2
        ks = jax.random.split(jax.random.key(5), 4)
        xa = _mk(ks[0], (n, h, w, c1r), 1.0).astype(jnp.bfloat16)
        xh = _mk(ks[1], (n2, h2, w, c2r), 1.0).astype(jnp.bfloat16)
        w1 = _mk(ks[2], (3, 3, c1r + c2r, m))
        w2 = _mk(ks[3], (3, 3, m, o))

        # host H-lerp exactly as the kernel computes it (f32 division of
        # exact integers — float64-then-cast differs by 1 ulp on some rows)
        num = np.arange(h) * (h2 - 1)
        lo = np.minimum(num // (h - 1), h2 - 2)
        f = ((num - lo * (h - 1)).astype(np.float32)
             / np.float32(h - 1))[None, :, None, None]
        xh_np = np.asarray(xh, np.float32)
        xb_full = jnp.asarray(
            xh_np[:, lo] * (1 - f) + xh_np[:, lo + 1] * f
        ).astype(jnp.bfloat16)

        x1ct = jnp.moveaxis(xa, -1, 0).reshape(c1r, -1)
        x2full_ct = jnp.moveaxis(xb_full, -1, 0).reshape(c2r, -1)
        x2half_ct = jnp.moveaxis(xh, -1, 0).reshape(c2r, -1)
        w1p = pack_w3x3([w1[:, :, :c1r], w1[:, :, c1r:]])[None]
        w2p = pack_w3x3([w2])[None]
        kw = dict(h=h, w=w, th=th, c1=c1r, m=m, o=o, c2=c2r, n2_images=n2,
                  interpret=True)
        ref = fused_double_conv_ct(
            x1ct, w1p, jnp.ones((1, m)), jnp.zeros((1, m)),
            w2p, jnp.ones((1, o)), jnp.zeros((1, o)),
            x2=x2full_ct, **kw)
        out = fused_double_conv_ct(
            x1ct, w1p, jnp.ones((1, m)), jnp.zeros((1, m)),
            w2p, jnp.ones((1, o)), jnp.zeros((1, o)),
            x2=x2half_ct, x2_half_h=True, **kw)
        scale = float(jnp.max(jnp.abs(ref))) or 1.0
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=5e-3 * scale)


class TestNineTapKernel:
    @pytest.mark.parametrize("th", [8, (8, 2), (16, 4)])
    def test_matches_xla_reference_and_chunking_bitwise(self, th):
        """fused_double_conv9_ct (in_conv, c1<=8) vs the XLA DoubleConv,
        and — for chunked rungs — bitwise equality with the whole-tile
        kernel (chunking resizes scratches, not contractions)."""
        from mimo_unet_tpu.ops.pallas.ct_conv import fused_double_conv9_ct

        c, m, o, h, w, n = 3, 6, 6, 16, 256, 2
        ks = jax.random.split(jax.random.key(4), 5)
        x = _mk(ks[0], (n, h, w, c), 1.0).astype(jnp.bfloat16)
        w1, w2 = _mk(ks[1], (3, 3, c, m)), _mk(ks[2], (3, 3, m, o))
        s1 = jax.random.uniform(ks[3], (m,), minval=0.5, maxval=1.5)
        s2 = jax.random.uniform(ks[4], (o,), minval=0.5, maxval=1.5)
        b1, b2 = jnp.zeros(m), jnp.zeros(o)

        ref = _xla_double_conv(x, w1, s1, b1, w2, s2, b2)
        ref_ct = jnp.moveaxis(ref, -1, 0).reshape(o, -1)

        xct = jnp.moveaxis(x, -1, 0).reshape(c, -1)
        kw = dict(h=h, w=w, c1=c, m=m, o=o, emit_hpool=True,
                  interpret=True)
        out, hp = fused_double_conv9_ct(
            xct, w1[None], s1[None], b1[None], pack_w3x3([w2])[None],
            s2[None], b2[None], th=th, **kw)
        scale = float(jnp.max(jnp.abs(ref_ct))) or 1.0
        np.testing.assert_allclose(
            out[:o].astype(np.float32), ref_ct.astype(np.float32),
            atol=3e-2 * scale)
        # H-pool half: row-pair max of the output
        want_hp = jnp.maximum(ref[:, 0::2], ref[:, 1::2])
        want_hp = jnp.moveaxis(want_hp, -1, 0).reshape(o, -1)
        np.testing.assert_allclose(
            hp[:o].astype(np.float32), want_hp.astype(np.float32),
            atol=3e-2 * scale)
        if isinstance(th, tuple):
            base_out, base_hp = fused_double_conv9_ct(
                xct, w1[None], s1[None], b1[None], pack_w3x3([w2])[None],
                s2[None], b2[None], th=th[0], **kw)
            assert bool(jnp.all(out == base_out))
            assert bool(jnp.all(hp == base_hp))


class TestFastPathForward:
    def test_matches_reference_forward(self):
        cfg = MimoUNetConfig(
            in_channels=3, out_channels=2, num_subnetworks=2,
            filter_base_count=6, compute_dtype="bfloat16")
        params, state = mimo_unet_init(jax.random.key(0), cfg)
        x = jax.random.uniform(jax.random.key(1), (2, 2, 16, 256, 3))
        ref, _ = mimo_unet_apply(params, state, x, cfg, train=False)
        out, new_state = mimo_unet_apply_ct(
            params, state, x, cfg, interpret=True)
        scale = float(jnp.max(jnp.abs(ref)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-2 * scale)
        # eval: state unchanged
        assert jax.tree.all(jax.tree.map(
            lambda a, b: bool(jnp.all(a == b)), new_state, state))

    def test_w640_mixed_path_matches_reference(self):
        """w % 128 (not 256): in_conv + decoder run the CT kernels, down1
        runs the NHWC fallback (640/2 = 320 is not lane-block aligned) —
        the NYUv2 whole-frame shape class (reference nyuv2.py:20-24)."""
        cfg = MimoUNetConfig(
            in_channels=3, out_channels=2, num_subnetworks=2,
            filter_base_count=6, compute_dtype="bfloat16")
        params, state = mimo_unet_init(jax.random.key(0), cfg)
        x = jax.random.uniform(jax.random.key(1), (1, 2, 16, 640, 3))
        from mimo_unet_tpu.models.fast_path import _ct_down1_aligned
        assert not _ct_down1_aligned(16, 640)
        ref, _ = mimo_unet_apply(params, state, x, cfg, train=False)
        out, _ = mimo_unet_apply_ct(params, state, x, cfg, interpret=True)
        scale = float(jnp.max(jnp.abs(ref)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-2 * scale)

    def test_mc_spatial_dropout_matches_xla_masks(self):
        """The documented MC recipe (encoder/core/decoder_dropout_rate 0.1,
        reference Readme.md:82): CT-path Dropout2d masks are drawn with the
        XLA path's exact keys, so with a shared rng the two paths must
        agree (bf16 kernel tolerance) — including which channels dropped."""
        cfg = MimoUNetConfig(
            in_channels=3, out_channels=2, num_subnetworks=2,
            filter_base_count=6, compute_dtype="bfloat16",
            encoder_dropout_rate=0.1, core_dropout_rate=0.1,
            decoder_dropout_rate=0.1)
        params, state = mimo_unet_init(jax.random.key(0), cfg)
        x = jax.random.uniform(jax.random.key(1), (2, 2, 16, 256, 3))
        rng = jax.random.key(7)
        ref, _ = mimo_unet_apply(params, state, x, cfg, train=False,
                                 rng=rng, mc_dropout=True)
        out, _ = mimo_unet_apply_ct(params, state, x, cfg, rng=rng,
                                    mc_dropout=True, interpret=True)
        scale = float(jnp.max(jnp.abs(ref)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-2 * scale)
        # and it is genuinely stochastic across keys
        out2, _ = mimo_unet_apply_ct(params, state, x, cfg,
                                     rng=jax.random.key(8),
                                     mc_dropout=True, interpret=True)
        assert float(jnp.max(jnp.abs(out2 - out))) > 1e-3

    def test_eligibility_gates(self):
        cfg = MimoUNetConfig(
            in_channels=3, out_channels=2, num_subnetworks=2,
            filter_base_count=6, compute_dtype="bfloat16")
        shape = (2, 2, 16, 256, 3)
        on_tpu = jax.default_backend() == "tpu"
        assert ct_fast_path_supported(
            cfg, shape, train=False, mc_dropout=False) == on_tpu
        force = MimoUNetConfig(
            in_channels=3, out_channels=2, num_subnetworks=2,
            filter_base_count=6, compute_dtype="bfloat16",
            ct_kernels="force")
        assert ct_fast_path_supported(
            force, shape, train=False, mc_dropout=False)
        # train / spatial-dropout-mc / f32 / bad width all fall back
        assert not ct_fast_path_supported(
            force, shape, train=True, mc_dropout=False)
        # mc-dropout is supported for the center/final sites...
        assert ct_fast_path_supported(
            force, shape, train=False, mc_dropout=True)
        # ...and (since round 3) for the spatial Dropout2d sites of the
        # documented MC recipe (reference Readme.md:82)
        import dataclasses
        spatial = dataclasses.replace(
            force, encoder_dropout_rate=0.1, core_dropout_rate=0.1,
            decoder_dropout_rate=0.1)
        assert ct_fast_path_supported(
            spatial, shape, train=False, mc_dropout=True)
        # w % 128 == 0 suffices (640-wide NYUv2 frames; down1 falls back)
        assert ct_fast_path_supported(
            force, (2, 2, 16, 640, 3), train=False, mc_dropout=False)
        f32 = MimoUNetConfig(
            in_channels=3, out_channels=2, num_subnetworks=2,
            filter_base_count=6, ct_kernels="force")
        assert not ct_fast_path_supported(
            f32, shape, train=False, mc_dropout=False)
        assert not ct_fast_path_supported(
            force, (2, 2, 16, 200, 3), train=False, mc_dropout=False)


class TestUpsampleW2xCT:
    def test_matches_einsum_w_half_fwd_and_grad(self):
        """The flat-lane W-half Pallas pass vs the mat_einsum form: same
        [w2 -> w] interp dot in the same operand dtype, so forward and
        gradient must agree to bf16 accumulation noise."""
        from mimo_unet_tpu.ops.pallas.ct_resize import (
            upsample_w2x_ct, upsample_w2x_ct_supported)
        from mimo_unet_tpu.ops.resize import (_interp_matrix, mat_einsum)

        c, rows, w2 = 24, 36, 128
        assert upsample_w2x_ct_supported(c, rows, w2)
        x = jax.random.normal(jax.random.key(0), (c, rows * w2)).astype(
            jnp.bfloat16)

        def ref_fn(v):
            x3 = v.reshape(c, rows, w2)
            mw = jnp.asarray(_interp_matrix(w2, 2 * w2)).astype(v.dtype)
            y = mat_einsum("pw,crw->crp", "pw,crp->crw", mw, x3)
            return y.reshape(c, rows * 2 * w2)

        ref = ref_fn(x)
        got = upsample_w2x_ct(x, rows, w2, True)
        np.testing.assert_allclose(
            np.asarray(ref, np.float32), np.asarray(got, np.float32),
            rtol=2e-2, atol=2e-2)

        wts = jax.random.normal(jax.random.key(1), ref.shape)

        def loss(fn):
            return lambda v: jnp.sum(fn(v).astype(jnp.float32) * wts)

        g_ref = jax.grad(loss(ref_fn))(x)
        g_new = jax.grad(
            loss(lambda v: upsample_w2x_ct(v, rows, w2, True)))(x)
        np.testing.assert_allclose(
            np.asarray(g_ref, np.float32), np.asarray(g_new, np.float32),
            rtol=5e-2, atol=5e-2)


class TestUpsample2xCT:
    def test_matches_matmul_upsample_fwd_and_grad(self):
        """upsample2x_ct (one Pallas pass each way) vs the matmul-einsum
        form (_upsample_ct_x2): same bilinear align-corners map
        (reference components.py:78).  bf16 intermediate rounding orders
        differ (W-then-H vs H-then-W), so compare with a 2-ulp budget."""
        from mimo_unet_tpu.models.fast_path import _upsample_ct_x2
        from mimo_unet_tpu.ops.pallas.ct_resize import (
            upsample2x_ct, upsample2x_ct_supported)

        c, n, h2, w2 = 16, 3, 12, 128
        assert upsample2x_ct_supported(c, n, h2, w2)
        x = jax.random.normal(jax.random.key(0), (c, n * h2 * w2)).astype(
            jnp.bfloat16)

        ref = _upsample_ct_x2(x, n, h2, w2)
        got = upsample2x_ct(x, n, h2, w2, True)
        a = np.asarray(ref, np.float32)
        b = np.asarray(got, np.float32)
        np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-2)

        wts = jax.random.normal(jax.random.key(1), ref.shape)

        def loss(fn):
            return lambda v: jnp.sum(fn(v).astype(jnp.float32) * wts)

        g_ref = jax.grad(loss(lambda v: _upsample_ct_x2(v, n, h2, w2)))(x)
        g_new = jax.grad(loss(lambda v: upsample2x_ct(v, n, h2, w2, True)))(x)
        np.testing.assert_allclose(
            np.asarray(g_ref, np.float32), np.asarray(g_new, np.float32),
            rtol=5e-2, atol=5e-2)

    def test_matches_f32_resize_exactly(self):
        """Against the f32 NHWC align-corners resize (ops/resize.py) the
        kernel must agree to bf16 rounding of the exact lerp."""
        from mimo_unet_tpu.ops.resize import upsample_bilinear_x2_align_corners
        from mimo_unet_tpu.ops.pallas.ct_resize import upsample2x_ct

        c, n, h2, w2 = 8, 2, 16, 128
        x4 = jax.random.normal(jax.random.key(0), (n, h2, w2, c))
        ref = upsample_bilinear_x2_align_corners(x4.astype(jnp.float32))
        xct = jnp.moveaxis(x4.astype(jnp.bfloat16), -1, 0).reshape(c, -1)
        got = upsample2x_ct(xct, n, h2, w2, True)
        got4 = jnp.moveaxis(
            got.reshape(c, n, 2 * h2, 2 * w2), 0, -1).astype(jnp.float32)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got4),
                                   rtol=2e-2, atol=2e-2)
