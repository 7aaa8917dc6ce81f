"""Unit tests for mimo_unet_tpu.ops against torch oracles (CPU)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from mimo_unet_tpu.ops import (
    conv2d,
    conv2d_init,
    conv_transpose2d,
    batch_norm,
    batch_norm_init,
    max_pool_2x2,
    max_pool_2x2_with_indices,
    max_unpool_2x2,
    upsample_bilinear_x2_align_corners,
    pad_to_match,
    dropout,
    dropout2d,
)
from mimo_unet_tpu.ops.pooling import local_to_torch_flat_indices


def nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.ascontiguousarray(np.moveaxis(x_nhwc, -1, 1)))


def to_nhwc(t: torch.Tensor) -> np.ndarray:
    return np.moveaxis(t.detach().numpy(), 1, -1)


def torch_w_to_hwio(w: torch.Tensor) -> np.ndarray:
    # torch conv weight OIHW -> HWIO
    return np.transpose(w.detach().numpy(), (2, 3, 1, 0))


class TestConv2d:
    @pytest.mark.parametrize("cin,cout,k,pad", [(3, 8, 3, "REFLECT"), (5, 7, 1, 0)])
    def test_matches_torch(self, rng, cin, cout, k, pad):
        x = rng.standard_normal((2, 12, 16, cin), dtype=np.float32)
        tconv = torch.nn.Conv2d(
            cin, cout, k, padding=(k - 1) // 2,
            padding_mode="reflect" if pad == "REFLECT" else "zeros",
        )
        params = {
            "w": jnp.asarray(torch_w_to_hwio(tconv.weight)),
            "b": jnp.asarray(tconv.bias.detach().numpy()),
        }
        got = conv2d(jnp.asarray(x), params, padding=pad)
        want = to_nhwc(tconv(nchw(x)))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_groups(self, rng):
        cin, cout, g = 8, 12, 4
        x = rng.standard_normal((2, 6, 6, cin), dtype=np.float32)
        tconv = torch.nn.Conv2d(cin, cout, 3, padding=1, padding_mode="reflect", groups=g)
        params = {
            "w": jnp.asarray(torch_w_to_hwio(tconv.weight)),
            "b": jnp.asarray(tconv.bias.detach().numpy()),
        }
        got = conv2d(jnp.asarray(x), params, padding="REFLECT", groups=g)
        want = to_nhwc(tconv(nchw(x)))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_fused_reflect_custom_grad_matches_pad_path(self, rng):
        """The pad-free reflect conv's custom VJP (classic backward,
        ops/conv.py::_conv3x3_reflect_customgrad) must match the
        materialized-pad path's gradients: same math, different forward
        formulation (reference components.py:23 reflect-padded 3x3)."""
        cin, cout = 5, 7
        x = jnp.asarray(rng.standard_normal((2, 8, 12, cin),
                                            dtype=np.float32))
        params = conv2d_init(jax.random.key(3), cin, cout, 3)

        def loss(x, w, fused):
            y = conv2d(x, {"w": w, "b": params["b"]}, padding="REFLECT",
                       fused_reflect=fused)
            return jnp.sum(y * jnp.cos(y))  # nontrivial cotangents

        (va, (dxa, dwa)) = jax.value_and_grad(loss, (0, 1))(
            x, params["w"], False)
        (vb, (dxb, dwb)) = jax.value_and_grad(loss, (0, 1))(
            x, params["w"], True)
        np.testing.assert_allclose(float(va), float(vb), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(dxa), np.asarray(dxb),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(dwa), np.asarray(dwb),
                                   atol=1e-4, rtol=1e-4)

    def test_fused_reflect_custom_grad_under_vmap(self, rng):
        """The vmapped per-subnetwork encoder/decoder path differentiates
        the fused conv under vmap."""
        cin, cout, s = 4, 6, 2
        x = jnp.asarray(rng.standard_normal((s, 2, 8, 8, cin),
                                            dtype=np.float32))
        w = jnp.asarray(rng.standard_normal((s, 3, 3, cin, cout),
                                            dtype=np.float32)) * 0.1
        b = jnp.zeros((s, cout))

        def one(x, w, b, fused):
            return jnp.sum(conv2d(x, {"w": w, "b": b}, padding="REFLECT",
                                  fused_reflect=fused) ** 2)

        def loss(x, w, fused):
            return jnp.sum(jax.vmap(one, in_axes=(0, 0, 0, None))(
                x, w, b, fused))

        dxa, dwa = jax.grad(loss, (0, 1))(x, w, False)
        dxb, dwb = jax.grad(loss, (0, 1))(x, w, True)
        np.testing.assert_allclose(np.asarray(dxa), np.asarray(dxb),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(dwa), np.asarray(dwb),
                                   atol=1e-4, rtol=1e-4)

    def test_init_bounds(self):
        params = conv2d_init(jax.random.key(0), 16, 32, 3)
        bound = 1.0 / np.sqrt(16 * 9)
        assert params["w"].shape == (3, 3, 16, 32)
        assert float(jnp.max(jnp.abs(params["w"]))) <= bound
        assert float(jnp.max(jnp.abs(params["b"]))) <= bound


class TestConvTranspose2d:
    def test_matches_torch(self, rng):
        cin, cout = 6, 4
        x = rng.standard_normal((2, 5, 7, cin), dtype=np.float32)
        tconv = torch.nn.ConvTranspose2d(cin, cout, kernel_size=2, stride=2)
        # torch weight [in, out, kh, kw] -> HWIO [kh, kw, in, out]
        w = np.transpose(tconv.weight.detach().numpy(), (2, 3, 0, 1))
        params = {"w": jnp.asarray(w), "b": jnp.asarray(tconv.bias.detach().numpy())}
        got = conv_transpose2d(jnp.asarray(x), params, stride=2)
        want = to_nhwc(tconv(nchw(x)))
        assert got.shape == (2, 10, 14, cout)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


class TestBatchNorm:
    def test_train_matches_torch(self, rng):
        c = 10
        x = rng.standard_normal((4, 6, 6, c), dtype=np.float32)
        tbn = torch.nn.BatchNorm2d(c)
        tbn.train()
        want = to_nhwc(tbn(nchw(x)))
        params, state = batch_norm_init(c)
        got, new_state = batch_norm(jnp.asarray(x), params, state, train=True)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(new_state["mean"]), tbn.running_mean.numpy(), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(new_state["var"]), tbn.running_var.numpy(), atol=1e-5
        )

    def test_eval_matches_torch(self, rng):
        c = 5
        x = rng.standard_normal((3, 4, 4, c), dtype=np.float32)
        tbn = torch.nn.BatchNorm2d(c)
        with torch.no_grad():
            tbn.running_mean.copy_(torch.arange(c, dtype=torch.float32) * 0.1)
            tbn.running_var.copy_(torch.arange(1, c + 1, dtype=torch.float32))
            tbn.weight.copy_(torch.linspace(0.5, 1.5, c))
            tbn.bias.copy_(torch.linspace(-1, 1, c))
        tbn.eval()
        want = to_nhwc(tbn(nchw(x)))
        params = {
            "scale": jnp.asarray(tbn.weight.detach().numpy()),
            "bias": jnp.asarray(tbn.bias.detach().numpy()),
        }
        state = {
            "mean": jnp.asarray(tbn.running_mean.numpy()),
            "var": jnp.asarray(tbn.running_var.numpy()),
        }
        got, _ = batch_norm(jnp.asarray(x), params, state, train=False)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


class TestPooling:
    def test_max_pool(self, rng):
        x = rng.standard_normal((2, 8, 10, 3), dtype=np.float32)
        got = max_pool_2x2(jnp.asarray(x))
        want = to_nhwc(F.max_pool2d(nchw(x), 2))
        np.testing.assert_allclose(np.asarray(got), want)

    def test_pool_indices_match_torch(self, rng):
        x = rng.standard_normal((2, 6, 8, 4), dtype=np.float32)
        pooled, idx = max_pool_2x2_with_indices(jnp.asarray(x))
        tp, tidx = F.max_pool2d(nchw(x), 2, return_indices=True)
        np.testing.assert_allclose(np.asarray(pooled), to_nhwc(tp))
        flat = local_to_torch_flat_indices(idx, in_w=8)
        np.testing.assert_array_equal(
            np.asarray(flat), to_nhwc(tidx).astype(np.int64)
        )

    def test_max_pool_skip_grads_match_unfused(self, rng):
        """max_pool_2x2_skip: forward == (max_pool_2x2(x), x) and the
        fused backward (skip add folded into the mask fusion) equals the
        unfused pair's gradient bitwise."""
        from mimo_unet_tpu.ops.pooling import max_pool_2x2_skip

        x = jnp.asarray(rng.standard_normal((2, 8, 10, 3), dtype=np.float32))
        wp = jnp.asarray(rng.standard_normal((3,), dtype=np.float32))
        ws = jnp.asarray(rng.standard_normal((3,), dtype=np.float32))

        def fused(x):
            p, s = max_pool_2x2_skip(x)
            return jnp.sum(p * p * wp) + jnp.sum(jnp.tanh(s) * ws)

        def unfused(x):
            return (jnp.sum(max_pool_2x2(x) ** 2 * wp)
                    + jnp.sum(jnp.tanh(x) * ws))

        vf, gf = jax.value_and_grad(fused)(x)
        vu, gu = jax.value_and_grad(unfused)(x)
        np.testing.assert_allclose(float(vf), float(vu), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(gf), np.asarray(gu))

    def test_unpool_roundtrip_matches_torch(self, rng):
        x = rng.standard_normal((2, 6, 8, 4), dtype=np.float32)
        pooled, idx = max_pool_2x2_with_indices(jnp.asarray(x))
        got = max_unpool_2x2(pooled, idx, 6, 8)
        tp, tidx = F.max_pool2d(nchw(x), 2, return_indices=True)
        want = to_nhwc(F.max_unpool2d(tp, tidx, 2))
        np.testing.assert_allclose(np.asarray(got), want)


class TestUpsample:
    @pytest.mark.parametrize("h,w", [(5, 7), (8, 8), (1, 4)])
    def test_matches_torch_align_corners(self, rng, h, w):
        x = rng.standard_normal((2, h, w, 3), dtype=np.float32)
        got = upsample_bilinear_x2_align_corners(jnp.asarray(x))
        want = to_nhwc(
            F.interpolate(nchw(x), scale_factor=2, mode="bilinear", align_corners=True)
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)

    def test_pad_to_match(self, rng):
        x = rng.standard_normal((1, 5, 6, 2), dtype=np.float32)
        got = pad_to_match(jnp.asarray(x), 8, 9)
        want = to_nhwc(F.pad(nchw(x), [1, 2, 1, 2]))  # dX=3, dY=3
        np.testing.assert_allclose(np.asarray(got), want)


class TestDropout:
    def test_rates_and_scaling(self):
        key = jax.random.key(0)
        x = jnp.ones((64, 16, 16, 8))
        y = dropout(x, 0.5, key, deterministic=False)
        kept = np.asarray(y) != 0
        assert abs(kept.mean() - 0.5) < 0.02
        np.testing.assert_allclose(np.asarray(y)[kept], 2.0)
        assert (dropout(x, 0.5, None, deterministic=True) == x).all()

    def test_dropout2d_zeroes_whole_channels(self):
        key = jax.random.key(1)
        x = jnp.ones((32, 8, 8, 16))
        y = np.asarray(dropout2d(x, 0.5, key, deterministic=False))
        per_channel = y.reshape(32, -1, 16)
        # every (sample, channel) plane is either all-zero or all-scaled
        all_zero = (per_channel == 0).all(axis=1)
        all_two = (per_channel == 2.0).all(axis=1)
        assert (all_zero | all_two).all()
        assert 0.3 < all_zero.mean() < 0.7
