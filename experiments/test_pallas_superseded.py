"""Pallas kernels vs reference ops (interpret mode — runs on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import mimo_unet_tpu.ops.conv as C
from pallas_conv_fused import fused_conv3x3_cmajor
from pallas_pad import reflect_pad_hw1, reflect_pad_w1


class TestReflectPadKernel:
    def test_matches_jnp_pad(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 12, 16, 5)).astype(np.float32))
        want = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        got = reflect_pad_hw1(x, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_w_only(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 8, 10, 3)).astype(np.float32))
        want = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="reflect")
        got = reflect_pad_w1(x, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


class TestFusedConv3x3:
    @pytest.mark.parametrize("ci,co,h,w,th", [(7, 5, 16, 32, 8), (63, 31, 16, 128, 16)])
    def test_matches_conv_bn_relu(self, rng, ci, co, h, w, th):
        b = 2
        x = rng.standard_normal((b, h, w, ci)).astype(np.float32)
        p = C.conv2d_init(jax.random.key(1), ci, co, 3)
        scale = rng.uniform(0.5, 1.5, co).astype(np.float32)
        shift = rng.uniform(-0.5, 0.5, co).astype(np.float32)

        want = C.conv2d(jnp.asarray(x), p, padding="REFLECT")
        want = np.maximum(np.asarray(want) * scale + shift, 0)

        x_pad = np.pad(
            np.moveaxis(x, -1, 1), ((0, 0), (0, 0), (1, 1), (1, 1)), mode="reflect"
        )
        shift_k = shift + np.asarray(p["b"]) * scale  # fold conv bias
        got = fused_conv3x3_cmajor(
            jnp.asarray(x_pad), p["w"], jnp.asarray(scale), jnp.asarray(shift_k),
            relu=True, tile_h=th, interpret=True,
        )
        got = np.moveaxis(np.asarray(got), 1, -1)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_no_relu(self, rng):
        ci, co = 4, 3
        x = rng.standard_normal((1, 8, 16, ci)).astype(np.float32)
        p = C.conv2d_init(jax.random.key(0), ci, co, 3)
        want = np.asarray(C.conv2d(jnp.asarray(x), p, padding="REFLECT"))
        x_pad = np.pad(
            np.moveaxis(x, -1, 1), ((0, 0), (0, 0), (1, 1), (1, 1)), mode="reflect"
        )
        got = fused_conv3x3_cmajor(
            jnp.asarray(x_pad), p["w"], jnp.ones(co), jnp.asarray(p["b"]),
            relu=False, tile_h=8, interpret=True,
        )
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(got), 1, -1), want, atol=1e-5
        )
