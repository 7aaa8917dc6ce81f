"""Auxiliary components: DropBlock, profiling utilities, visualization."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mimo_unet_tpu.ops.regularization import drop_block_2d
from mimo_unet_tpu.train.profiling import cost_analysis, timed_per_exec
from mimo_unet_tpu.visualization import colorize, colorize_grid, make_grid, output_monitor_images


class TestDropBlock:
    def test_deterministic_identity(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 16, 16, 4)).astype(np.float32))
        y = drop_block_2d(x, 0.3, 5, None, deterministic=True)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))

    def test_drops_contiguous_blocks(self):
        x = jnp.ones((8, 32, 32, 4))
        y = np.asarray(drop_block_2d(x, 0.2, 5, jax.random.key(0), deterministic=False))
        dropped = (y == 0)
        assert 0.05 < dropped.mean() < 0.5
        # survivors are rescaled above 1
        assert y[y > 0].min() > 1.0
        # blocks are contiguous: a dropped pixel has dropped neighbors
        d = dropped[0, :, :, 0]
        if d.any():
            ys, xs = np.nonzero(d)
            i = len(ys) // 2
            yy, xx = ys[i], xs[i]
            neigh = d[max(yy - 2, 0) : yy + 3, max(xx - 2, 0) : xx + 3]
            assert neigh.sum() >= 2

    def test_zero_rate_noop(self):
        x = jnp.ones((1, 8, 8, 1))
        y = drop_block_2d(x, 0.0, 3, jax.random.key(0), deterministic=False)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


class TestProfiling:
    def test_cost_analysis_flops(self):
        def f(a, b):
            return (a @ b).sum()

        costs = cost_analysis(f, jnp.ones((64, 64)), jnp.ones((64, 64)))
        # 2*M*N*K = 524288 FLOPs for the matmul (+ reduction)
        assert costs["flops"] >= 2 * 64 * 64 * 64

    def test_timed_per_exec_positive(self):
        f = jax.jit(lambda a: (a * 2).sum())
        t = timed_per_exec(f, jnp.ones((256, 256)), reps=3)
        assert t > 0


class TestVisualization:
    def test_colorize_shapes(self, rng):
        img = colorize(rng.uniform(size=(8, 8)).astype(np.float32), 0, 1, "turbo")
        assert img.shape == (8, 8, 3) and img.dtype == np.uint8

    def test_make_grid(self, rng):
        imgs = (rng.uniform(size=(5, 8, 8, 3)) * 255).astype(np.uint8)
        grid = make_grid(imgs, nrow=3, padding=1)
        assert grid.shape == (2 * 9 + 1, 3 * 9 + 1, 3)

    def test_output_monitor_images(self, rng):
        outputs = {
            "preds": rng.uniform(size=(4, 8, 8, 1)).astype(np.float32),
            "label": rng.uniform(size=(4, 8, 8, 1)).astype(np.float32),
            "err_map": rng.standard_normal((4, 8, 8, 1)).astype(np.float32),
            "aleatoric_std_map": rng.uniform(size=(4, 8, 8, 1)).astype(np.float32),
            "epistemic_std_map": rng.uniform(size=(4, 8, 8, 1)).astype(np.float32),
            "mask": None,
        }
        for mode in ("depth", "sen12tp"):
            images = output_monitor_images(outputs, mode)
            assert set(images) == {"pred", "true", "error", "aleatoric_std", "epistemic_std"}
            for img in images.values():
                assert img.dtype == np.uint8 and img.ndim == 3
