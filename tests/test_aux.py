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
        images = output_monitor_images(outputs, "depth")
        assert set(images) == {"pred", "true", "error", "aleatoric_std", "epistemic_std"}
        for img in images.values():
            assert img.dtype == np.uint8 and img.ndim == 3
        # sen12tp single-target without names: same set, reference-style names
        images = output_monitor_images(outputs, "sen12tp")
        assert set(images) == {
            "predicted", "true", "error", "aleatoric_std", "epistemic_std"
        }

    def test_output_monitor_images_per_target(self, rng):
        """Multi-target SEN12TP runs log one image set per vegetation index
        (reference mimo/tasks/sen12tp/callbacks.py:32-48)."""
        outputs = {
            "preds": rng.uniform(size=(4, 8, 8, 2)).astype(np.float32),
            "label": rng.uniform(size=(4, 8, 8, 2)).astype(np.float32),
            "err_map": rng.standard_normal((4, 8, 8, 2)).astype(np.float32),
            "aleatoric_std_map": rng.uniform(size=(4, 8, 8, 2)).astype(np.float32),
            "epistemic_std_map": rng.uniform(size=(4, 8, 8, 2)).astype(np.float32),
            "mask": None,
        }
        images = output_monitor_images(
            outputs, "sen12tp", target_names=["NDVI", "EVI"]
        )
        expected = {
            f"{t}_{kind}"
            for t in ("NDVI", "EVI")
            for kind in ("predicted", "true", "error", "aleatoric_std",
                         "epistemic_std")
        }
        assert set(images) == expected
        for img in images.values():
            assert img.dtype == np.uint8 and img.ndim == 3
        # the per-target slices differ (channel 0 is not silently reused)
        assert not np.array_equal(images["NDVI_predicted"], images["EVI_predicted"])
        # unnamed multi-target falls back to target{i}
        fallback = output_monitor_images(outputs, "sen12tp")
        assert "target0_predicted" in fallback and "target1_true" in fallback
        with pytest.raises(ValueError, match="target_names"):
            output_monitor_images(outputs, "sen12tp", target_names=["NDVI"])


class TestLoggers:
    def test_tensorboard_logger_writes_events(self, tmp_path):
        """--use_tensorboard parity: the reference OutputMonitor logs to
        wandb *or* TensorBoard (mimo/tasks/depth/callbacks.py:42-48)."""
        import os

        pytest.importorskip("tensorboardX")
        from mimo_unet_tpu.train.logging import TensorBoardLogger, make_logger

        lg = TensorBoardLogger(str(tmp_path))
        lg.log_scalars(1, {"val_loss": 0.5, "metric_val/r2": 0.9})
        lg.log_image(1, "train/pred", np.zeros((4, 4, 3), np.uint8))
        lg.finish()
        tb_dir = os.path.join(tmp_path, "tensorboard")
        events = [f for f in os.listdir(tb_dir) if "tfevents" in f]
        assert events, os.listdir(tb_dir)
        assert os.path.getsize(os.path.join(tb_dir, events[0])) > 0

        multi = make_logger(str(tmp_path), use_tensorboard=True)
        kinds = {type(l).__name__ for l in multi.loggers}
        assert "TensorBoardLogger" in kinds and "TSVLogger" in kinds
        multi.finish()
