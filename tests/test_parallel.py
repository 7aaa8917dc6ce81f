"""Mesh/sharding and multi-host helper tests (8-device CPU mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mimo_unet_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    pad_batch_to_divisible,
    replicated_sharding,
    shard_batch,
)
from mimo_unet_tpu.parallel.multihost import host_local_batch_slice


class TestMesh:
    def test_make_mesh_sizes(self):
        assert make_mesh().size == jax.device_count()
        assert make_mesh(4).size == 4

    def test_shard_batch_places_on_mesh(self, rng):
        mesh = make_mesh(8)
        batch = {
            "image": rng.standard_normal((16, 4, 4, 3)).astype(np.float32),
            "mask": None,
        }
        out = shard_batch(batch, mesh)
        assert "mask" not in out
        assert out["image"].sharding.is_equivalent_to(
            batch_sharding(mesh), ndim=4
        )
        # each device holds 16/8 = 2 rows
        assert out["image"].addressable_shards[0].data.shape[0] == 2

    def test_pad_batch_to_divisible(self, rng):
        batch = {"x": rng.standard_normal((5, 3)).astype(np.float32)}
        padded, real = pad_batch_to_divisible(batch, 4)
        assert real == 5
        assert padded["x"].shape == (8, 3)
        np.testing.assert_array_equal(padded["x"][5:], np.tile(batch["x"][-1:], (3, 1)))
        same, real = pad_batch_to_divisible({"x": np.zeros((8, 2))}, 4)
        assert real == 8 and same["x"].shape == (8, 2)

    def test_global_batch_math_matches_single_device(self, rng):
        """A jitted global-batch reduction gives identical results sharded
        over 8 devices and on one device (the BatchNorm-stat guarantee)."""
        mesh = make_mesh(8)
        x = rng.standard_normal((16, 8, 8, 4)).astype(np.float32)

        def stats(a):
            return jnp.mean(a, axis=(0, 1, 2)), jnp.var(a, axis=(0, 1, 2))

        sharded = jax.jit(stats, in_shardings=batch_sharding(mesh),
                          out_shardings=replicated_sharding(mesh))(
            jax.device_put(x, batch_sharding(mesh))
        )
        local = jax.jit(stats)(jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(sharded[0]), np.asarray(local[0]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(sharded[1]), np.asarray(local[1]), atol=1e-6)


class TestSpatialPartitioning:
    def test_forward_matches_unsharded(self, rng):
        """2-D mesh (data x spatial): H-sharded forward == unsharded (XLA
        SPMD inserts the conv/pool halo exchanges)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from mimo_unet_tpu.parallel.mesh import image_sharding, make_mesh_2d
        from mimo_unet_tpu.tasks import MimoUnetTask

        task = MimoUnetTask(
            in_channels=3, out_channels=2, num_subnetworks=2,
            filter_base_count=4, loss="laplace_nll", seed=0,
        )
        state = task.init_state(1)
        mesh = make_mesh_2d(2, 4)
        repl = NamedSharding(mesh, P())
        xspec = image_sharding(mesh)

        x = jnp.asarray(rng.uniform(size=(4, 2, 64, 64, 3)).astype(np.float32))
        fwd = jax.jit(
            lambda p, s, xx: task.forward(p, s, xx, train=False)[0],
            in_shardings=(repl, repl, xspec),
        )
        p1, p2 = fwd(
            jax.device_put(state.params, repl),
            jax.device_put(state.model_state, repl),
            jax.device_put(x, xspec),
        )
        (p1u, p2u), _ = task.forward(state.params, state.model_state, x, train=False)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p1u), atol=1e-6)
        np.testing.assert_allclose(np.asarray(p2), np.asarray(p2u), atol=1e-6)

    def test_mesh_validation(self):
        from mimo_unet_tpu.parallel.mesh import make_mesh_2d

        with pytest.raises(ValueError, match="devices"):
            make_mesh_2d(4, 4)  # 16 > 8 available


class TestMultihost:
    def test_host_local_batch_slice_single_process(self):
        start, stop = host_local_batch_slice(32)
        assert (start, stop) == (0, 32)  # single process owns everything
