"""Mesh/sharding and multi-host helper tests (8-device CPU mesh)."""

import os

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

    def test_divisibility_error_message(self, monkeypatch):
        monkeypatch.setattr(jax, "process_count", lambda: 4)
        with pytest.raises(ValueError, match="divisible by the process count"):
            host_local_batch_slice(6)

    def test_two_process_distributed_smoke(self, tmp_path):
        """Process-spanning mesh init: 2 subprocesses x 2 virtual CPU devices
        each join one jax.distributed cluster, build the canonical 4-device
        mesh, feed per-host batch shards, and reduce across processes (the
        real DCN data-parallel code path, on Gloo CPU collectives)."""
        import socket
        import subprocess
        import sys
        import textwrap

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        worker = os.path.join(tmp_path, "worker.py")
        with open(worker, "w") as f:
            f.write(textwrap.dedent('''
                import os, sys
                proc_id, coord, repo = int(sys.argv[1]), sys.argv[2], sys.argv[3]
                os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
                os.environ["JAX_PLATFORMS"] = "cpu"
                sys.path.insert(0, repo)
                import jax
                from mimo_unet_tpu.parallel.multihost import (
                    host_local_batch_slice, initialize_multihost,
                )
                initialize_multihost(
                    coordinator_address=coord, num_processes=2, process_id=proc_id
                )
                import numpy as np
                import jax.numpy as jnp
                from mimo_unet_tpu.parallel.mesh import batch_sharding, make_mesh

                assert jax.process_count() == 2, jax.process_count()
                mesh = make_mesh()
                assert mesh.size == 4, mesh.size
                start, stop = host_local_batch_slice(8)
                assert (start, stop) == (proc_id * 4, proc_id * 4 + 4)

                sharding = batch_sharding(mesh)
                local = np.arange(start * 2, stop * 2, dtype=np.float32).reshape(4, 2)
                garr = jax.make_array_from_process_local_data(sharding, local, (8, 2))
                from jax.sharding import NamedSharding, PartitionSpec as P
                total = jax.jit(
                    lambda x: jnp.sum(x), out_shardings=NamedSharding(mesh, P())
                )(garr)
                assert float(total) == float(np.arange(16).sum()), float(total)
                print(f"proc{proc_id} ok")
            '''))

        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]

        env = {k: v for k, v in os.environ.items()
               if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS",
                            "JAX_COMPILATION_CACHE_DIR")}
        procs = [
            subprocess.Popen(
                [sys.executable, worker, str(i), f"localhost:{port}", repo],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True,
            )
            for i in range(2)
        ]
        outs = [p.communicate(timeout=180)[0] for p in procs]
        for p, out in zip(procs, outs):
            assert p.returncode == 0, out[-2000:]
        assert "proc0 ok" in outs[0] and "proc1 ok" in outs[1]


class TestImageShardingRanks:
    def test_rank5_shards_h_axis2(self):
        from mimo_unet_tpu.parallel.mesh import image_sharding, make_mesh_2d

        mesh = make_mesh_2d(2, 4)
        spec = image_sharding(mesh, rank=5).spec
        assert spec == jax.sharding.PartitionSpec("data", None, "spatial")

    def test_rank4_shards_h_axis1(self, rng):
        """[B,H,W,C] must shard H (axis 1), not W — the round-1 footgun."""
        from mimo_unet_tpu.parallel.mesh import image_sharding, make_mesh_2d

        mesh = make_mesh_2d(2, 4)
        spec4 = image_sharding(mesh, rank=4).spec
        assert spec4 == jax.sharding.PartitionSpec("data", "spatial")
        x = jnp.asarray(rng.uniform(size=(2, 8, 8, 3)).astype(np.float32))
        arr = jax.device_put(x, image_sharding(mesh, rank=4))
        shard_shape = arr.addressable_shards[0].data.shape
        assert shard_shape == (1, 2, 8, 3)  # H split by 4, W intact
        with pytest.raises(ValueError, match="rank"):
            image_sharding(mesh, rank=3)
