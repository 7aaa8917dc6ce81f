"""CT Pallas fast path under a multi-device data-parallel mesh.

The production kernels (ops/pallas/ct_conv.py, ct_train.py) run inside
``jax.shard_map`` over the data axis when a mesh is active
(models/fast_path.py, parallel/mesh.py ct_mesh_scope).  These tests force
the CT path (ct_kernels="force", interpret mode on the CPU devices) under
the 8-device mesh and assert numerical equality with the single-device
result — in particular the global-batch BatchNorm statistics (psum'd
sums), which must match the reference's single-device semantics
(reference mimo/models/mimo_components/components.py:24,27).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimo_unet_tpu.models import MimoUNetConfig, mimo_unet_apply, mimo_unet_init
from mimo_unet_tpu.parallel.mesh import (
    batch_sharding,
    ct_mesh_scope,
    make_mesh,
    replicated_sharding,
)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the 8-device CPU mesh"
)

H, W, B, S, CIN = 32, 256, 8, 2, 3


def _cfg(**kw):
    base = dict(
        in_channels=CIN,
        out_channels=2,
        num_subnetworks=S,
        filter_base_count=6,
        compute_dtype="bfloat16",
        ct_kernels="force",
    )
    base.update(kw)
    return MimoUNetConfig(**base)


def _inputs(key=0):
    k = jax.random.key(key)
    return jax.random.uniform(k, (B, S, H, W, CIN), jnp.float32)


def _params(cfg, key=1):
    return mimo_unet_init(jax.random.key(key), cfg)


def test_ct_eval_mesh_matches_single_device():
    cfg = _cfg()
    params, state = _params(cfg)
    x = _inputs()
    assert jnp.isdtype(x.dtype, jnp.float32)

    # single device (no mesh scope): plain CT path
    ref, _ = jax.jit(
        lambda p, st, xx: mimo_unet_apply(p, st, xx, cfg, train=False)
    )(params, state, x)

    mesh = make_mesh(8)
    repl, data = replicated_sharding(mesh), batch_sharding(mesh)
    with ct_mesh_scope(mesh):
        out, _ = jax.jit(
            lambda p, st, xx: mimo_unet_apply(p, st, xx, cfg, train=False),
            in_shardings=(repl, repl, data),
        )(
            jax.device_put(params, repl),
            jax.device_put(state, repl),
            jax.device_put(x, data),
        )
    # the GSPMD-partitioned core accumulates in a different order than the
    # single-device program, so bf16 activations can differ by 1 ulp before
    # the decoder; the bound is a couple of bf16 ulps at logit scale
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=0, atol=8e-3
    )


def test_ct_train_mesh_matches_single_device():
    """Loss, gradients, and the updated BatchNorm running stats of the
    sharded CT train path must match the single-device CT result (the
    psum'd statistics reproduce global-batch BN)."""
    cfg = _cfg()
    params, state = _params(cfg)
    x = _inputs()
    label = jax.random.uniform(jax.random.key(3), (B, S, H, W, 1))

    def loss_fn(p, st, xx):
        out, new_state = mimo_unet_apply(p, st, xx, cfg, train=True,
                                         rng=jax.random.key(7))
        mu, logb = out[..., :1], out[..., 1:]
        loss = jnp.mean(logb + jnp.abs(label - mu) / jnp.exp(logb))
        return loss, new_state

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    (ref_loss, ref_state), ref_grads = jax.jit(grad_fn)(params, state, x)

    mesh = make_mesh(8)
    repl, data = replicated_sharding(mesh), batch_sharding(mesh)
    with ct_mesh_scope(mesh):
        (loss, new_state), grads = jax.jit(
            grad_fn, in_shardings=(repl, repl, data)
        )(
            jax.device_put(params, repl),
            jax.device_put(state, repl),
            jax.device_put(x, data),
        )

    np.testing.assert_allclose(float(loss), float(ref_loss),
                               rtol=5e-5, atol=1e-6)

    # BatchNorm running stats: global-batch parity is the whole point
    flat_ref = jax.tree_util.tree_leaves_with_path(ref_state)
    flat_new = jax.tree_util.tree_leaves_with_path(new_state)
    assert len(flat_ref) == len(flat_new)
    for (path_r, leaf_r), (path_n, leaf_n) in zip(flat_ref, flat_new):
        assert path_r == path_n
        # the XLA core's stats differ by GSPMD f32 accumulation order
        # (~5e-6 abs); the CT kernels' psum'd stats are equally tight
        np.testing.assert_allclose(
            np.asarray(leaf_n), np.asarray(leaf_r), rtol=1e-3, atol=5e-5,
            err_msg=f"model state mismatch at {jax.tree_util.keystr(path_r)}",
        )

    # Gradients: elementwise equality between two differently-partitioned
    # bf16 programs is noise-bounded (1-ulp activation differences flip
    # ReLU masks and reorder cancellation-heavy sums — PERFORMANCE.md
    # finding 7), so use the established bound instead: the sharded CT
    # gradients must be as close to the f32 truth as the single-device CT
    # gradients are (same methodology as tests/test_ct_train.py).
    cfg32 = _cfg(compute_dtype=None, ct_kernels="off")

    def loss32(p, st, xx):
        out, _ = mimo_unet_apply(p, st, xx, cfg32, train=True,
                                 rng=jax.random.key(7))
        mu, logb = out[..., :1], out[..., 1:]
        return jnp.mean(logb + jnp.abs(label - mu) / jnp.exp(logb))

    g32 = jax.jit(jax.grad(loss32))(params, state, x)

    def cosines(ga, gb):
        out = []
        for a, b in zip(jax.tree_util.tree_leaves(ga),
                        jax.tree_util.tree_leaves(gb)):
            a = np.asarray(a, np.float64).ravel()
            b = np.asarray(b, np.float64).ravel()
            na, nb = np.linalg.norm(a), np.linalg.norm(b)
            if na < 1e-12 or nb < 1e-12:
                continue
            out.append(float(a @ b / (na * nb)))
        return np.array(out)

    cos_single = cosines(g32, ref_grads)
    cos_sharded = cosines(g32, grads)
    assert cos_sharded.min() > cos_single.min() - 0.15
    assert cos_sharded.mean() > cos_single.mean() - 0.05


def test_ct_gate_rejects_indivisible_batch():
    """A batch that doesn't divide the data axis must fall back (gate off),
    not crash inside shard_map."""
    from mimo_unet_tpu.models.fast_path import (
        ct_fast_path_supported,
        ct_train_path_supported,
    )

    cfg = _cfg()
    mesh = make_mesh(8)
    shape = (6, S, H, W, CIN)  # 6 % 8 != 0
    with ct_mesh_scope(mesh):
        assert not ct_fast_path_supported(cfg, shape, train=False,
                                          mc_dropout=False)
        assert not ct_train_path_supported(cfg, shape, train=True,
                                           mc_dropout=False)
    # without the mesh the same shape is eligible
    assert ct_fast_path_supported(cfg, shape, train=False, mc_dropout=False)


def test_ct_gate_rejects_spatial_mesh():
    from mimo_unet_tpu.models.fast_path import ct_fast_path_supported
    from mimo_unet_tpu.parallel.mesh import make_mesh_2d

    cfg = _cfg()
    mesh2 = make_mesh_2d(2, 4)
    with ct_mesh_scope(mesh2):
        assert not ct_fast_path_supported(
            cfg, (B, S, H, W, CIN), train=False, mc_dropout=False
        )
