"""Section-wise fwd+bwd timing of the CT train path (B=64)."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import jax
import jax.numpy as jnp

from mimo_unet_tpu.models.mimo_unet import (
    MimoUNetConfig, mimo_unet_init, core_apply)
from mimo_unet_tpu.models import fast_path as fp
from mimo_unet_tpu.ops.pallas.ct_conv import align8, pack_w3x3
from mimo_unet_tpu.ops.pallas.ct_train import conv3x3_ct_train


def timed(fn, *args, reps=10):
    r = fn(*args)
    leaf = jax.tree.leaves(r)[0]
    float(jnp.sum(leaf.reshape(-1)[:2].astype(jnp.float32)))

    def run_k(k):
        t0 = time.perf_counter()
        r = None
        for _ in range(k):
            r = fn(*args)
        leaf = jax.tree.leaves(r)[0]
        float(jnp.sum(leaf.reshape(-1)[:2].astype(jnp.float32)))
        return time.perf_counter() - t0

    run_k(2)
    t1 = min(run_k(1) for _ in range(3))
    tk = min(run_k(reps + 1) for _ in range(2))
    return (tk - t1) / reps


def main():
    b, s, h, w, cin, f = 64, 2, 256, 256, 3, 21
    cfg = MimoUNetConfig(in_channels=cin, out_channels=2, num_subnetworks=s,
                         filter_base_count=f, compute_dtype="bfloat16")
    params, state = mimo_unet_init(jax.random.key(0), cfg)
    x = jax.random.uniform(jax.random.key(1), (b, s, h, w, cin))

    from mimo_unet_tpu.models.fast_path import (
        mimo_unet_apply_ct_train, _max_pool_ct, _upsample_ct_x2)

    # core only (same input shape as the real core sees)
    x2c = jax.random.uniform(jax.random.key(2), (b, h // 2, w // 2, 2 * f * s)
                             ).astype(jnp.bfloat16)

    def loss_core(p):
        y, _ = core_apply(p["core"], state["core"], x2c, cfg, train=True,
                          rng=jax.random.key(0))
        return jnp.mean(y.astype(jnp.float32) ** 2)

    gc = jax.jit(jax.grad(loss_core))
    print(f"core fwd+bwd: {timed(gc, params)*1e3:.1f} ms", flush=True)

    # pool fwd+bwd
    z = jax.random.normal(jax.random.key(4), (24, s * b, h, w),
                          jnp.float32).astype(jnp.bfloat16)

    def loss_pool(z):
        return jnp.sum(_max_pool_ct(z).astype(jnp.float32) ** 2)

    gp = jax.jit(jax.grad(loss_pool))
    print(f"pool fwd+bwd: {timed(gp, z)*1e3:.1f} ms", flush=True)

    # upsample fwd+bwd
    xu = jax.random.normal(jax.random.key(5), (48, b * (h // 2) * (w // 2)),
                           jnp.float32).astype(jnp.bfloat16)

    def loss_up(xu):
        return jnp.sum(
            _upsample_ct_x2(xu, b, h // 2, w // 2).astype(jnp.float32) ** 2)

    gu = jax.jit(jax.grad(loss_up))
    print(f"upsample fwd+bwd: {timed(gu, xu)*1e3:.1f} ms", flush=True)

    # full path fwd+bwd
    def loss_full(p):
        out, _ = mimo_unet_apply_ct_train(p, state, x, cfg,
                                          rng=jax.random.key(3),
                                          interpret=False)
        return jnp.mean(out ** 2)

    g = jax.jit(jax.grad(loss_full))
    print(f"full fwd+bwd: {timed(g, params)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
