"""Per-block timing of the shared core (eval, NHWC XLA, B=128)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import jax
import jax.numpy as jnp

from mimo_unet_tpu.models.mimo_unet import MimoUNetConfig, mimo_unet_init
from mimo_unet_tpu.models.blocks import down_apply, up_apply


def timed(fn, *args, reps=20):
    r = fn(*args)
    jax.block_until_ready(r)
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
    b, s, f = 128, 2, 21
    fs = f * s
    cfg = MimoUNetConfig(in_channels=3, out_channels=2, num_subnetworks=s,
                         filter_base_count=f, compute_dtype="bfloat16")
    params, state = mimo_unet_init(jax.random.key(0), cfg)
    cp, cs = params["core"], state["core"]
    cdt = jnp.bfloat16
    key = jax.random.key(1)

    x2 = jax.random.normal(key, (b, 128, 128, 2 * fs)).astype(cdt)

    def blk_down(name, xin):
        fn = jax.jit(lambda x: down_apply(
            cp[name], cs[name], x, train=False, compute_dtype=cdt)[0][0])
        out = fn(xin)
        print(f"{name} {tuple(xin.shape)} -> {tuple(out.shape)}: "
              f"{timed(fn, xin)*1e3:.2f} ms", flush=True)
        return out

    def blk_up(name, x1, x2s):
        fn = jax.jit(lambda a, c: up_apply(
            cp[name], cs[name], a, c, None, mode=cfg.mode, train=False,
            compute_dtype=cdt)[0])
        out = fn(x1, x2s)
        print(f"{name} {tuple(x1.shape)}+{tuple(x2s.shape)} -> "
              f"{tuple(out.shape)}: {timed(fn, x1, x2s)*1e3:.2f} ms",
              flush=True)
        return out

    x3 = blk_down("down2", x2)
    x4 = blk_down("down3", x3)
    x5 = blk_down("down4", x4)
    xu1 = blk_up("up1", x5, x4)
    xu2 = blk_up("up2", xu1, x3)
    xu3 = blk_up("up3", xu2, x2)


if __name__ == "__main__":
    main()
