"""Pool v2: H-pool via sublane-strided slices / reduce_window, W-pool via
the bf16-pair bitcast trick (elementwise, no gather)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import jax
import jax.numpy as jnp
from jax import lax

C, N, H, W = 24, 256, 256, 256


def timed(fn, *args, reps=20):
    r = fn(*args)
    jax.block_until_ready(r)

    def run_k(k):
        t0 = time.perf_counter()
        r = None
        for _ in range(k):
            r = fn(*args)
        float(jnp.sum(r[:1, :2].astype(jnp.float32)))
        return time.perf_counter() - t0

    run_k(2)
    t1 = min(run_k(1) for _ in range(3))
    tk = min(run_k(reps + 1) for _ in range(2))
    return (tk - t1) / reps


def wpool_bitcast(u):
    """[..., W] bf16 -> [..., W/2] max of adjacent pairs, elementwise."""
    shape = u.shape
    pairs = u.reshape(shape[:-1] + (shape[-1] // 2, 2))
    v32 = lax.bitcast_convert_type(pairs, jnp.int32)  # [..., W/2]
    even = lax.bitcast_convert_type(v32 << 16, jnp.float32)
    odd = lax.bitcast_convert_type(
        v32 & jnp.int32(-65536), jnp.float32)
    return jnp.maximum(even, odd).astype(jnp.bfloat16)


def main():
    x = jax.random.normal(jax.random.key(0), (C, N * H * W),
                          jnp.float32).astype(jnp.bfloat16)

    @jax.jit
    def ref_pool(a):
        a4 = a.reshape(C, N, H, W)
        y = lax.reduce_window(a4, -jnp.inf, lax.max,
                              (1, 1, 2, 2), (1, 1, 2, 2), "VALID")
        return y.reshape(C, -1)

    @jax.jit
    def v_hslice_wbitcast(a):
        a4 = a.reshape(C, N, H, W)
        hm = jnp.maximum(a4[:, :, 0::2], a4[:, :, 1::2])
        return wpool_bitcast(hm).reshape(C, -1)

    @jax.jit
    def v_hrw_wbitcast(a):
        a4 = a.reshape(C, N, H, W)
        hm = lax.reduce_window(a4, -jnp.inf, lax.max,
                               (1, 1, 2, 1), (1, 1, 2, 1), "VALID")
        return wpool_bitcast(hm).reshape(C, -1)

    @jax.jit
    def v_wbitcast_then_h(a):
        a4 = a.reshape(C, N, H, W)
        wm = wpool_bitcast(a4)  # [C, N, H, W/2]
        return jnp.maximum(wm[:, :, 0::2], wm[:, :, 1::2]).reshape(C, -1)

    ref = ref_pool(x)
    for name, fn in [("reduce_window(ref)", ref_pool),
                     ("hslice+wbitcast", v_hslice_wbitcast),
                     ("hreducewin+wbitcast", v_hrw_wbitcast),
                     ("wbitcast_then_hslice", v_wbitcast_then_h)]:
        try:
            out = fn(x)
            ok = bool(jnp.all(out == ref))
            t = timed(fn, x)
            print(f"{name}: {t*1e3:.2f} ms  match={ok}", flush=True)
        except Exception as e:
            print(f"{name}: ERROR {str(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
