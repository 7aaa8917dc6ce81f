"""Decoder CT upsample (5.8 ms at B=128) formulation variants, plus a
batch-size re-sweep of the full inference graph (the fusion landscape
changed since B=128 was picked in round 1)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import jax
import jax.numpy as jnp
from jax import lax

from mimo_unet_tpu.ops.resize import _interp_matrix


def timed(fn, *args, reps=20):
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
    cdt = jnp.bfloat16
    c, b, h2, w2 = 48, 128, 128, 128
    x = jax.random.normal(jax.random.key(0), (c, b * h2 * w2)).astype(cdt)
    mh = jnp.asarray(_interp_matrix(h2, 2 * h2)).astype(cdt)
    mw = jnp.asarray(_interp_matrix(w2, 2 * w2)).astype(cdt)

    def base(v):
        x4 = v.reshape(c, b, h2, w2)
        y = jnp.einsum("oh,cnhw->cnow", mh, x4)
        y = jnp.einsum("pw,cnow->cnop", mw, y)
        return y.reshape(c, -1)

    print(f"dec upsample base:         {timed(jax.jit(base), x)*1e3:.2f} ms",
          flush=True)

    def v_wfirst(v):
        x4 = v.reshape(c, b, h2, w2)
        y = jnp.einsum("pw,cnhw->cnhp", mw, x4)
        y = jnp.einsum("oh,cnhp->cnop", mh, y)
        return y.reshape(c, -1)

    print(f"dec upsample W-first:      {timed(jax.jit(v_wfirst), x)*1e3:.2f} ms",
          flush=True)

    def v_2d(v):
        # W step as ONE 2D matmul [c*b*h2, w2] x [w2, 2w2]
        y = v.reshape(-1, w2) @ mw.T
        # H step: back to [c*b, h2, 2w2], contract h2
        y = y.reshape(c * b, h2, 2 * w2)
        y = jnp.einsum("oh,nhw->now", mh, y)
        return y.reshape(c, -1)

    print(f"dec upsample 2D-W+einsum-H:{timed(jax.jit(v_2d), x)*1e3:.2f} ms",
          flush=True)

    def v_dg(v):
        y = lax.dot_general(v.reshape(-1, w2), mw,
                            (((1,), (1,)), ((), ())))  # [cbh, 2w2]
        y = y.reshape(c * b, h2, 2 * w2)
        y = lax.dot_general(mh, y, (((1,), (1,)), ((), ())))
        # [2h2? no: mh [o,h] x y [n,h,w] contract h -> [o, n, w]
        return jnp.swapaxes(y, 0, 1).reshape(c, -1)

    print(f"dec upsample dg:           {timed(jax.jit(v_dg), x)*1e3:.2f} ms",
          flush=True)

    # ---- full-graph batch re-sweep ----------------------------------------
    from mimo_unet_tpu.tasks import MimoUnetTask
    from mimo_unet_tpu.transforms import (
        compute_uncertainties, repeat_subnetworks)

    task = MimoUnetTask(
        in_channels=3, out_channels=2, num_subnetworks=2,
        filter_base_count=21, loss="laplace_nll", seed=0,
        compute_dtype="bfloat16")
    state = task.init_state(steps_per_epoch=1)
    loss_fn = task.loss_fn

    @jax.jit
    def infer(params, model_state, image):
        xx = repeat_subnetworks(image, task.num_subnetworks)
        (p1, p2), _ = task.forward(params, model_state, xx, train=False)
        mean, ale, epi = compute_uncertainties(loss_fn, p1, p2)
        return mean.mean() + ale.mean() + epi.mean()

    for bsz in (96, 128, 160, 192, 256):
        xi = jax.random.uniform(jax.random.key(0), (bsz, 256, 256, 3))
        t = timed(infer, state.params, state.model_state, xi)
        print(f"infer B={bsz}: {bsz/t:.1f} patches/s", flush=True)


if __name__ == "__main__":
    main()
