"""Decompose the train step's time: fwd(train) vs fwd+bwd vs full step."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import jax
import jax.numpy as jnp

from mimo_unet_tpu.tasks import MimoUnetTask
from mimo_unet_tpu.transforms import apply_input_transform


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
    b = 64
    task = MimoUnetTask(
        in_channels=3, out_channels=2, num_subnetworks=2,
        filter_base_count=21, loss="laplace_nll", seed=0,
        compute_dtype="bfloat16")
    state = task.init_state(steps_per_epoch=1000)
    tx = task.make_optimizer(steps_per_epoch=1000)
    loss_fn = task.loss_fn
    rngk = jax.random.key(0)
    batch = {
        "image": jax.random.uniform(jax.random.key(1), (b, 256, 256, 3)),
        "label": jax.random.uniform(jax.random.key(2), (b, 256, 256, 1)),
    }

    x, y, _ = apply_input_transform(
        jax.random.key(3), batch["image"], batch["label"], None,
        task.num_subnetworks, 0.0, 1)

    # fwd only, train mode (batch-stat BN)
    @jax.jit
    def fwd_train(params, mstate, x):
        (p1, p2), new_state = task.forward(params, mstate, x, train=True,
                                           rng=jax.random.key(0))
        return p1.mean() + p2.mean() + jax.tree.leaves(new_state)[0].mean()

    t = timed(fwd_train, state.params, state.model_state, x)
    print(f"fwd(train): {t*1e3:.1f} ms", flush=True)

    @jax.jit
    def fwd_eval(params, mstate, x):
        (p1, p2), _ = task.forward(params, mstate, x, train=False)
        return p1.mean() + p2.mean()

    t = timed(fwd_eval, state.params, state.model_state, x)
    print(f"fwd(eval): {t*1e3:.1f} ms", flush=True)

    # fwd+bwd (loss grad wrt params)
    def loss_of(params, mstate, x, y):
        (p1, p2), new_state = task.forward(params, mstate, x, train=True,
                                           rng=jax.random.key(0))
        l = loss_fn(p1, p2, y, reduce_mean=False)
        return jnp.mean(l), new_state

    grad_fn = jax.jit(jax.grad(loss_of, has_aux=True))
    t = timed(grad_fn, state.params, state.model_state, x, y)
    print(f"fwd+bwd: {t*1e3:.1f} ms", flush=True)

    # full train step
    train_step = jax.jit(
        functools.partial(task.train_step, tx, with_outputs=False),
        donate_argnums=(0,))
    carry = {"s": jax.device_put(state)}

    def step_scalar(_):
        new_state, logs, _ = train_step(carry["s"], batch, rngk)
        carry["s"] = new_state
        return logs["train_loss"]

    t = timed(step_scalar, 0)
    print(f"full step: {t*1e3:.1f} ms  ({b/t:.0f} img/s)", flush=True)


if __name__ == "__main__":
    main()
