"""Verify the train-path changes (Pallas CT upsample + fused
conv1x1_prelu decoder out-conv) by driving the public API on the real
TPU: loss decreases over optimizer steps on the CT path, and one-step
gradients match the XLA path (cosine at the bf16 noise floor)."""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import jax
import jax.numpy as jnp
import numpy as np

from mimo_unet_tpu.tasks import MimoUnetTask


def main():
    print("backend:", jax.default_backend(), jax.devices())
    b = 16
    batch = {
        "image": jax.random.uniform(jax.random.key(1), (b, 256, 256, 3)),
        "label": jax.random.uniform(jax.random.key(2), (b, 256, 256, 1)),
    }
    image_t = jnp.stack([batch["image"]] * 2, axis=1)
    label_t = jnp.stack([batch["label"]] * 2, axis=1)

    grads = {}
    for mode in ("force", "off"):
        task = MimoUnetTask(
            in_channels=3, out_channels=2, num_subnetworks=2,
            filter_base_count=21, loss="laplace_nll", seed=0,
            compute_dtype="bfloat16", ct_kernels=mode)
        tx = task.make_optimizer(steps_per_epoch=100)
        train_step = jax.jit(
            functools.partial(task.train_step, tx, with_outputs=False))
        state = jax.device_put(task.init_state(steps_per_epoch=100))

        ls = []
        st = state
        for i in range(8):
            st, logs, _ = train_step(st, batch, jax.random.key(i))
            ls.append(float(logs["train_loss"]))
        print(f"{mode}: losses {['%.4f' % x for x in ls]}")
        assert ls[-1] < ls[0], f"{mode}: loss did not decrease"
        assert all(np.isfinite(x) for x in ls), f"{mode}: non-finite loss"

        def objective(params):
            (p1, p2), _ = task.forward(
                params, state.model_state, image_t, train=True,
                rng=jax.random.key(7))
            return jnp.mean(task.loss_fn(p1, p2, label_t))

        g = jax.jit(jax.grad(objective))(state.params)
        grads[mode] = jax.tree_util.tree_leaves(g)

    va = np.concatenate([np.asarray(x, np.float64).ravel()
                         for x in grads["force"]])
    vb = np.concatenate([np.asarray(x, np.float64).ravel()
                         for x in grads["off"]])
    cos = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
    print(f"one-step grad cosine CT vs XLA: {cos:.5f}")
    assert cos > 0.99, "gradients diverge beyond bf16 noise"
    print("OK")


if __name__ == "__main__":
    main()
