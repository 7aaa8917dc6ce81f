"""Bitwise check on the real chip: eval CT forward with the Pallas W-pool
vs the einsum selection form (the kernels are bitwise-equal in interpret
mode; this confirms Mosaic compiles them to the same values)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import jax
import jax.numpy as jnp
import numpy as np

from mimo_unet_tpu.models import mimo_unet_apply
from mimo_unet_tpu.tasks import MimoUnetTask
import mimo_unet_tpu.ops.pallas.ct_elem as ct_elem


def main():
    task = MimoUnetTask(
        in_channels=3, out_channels=2, num_subnetworks=2,
        filter_base_count=21, loss="laplace_nll", seed=0,
        compute_dtype="bfloat16", ct_kernels="auto",
    )
    state = task.init_state(steps_per_epoch=1)
    cfg = task.model_config
    x5 = jax.random.uniform(jax.random.key(3), (4, 2, 256, 256, 3))

    out_pallas, _ = jax.jit(lambda p, s, v: mimo_unet_apply(
        p, s, v, cfg, train=False))(state.params, state.model_state, x5)
    out_pallas = np.asarray(out_pallas, np.float32)

    # disable the Pallas W-pool (einsum fallback) and retrace
    orig = ct_elem.wpool_ct_supported
    ct_elem.wpool_ct_supported = lambda *a: False
    try:
        out_einsum, _ = jax.jit(lambda p, s, v: mimo_unet_apply(
            p, s, v, cfg, train=False))(state.params, state.model_state, x5)
        out_einsum = np.asarray(out_einsum, np.float32)
    finally:
        ct_elem.wpool_ct_supported = orig

    diff = np.max(np.abs(out_pallas - out_einsum))
    print(f"wpool-vs-einsum max abs diff: {diff}", flush=True)
    assert diff == 0.0, diff
    print("bitwise OK", flush=True)


if __name__ == "__main__":
    main()
