"""DropBlock spatial regularization (NHWC).

Parity component for reference mimo/regularization.py:9-71 (vendored
DropBlock2D; dead code there — imported nowhere — but part of the public
surface, SURVEY.md §2 C20).  Drops contiguous ``block_size`` x ``block_size``
spatial regions instead of single pixels, rescaling the survivors.

gamma = (drop_prob / block_size^2) * (feat^2 / (feat - block + 1)^2); block
centers are sampled in the valid interior and dilated to full blocks with a
max-pool, exactly the torchvision-style formulation the reference vendors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def drop_block_2d(
    x: jax.Array,
    rate: float,
    block_size: int,
    key: jax.Array | None,
    *,
    deterministic: bool,
) -> jax.Array:
    """Apply DropBlock to NHWC ``x``."""
    if deterministic or rate == 0.0:
        return x
    b, h, w, c = x.shape
    gamma = (
        (rate / (block_size**2))
        * (h * w)
        / ((h - block_size + 1) * (w - block_size + 1))
    )
    valid_h = h - block_size + 1
    valid_w = w - block_size + 1
    centers = jax.random.bernoulli(key, gamma, (b, valid_h, valid_w, c)).astype(
        x.dtype
    )
    pad_lo = block_size // 2
    pad_hi = block_size - 1 - pad_lo
    centers = jnp.pad(
        centers, ((0, 0), (pad_lo, pad_hi), (pad_lo, pad_hi), (0, 0))
    )
    # dilate centers to blocks: max-pool with a block_size window, stride 1
    block_mask = lax.reduce_window(
        centers,
        0.0,
        lax.max,
        window_dimensions=(1, block_size, block_size, 1),
        window_strides=(1, 1, 1, 1),
        padding="SAME",
    )
    keep = 1.0 - block_mask
    denom = jnp.maximum(jnp.mean(keep), 1e-7)
    return x * keep / denom
