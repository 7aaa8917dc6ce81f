"""Dropout variants with torch semantics (inverted dropout, scale 1/(1-p)).

The reference uses ``nn.Dropout2d`` at the end of every DoubleConv
(reference: mimo/models/mimo_components/components.py:29 — zeroes whole
channels) and plain ``nn.Dropout`` for the center/final sites
(model.py:210, :281).  MC-dropout eval (ensemble.py:54-66) re-enables these
at inference; here that is just calling with ``deterministic=False``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dropout(
    x: jax.Array,
    rate: float,
    key: jax.Array | None,
    *,
    deterministic: bool,
) -> jax.Array:
    """Elementwise inverted dropout."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


def dropout2d(
    x: jax.Array,
    rate: float,
    key: jax.Array | None,
    *,
    deterministic: bool,
) -> jax.Array:
    """Channel dropout on NHWC: zero entire (H, W) feature maps per sample."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask_shape = x.shape[:-3] + (1, 1, x.shape[-1])
    mask = jax.random.bernoulli(key, keep, mask_shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))
