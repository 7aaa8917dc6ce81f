"""MIMO batch transforms and uncertainty decomposition (pure functions).

Rebuilt from reference mimo/models/utils.py:
  * apply_input_transform (:5-49) — the MIMO input-repetition trick: each
    subnetwork sees an independently shuffled batch except for a shared
    tail of ``input_repetition_probability`` of examples.
  * repeat_subnetworks (:51-61), flatten_subnetwork_dimension (:63-74)
  * compute_uncertainties (:76-101) — mean over subnetwork modes;
    aleatoric variance = mean of per-subnetwork variances; epistemic
    variance = unbiased variance of per-subnetwork means.

Layout note: this framework is NHWC — images are ``[B, H, W, C]`` and the
MIMO axis is inserted at position 1: ``[B, S, H, W, C]``.  The functions are
layout-agnostic (they only touch axes 0/1), so they accept any
``[B, ...]`` / ``[B, S, ...]`` ranks.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def apply_input_transform(
    key: jax.Array,
    image: jax.Array,
    label: jax.Array,
    mask: Optional[jax.Array],
    num_subnetworks: int,
    input_repetition_probability: float = 0.0,
    batch_repetitions: int = 1,
) -> Tuple[jax.Array, jax.Array, Optional[jax.Array]]:
    """Build per-subnetwork shuffled batches [B*reps, S, ...] from [B, ...].

    Semantics (reference mimo/models/utils.py:27-35): a main permutation of
    the batch is tiled ``batch_repetitions`` times; the first
    ``(1 - input_repetition_probability)`` fraction is re-shuffled
    independently per subnetwork, the tail is shared across subnetworks.
    Shapes are static under jit; all randomness flows from ``key``.
    """
    b = image.shape[0]
    k_main, k_sub = jax.random.split(key)
    main_shuffle = jnp.tile(jax.random.permutation(k_main, b), batch_repetitions)
    to_shuffle = int(main_shuffle.shape[0] * (1.0 - input_repetition_probability))

    def per_subnetwork_indices(k):
        head = main_shuffle[:to_shuffle][jax.random.permutation(k, to_shuffle)]
        return jnp.concatenate([head, main_shuffle[to_shuffle:]], axis=0)

    # [S, B*reps]
    indices = jax.vmap(per_subnetwork_indices)(jax.random.split(k_sub, num_subnetworks))

    def gather(x):
        # [B, ...] -> [B*reps, S, ...]
        return jnp.moveaxis(x[indices], 0, 1)

    image_t = gather(image)
    label_t = gather(label)
    mask_t = gather(mask) if mask is not None else None
    return image_t, label_t, mask_t


def repeat_subnetworks(x: jax.Array, num_subnetworks: int) -> jax.Array:
    """[B, ...] -> [B, S, ...] by tiling (eval-time input sharing)."""
    return jnp.repeat(x[:, None], num_subnetworks, axis=1)


def flatten_subnetwork_dimension(x: jax.Array) -> jax.Array:
    """[B, S, ...] -> [B*S, ...] (collapse the subnetwork axis)."""
    return x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])


def compute_uncertainties(
    criterion,
    y_preds: jax.Array,
    log_params: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Decompose predictions into (mean, aleatoric_var, epistemic_var).

    Args:
        criterion: an UncertaintyLoss providing ``mode`` and ``std``.
        y_preds, log_params: [B, S, ...]
    Returns:
        mean, aleatoric_variance, epistemic_variance: [B, ...]

    aleatoric = E_S[std_s^2]; epistemic = unbiased Var_S[mu_s] (zero when
    S == 1), per reference mimo/models/utils.py:88-99.
    """
    s = y_preds.shape[1]
    mean = jnp.mean(criterion.mode(y_preds, log_params), axis=1)
    stds = criterion.std(y_preds, log_params)
    aleatoric_variance = jnp.mean(jnp.square(stds), axis=1)

    if s > 1:
        mu_bar = jnp.mean(y_preds, axis=1, keepdims=True)
        epistemic_variance = jnp.sum(jnp.square(y_preds - mu_bar), axis=1) / (s - 1)
    else:
        epistemic_variance = jnp.zeros_like(aleatoric_variance)

    return mean, aleatoric_variance, epistemic_variance
