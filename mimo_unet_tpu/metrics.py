"""Regression metrics (r2/mae/mse/rmse/mape) as pure jnp functions.

Mirrors reference mimo/metrics.py:7-34 (which delegates to torchmetrics
functional): same names, same formulas, computable inside a jitted step so
per-step metric logging does not force a device round-trip per metric.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

_EPS = 1.17e-06  # torchmetrics MAPE epsilon (float32 eps)


def _wmean(x: jax.Array, w: Optional[jax.Array]) -> jax.Array:
    """Mean of ``x``, optionally weighted by ``w`` (same shape).  With 0/1
    weights this equals the plain mean over the selected elements — used to
    keep padded validation rows out of batch statistics."""
    if w is None:
        return jnp.mean(x)
    return jnp.sum(x * w) / jnp.sum(w)


def mean_absolute_error(y_hat, y, weights: Optional[jax.Array] = None) -> jax.Array:
    return _wmean(jnp.abs(y_hat - y), weights)


def mean_squared_error(y_hat, y, weights: Optional[jax.Array] = None) -> jax.Array:
    return _wmean(jnp.square(y_hat - y), weights)


def root_mean_squared_error(y_hat, y, weights: Optional[jax.Array] = None) -> jax.Array:
    return jnp.sqrt(mean_squared_error(y_hat, y, weights))


def r2_score(y_hat, y, weights: Optional[jax.Array] = None) -> jax.Array:
    if weights is None:
        ss_res = jnp.sum(jnp.square(y - y_hat))
        ss_tot = jnp.sum(jnp.square(y - jnp.mean(y)))
    else:
        ss_res = jnp.sum(weights * jnp.square(y - y_hat))
        ss_tot = jnp.sum(weights * jnp.square(y - _wmean(y, weights)))
    return 1.0 - ss_res / ss_tot


def mean_absolute_percentage_error(
    y_hat, y, weights: Optional[jax.Array] = None
) -> jax.Array:
    return _wmean(jnp.abs(y_hat - y) / jnp.clip(jnp.abs(y), _EPS), weights)


_METRICS = {
    "mae": mean_absolute_error,
    "mse": mean_squared_error,
    "rmse": root_mean_squared_error,
    "r2": r2_score,
    "mape": mean_absolute_percentage_error,
}


def get_metric(metric: str):
    try:
        return _METRICS[metric]
    except KeyError:
        raise ValueError(f"Unknown metric: {metric}") from None


def compute_regression_metrics(
    y_hat: jax.Array,
    y: jax.Array,
    metrics: Optional[List[str]] = None,
    weights: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """Flattened-tensor regression metrics, default ['r2','mae','mse','rmse'].

    ``weights`` (broadcastable to ``y``) downweights elements; validation
    passes a 0/1 row-validity vector so batch-padding rows (added so the
    batch divides the device mesh) do not contaminate the statistics.
    """
    if metrics is None:
        metrics = ["r2", "mae", "mse", "rmse"]
    if weights is not None:
        weights = jnp.broadcast_to(weights, y.shape).reshape(-1)
    y_hat = jax.lax.stop_gradient(y_hat).reshape(-1)
    y = jax.lax.stop_gradient(y).reshape(-1)
    return {m: get_metric(m)(y_hat, y, weights) for m in metrics}
