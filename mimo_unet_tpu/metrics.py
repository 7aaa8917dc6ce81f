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


def mean_absolute_error(y_hat: jax.Array, y: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(y_hat - y))


def mean_squared_error(y_hat: jax.Array, y: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(y_hat - y))


def root_mean_squared_error(y_hat: jax.Array, y: jax.Array) -> jax.Array:
    return jnp.sqrt(mean_squared_error(y_hat, y))


def r2_score(y_hat: jax.Array, y: jax.Array) -> jax.Array:
    ss_res = jnp.sum(jnp.square(y - y_hat))
    ss_tot = jnp.sum(jnp.square(y - jnp.mean(y)))
    return 1.0 - ss_res / ss_tot


def mean_absolute_percentage_error(y_hat: jax.Array, y: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(y_hat - y) / jnp.clip(jnp.abs(y), _EPS))


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
) -> Dict[str, jax.Array]:
    """Flattened-tensor regression metrics, default ['r2','mae','mse','rmse']."""
    if metrics is None:
        metrics = ["r2", "mae", "mse", "rmse"]
    y_hat = jax.lax.stop_gradient(y_hat).reshape(-1)
    y = jax.lax.stop_gradient(y).reshape(-1)
    return {m: get_metric(m)(y_hat, y) for m in metrics}
