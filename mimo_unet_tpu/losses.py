"""Probabilistic regression losses (Gaussian/Laplace NLL, evidential NIG).

Rebuilt from the semantics of reference mimo/losses.py:
  * GaussianNLL   (losses.py:39-121):  log(var) + diff^2 / var
  * LaplaceNLL    (losses.py:124-192): log(b) + |diff| / b
  * EvidentialLoss(losses.py:195-271): NIG sum-of-squares + regularizer

Parity-critical detail — the no-grad clamp: the reference computes
``var = exp(log_var)``, clamps it **in place under torch.no_grad()**, then
evaluates the loss on the clamped value.  Autograd therefore backpropagates
through log/div at the *clamped* forward values but treats d(var)/d(log_var)
as the *unclamped* exp.  Reproduced here with the straight-through
composition ``v + stop_gradient(clip(v) - v)``.

All losses are pure functions; the class wrappers only carry hyperparameters
and provide ``from_name`` used by checkpoints/CLIs (losses.py:29-36).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _clamp_no_grad(x: jax.Array, lo: float, hi: float) -> jax.Array:
    """Forward: clip(x, lo, hi). Backward: identity (straight-through)."""
    return x + jax.lax.stop_gradient(jnp.clip(x, lo, hi) - x)


class UncertaintyLoss:
    """Interface mirroring reference losses.py:4-36 as stateless callables."""

    num_distribution_params: int = 2

    @classmethod
    def from_name(cls, name: str) -> "UncertaintyLoss":
        if name == "gaussian_nll":
            return GaussianNLL()
        if name == "laplace_nll":
            return LaplaceNLL()
        raise ValueError(f"Unknown loss function: {name}")

    @property
    def name(self) -> str:
        raise NotImplementedError

    def __call__(self, y_hat, log_param, y, *, mask=None, reduce_mean=True):
        raise NotImplementedError

    # torch-style alias so call sites read like the reference
    def forward(self, y_hat, log_param, y, *, mask=None, reduce_mean=True):
        return self(y_hat, log_param, y, mask=mask, reduce_mean=reduce_mean)

    def std(self, mu, log_param):
        raise NotImplementedError

    def mode(self, mu, log_param):
        return mu

    def calculate_dist_param(self, std, *, log: bool = False):
        raise NotImplementedError


class GaussianNLL(UncertaintyLoss):
    """NLL of N(y_hat, var) up to constants: log(var) + diff^2/var."""

    num_distribution_params = 2

    def __init__(self, eps_min: float = 1e-5, eps_max: float = 1e3):
        self.eps_min = eps_min
        self.eps_max = eps_max

    @property
    def name(self) -> str:
        return "gaussian_nll"

    def __call__(
        self,
        y_hat: jax.Array,
        log_variance: jax.Array,
        y: jax.Array,
        *,
        mask: Optional[jax.Array] = None,
        reduce_mean: bool = True,
    ) -> jax.Array:
        diff = y_hat - y
        variance = _clamp_no_grad(jnp.exp(log_variance), self.eps_min, self.eps_max)
        loss = jnp.log(variance) + jnp.square(diff) / variance
        if mask is not None:
            loss = loss * mask
        return jnp.mean(loss) if reduce_mean else loss

    def std(self, mu, log_variance):
        return jnp.exp(log_variance) ** 0.5

    def calculate_dist_param(self, std, *, log: bool = False):
        param = _clamp_no_grad(jnp.square(std), self.eps_min, self.eps_max)
        return jnp.log(param) if log else param


class LaplaceNLL(UncertaintyLoss):
    """NLL of Laplace(y_hat, b) up to constants: log(b) + |diff|/b."""

    num_distribution_params = 2

    def __init__(self, eps_min: float = 1e-5, eps_max: float = 1e3):
        self.eps_min = eps_min
        self.eps_max = eps_max

    @property
    def name(self) -> str:
        return "laplace_nll"

    def __call__(
        self,
        y_hat: jax.Array,
        log_scale: jax.Array,
        y: jax.Array,
        *,
        mask: Optional[jax.Array] = None,
        reduce_mean: bool = True,
    ) -> jax.Array:
        diff = y_hat - y
        scale = _clamp_no_grad(jnp.exp(log_scale), self.eps_min, self.eps_max)
        loss = jnp.log(scale) + jnp.abs(diff) / scale
        if mask is not None:
            loss = loss * mask
        return jnp.mean(loss) if reduce_mean else loss

    def std(self, mu, log_scale):
        # std of Laplace(b) = b * sqrt(2)
        return jnp.exp(log_scale) * (2.0**0.5)

    def calculate_dist_param(self, std, *, log: bool = False):
        param = _clamp_no_grad(std / (2.0**0.5), self.eps_min, self.eps_max)
        return jnp.log(param) if log else param


def evidential_nig_loss(
    mu: jax.Array,
    v: jax.Array,
    alpha: jax.Array,
    beta: jax.Array,
    targets: jax.Array,
) -> jax.Array:
    """Deep evidential regression sum-of-squares loss + regularizer.

    Matches reference losses.py:203-238 (itself following the chemprop
    formulation): elementwise, no reduction.
    """
    def gamma_fn(x):
        return jnp.exp(jax.lax.lgamma(x))

    coeff = gamma_fn(alpha - 0.5) / (4.0 * gamma_fn(alpha) * v * jnp.sqrt(beta))
    second_term = 2.0 * beta * (1.0 + v) + (2.0 * alpha - 1.0) * v * jnp.square(
        targets - mu
    )
    l_sos = coeff * second_term
    l_reg = jnp.square(targets - mu) * (2.0 * alpha + v)
    return l_sos + l_reg


class EvidentialLoss:
    """Normal-Inverse-Gamma evidential loss (reference losses.py:195-271).

    ``evidential_output`` packs (gamma, v, alpha, beta) on the LAST axis —
    NHWC-native [B, H, W, 4] (the reference unbinds torch dim=1 of NCHW; same
    four parameters, channels-last here).  ``y_true`` is [B, H, W, 1].
    """

    num_distribution_params = 4

    def __init__(self, coeff: float = 1.0):
        self.coeff = coeff

    @property
    def name(self) -> str:
        return "evidential"

    def __call__(
        self,
        evidential_output: jax.Array,
        y_true: jax.Array,
        *,
        mask: Optional[jax.Array] = None,
        reduce_mean: bool = False,
    ) -> jax.Array:
        gamma, v, alpha, beta = (
            evidential_output[..., 0],
            evidential_output[..., 1],
            evidential_output[..., 2],
            evidential_output[..., 3],
        )
        loss = evidential_nig_loss(gamma, v, alpha, beta, jnp.squeeze(y_true, axis=-1))
        if mask is not None:
            loss = loss * mask
        return jnp.mean(loss) if reduce_mean else loss

    forward = __call__

    @staticmethod
    def mode(evidential_output):
        return evidential_output[..., 0]

    @staticmethod
    def aleatoric_var(evidential_output):
        alpha, beta = evidential_output[..., 2], evidential_output[..., 3]
        return beta / (alpha - 1.0)

    @staticmethod
    def epistemic_var(evidential_output):
        v, alpha, beta = (
            evidential_output[..., 1],
            evidential_output[..., 2],
            evidential_output[..., 3],
        )
        return beta / (v * (alpha - 1.0))
