"""Subnetwork loss re-weighting buffer as pure, jit-carried state.

The reference LossBuffer (mimo/models/mimo_components/loss_buffer.py:18-74)
is a host-side mutable ring buffer of the last ``buffer_size`` per-subnetwork
loss vectors; weights = softmax(mean_loss / temperature) * S, so lagging
subnetworks get up-weighted.  Here the buffer is an explicit ``[max(size,1),
S]`` array + ring index carried through the jitted train step — no
host<->device traffic (unlike the reference, which keeps the buffer on CPU
and ships weights to device every step, mimo_unet.py:243).

``buffer_size == 0`` disables re-weighting: the buffer is never written, the
zero-mean softmax is uniform, and weights are exactly 1 (same as reference
behavior via its zeros-path, loss_buffer.py:60-74).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def softmax_temperature(x: jax.Array, temperature: float = 1.0) -> jax.Array:
    """softmax(x / temperature) along the last axis."""
    assert temperature > 0, "Temperature should be positive."
    return jax.nn.softmax(x / temperature, axis=-1)


class LossBufferState(NamedTuple):
    buffer: jax.Array  # [max(buffer_size, 1), S] float32
    index: jax.Array  # scalar int32 ring pointer


def loss_buffer_init(subnetworks: int, buffer_size: int) -> LossBufferState:
    return LossBufferState(
        buffer=jnp.zeros((max(buffer_size, 1), subnetworks), jnp.float32),
        index=jnp.zeros((), jnp.int32),
    )


def loss_buffer_add(
    state: LossBufferState, loss: jax.Array, buffer_size: int
) -> LossBufferState:
    """Write the latest per-subnetwork loss [S] at the ring position."""
    if buffer_size == 0:
        return state
    loss = jax.lax.stop_gradient(loss.astype(jnp.float32))
    return LossBufferState(
        buffer=state.buffer.at[state.index].set(loss),
        index=(state.index + 1) % buffer_size,
    )


def loss_buffer_weights(
    state: LossBufferState, temperature: float, buffer_size: int
) -> jax.Array:
    """Weights [S]: softmax(mean_loss / T) * S (uniform == all-ones)."""
    s = state.buffer.shape[1]
    if buffer_size == 0:
        return jnp.ones((s,), jnp.float32)
    mean = jnp.mean(state.buffer, axis=0)
    return softmax_temperature(mean, temperature) * s
