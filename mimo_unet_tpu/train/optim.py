"""Optimizer matching the reference training semantics.

The reference uses ``torch.optim.Adam(lr, weight_decay)`` +
``StepLR(step_size=20, gamma=0.5)`` stepped per *epoch* (reference:
mimo/models/mimo_unet.py:185-201).  Two parity traps handled here:

  * torch ``Adam(weight_decay=w)`` is L2-in-gradient (g + w*p fed into the
    moments), NOT decoupled AdamW — so ``optax.add_decayed_weights`` goes
    *before* ``scale_by_adam`` in the chain.
  * StepLR is epoch-indexed; jitted training counts steps, so the schedule
    takes ``steps_per_epoch`` and floors.
"""

from __future__ import annotations

import optax


def step_lr_schedule(
    learning_rate: float,
    step_size: int,
    gamma: float,
    steps_per_epoch: int,
) -> optax.Schedule:
    """lr(step) = lr0 * gamma ** ((step // steps_per_epoch) // step_size)."""

    def schedule(count):
        epoch = count // max(steps_per_epoch, 1)
        return learning_rate * gamma ** (epoch // step_size)

    return schedule


def adam_with_steplr(
    learning_rate: float,
    weight_decay: float,
    scheduler_step_size: int,
    scheduler_gamma: float,
    steps_per_epoch: int,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    schedule = step_lr_schedule(
        learning_rate, scheduler_step_size, scheduler_gamma, steps_per_epoch
    )
    transforms = []
    if weight_decay:
        transforms.append(optax.add_decayed_weights(weight_decay))
    transforms.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    transforms.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*transforms)
