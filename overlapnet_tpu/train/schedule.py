"""Learning-rate schedule matching the reference exactly.

Reference (training.py:47-57): epoch 0 runs at 0.1 * initial_lr (warmup),
epoch e >= 1 at initial_lr * alpha^(e-1). Keras applies it per epoch; here it
is an optax step-schedule parameterized by steps_per_epoch.
"""

from __future__ import annotations

import jax.numpy as jnp


def reference_lr_schedule(initial_lr: float, alpha: float, steps_per_epoch: int):
    """Step-indexed schedule reproducing the reference's per-epoch values."""

    def schedule(step):
        epoch = step // steps_per_epoch
        warm = initial_lr * 0.1
        decayed = initial_lr * jnp.power(alpha, jnp.maximum(epoch - 1, 0).astype(jnp.float32))
        return jnp.where(epoch < 1, warm, decayed)

    return schedule
