"""Learning-rate schedules.

The reference computes a cyclic-triangular LR every step
(multimodal_kfold_train_cvae_supervised.py:179-182) but assigns it to
``optimizer1.lr`` — a no-op attribute on torch Adam — so the *effective* LR in
the supervised and nmpmcont trainers is the constructor's constant 1e-4
(SURVEY.md Q1). Only the nm-MLP trainer wires the schedule into param_groups
(multimodal_kfold_cvae_nmmlp.py:380-381).

We therefore default to a constant LR for behavioral parity and expose the
intended cyclic schedule (``cyclic_triangular``) as an opt-in.
"""
from __future__ import annotations

import jax.numpy as jnp


def cyclic_triangular(base_lr: float, max_lr: float, step_size: float,
                      gamma: float = 0.98):
    """clr(step) matching train:179-182 / nmmlp:377-379.

    ``step_size = 2 * ceil(n_samples / batch_size)``; the reference's
    global_step starts at 1 for the first batch, so we evaluate at count+1.
    """

    def schedule(count):
        gs = count.astype(jnp.float32) + 1.0
        cycle = jnp.floor(1.0 + gs / (2.0 * step_size))
        x = jnp.abs(gs / step_size - 2.0 * cycle + 1.0)
        return base_lr + (max_lr - base_lr) * jnp.maximum(0.0, 1.0 - x) * (
            gamma ** cycle
        )

    return schedule
