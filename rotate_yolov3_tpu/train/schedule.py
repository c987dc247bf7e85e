"""Darknet-style LR schedule: burn-in warmup + step decays.

The reference trains with SGD + burn-in + step LR policy driven by the cfg
[net] block (SURVEY.md §2 "train CLI": 'SGD + burn-in/LR schedule';
cfg fields learning_rate/burn_in/steps/scales/policy). Implemented as an
optax-compatible schedule function.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def darknet_schedule(base_lr: float, burn_in: int = 1000,
                     steps: Sequence[float] = (400000, 450000),
                     scales: Sequence[float] = (0.1, 0.1),
                     power: float = 4.0):
    """lr(step) = base * (step/burn_in)^power during burn-in, then base with
    multiplicative decays at each threshold in ``steps``."""
    steps = jnp.asarray(list(steps), jnp.float32)
    scales = jnp.asarray(list(scales), jnp.float32)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = jnp.minimum((step + 1.0) / max(burn_in, 1), 1.0) ** power
        decay = jnp.prod(jnp.where(step >= steps, scales, 1.0))
        return base_lr * warm * decay

    return schedule


def cosine_schedule(base_lr: float, total_steps: int, burn_in: int = 1000,
                    final_frac: float = 0.05):
    """Cosine decay alternative (not in the reference; opt-in via flag)."""
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = jnp.minimum((step + 1.0) / max(burn_in, 1), 1.0)
        t = jnp.clip(step / max(total_steps, 1), 0.0, 1.0)
        cos = final_frac + (1 - final_frac) * 0.5 * (1 + jnp.cos(jnp.pi * t))
        return base_lr * warm * cos

    return schedule
