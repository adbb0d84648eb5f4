"""LR schedules and ramp functions.

References: cosine-with-warmup (``gcd/project_utils/schedulers.py:86-118``,
``local_utils/scheduler.py``), sigmoid/linear rampup and cosine rampdown
(``local_utils/ramps.py``).  Implemented as optax-compatible schedules /
pure functions.
"""

from __future__ import annotations

import numpy as np
import optax


def cosine_warmup_schedule(base_lr: float, warmup_steps: int,
                           total_steps: int, final_lr: float = 0.0):
    """Linear warmup then cosine decay (optax schedule)."""
    if warmup_steps > 0:
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=base_lr, warmup_steps=warmup_steps,
            decay_steps=total_steps, end_value=final_lr)
    return optax.cosine_decay_schedule(base_lr, total_steps,
                                       alpha=final_lr / max(base_lr, 1e-12))


def sigmoid_rampup(current: float, rampup_length: float) -> float:
    """Exponential rampup from Tarvainen & Valpola (``ramps.py:12-19``)."""
    if rampup_length == 0:
        return 1.0
    current = float(np.clip(current, 0.0, rampup_length))
    phase = 1.0 - current / rampup_length
    return float(np.exp(-5.0 * phase * phase))


def linear_rampup(current: float, rampup_length: float) -> float:
    if rampup_length == 0:
        return 1.0
    return float(np.clip(current / rampup_length, 0.0, 1.0))


def cosine_rampdown(current: float, rampdown_length: float) -> float:
    return float(0.5 * (np.cos(np.pi * current / rampdown_length) + 1))
