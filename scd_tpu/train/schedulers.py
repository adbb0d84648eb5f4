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


def step_schedule(base_lr: float, step_size: int = 150, gamma: float = 0.1):
    """StepLR (reference ``get_scheduler('step')``, ``schedulers.py:7-10``)."""
    def fn(step):
        import jax.numpy as jnp
        return base_lr * gamma ** jnp.floor_divide(step, step_size)
    return fn


def multi_step_schedule(base_lr: float, milestones):
    """MultiStepLR (reference ``schedulers.py:41-52``)."""
    return optax.piecewise_constant_schedule(
        base_lr, {int(m): 0.1 for m in milestones})


def cosine_annealing_schedule(base_lr: float, total_steps: int,
                              eta_min: float = 0.0):
    """CosineAnnealingLR with eta_min = lr*1e-3 by default in the reference
    dispatcher (``schedulers.py:15-17``)."""
    return optax.cosine_decay_schedule(
        base_lr, total_steps, alpha=eta_min / max(base_lr, 1e-12))


def cosine_warm_restarts_schedule(base_lr: float, t0: int,
                                  eta_min: float = 0.0,
                                  warmup_steps: int = 0):
    """CosineAnnealingWarmRestarts (fixed period T_0; reference
    ``schedulers.py:19-26``), optionally with an initial linear warmup that
    interpolates up to the cosine curve's value at ``warmup_steps``
    (reference ``CosineAnnealingWarmupRestarts_New``,
    ``schedulers.py:86-123``)."""
    import jax.numpy as jnp

    def cos_val(step):
        t_cur = jnp.mod(step, t0)
        return eta_min + (base_lr - eta_min) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * t_cur / t0))

    if warmup_steps <= 0:
        return cos_val

    target = float(np.asarray(cos_val(warmup_steps)))

    def fn(step):
        step = jnp.asarray(step)
        warm = eta_min + (target - eta_min) * (step + 1) / warmup_steps
        return jnp.where(step < warmup_steps, warm, cos_val(step))
    return fn


class ReduceLROnPlateau:
    """Host-side plateau controller: call ``step(metric)`` per epoch, read
    ``scale`` (multiply into the base lr via ``optax.inject_hyperparams`` or
    a host-updated scalar).  Matches torch semantics used by the reference
    (``schedulers.py:13`` with mode='min', patience=50)."""

    def __init__(self, factor: float = 0.1, patience: int = 50,
                 threshold: float = 1e-4, mode: str = "min",
                 threshold_mode: str = "rel", min_scale: float = 1e-8):
        from scd_tpu.utils.experiment import IndicatePlateau

        self._plateau = IndicatePlateau(threshold=threshold,
                                        patience_epochs=patience, mode=mode,
                                        threshold_mode=threshold_mode)
        self.factor = factor
        self.min_scale = min_scale
        self.scale = 1.0

    def step(self, metric: float) -> float:
        if self._plateau.step(metric):
            self.scale = max(self.scale * self.factor, self.min_scale)
        return self.scale


class WarmRestartPlateau(ReduceLROnPlateau):
    """Plateau reduction that resets to the base lr every ``t_restart``
    epochs (reference ``WarmRestartPlateau``, ``schedulers.py:61-83``)."""

    def __init__(self, t_restart: int = 120, **kw):
        super().__init__(**kw)
        self.t_restart = t_restart
        self._epoch = 0

    def step(self, metric: float) -> float:
        super().step(metric)
        self._epoch += 1
        if self._epoch % self.t_restart == 0:
            self.scale = 1.0
            self._plateau._reset()
        return self.scale


def get_scheduler(name: str, base_lr: float, total_steps: int, **kw):
    """Dispatcher mirroring the reference's ``get_scheduler``
    (``schedulers.py:5-59``).  Returns an optax schedule fn for functional
    schedules, or a host controller object for the plateau family."""
    if name == "step":
        return step_schedule(base_lr, kw.get("step_size", 150),
                             kw.get("gamma", 0.1))
    if name == "multi_step":
        return multi_step_schedule(
            base_lr, kw.get("milestones", [30 * i for i in range(1, 5)]))
    if name == "cosine":
        return cosine_annealing_schedule(base_lr, total_steps,
                                         kw.get("eta_min", base_lr * 1e-3))
    if name in ("cosine_warm_restarts", "cosine_warm_restarts_warmup"):
        num_restarts = kw.get("num_restarts", 2)
        t0 = kw.get("t0", max(int(total_steps / (num_restarts + 1)), 1))
        warmup = kw.get("warmup_steps",
                        10 if name.endswith("warmup") else 0)
        return cosine_warm_restarts_schedule(
            base_lr, t0, kw.get("eta_min", base_lr * 1e-3), warmup)
    if name == "plateau":
        return ReduceLROnPlateau(patience=kw.get("patience", 50))
    if name == "warm_restarts_plateau":
        return WarmRestartPlateau(
            t_restart=kw.get("t_restart", 120), mode="min",
            threshold_mode="abs", threshold=kw.get("threshold", 0.5),
            patience=kw.get("patience", 100))
    raise NotImplementedError(name)
