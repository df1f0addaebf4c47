"""LR schedules (reference: helpers/training/custom_schedule.py:195-481 —
polynomial-with-warmup, Cosine, CosineAnnealingHardRestarts, Sine, constant(+warmup),
cosine_with_restarts) as optax schedules."""

from __future__ import annotations

import math
from typing import Any, Callable

import jax.numpy as jnp
import optax


def _with_warmup(schedule: Callable, warmup_steps: int, peak_lr: float) -> Callable:
    if warmup_steps <= 0:
        return schedule
    warmup = optax.linear_schedule(0.0, peak_lr, warmup_steps)
    return optax.join_schedules([warmup, schedule], [warmup_steps])


def sine_schedule(peak_lr: float, total_steps: int, min_lr: float = 0.0) -> Callable:
    """Full sine oscillation between min and peak (the reference's Sine schedule)."""

    def schedule(step):
        frac = jnp.clip(step / max(total_steps, 1), 0.0, 1.0)
        return min_lr + (peak_lr - min_lr) * 0.5 * (1.0 + jnp.sin(2.0 * math.pi * frac - math.pi / 2.0))

    return schedule


def cosine_hard_restarts(peak_lr: float, total_steps: int, cycles: int, min_lr: float = 0.0) -> Callable:
    def schedule(step):
        frac = jnp.clip(step / max(total_steps, 1), 0.0, 1.0 - 1e-9)
        cycle_frac = (frac * cycles) % 1.0
        return min_lr + (peak_lr - min_lr) * 0.5 * (1.0 + jnp.cos(math.pi * cycle_frac))

    return schedule


def get_lr_schedule(config: Any, total_steps: int) -> optax.Schedule:
    name = (config.get("lr_scheduler") or "constant").lower()
    peak = float(config.get("learning_rate", 1e-4) or 1e-4)
    warmup = int(config.get("lr_warmup_steps", 0) or 0)
    end = float(config.get("lr_end", 1e-7) or 0.0)
    cycles = int(config.get("lr_num_cycles", 1) or 1)
    power = float(config.get("lr_power", 1.0) or 1.0)
    decay_steps = max(total_steps - warmup, 1)

    if name == "constant":
        return optax.constant_schedule(peak)
    if name == "constant_with_warmup":
        return _with_warmup(optax.constant_schedule(peak), warmup, peak)
    if name == "linear":
        return _with_warmup(optax.linear_schedule(peak, end, decay_steps), warmup, peak)
    if name == "polynomial":
        return _with_warmup(
            optax.polynomial_schedule(peak, end, power, decay_steps), warmup, peak
        )
    if name == "cosine":
        return _with_warmup(optax.cosine_decay_schedule(peak, decay_steps, alpha=end / peak if peak else 0.0), warmup, peak)
    if name == "cosine_with_restarts":
        return _with_warmup(
            optax.sgdr_schedule(
                [
                    dict(init_value=peak, peak_value=peak, decay_steps=max(decay_steps // max(cycles, 1), 1), warmup_steps=0, end_value=end)
                    for _ in range(max(cycles, 1))
                ]
            ),
            warmup,
            peak,
        )
    if name == "cosine_annealing_hard_restarts":
        return _with_warmup(cosine_hard_restarts(peak, decay_steps, max(cycles, 1), end), warmup, peak)
    if name == "sine":
        return _with_warmup(sine_schedule(peak, decay_steps, end), warmup, peak)
    raise ValueError(f"unknown lr_scheduler {name!r}")
