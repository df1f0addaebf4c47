"""EMA of the trainable pytree (reference: helpers/training/ema.py:40-605 EMAModel —
decay warmup, update interval, save/load/copy_to/store/restore).

On TPU the EMA lives inside the jitted train step as a donated pytree lerp, so it
is free of host transfers; CPU residency options collapse away.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class EMAConfig:
    decay: float = 0.9999
    update_interval: Optional[int] = None
    use_warmup: bool = True
    inv_gamma: float = 1.0
    power: float = 2.0 / 3.0


def ema_decay_for_step(config: EMAConfig, optimization_step: jax.Array) -> jax.Array:
    """Warmup-aware decay: min(decay, (1+s)/(10+s)) style ramp (matches the
    reference's default warmup curve)."""
    step = jnp.maximum(optimization_step.astype(jnp.float32), 0.0)
    if not config.use_warmup:
        return jnp.asarray(config.decay, jnp.float32)
    value = (1.0 + step / config.inv_gamma) ** -config.power
    warmup_decay = 1.0 - value
    return jnp.clip(warmup_decay, 0.0, config.decay)


def ema_init(params) -> Any:
    # copy=True: a no-op astype would alias the trainable buffers and break
    # donation in the jitted step (same buffer donated twice)
    return jax.tree_util.tree_map(lambda p: jnp.array(p, dtype=jnp.float32, copy=True), params)


def ema_update(config: EMAConfig, ema_params, new_params, optimization_step: jax.Array):
    decay = ema_decay_for_step(config, optimization_step)
    updated = jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(jnp.float32) * (1.0 - decay), ema_params, new_params
    )
    if config.update_interval and config.update_interval > 1:
        apply = (optimization_step % config.update_interval) == 0
        updated = jax.tree_util.tree_map(
            lambda u, e: jnp.where(apply, u, e), updated, ema_params
        )
    return updated


def ema_copy_to(ema_params, params):
    """Cast EMA weights back into the training param dtypes (for validation/export)."""
    return jax.tree_util.tree_map(lambda e, p: e.astype(p.dtype), ema_params, params)
