"""Representation-alignment auxiliary losses over hidden-state taps.

Reference: helpers/training/crepa.py (CREPA cross-frame alignment with a
DINOv2 teacher via cached features) + the LayerSync hidden-state regularizer
(SURVEY.md §2.2); hidden states reach the loss through the transformers'
``sow("intermediates", ...)`` taps.

* **LayerSync**: teacher-free — early-layer hidden states align to a
  stop-gradient later layer (self-distillation through depth).
* **CREPA**: hidden states at one layer align to externally-cached teacher
  features supplied in the batch (``teacher_embeds``, from a
  conditioning_image_embeds dataset).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RepaConfig:
    layersync_gamma: float = 0.0  # weight of the LayerSync loss; 0 = off
    layersync_source_layer: int = 2
    layersync_target_layer: int = -1
    crepa_weight: float = 0.0  # weight of CREPA alignment; 0 = off
    crepa_layer: int = 8
    # U-REPA (reference crepa.py:756 UrepaRegularizer): UNet mid-block tokens
    # align to teacher features (cached, or an in-loop vision encoder); the
    # manifold term matches the batch-pair similarity structure.  The weight
    # schedule + similarity-EMA cutoff reuse CREPA's machinery (the reference
    # UrepaRegularizer shares CrepaScheduler).
    urepa_weight: float = 0.0
    urepa_manifold_weight: float = 3.0
    urepa_schedule: Optional[Any] = None  # CrepaSettings carrying the schedule

    @classmethod
    def from_config(cls, config: Any) -> "RepaConfig":
        urepa_on = bool(config.get("urepa_enabled", False))
        urepa_schedule = None
        if urepa_on:
            from .crepa import schedule_settings

            urepa_schedule = schedule_settings(
                base_weight=float(config.get("urepa_lambda", 0.5) or 0.0),
                scheduler=config.get("urepa_scheduler", "constant"),
                warmup_steps=config.get("urepa_warmup_steps", 0),
                decay_steps=config.get("urepa_decay_steps", 0),
                lambda_end=config.get("urepa_lambda_end", 0.0),
                cutoff_step=config.get("urepa_cutoff_step", 0),
                power=config.get("urepa_power", 1.0),
                max_train_steps=int(config.get("max_train_steps", 0) or 0),
                similarity_threshold=config.get("urepa_similarity_threshold"),
                similarity_ema_decay=float(
                    config.get("urepa_similarity_ema_decay", 0.99) or 0.99
                ),
                threshold_mode=config.get("urepa_threshold_mode", "permanent"),
                encoder_image_size=int(
                    config.get("urepa_encoder_image_size", 518) or 518
                ),
            )
        return cls(
            layersync_gamma=float(config.get("layersync_gamma", 0.0) or 0.0),
            layersync_source_layer=int(config.get("layersync_source_layer", 2) or 2),
            layersync_target_layer=int(config.get("layersync_target_layer", -1) or -1),
            crepa_weight=float(config.get("crepa_weight", 0.0) or 0.0),
            crepa_layer=int(config.get("crepa_layer", 8) or 8),
            urepa_weight=float(config.get("urepa_lambda", 0.5) or 0.0) if urepa_on else 0.0,
            urepa_manifold_weight=float(config.get("urepa_manifold_weight", 3.0) or 3.0),
            urepa_schedule=urepa_schedule,
        )

    @property
    def enabled(self) -> bool:
        return self.layersync_gamma > 0 or self.crepa_weight > 0 or self.urepa_weight > 0


def _flat_hiddens(intermediates: Dict[str, Any]):
    """Ordered [(name, (B, S, D) array)] from the sown intermediates tree."""
    out = []
    for name, value in intermediates.items():
        while isinstance(value, (tuple, list)):
            value = value[0]
        if isinstance(value, dict):
            continue
        out.append((name, value))
    return out


def _match_tokens(layer: jax.Array, teacher: jax.Array) -> jax.Array:
    """Adapt (B, S_h, D_h) hidden tokens to the teacher's (S_t, D_t) layout by
    channel-group and token-group mean pooling (parameter-free stand-in for
    the reference's learned projector, which would need its own optimizer)."""
    d_h, d_t = layer.shape[-1], teacher.shape[-1]
    if d_h != d_t:
        if d_h % d_t == 0:
            layer = layer.reshape(*layer.shape[:-1], d_t, d_h // d_t).mean(-1)
        else:
            layer = layer[..., :d_t]
    if layer.shape[1] != teacher.shape[1]:
        ratio = max(layer.shape[1] // teacher.shape[1], 1)
        layer = layer[:, : teacher.shape[1] * ratio].reshape(
            layer.shape[0], teacher.shape[1], ratio, -1
        ).mean(2)
    return layer


def _cosine_align(source: jax.Array, target: jax.Array) -> jax.Array:
    s = source.astype(jnp.float32)
    t = jax.lax.stop_gradient(target.astype(jnp.float32))
    s = s / (jnp.linalg.norm(s, axis=-1, keepdims=True) + 1e-6)
    t = t / (jnp.linalg.norm(t, axis=-1, keepdims=True) + 1e-6)
    return jnp.mean(1.0 - jnp.sum(s * t, axis=-1))


def repa_auxiliary_loss(
    repa: RepaConfig,
    intermediates: Dict[str, Any],
    batch: Dict[str, jax.Array],
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    hiddens = _flat_hiddens(intermediates)
    total = jnp.zeros([], jnp.float32)
    logs: Dict[str, jax.Array] = {}
    if not hiddens:
        return total, logs

    if repa.layersync_gamma > 0 and len(hiddens) >= 2:
        src = hiddens[repa.layersync_source_layer % len(hiddens)][1]
        dst = hiddens[repa.layersync_target_layer % len(hiddens)][1]
        value = _cosine_align(src, dst)
        total = total + repa.layersync_gamma * value
        logs["layersync_loss"] = value

    if repa.crepa_weight > 0 and "teacher_embeds" in batch:
        layer = hiddens[repa.crepa_layer % len(hiddens)][1]
        teacher = batch["teacher_embeds"]  # (B, S, D_t) — pooled per token group
        layer = _match_tokens(layer, teacher)
        value = _cosine_align(layer, teacher)
        total = total + repa.crepa_weight * value
        logs["crepa_loss"] = value

    if repa.urepa_weight > 0 and "teacher_embeds" in batch:
        # U-REPA: mid-block tokens (sown as "mid_hidden") → cosine alignment
        # plus batch-pair manifold matching (reference crepa.py:993
        # _compute_manifold_loss ||sim(y_i,y_j) − sim(h_i,h_j)||²)
        mid = dict(hiddens).get("mid_hidden")
        if mid is None:
            mid = hiddens[len(hiddens) // 2][1]
        if mid.ndim == 4:  # (1, B, S, D) sow stacking
            mid = mid[0]
        teacher = jax.lax.stop_gradient(batch["teacher_embeds"].astype(jnp.float32))
        mid = _match_tokens(mid, teacher)
        align = _cosine_align(mid, teacher)
        p = jnp.mean(mid.astype(jnp.float32), axis=1)
        e = jnp.mean(teacher, axis=1)
        p = p / (jnp.linalg.norm(p, axis=-1, keepdims=True) + 1e-6)
        e = e / (jnp.linalg.norm(e, axis=-1, keepdims=True) + 1e-6)
        manifold = jnp.mean((p @ p.T - e @ e.T) ** 2)
        value = align + repa.urepa_manifold_weight * manifold
        weight = jnp.asarray(repa.urepa_weight, jnp.float32)
        if repa.urepa_schedule is not None:
            # scheduled λ(step) + similarity-EMA cutoff, shared with CREPA
            from .crepa import scheduled_weight

            step = jnp.asarray(batch.get("global_step", 0), jnp.float32)
            weight = scheduled_weight(repa.urepa_schedule, step)
            cutoff = batch.get("urepa_cutoff")
            if cutoff is not None:
                weight = weight * (1.0 - cutoff.astype(jnp.float32))
        total = total + weight * value
        logs["urepa_alignment_loss"] = align
        logs["urepa_manifold_loss"] = manifold
        # cosine similarity (not 1−cos): the host-side cutoff EMA tracks this
        logs["urepa_alignment_score"] = jax.lax.stop_gradient(1.0 - align)
        logs["urepa_weight"] = jax.lax.stop_gradient(weight)
    return total, logs
