"""TREAD token-dropout routing.

Reference: helpers/training/tread.py:18 ``TREADRouter`` — ranks tokens by an
importance score (L1 magnitude mixed with noise), keeps the top fraction,
runs the inner transformer blocks on the kept subset, then scatters outputs
back to the full sequence (20–40% speedup, documentation/TREAD.md:108).

JAX shape: selection must be static-size for XLA, so we keep exactly
``ceil(S * selection_ratio)`` tokens via ``top_k`` + ``take_along_axis`` and
restore with a scatter — all fixed shapes, fully jit/vmap-safe.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class TREADConfig:
    # list of {selection_ratio, start_layer, end_layer} route entries like the
    # reference's --tread_config routes
    routes: Tuple[dict, ...] = ()

    @classmethod
    def from_config(cls, config) -> Optional["TREADConfig"]:
        raw = getattr(config, "tread_config", None)
        if not raw:
            return None
        routes = raw.get("routes") if isinstance(raw, dict) else raw
        if not routes:
            return None
        return cls(routes=tuple(routes))

    def route_for_layer(self, layer: int, num_layers: int) -> Optional[dict]:
        for route in self.routes:
            start = route.get("start_layer", 0)
            end = route.get("end_layer", num_layers - 1)
            if start < 0:
                start += num_layers
            if end < 0:
                end += num_layers
            if start <= layer <= end:
                return route
        return None


class TREADRouter:
    """Select/restore over a token axis with static kept-size."""

    def __init__(self, selection_ratio: float, force_keep: Optional[jax.Array] = None):
        if not 0.0 < selection_ratio <= 1.0:
            raise ValueError(f"selection_ratio must be in (0,1], got {selection_ratio}")
        self.selection_ratio = selection_ratio
        self.force_keep = force_keep

    def plan(self, tokens: jax.Array, rng: Optional[jax.Array] = None, noise_scale: float = 0.1):
        """Returns (keep_idx, restore_info).  ``tokens`` (B, S, D)."""
        batch, seq_len, _ = tokens.shape
        keep = max(1, int(round(seq_len * self.selection_ratio)))
        # importance: mean |activation| per token (reference uses L1 + noise rank mixing)
        score = jnp.mean(jnp.abs(tokens.astype(jnp.float32)), axis=-1)
        if rng is not None and noise_scale > 0:
            noise = jax.random.uniform(rng, score.shape, jnp.float32)
            std = jnp.std(score, axis=-1, keepdims=True)
            score = score + noise * noise_scale * std
        if self.force_keep is not None:
            score = jnp.where(self.force_keep, jnp.inf, score)
        _, keep_idx = jax.lax.top_k(score, keep)  # (B, keep)
        keep_idx = jnp.sort(keep_idx, axis=-1)  # preserve sequence order
        return keep_idx, (batch, seq_len)

    @staticmethod
    def select(tokens: jax.Array, keep_idx: jax.Array) -> jax.Array:
        return jnp.take_along_axis(tokens, keep_idx[..., None], axis=1)

    @staticmethod
    def restore(full_tokens: jax.Array, routed: jax.Array, keep_idx: jax.Array) -> jax.Array:
        """Scatter routed outputs back over the untouched full sequence."""
        batch = full_tokens.shape[0]
        batch_idx = jnp.arange(batch)[:, None]
        return full_tokens.at[batch_idx, keep_idx].set(routed.astype(full_tokens.dtype))
