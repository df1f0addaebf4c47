"""Rotary position embeddings (axial, Flux/Wan-style) in JAX.

The reference's DiT families embed image-token positions with multi-axis RoPE
(e.g. Flux packs (t, h, w) ids; reference: helpers/models/flux vendored
transformer).  We precompute cos/sin tables outside the jitted step where
possible and apply with pure elementwise math so XLA fuses it into the
surrounding matmuls.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def rope_frequencies(dim: int, positions: jax.Array, theta: float = 10000.0) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables for one axis.

    positions: (..., seq) integer or float positions.
    Returns cos, sin of shape (..., seq, dim // 2).
    """
    if dim % 2:
        raise ValueError("rope dim must be even")
    freqs = 1.0 / (theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    angles = positions.astype(jnp.float32)[..., None] * freqs
    return jnp.cos(angles), jnp.sin(angles)


def axial_rope(
    axes_dim: Sequence[int],
    ids: jax.Array,
    theta: float = 10000.0,
) -> Tuple[jax.Array, jax.Array]:
    """Multi-axis RoPE table à la Flux.

    ``ids``: (..., seq, n_axes) integer coordinates per token (e.g. (t, h, w)).
    ``axes_dim``: per-axis rotary dims, summing to head_dim.
    Returns cos, sin with shape (..., seq, head_dim // 2).
    """
    cos_parts = []
    sin_parts = []
    for axis, dim in enumerate(axes_dim):
        cos, sin = rope_frequencies(dim, ids[..., axis], theta)
        cos_parts.append(cos)
        sin_parts.append(sin)
    return jnp.concatenate(cos_parts, axis=-1), jnp.concatenate(sin_parts, axis=-1)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate pairs (even, odd channels interleaved) of ``x``: (..., seq, heads, head_dim).

    cos/sin: (..., seq, head_dim // 2) — broadcast over the heads axis.
    """
    x_f = x.astype(jnp.float32)
    x_pairs = x_f.reshape(*x.shape[:-1], -1, 2)
    x_even = x_pairs[..., 0]
    x_odd = x_pairs[..., 1]
    cos_b = jnp.expand_dims(cos, axis=-2)  # broadcast over heads
    sin_b = jnp.expand_dims(sin, axis=-2)
    rotated_even = x_even * cos_b - x_odd * sin_b
    rotated_odd = x_even * sin_b + x_odd * cos_b
    out = jnp.stack([rotated_even, rotated_odd], axis=-1)
    return out.reshape(x.shape).astype(x.dtype)
