"""LTX-2 Gemma text connectors in flax.linen — checkpoint-faithful.

Reference behavior: helpers/models/ltxvideo2/connectors.py
(``LTX2TextConnectors``): the stacked Gemma hidden states (49 layers x 3840)
are per-layer masked-mean/range normalized (x8), projected to 3840, and run
through per-modality 2-layer 1-D transformers (30 heads x 128) whose padded
positions are REPLACED by tiled learnable registers (so the connector output
carries no padding mask) — affine-free RMS norms, 1-D fractional-coordinate
interleaved RoPE, LTX2-style attention with full-width affine q/k RMS norms.

The connector runs on the ENCODE side of the data plane: its outputs are the
``text_embeds`` the LTX-2 DiT consumes.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .transformer import LTX2Attention, LTX2FFN, _rms_plain, ltx2_rope_tables

Dtype = Any


@dataclasses.dataclass(frozen=True)
class LTX2ConnectorConfig:
    caption_channels: int = 3840
    text_proj_in_factor: int = 49  # stacked Gemma layers
    num_heads: int = 30
    head_dim: int = 128
    num_layers: int = 2
    num_registers: int = 128
    rope_base_seq_len: int = 4096
    rope_theta: float = 10000.0
    scale_factor: int = 8

    @property
    def inner_dim(self) -> int:
        return self.num_heads * self.head_dim

    @classmethod
    def tiny(cls) -> "LTX2ConnectorConfig":
        return cls(caption_channels=16, text_proj_in_factor=3, num_heads=2,
                   head_dim=8, num_layers=1, num_registers=4)


def per_layer_masked_mean_norm(
    hidden: jax.Array, mask: jax.Array, scale_factor: float = 8.0, eps: float = 1e-6
) -> jax.Array:
    """(B, S, D, L) stacked layers + (B, S) mask → (B, S, D·L) range-normalized
    per layer over the valid tokens (reference connectors.py:14-49)."""
    m = mask.astype(bool)[:, :, None, None]
    h = hidden.astype(jnp.float32)
    valid = jnp.sum(mask.astype(jnp.float32), axis=1) * h.shape[2]  # (B,)
    masked = jnp.where(m, h, 0.0)
    mean = jnp.sum(masked, axis=(1, 2), keepdims=True) / (valid[:, None, None, None] + eps)
    x_min = jnp.min(jnp.where(m, h, jnp.inf), axis=(1, 2), keepdims=True)
    x_max = jnp.max(jnp.where(m, h, -jnp.inf), axis=(1, 2), keepdims=True)
    normalized = (h - mean) / (x_max - x_min + eps) * scale_factor
    normalized = normalized.reshape(hidden.shape[0], hidden.shape[1], -1)
    return jnp.where(mask.astype(bool)[:, :, None], normalized, 0.0)


class ConnectorTransformer1d(nn.Module):
    """2-layer 1-D transformer with padded positions replaced by learnable
    registers (reference LTX2ConnectorTransformer1d)."""

    config: LTX2ConnectorConfig
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array) -> jax.Array:
        cfg = self.config
        dim = cfg.inner_dim
        batch, seq = x.shape[:2]
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        registers = self.param(
            "learnable_registers",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -1.0, 1.0),
            (cfg.num_registers, dim),
        )
        if seq % cfg.num_registers != 0:
            raise ValueError(
                f"sequence length {seq} must divide the register count {cfg.num_registers}"
            )
        tiled = jnp.tile(registers, (seq // cfg.num_registers, 1)).astype(self.dtype)

        # left-padded input: roll each row so valid tokens sit at the front,
        # then registers fill the tail (reference connectors.py:253-283)
        valid = jnp.sum(mask.astype(jnp.int32), axis=1)  # (B,)
        pad = seq - valid

        def roll_row(row, shift):
            return jnp.roll(row, -shift, axis=0)

        fronted = jax.vmap(roll_row)(x, pad)
        front_mask = (jnp.arange(seq)[None, :] < valid[:, None])[..., None]
        h = jnp.where(front_mask, fronted, tiled[None])

        coords = np.arange(seq, dtype=np.float64)[:, None]
        rope = ltx2_rope_tables(coords, (cfg.rope_base_seq_len,), dim, cfg.rope_theta)

        for layer in range(cfg.num_layers):
            h_n = _rms_plain(h)
            h = h + LTX2Attention(
                cfg.num_heads, cfg.head_dim, dim, name=f"block_{layer}_attn", **common
            )(h_n, q_rope=rope)
            h_n = _rms_plain(h)
            h = h + LTX2FFN(dim, name=f"block_{layer}_ff", **common)(h_n)
        return _rms_plain(h)


class LTX2TextConnectors(nn.Module):
    config: LTX2ConnectorConfig = LTX2ConnectorConfig()
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, text_hidden_states: jax.Array, mask: jax.Array):
        """``text_hidden_states`` (B, S, caption_channels·49) stacked Gemma
        features, left-padded; returns (video_embeds, audio_embeds)."""
        cfg = self.config
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        stacked = text_hidden_states.reshape(
            *text_hidden_states.shape[:2], cfg.caption_channels, -1
        )
        normalized = per_layer_masked_mean_norm(stacked, mask, cfg.scale_factor)
        proj = nn.Dense(
            cfg.caption_channels, use_bias=False, name="text_proj_in", **common
        )(normalized.astype(self.dtype))
        video = ConnectorTransformer1d(cfg, name="video_connector", **common)(proj, mask)
        audio = ConnectorTransformer1d(cfg, name="audio_connector", **common)(proj, mask)
        return video, audio


def load_ltx2_connectors(config: LTX2ConnectorConfig, path: str):
    """Import an ``LTX2TextConnectors`` torch checkpoint."""
    from ..weight_import import read_safetensors

    w = read_safetensors(path)
    f32 = lambda key: np.asarray(w[key], np.float32)

    def attn(src):
        return {
            "to_q": {"kernel": f32(f"{src}.to_q.weight").T, "bias": f32(f"{src}.to_q.bias")},
            "to_k": {"kernel": f32(f"{src}.to_k.weight").T, "bias": f32(f"{src}.to_k.bias")},
            "to_v": {"kernel": f32(f"{src}.to_v.weight").T, "bias": f32(f"{src}.to_v.bias")},
            "norm_q": f32(f"{src}.norm_q.weight"),
            "norm_k": f32(f"{src}.norm_k.weight"),
            "to_out": {"kernel": f32(f"{src}.to_out.0.weight").T, "bias": f32(f"{src}.to_out.0.bias")},
        }

    def connector(prefix):
        params = {"learnable_registers": f32(f"{prefix}.learnable_registers")}
        for i in range(config.num_layers):
            src = f"{prefix}.transformer_blocks.{i}"
            params[f"block_{i}_attn"] = attn(f"{src}.attn1")
            params[f"block_{i}_ff"] = {
                "proj_in": {"kernel": f32(f"{src}.ff.net.0.proj.weight").T,
                            "bias": f32(f"{src}.ff.net.0.proj.bias")},
                "proj_out": {"kernel": f32(f"{src}.ff.net.2.weight").T,
                             "bias": f32(f"{src}.ff.net.2.bias")},
            }
        return params

    return {
        "params": {
            "text_proj_in": {"kernel": f32("text_proj_in.weight").T},
            "video_connector": connector("video_connector"),
            "audio_connector": connector("audio_connector"),
        }
    }
