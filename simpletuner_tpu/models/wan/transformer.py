"""Wan-architecture video DiT in flax.linen.

Reference behavior: helpers/models/wan vendored transformer (SURVEY.md §2.3:
1.3B/14B flow-matching video DiT, T2V/I2V flavours, TREAD support) — blocks of
self-attention over 3-D RoPE'd video tokens + cross-attention to umT5 text
context + FFN, all modulated by AdaLN from the timestep embedding.  TPU-first:
(1,2,2) patchify to keep token count = T'·H'/2·W'/2, static shapes per video
bucket, Pallas flash attention through the dispatcher.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import apply_rope, axial_rope, dot_product_attention
from ..layers import (
    AdaLayerNormZero,
    LayerNorm,
    LoRADense,
    MLPEmbedder,
    RMSNorm,
    modulate,
    timestep_embedding,
)

Dtype = Any


@dataclasses.dataclass(frozen=True)
class WanConfig:
    in_channels: int = 16
    patch: Tuple[int, int, int] = (1, 2, 2)  # (t, h, w)
    hidden_size: int = 1536
    depth: int = 30
    num_heads: int = 12
    head_dim: int = 128
    ffn_ratio: float = 4.0
    text_dim: int = 4096  # umT5-xxl features
    axes_dim: Tuple[int, ...] = (44, 42, 42)  # rope split over (t, h, w); sums to head_dim
    qk_norm: bool = True

    @classmethod
    def b1_3(cls) -> "WanConfig":
        return cls()

    @classmethod
    def b14(cls) -> "WanConfig":
        return cls(hidden_size=5120, depth=40, num_heads=40)

    @classmethod
    def tiny(cls) -> "WanConfig":
        return cls(hidden_size=64, depth=2, num_heads=2, head_dim=32,
                   text_dim=32, axes_dim=(12, 10, 10))


class WanBlock(nn.Module):
    config: WanConfig
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"

    @nn.compact
    def __call__(self, x, context, vec, rope):
        cfg = self.config
        dim = cfg.hidden_size
        inner = cfg.num_heads * cfg.head_dim
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        batch, seq = x.shape[:2]
        heads_shape = (batch, seq, cfg.num_heads, cfg.head_dim)

        mods = AdaLayerNormZero(6, name="modulation", **common)(vec, dim)

        # --- self-attention over video tokens (3D rope) --------------------------------
        x_n = modulate(LayerNorm(use_scale=False, use_bias=False, **common)(x), mods[0], mods[1])
        q = LoRADense(inner, name="self_attn_q", **common, **lora)(x_n).reshape(heads_shape)
        k = LoRADense(inner, name="self_attn_k", **common, **lora)(x_n).reshape(heads_shape)
        v = LoRADense(inner, name="self_attn_v", **common, **lora)(x_n).reshape(heads_shape)
        if cfg.qk_norm:
            q = RMSNorm(name="self_attn_norm_q", **common)(q)
            k = RMSNorm(name="self_attn_norm_k", **common)(k)
        cos, sin = rope
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        attn = dot_product_attention(q, k, v).reshape(batch, seq, inner)
        x = x + mods[2][:, None, :] * LoRADense(dim, name="self_attn_proj", **common, **lora)(attn)

        # --- cross-attention to text (no rope, no modulation gate in Wan) ---------------
        x_c = LayerNorm(name="cross_norm", **common)(x)
        q = LoRADense(inner, name="cross_attn_q", **common, **lora)(x_c).reshape(heads_shape)
        ctx_shape = (batch, context.shape[1], cfg.num_heads, cfg.head_dim)
        k = LoRADense(inner, name="cross_attn_k", **common, **lora)(context).reshape(ctx_shape)
        v = LoRADense(inner, name="cross_attn_v", **common, **lora)(context).reshape(ctx_shape)
        if cfg.qk_norm:
            q = RMSNorm(name="cross_attn_norm_q", **common)(q)
            k = RMSNorm(name="cross_attn_norm_k", **common)(k)
        attn = dot_product_attention(q, k, v).reshape(batch, seq, inner)
        x = x + LoRADense(dim, name="cross_attn_proj", **common, **lora)(attn)

        # --- FFN ------------------------------------------------------------------------
        x_f = modulate(LayerNorm(use_scale=False, use_bias=False, **common)(x), mods[3], mods[4])
        h = LoRADense(int(dim * cfg.ffn_ratio), name="ffn_in", **common, **lora)(x_f)
        x = x + mods[5][:, None, :] * LoRADense(dim, name="ffn_out", **common, **lora)(
            nn.gelu(h, approximate=True)
        )
        return x


class WanTransformer(nn.Module):
    config: WanConfig = WanConfig()
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        latents: jax.Array,  # (B, T, H, W, C) noisy video latents
        timesteps: jax.Array,  # (B,) sigma in [0, 1]
        context: jax.Array,  # (B, L, text_dim)
    ) -> jax.Array:
        cfg = self.config
        dim = cfg.hidden_size
        pt, ph, pw = cfg.patch
        batch, t, height, width, channels = latents.shape
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)

        # (1,2,2) patchify
        x = latents.reshape(batch, t // pt, pt, height // ph, ph, width // pw, pw, channels)
        x = jnp.transpose(x, (0, 1, 3, 5, 2, 4, 6, 7)).reshape(
            batch, (t // pt) * (height // ph) * (width // pw), pt * ph * pw * channels
        )
        x = LoRADense(dim, name="patch_in", **common, **lora)(x)

        txt = LoRADense(dim, name="text_in", **common, **lora)(context)
        vec = MLPEmbedder(dim, name="time_in", **common)(
            timestep_embedding(timesteps, 256).astype(self.dtype)
        )

        # 3D rope ids over (t, h, w)
        tt, hh, ww = t // pt, height // ph, width // pw
        ids = jnp.stack(
            jnp.meshgrid(jnp.arange(tt), jnp.arange(hh), jnp.arange(ww), indexing="ij"),
            axis=-1,
        ).reshape(1, -1, 3)
        ids = jnp.broadcast_to(ids, (batch, ids.shape[1], 3))
        rope = axial_rope(cfg.axes_dim, ids)

        block_cls = nn.remat(WanBlock) if self.remat else WanBlock
        for layer in range(cfg.depth):
            x = block_cls(cfg, name=f"block_{layer}", **common, **lora)(x, txt, vec, rope)

        shift, scale = AdaLayerNormZero(2, name="final_mod", **common)(vec, dim)
        x = modulate(LayerNorm(use_scale=False, use_bias=False, **common)(x), shift, scale)
        x = LoRADense(pt * ph * pw * channels, name="final_proj", **common)(x)

        # unpatchify
        x = x.reshape(batch, tt, hh, ww, pt, ph, pw, channels)
        x = jnp.transpose(x, (0, 1, 4, 2, 5, 3, 6, 7)).reshape(batch, t, height, width, channels)
        return x.astype(jnp.float32)
