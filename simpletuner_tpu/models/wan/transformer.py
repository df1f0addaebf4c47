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
    out_channels: int = 0  # 0 = same as in_channels (I2V uses fewer out than in)
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
        # in_channels matches VideoVAEConfig.tiny's 4 latent channels — the
        # i2v output head resolves out_channels from the base latent width,
        # so an inconsistent tiny pair mispredicts channel counts
        return cls(in_channels=4, hidden_size=64, depth=2, num_heads=2, head_dim=32,
                   text_dim=32, axes_dim=(12, 10, 10))


class WanBlock(nn.Module):
    """Wan transformer block (diffusers WanTransformerBlock semantics):
    per-block ``scale_shift_table`` (6, dim) added to the shared time
    conditioning ``e6`` (B, 6, dim); qk RMS-norm across heads (over the full
    inner dim); ungated cross-attention with an affine norm."""

    config: WanConfig
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"

    @nn.compact
    def __call__(self, x, context, e6, rope):
        cfg = self.config
        dim = cfg.hidden_size
        inner = cfg.num_heads * cfg.head_dim
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        batch, seq = x.shape[:2]
        heads_shape = (batch, seq, cfg.num_heads, cfg.head_dim)

        table = self.param(
            "scale_shift_table",
            nn.initializers.normal(stddev=1.0 / dim ** 0.5),
            (6, dim),
            self.param_dtype,
        )
        mods = table[None].astype(jnp.float32) + e6.astype(jnp.float32)  # (B, 6, dim)
        mods = [mods[:, i].astype(self.dtype) for i in range(6)]

        def qk_norm(value, name):
            if not cfg.qk_norm:
                return value
            return RMSNorm(name=name, **common)(value)  # across heads: over inner dim

        # --- self-attention over video tokens (3D rope) --------------------------------
        x_n = modulate(LayerNorm(use_scale=False, use_bias=False, **common)(x), mods[0], mods[1])
        q = qk_norm(LoRADense(inner, name="self_attn_q", **common, **lora)(x_n), "self_attn_norm_q")
        k = qk_norm(LoRADense(inner, name="self_attn_k", **common, **lora)(x_n), "self_attn_norm_k")
        v = LoRADense(inner, name="self_attn_v", **common, **lora)(x_n)
        q, k, v = (t.reshape(heads_shape) for t in (q, k, v))
        cos, sin = rope
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        attn = dot_product_attention(q, k, v).reshape(batch, seq, inner)
        x = x + mods[2][:, None, :] * LoRADense(dim, name="self_attn_proj", **common, **lora)(attn)

        # --- cross-attention to text (no rope, ungated; affine norm) --------------------
        x_c = LayerNorm(name="cross_norm", **common)(x)
        ctx_shape = (batch, context.shape[1], cfg.num_heads, cfg.head_dim)
        q = qk_norm(LoRADense(inner, name="cross_attn_q", **common, **lora)(x_c), "cross_attn_norm_q")
        k = qk_norm(LoRADense(inner, name="cross_attn_k", **common, **lora)(context), "cross_attn_norm_k")
        v = LoRADense(inner, name="cross_attn_v", **common, **lora)(context)
        q = q.reshape(heads_shape)
        k = k.reshape(ctx_shape)
        v = v.reshape(ctx_shape)
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

        # 2-layer text projection (diffusers condition_embedder.text_embedder)
        txt = LoRADense(dim, name="text_in0", **common, **lora)(context)
        txt = LoRADense(dim, name="text_in2", **common, **lora)(nn.gelu(txt, approximate=True))
        vec = MLPEmbedder(dim, name="time_in", **common)(
            timestep_embedding(timesteps, 256).astype(self.dtype)
        )
        # shared 6-way time modulation (diffusers condition_embedder.time_proj)
        e6 = LoRADense(6 * dim, name="time_proj", **common)(nn.silu(vec)).reshape(-1, 6, dim)

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
            x = block_cls(cfg, name=f"block_{layer}", **common, **lora)(x, txt, e6, rope)
            self.sow("intermediates", f"block_{layer}_hidden", x)

        # final head: scale_shift_table (2, dim) + temb (diffusers wan norm_out)
        final_table = self.param(
            "final_scale_shift_table",
            nn.initializers.normal(stddev=1.0 / cfg.hidden_size ** 0.5),
            (2, dim),
            jnp.float32,
        )
        final_mods = final_table[None] + vec.astype(jnp.float32)[:, None]
        shift, scale = final_mods[:, 0].astype(self.dtype), final_mods[:, 1].astype(self.dtype)
        x = modulate(LayerNorm(use_scale=False, use_bias=False, **common)(x), shift, scale)
        x = LoRADense(pt * ph * pw * (cfg.out_channels or channels), name="final_proj", **common)(x)

        # unpatchify
        out_ch = cfg.out_channels or channels
        x = x.reshape(batch, tt, hh, ww, pt, ph, pw, out_ch)
        x = jnp.transpose(x, (0, 1, 4, 2, 5, 3, 6, 7)).reshape(batch, t, height, width, out_ch)
        return x.astype(jnp.float32)
