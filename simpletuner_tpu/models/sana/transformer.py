"""Sana DiT in flax.linen — checkpoint-faithful.

Reference behavior: helpers/models/sana/transformer.py (vendored
SanaTransformer2DModel): 1x1 patchify with NO positional embedding (spatial
information flows only through the Mix-FFN's depthwise 3x3 conv), ReLU linear
self-attention with 70x32 heads, softmax cross-attention with 20x112 heads on
a no-affine norm, GLUMBConv feed-forward (1x1 expand -> silu -> depthwise 3x3
-> GLU gate -> 1x1 project, bias-free point conv), adaLN-single modulation
with per-block scale_shift_table, gelu-tanh caption projection + RMSNorm.

TPU-first: linear attention is two einsums (no SxS matrix) that XLA maps onto
the MXU; the depthwise conv is a cheap VPU op in NHWC layout.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import dot_product_attention
from ..layers import LayerNorm, LoRADense, MLPEmbedder, RMSNorm, timestep_embedding

Dtype = Any


def relu_linear_attention(q: jax.Array, k: jax.Array, v: jax.Array, eps: float = 1e-15) -> jax.Array:
    """(B, S, H, D) linear attention with ReLU feature maps (diffusers
    SanaLinearAttnProcessor2_0 semantics, fp32 accumulation, eps 1e-15)."""
    q = jax.nn.relu(q.astype(jnp.float32))
    k = jax.nn.relu(k.astype(jnp.float32))
    v = v.astype(jnp.float32)
    kv = jnp.einsum("bshd,bshe->bhde", k, v)  # (B, H, D, D_v)
    k_sum = k.sum(axis=1)  # (B, H, D)
    normalizer = jnp.einsum("bshd,bhd->bsh", q, k_sum) + eps
    out = jnp.einsum("bshd,bhde->bshe", q, kv) / normalizer[..., None]
    return out


@dataclasses.dataclass(frozen=True)
class SanaConfig:
    in_channels: int = 32  # DC-AE latents
    patch_size: int = 1
    hidden_size: int = 2240
    depth: int = 20
    self_heads: int = 70
    self_head_dim: int = 32
    cross_heads: int = 20
    cross_head_dim: int = 112
    text_dim: int = 2304  # gemma-2
    ffn_ratio: float = 2.5

    # legacy aliases used by subclasses (sanavideo) and older configs
    @property
    def num_heads(self) -> int:
        return self.cross_heads

    @property
    def head_dim(self) -> int:
        return self.cross_head_dim

    @classmethod
    def tiny(cls) -> "SanaConfig":
        return cls(
            in_channels=4, hidden_size=64, depth=2, self_heads=4, self_head_dim=16,
            cross_heads=2, cross_head_dim=32, text_dim=32,
        )


class GLUMBConv(nn.Module):
    """Mix-FFN: 1x1 expand -> silu -> depthwise 3x3 -> GLU -> bias-free 1x1."""

    dim: int
    ratio: float
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, H, W, C)
        hidden = int(self.dim * self.ratio)
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = nn.Conv(hidden * 2, (1, 1), name="conv_inverted", **common)(x)
        h = nn.silu(h)
        h = nn.Conv(
            hidden * 2, (3, 3), feature_group_count=hidden * 2, padding="SAME",
            name="conv_depth", **common,
        )(h)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.silu(gate)
        return nn.Conv(self.dim, (1, 1), use_bias=False, name="conv_point", **common)(h)


class SanaBlock(nn.Module):
    config: SanaConfig
    hw: tuple = (8, 8)  # static (H', W') for the depthwise Mix-FFN conv
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"

    @nn.compact
    def __call__(self, x, context, t6):
        cfg = self.config
        dim = cfg.hidden_size
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        batch, seq = x.shape[:2]
        height, width = self.hw

        table = self.param(
            "scale_shift_table",
            nn.initializers.normal(stddev=1.0 / dim ** 0.5),
            (6, dim),
            self.param_dtype,
        )
        mods = table[None].astype(jnp.float32) + t6.astype(jnp.float32)
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = (
            mods[:, i][:, None, :].astype(self.dtype) for i in range(6)
        )

        # --- ReLU linear self-attention (70x32 heads, no position) ---------------------
        inner_self = cfg.self_heads * cfg.self_head_dim
        x_n = LayerNorm(use_scale=False, use_bias=False, **common)(x)
        x_n = x_n * (1 + scale_msa) + shift_msa
        shape_self = (batch, seq, cfg.self_heads, cfg.self_head_dim)
        q = LoRADense(inner_self, name="attn1_q", **common, **lora)(x_n).reshape(shape_self)
        k = LoRADense(inner_self, name="attn1_k", **common, **lora)(x_n).reshape(shape_self)
        v = LoRADense(inner_self, name="attn1_v", **common, **lora)(x_n).reshape(shape_self)
        attn = relu_linear_attention(q, k, v).reshape(batch, seq, inner_self).astype(self.dtype)
        x = x + gate_msa * LoRADense(dim, name="attn1_proj", **common, **lora)(attn)

        # --- softmax cross-attention (20x112 heads, no-affine norm) --------------------
        inner_cross = cfg.cross_heads * cfg.cross_head_dim
        x_c = LayerNorm(use_scale=False, use_bias=False, **common)(x)
        shape_q = (batch, seq, cfg.cross_heads, cfg.cross_head_dim)
        shape_kv = (batch, context.shape[1], cfg.cross_heads, cfg.cross_head_dim)
        q = LoRADense(inner_cross, name="attn2_q", **common, **lora)(x_c).reshape(shape_q)
        k = LoRADense(inner_cross, name="attn2_k", **common, **lora)(context).reshape(shape_kv)
        v = LoRADense(inner_cross, name="attn2_v", **common, **lora)(context).reshape(shape_kv)
        attn = dot_product_attention(q, k, v).reshape(batch, seq, inner_cross)
        x = x + LoRADense(dim, name="attn2_proj", **common, **lora)(attn)

        # --- GLUMBConv Mix-FFN ----------------------------------------------------------
        x_f = LayerNorm(use_scale=False, use_bias=False, **common)(x)
        x_f = x_f * (1 + scale_mlp) + shift_mlp
        ff = GLUMBConv(dim, cfg.ffn_ratio, name="ff", **common)(
            x_f.reshape(batch, height, width, dim)
        ).reshape(batch, seq, dim)
        x = x + gate_mlp * ff
        return x


class SanaTransformer(nn.Module):
    config: SanaConfig = SanaConfig()
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"
    remat: bool = False

    @nn.compact
    def __call__(self, latents, timesteps, context):
        cfg = self.config
        dim = cfg.hidden_size
        p = cfg.patch_size
        batch, height, width, channels = latents.shape
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        hh, ww = height // p, width // p

        x = latents.reshape(batch, hh, p, ww, p, channels)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(batch, hh * ww, p * p * channels)
        x = LoRADense(dim, name="patch_in", **common, **lora)(x)

        txt = LoRADense(dim, name="caption_in_1", **common, **lora)(context)
        txt = nn.gelu(txt, approximate=True)
        txt = LoRADense(dim, name="caption_in_2", **common, **lora)(txt)
        txt = RMSNorm(name="caption_norm", eps=1e-5, **common)(txt)

        t_emb = MLPEmbedder(dim, name="time_in", **common)(
            timestep_embedding(timesteps, 256).astype(self.dtype)
        )
        t6 = LoRADense(6 * dim, name="time_proj", **common)(nn.silu(t_emb)).reshape(-1, 6, dim)

        block_cls = nn.remat(SanaBlock) if self.remat else SanaBlock
        for layer in range(cfg.depth):
            x = block_cls(cfg, hw=(hh, ww), name=f"block_{layer}", **common, **lora)(x, txt, t6)
            self.sow("intermediates", f"block_{layer}_hidden", x)

        final_table = self.param(
            "final_scale_shift_table",
            nn.initializers.normal(stddev=1.0 / dim ** 0.5),
            (2, dim),
            self.param_dtype,
        )
        final = final_table[None].astype(jnp.float32) + t_emb[:, None, :].astype(jnp.float32)
        shift = final[:, 0][:, None, :].astype(self.dtype)
        scale = final[:, 1][:, None, :].astype(self.dtype)
        x = LayerNorm(use_scale=False, use_bias=False, **common)(x)
        x = x * (1 + scale) + shift
        x = LoRADense(p * p * channels, name="final_proj", **common)(x)
        x = x.reshape(batch, hh, ww, p, p, channels)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(batch, height, width, channels)
        return x.astype(jnp.float32)
