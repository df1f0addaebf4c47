"""SD3 / SD3.5 MMDiT in flax.linen.

Reference behavior: the vendored SD3 transformer under helpers/models/sd3
(SURVEY.md §2.3: 2–8B flow-matching MMDiT, joint text+image attention with
separate stream params, pooled CLIP adaLN conditioning, 2x2 patch embedding).
TPU-first choices: 2-D sincos position embeddings computed on the fly (no
learned-pos-embed crop/interp state), bf16 compute / fp32 params, LoRA-aware
projections, optional per-block remat.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import dot_product_attention
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
class SD3Config:
    in_channels: int = 16
    patch_size: int = 2
    hidden_size: int = 1536  # sd3-medium: 24 layers * 64
    depth: int = 24
    num_heads: int = 24
    context_dim: int = 4096  # t5 + padded clip sequence features
    pooled_dim: int = 2048  # clip-l + clip-g pooled
    mlp_ratio: float = 4.0
    qk_norm: bool = True  # SD3.5; medium 3.0 ships without but tolerates it
    # learned pos-embed grid side (diffusers pos_embed_max_size); 0 = use sincos
    pos_embed_max_size: int = 0

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @classmethod
    def medium(cls) -> "SD3Config":
        return cls(pos_embed_max_size=192)

    @classmethod
    def large(cls) -> "SD3Config":
        return cls(hidden_size=2432, depth=38, num_heads=38, pos_embed_max_size=192)

    @classmethod
    def tiny(cls) -> "SD3Config":
        # dims match tiny text encoders: CLIP-L 32 + CLIP-G 64 (seq concat 96 = pooled concat 96)
        return cls(hidden_size=64, depth=2, num_heads=2, context_dim=96, pooled_dim=96)


def posemb_2d_sincos(height: int, width: int, dim: int, base: float = 10000.0) -> jax.Array:
    """Fixed 2-D sincos position embedding (H*W, dim)."""
    quarter = dim // 4
    omega = 1.0 / (base ** (jnp.arange(quarter, dtype=jnp.float32) / quarter))
    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    out_y = ys[:, None] * omega[None]  # (H, q)
    out_x = xs[:, None] * omega[None]  # (W, q)
    emb_y = jnp.concatenate([jnp.sin(out_y), jnp.cos(out_y)], axis=-1)  # (H, 2q)
    emb_x = jnp.concatenate([jnp.sin(out_x), jnp.cos(out_x)], axis=-1)  # (W, 2q)
    grid = jnp.concatenate(
        [
            jnp.broadcast_to(emb_y[:, None, :], (height, width, 2 * quarter)),
            jnp.broadcast_to(emb_x[None, :, :], (height, width, 2 * quarter)),
        ],
        axis=-1,
    )
    return grid.reshape(height * width, -1)


class MMDiTBlock(nn.Module):
    config: SD3Config
    context_pre_only: bool = False  # final block drops the context output
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"

    @nn.compact
    def __call__(self, img, txt, vec):
        cfg = self.config
        dim = cfg.hidden_size
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        img_mods = AdaLayerNormZero(6, name="img_mod", **common)(vec, dim)
        n_txt = 2 if self.context_pre_only else 6
        txt_mods = AdaLayerNormZero(n_txt, name="txt_mod", **common)(vec, dim)

        img_n = modulate(LayerNorm(use_scale=False, use_bias=False, **common)(img), img_mods[0], img_mods[1])
        txt_n = modulate(LayerNorm(use_scale=False, use_bias=False, **common)(txt), txt_mods[0], txt_mods[1])

        def qkv(prefix, x):
            q = LoRADense(dim, name=f"{prefix}_attn_q", **common, **lora)(x)
            k = LoRADense(dim, name=f"{prefix}_attn_k", **common, **lora)(x)
            v = LoRADense(dim, name=f"{prefix}_attn_v", **common, **lora)(x)
            batch, seq = x.shape[:2]
            shape = (batch, seq, cfg.num_heads, cfg.head_dim)
            q, k, v = q.reshape(shape), k.reshape(shape), v.reshape(shape)
            if cfg.qk_norm:
                q = RMSNorm(name=f"{prefix}_attn_norm_q", **common)(q)
                k = RMSNorm(name=f"{prefix}_attn_norm_k", **common)(k)
            return q, k, v

        img_q, img_k, img_v = qkv("img", img_n)
        txt_q, txt_k, txt_v = qkv("txt", txt_n)

        q = jnp.concatenate([txt_q, img_q], axis=1)
        k = jnp.concatenate([txt_k, img_k], axis=1)
        v = jnp.concatenate([txt_v, img_v], axis=1)
        attn = dot_product_attention(q, k, v)
        batch = img.shape[0]
        attn = attn.reshape(batch, -1, dim)
        txt_attn, img_attn = attn[:, : txt.shape[1]], attn[:, txt.shape[1]:]

        img = img + img_mods[2][:, None, :] * LoRADense(dim, name="img_attn_proj", **common, **lora)(img_attn)
        img_m = modulate(LayerNorm(use_scale=False, use_bias=False, **common)(img), img_mods[3], img_mods[4])
        mlp_dim = int(dim * cfg.mlp_ratio)
        h = LoRADense(mlp_dim, name="img_mlp_in", **common, **lora)(img_m)
        img = img + img_mods[5][:, None, :] * LoRADense(dim, name="img_mlp_out", **common, **lora)(
            nn.gelu(h, approximate=True)
        )

        if self.context_pre_only:
            return img, txt
        txt = txt + txt_mods[2][:, None, :] * LoRADense(dim, name="txt_attn_proj", **common, **lora)(txt_attn)
        txt_m = modulate(LayerNorm(use_scale=False, use_bias=False, **common)(txt), txt_mods[3], txt_mods[4])
        h = LoRADense(mlp_dim, name="txt_mlp_in", **common, **lora)(txt_m)
        txt = txt + txt_mods[5][:, None, :] * LoRADense(dim, name="txt_mlp_out", **common, **lora)(
            nn.gelu(h, approximate=True)
        )
        return img, txt


class SD3Transformer(nn.Module):
    config: SD3Config = SD3Config()
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        latents: jax.Array,  # (B, H, W, C) noisy latents (NHWC)
        timesteps: jax.Array,  # (B,) sigma in [0, 1]
        context: jax.Array,  # (B, T, context_dim)
        pooled: jax.Array,  # (B, pooled_dim)
        controlnet_block_residuals: Optional[Tuple[jax.Array, ...]] = None,
        skip_layers: Optional[Tuple[int, ...]] = None,  # SLG (SD3.5): static block skip list
    ) -> jax.Array:
        cfg = self.config
        dim = cfg.hidden_size
        p = cfg.patch_size
        batch, height, width, channels = latents.shape
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)

        # 2x2 patchify -> tokens
        x = latents.reshape(batch, height // p, p, width // p, p, channels)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
            batch, (height // p) * (width // p), p * p * channels
        )
        x = LoRADense(dim, name="patch_in", **common, **lora)(x)
        hh, ww = height // p, width // p
        if cfg.pos_embed_max_size:
            # learned grid, center-cropped to the active resolution (diffusers
            # SD3 ``pos_embed`` crop semantics — enables weight import)
            side = cfg.pos_embed_max_size
            table = self.param(
                "pos_embed",
                nn.initializers.normal(stddev=0.02),
                (side, side, dim),
                self.param_dtype,
            )
            top = (side - hh) // 2
            left = (side - ww) // 2
            pos = table[top: top + hh, left: left + ww].reshape(hh * ww, dim)
        else:
            pos = posemb_2d_sincos(hh, ww, dim)
        x = x + pos[None].astype(self.dtype)

        txt = LoRADense(dim, name="context_in", **common, **lora)(context)

        vec = MLPEmbedder(dim, name="time_in", **common)(
            timestep_embedding(timesteps, 256).astype(self.dtype)
        )
        vec = vec + MLPEmbedder(dim, name="pooled_in", **common)(pooled.astype(self.dtype))

        block_cls = nn.remat(MMDiTBlock) if self.remat else MMDiTBlock
        for layer in range(cfg.depth):
            if skip_layers is not None and layer in skip_layers:
                # skip-layer guidance (diffusers SD3.5 skip_guidance_layers):
                # the perturbed forward drops these blocks entirely
                continue
            x, txt = block_cls(
                cfg,
                context_pre_only=(layer == cfg.depth - 1),
                name=f"block_{layer}",
                **common,
                **lora,
            )(x, txt, vec)
            if controlnet_block_residuals is not None:
                # interval-spread residuals (diffusers SD3ControlNetModel:
                # hidden += control_block_samples[i // interval_control])
                n_res = len(controlnet_block_residuals)
                x = x + controlnet_block_residuals[layer * n_res // cfg.depth].astype(x.dtype)

        shift, scale = AdaLayerNormZero(2, name="final_mod", **common)(vec, dim)
        x = modulate(LayerNorm(use_scale=False, use_bias=False, **common)(x), shift, scale)
        x = LoRADense(p * p * channels, name="final_proj", **common)(x)

        # unpatchify
        x = x.reshape(batch, height // p, width // p, p, p, channels)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(batch, height, width, channels)
        return x.astype(jnp.float32)
