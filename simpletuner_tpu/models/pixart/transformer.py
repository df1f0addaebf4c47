"""PixArt (alpha/Sigma) DiT in flax.linen — checkpoint-faithful.

Reference behavior: helpers/models/pixart/transformer.py (vendored
PixArtTransformer2DModel, blocks = BasicTransformerBlock with
``ada_norm_single``): 2x2 conv patchify + fixed 2-D sincos position table
(recomputed, never stored), caption tokens through a gelu-tanh projection MLP,
adaLN-single (one 6·dim modulation from the timestep embedding shared by all
blocks, plus a per-block learned ``scale_shift_table``), self-attention →
cross-attention on the *unnormalized* stream → gelu-tanh FFN, and a final
(2, dim) scale-shift table.  PixArt-alpha 1024 additionally embeds resolution
and aspect-ratio (``use_additional_conditions``); Sigma drops them.

TPU-first: the sincos table is computed at trace time from the static bucket
shape (no interpolation state), everything else is dense matmuls on the MXU.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops import dot_product_attention
from ..layers import LayerNorm, LoRADense, MLPEmbedder, timestep_embedding

Dtype = Any


@dataclasses.dataclass(frozen=True)
class PixartConfig:
    in_channels: int = 4
    out_channels: int = 0  # 0 = same as in; PixArt epsilon uses 2x ("learned_range")
    patch_size: int = 2
    hidden_size: int = 1152
    depth: int = 28
    num_heads: int = 16
    head_dim: int = 72
    text_dim: int = 4096
    ffn_ratio: float = 4.0
    # diffusers PatchEmbed sincos parameters: base_size = sample_size // patch,
    # interpolation_scale = max(sample_size // 64, 1)
    base_size: int = 64
    interpolation_scale: int = 2
    use_additional_conditions: bool = False  # PixArt-alpha 1024 only

    @classmethod
    def tiny(cls) -> "PixartConfig":
        return cls(
            hidden_size=64, depth=2, num_heads=2, head_dim=32, text_dim=32,
            base_size=8, interpolation_scale=1,
        )

    @classmethod
    def sigma_1024(cls) -> "PixartConfig":
        return cls(out_channels=8)

    @classmethod
    def sigma_512(cls) -> "PixartConfig":
        return cls(out_channels=8, base_size=32, interpolation_scale=1)

    @property
    def effective_out_channels(self) -> int:
        return self.out_channels or self.in_channels


def _sincos_1d(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    omega = np.arange(embed_dim // 2, dtype=np.float64) / (embed_dim / 2.0)
    omega = 1.0 / 10000 ** omega
    out = np.einsum("m,d->md", pos.reshape(-1), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def sincos_pos_embed_2d(
    embed_dim: int, grid_h: int, grid_w: int, base_size: int, interpolation_scale: float
) -> np.ndarray:
    """diffusers ``get_2d_sincos_pos_embed`` semantics (row-major h, w)."""
    gh = np.arange(grid_h, dtype=np.float64) / (grid_h / base_size) / interpolation_scale
    gw = np.arange(grid_w, dtype=np.float64) / (grid_w / base_size) / interpolation_scale
    grid = np.meshgrid(gw, gh)  # w first, 'xy' indexing — matches diffusers
    grid = np.stack(grid, axis=0).reshape(2, 1, grid_h, grid_w)
    emb_w = _sincos_1d(embed_dim // 2, grid[0])
    emb_h = _sincos_1d(embed_dim // 2, grid[1])
    return np.concatenate([emb_w, emb_h], axis=1)  # (h*w, dim)


class PixartBlock(nn.Module):
    """BasicTransformerBlock(ada_norm_single): self-attn → cross-attn (applied
    to the unnormalized stream, ungated) → gelu-tanh FFN."""

    config: PixartConfig
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"

    @nn.compact
    def __call__(self, x, context, t6):
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
        mods = table[None].astype(jnp.float32) + t6.astype(jnp.float32)  # (B, 6, dim)
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = (
            mods[:, i][:, None, :].astype(self.dtype) for i in range(6)
        )

        # --- self-attention -------------------------------------------------------------
        x_n = LayerNorm(use_scale=False, use_bias=False, **common)(x)
        x_n = x_n * (1 + scale_msa) + shift_msa
        q = LoRADense(inner, name="attn1_q", **common, **lora)(x_n).reshape(heads_shape)
        k = LoRADense(inner, name="attn1_k", **common, **lora)(x_n).reshape(heads_shape)
        v = LoRADense(inner, name="attn1_v", **common, **lora)(x_n).reshape(heads_shape)
        attn = dot_product_attention(q, k, v).reshape(batch, seq, inner)
        x = x + gate_msa * LoRADense(dim, name="attn1_proj", **common, **lora)(attn)

        # --- cross-attention on the raw stream (no norm, no gate) ------------------------
        ctx_shape = (batch, context.shape[1], cfg.num_heads, cfg.head_dim)
        q = LoRADense(inner, name="attn2_q", **common, **lora)(x).reshape(heads_shape)
        k = LoRADense(inner, name="attn2_k", **common, **lora)(context).reshape(ctx_shape)
        v = LoRADense(inner, name="attn2_v", **common, **lora)(context).reshape(ctx_shape)
        attn = dot_product_attention(q, k, v).reshape(batch, seq, inner)
        x = x + LoRADense(dim, name="attn2_proj", **common, **lora)(attn)

        # --- feed-forward ---------------------------------------------------------------
        x_n = LayerNorm(use_scale=False, use_bias=False, **common)(x)
        x_n = x_n * (1 + scale_mlp) + shift_mlp
        h = LoRADense(int(dim * cfg.ffn_ratio), name="ff_in", **common, **lora)(x_n)
        h = nn.gelu(h, approximate=True)
        x = x + gate_mlp * LoRADense(dim, name="ff_out", **common, **lora)(h)
        return x


class PixartTransformer(nn.Module):
    config: PixartConfig = PixartConfig()
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        latents: jax.Array,  # (B, H, W, C)
        timesteps: jax.Array,  # (B,) integer DDPM timesteps
        context: jax.Array,  # (B, L, text_dim)
        controlnet_block_residuals: Optional[Tuple[jax.Array, ...]] = None,
    ) -> jax.Array:
        cfg = self.config
        dim = cfg.hidden_size
        p = cfg.patch_size
        batch, height, width, channels = latents.shape
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        hh, ww = height // p, width // p

        # patchify + fixed sincos position table (recomputed per bucket shape)
        x = latents.reshape(batch, hh, p, ww, p, channels)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(batch, hh * ww, p * p * channels)
        x = LoRADense(dim, name="patch_in", **common, **lora)(x)
        pos = sincos_pos_embed_2d(dim, hh, ww, cfg.base_size, cfg.interpolation_scale)
        x = x + jnp.asarray(pos, self.dtype)[None]

        # caption projection (gelu-tanh MLP)
        txt = LoRADense(dim, name="caption_in_1", **common, **lora)(context)
        txt = nn.gelu(txt, approximate=True)
        txt = LoRADense(dim, name="caption_in_2", **common, **lora)(txt)

        # adaLN-single conditioning
        t_emb = MLPEmbedder(dim, name="time_in", **common)(
            timestep_embedding(timesteps.astype(jnp.float32), 256, time_factor=1.0).astype(self.dtype)
        )
        if cfg.use_additional_conditions:
            size_dim = dim // 3
            res = jnp.asarray(
                [[height * 8, width * 8]] * batch, jnp.float32
            ).reshape(-1)  # (B·2,) pixel-space resolution
            res_emb = MLPEmbedder(size_dim, name="resolution_in", **common)(
                timestep_embedding(res, 256, time_factor=1.0).astype(self.dtype)
            ).reshape(batch, 2 * size_dim)
            ar = jnp.asarray([[height / max(width, 1)]] * batch, jnp.float32).reshape(-1)
            ar_emb = MLPEmbedder(size_dim, name="aspect_in", **common)(
                timestep_embedding(ar, 256, time_factor=1.0).astype(self.dtype)
            ).reshape(batch, size_dim)
            t_emb = t_emb + jnp.concatenate([res_emb, ar_emb], axis=1)
        t6 = LoRADense(6 * dim, name="time_proj", **common)(nn.silu(t_emb)).reshape(-1, 6, dim)

        block_cls = nn.remat(PixartBlock) if self.remat else PixartBlock
        for layer in range(cfg.depth):
            x = block_cls(cfg, name=f"block_{layer}", **common, **lora)(x, txt, t6)
            if controlnet_block_residuals is not None and layer < len(
                controlnet_block_residuals
            ):
                # PixArt-δ semantics: the control branch copies the first N
                # blocks and its block-i output feeds the host's block i+1
                # (reference helpers/models/pixart ControlNet)
                x = x + controlnet_block_residuals[layer].astype(x.dtype)
            self.sow("intermediates", f"block_{layer}_hidden", x)

        # final scale-shift from the *embedded* timestep (pre-linear)
        final_table = self.param(
            "final_scale_shift_table",
            nn.initializers.normal(stddev=1.0 / dim ** 0.5),
            (2, dim),
            self.param_dtype,
        )
        shift, scale = (
            (final_table[None].astype(jnp.float32) + t_emb[:, None, :].astype(jnp.float32))[:, i][:, None, :]
            for i in range(2)
        )
        x = LayerNorm(use_scale=False, use_bias=False, **common)(x)
        x = x * (1 + scale.astype(self.dtype)) + shift.astype(self.dtype)
        out_ch = cfg.effective_out_channels
        x = LoRADense(p * p * out_ch, name="final_proj", **common, **lora)(x)
        x = x.reshape(batch, hh, ww, p, p, out_ch)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(batch, height, width, out_ch)
        # reference trains on the epsilon half of the learned-range head
        return x[..., : cfg.in_channels].astype(jnp.float32)
