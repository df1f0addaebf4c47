"""LTX-Video DiT in flax.linen — checkpoint-faithful.

Reference behavior: helpers/models/ltxvideo/transformer.py (vendored
LTXVideoTransformer3DModel): (1,1,1)-patch tokens straight from the 128-ch
causal-VAE latents through ``proj_in``, adaLN-single time conditioning with
per-block (6, dim) scale-shift tables, blocks of [RMS-norm self-attention with
LTX's full-inner-dim rotary + affine across-heads qk RMSNorms] →
[cross-attention on the *raw* stream, also qk-normed] → [gelu-tanh FFN], and a
final (2, dim) table over the *embedded* timestep.

LTX rotary: dim//6 log-spaced frequencies per (t, h, w) axis over coordinates
normalized by (1/latent_frame_rate, 32, 32) and mapped to (2·coord − 1), with
interleaved cos/sin pairs applied to the flattened inner dim BEFORE the head
split (reference LTXVideoRotaryPosEmbed + LTXVideoAttnProcessor).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops import dot_product_attention
from ..layers import LayerNorm, LoRADense, MLPEmbedder, RMSNorm, timestep_embedding

Dtype = Any


@dataclasses.dataclass(frozen=True)
class LTXConfig:
    in_channels: int = 128
    out_channels: int = 128
    patch: Tuple[int, int, int] = (1, 1, 1)  # latent cells are already 32x32x8 px
    hidden_size: int = 2048
    depth: int = 28
    num_heads: int = 32
    head_dim: int = 64
    text_dim: int = 4096     # caption_channels (T5-XXL)
    cross_dim: int = 2048    # cross_attention_dim
    ffn_ratio: float = 4.0
    rope_theta: float = 10000.0
    base_num_frames: int = 20
    base_height: int = 2048
    base_width: int = 2048
    frame_rate: float = 25.0

    @classmethod
    def tiny(cls) -> "LTXConfig":
        return cls(
            in_channels=8, out_channels=8, hidden_size=64, depth=2, num_heads=2,
            head_dim=32, text_dim=32, cross_dim=64,
        )


def ltx_rope(cfg: LTXConfig, t: int, h: int, w: int) -> Tuple[np.ndarray, np.ndarray]:
    """(seq, inner) cos/sin tables, LTXVideoRotaryPosEmbed semantics."""
    inner = cfg.num_heads * cfg.head_dim
    latent_frame_rate = cfg.frame_rate / 8.0
    scale = (1.0 / latent_frame_rate, 32.0, 32.0)
    grid_f, grid_h, grid_w = np.meshgrid(
        np.arange(t, dtype=np.float64),
        np.arange(h, dtype=np.float64),
        np.arange(w, dtype=np.float64),
        indexing="ij",
    )
    grid = np.stack(
        [
            grid_f * scale[0] * 1.0 / cfg.base_num_frames,
            grid_h * scale[1] * 1.0 / cfg.base_height,
            grid_w * scale[2] * 1.0 / cfg.base_width,
        ],
        axis=0,
    ).reshape(3, -1).T  # (seq, 3)

    n_freqs = inner // 6
    freqs = cfg.rope_theta ** np.linspace(
        math.log(1.0, cfg.rope_theta), math.log(cfg.rope_theta, cfg.rope_theta), n_freqs
    )
    freqs = freqs * math.pi / 2.0
    # (seq, 3, n_freqs) -> transpose -> (seq, n_freqs, 3) -> flatten
    args = freqs[None, None, :] * (grid[:, :, None] * 2.0 - 1.0)
    args = np.swapaxes(args, 1, 2).reshape(grid.shape[0], -1)
    cos = np.repeat(np.cos(args), 2, axis=-1)
    sin = np.repeat(np.sin(args), 2, axis=-1)
    pad = inner % 6
    if pad:
        cos = np.concatenate([np.ones_like(cos[:, :pad]), cos], axis=-1)
        sin = np.concatenate([np.zeros_like(sin[:, :pad]), sin], axis=-1)
    return cos.astype(np.float32), sin.astype(np.float32)


def _apply_ltx_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: (B, S, inner); interleaved pairs (diffusers apply_rotary_emb with
    use_real_unbind_dim=-1 on repeated-interleave tables)."""
    xf = x.astype(jnp.float32)
    x1 = xf[..., 0::2]
    x2 = xf[..., 1::2]
    rotated = jnp.stack([-x2, x1], axis=-1).reshape(xf.shape)
    return (xf * cos[None] + rotated * sin[None]).astype(x.dtype)


class LTXBlock(nn.Module):
    config: LTXConfig
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"

    @nn.compact
    def __call__(self, x, context, t6, rope):
        cfg = self.config
        dim = cfg.hidden_size
        inner = cfg.num_heads * cfg.head_dim
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        batch, seq = x.shape[:2]
        cos, sin = rope

        table = self.param(
            "scale_shift_table",
            nn.initializers.normal(stddev=1.0 / dim ** 0.5),
            (6, dim),
            self.param_dtype,
        )
        if t6.ndim == 4:
            # per-frame conditioning (i2v first-frame protection, reference
            # ltxvideo/__init__.py:65 apply_first_frame_protection): t6 is
            # (B, frames, 6, dim); every token of a frame shares its mods
            mods = table[None, None].astype(jnp.float32) + t6.astype(jnp.float32)
            mods = jnp.repeat(mods, seq // mods.shape[1], axis=1)  # (B, seq, 6, dim)
            shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = (
                mods[:, :, i].astype(self.dtype) for i in range(6)
            )
        else:
            mods = table[None].astype(jnp.float32) + t6.astype(jnp.float32)  # (B, 6, dim)
            shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = (
                mods[:, i][:, None, :].astype(self.dtype) for i in range(6)
            )

        # --- self-attention (rope over flattened inner dim, across-head qk RMS) ---------
        x_n = RMSNorm(use_scale=False, **common)(x)
        x_n = x_n * (1 + scale_msa) + shift_msa
        q = LoRADense(inner, name="attn1_q", **common, **lora)(x_n)
        k = LoRADense(inner, name="attn1_k", **common, **lora)(x_n)
        v = LoRADense(inner, name="attn1_v", **common, **lora)(x_n)
        q = RMSNorm(name="attn1_norm_q", **common)(q)
        k = RMSNorm(name="attn1_norm_k", **common)(k)
        q = _apply_ltx_rope(q, cos, sin)
        k = _apply_ltx_rope(k, cos, sin)
        shape = (batch, seq, cfg.num_heads, cfg.head_dim)
        attn = dot_product_attention(
            q.reshape(shape), k.reshape(shape), v.reshape(shape)
        ).reshape(batch, seq, inner)
        x = x + gate_msa * LoRADense(dim, name="attn1_proj", **common, **lora)(attn)

        # --- cross-attention on the raw stream (qk-normed, ungated) ---------------------
        q = LoRADense(inner, name="attn2_q", **common, **lora)(x)
        k = LoRADense(inner, name="attn2_k", **common, **lora)(context)
        v = LoRADense(inner, name="attn2_v", **common, **lora)(context)
        q = RMSNorm(name="attn2_norm_q", **common)(q)
        k = RMSNorm(name="attn2_norm_k", **common)(k)
        ctx_shape = (batch, context.shape[1], cfg.num_heads, cfg.head_dim)
        attn = dot_product_attention(
            q.reshape(shape), k.reshape(ctx_shape), v.reshape(ctx_shape)
        ).reshape(batch, seq, inner)
        x = x + LoRADense(dim, name="attn2_proj", **common, **lora)(attn)

        # --- gelu-tanh FFN ---------------------------------------------------------------
        x_f = RMSNorm(use_scale=False, **common)(x)
        x_f = x_f * (1 + scale_mlp) + shift_mlp
        h = LoRADense(int(dim * cfg.ffn_ratio), name="ff_in", **common, **lora)(x_f)
        h = nn.gelu(h, approximate=True)
        x = x + gate_mlp * LoRADense(dim, name="ff_out", **common, **lora)(h)
        return x


class LTXTransformer(nn.Module):
    config: LTXConfig = LTXConfig()
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        latents: jax.Array,  # (B, T, H, W, C)
        timesteps: jax.Array,  # (B,) sigma in [0, 1], or (B, T) per-frame
        context: jax.Array,  # (B, L, text_dim)
    ) -> jax.Array:
        cfg = self.config
        dim = cfg.hidden_size
        batch, t, h, w, channels = latents.shape
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)

        x = latents.reshape(batch, t * h * w, channels)
        x = LoRADense(dim, name="patch_in", **common, **lora)(x)

        txt = LoRADense(dim, name="caption_in_1", **common, **lora)(context)
        txt = nn.gelu(txt, approximate=True)
        txt = LoRADense(dim, name="caption_in_2", **common, **lora)(txt)

        per_frame = timesteps.ndim == 2
        t_flat = timesteps.reshape(-1)  # (B,) or (B*T,)
        t_emb = MLPEmbedder(dim, name="time_in", **common)(
            timestep_embedding(t_flat, 256).astype(self.dtype)
        )
        t6 = LoRADense(6 * dim, name="time_proj", **common)(nn.silu(t_emb))
        if per_frame:
            t6 = t6.reshape(batch, t, 6, dim)
            t_emb = t_emb.reshape(batch, t, dim)
        else:
            t6 = t6.reshape(-1, 6, dim)

        cos, sin = ltx_rope(cfg, t, h, w)
        rope = (jnp.asarray(cos), jnp.asarray(sin))

        block_cls = nn.remat(LTXBlock) if self.remat else LTXBlock
        for layer in range(cfg.depth):
            x = block_cls(cfg, name=f"block_{layer}", **common, **lora)(x, txt, t6, rope)
            self.sow("intermediates", f"block_{layer}_hidden", x)

        final_table = self.param(
            "final_scale_shift_table",
            nn.initializers.normal(stddev=1.0 / dim ** 0.5),
            (2, dim),
            self.param_dtype,
        )
        if per_frame:
            final = final_table[None, None].astype(jnp.float32) + t_emb[:, :, None, :].astype(jnp.float32)
            final = jnp.repeat(final, h * w, axis=1)  # (B, seq, 2, dim)
            shift = final[:, :, 0].astype(self.dtype)
            scale = final[:, :, 1].astype(self.dtype)
        else:
            final = final_table[None].astype(jnp.float32) + t_emb[:, None, :].astype(jnp.float32)
            shift = final[:, 0][:, None, :].astype(self.dtype)
            scale = final[:, 1][:, None, :].astype(self.dtype)
        x = LayerNorm(use_scale=False, use_bias=False, **common)(x)
        x = x * (1 + scale) + shift
        x = LoRADense(cfg.out_channels, name="final_proj", **common)(x)
        return x.reshape(batch, t, h, w, cfg.out_channels).astype(jnp.float32)
