"""Lumina2 Next-DiT in flax.linen — checkpoint-faithful.

Reference behavior: helpers/models/lumina2/transformer.py (vendored
``Lumina2Transformer2DModel``): linear patchify (2x2), combined
timestep+caption embedding (256-dim sinusoid → 1024 MLP; RMSNorm + linear
caption projection), two ``context_refiner`` blocks (unmodulated) over caption
tokens and two ``noise_refiner`` blocks (modulated) over image tokens, then a
joint [caption, image] sequence through 26 modulated blocks.  Blocks are
Llama-style: GQA attention (24 q heads / 8 kv heads, per-head RMS q/k norm,
3-axis complex RoPE), SwiGLU feed-forward (fp32 SiLU), sandwich RMSNorms with
tanh-gated residuals, and a 4-way adaLN (scale_msa, gate_msa, scale_mlp,
gate_mlp) from the 1024-dim time embedding.  Final LuminaLayerNormContinuous:
LN(no affine) * (1 + linear(silu(temb))) → linear to p·p·C.

TPU-first: the reference packs each sample's [caption[:eff], image] tokens into
a ragged joint sequence; here the joint sequence keeps the full static caption
length and masks padded caption tokens out of attention with segment ids —
identical math for every valid token, static shapes for XLA.  Padded caption
positions get RoPE angle 0, exactly like the reference's zero-filled
``cap_freqs_cis``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops import dot_product_attention
from ..layers import LoRADense, MLPEmbedder, RMSNorm, timestep_embedding

Dtype = Any


@dataclasses.dataclass(frozen=True)
class Lumina2Config:
    in_channels: int = 16
    patch_size: int = 2
    hidden_size: int = 2304
    depth: int = 26
    refiner_depth: int = 2
    num_heads: int = 24
    num_kv_heads: int = 8
    cap_feat_dim: int = 2304
    multiple_of: int = 256
    ffn_dim_multiplier: float = 0.0  # 0 = unset
    norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    axes_dim: Tuple[int, int, int] = (32, 32, 32)

    @classmethod
    def tiny(cls) -> "Lumina2Config":
        return cls(
            in_channels=4, hidden_size=96, depth=2, refiner_depth=1,
            num_heads=4, num_kv_heads=2, cap_feat_dim=32, multiple_of=32,
            axes_dim=(8, 8, 8),
        )

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def time_dim(self) -> int:
        return min(self.hidden_size, 1024)

    @property
    def ffn_inner(self) -> int:
        # diffusers LuminaFeedForward: inner = 4*dim → 2/3 → multiple_of ceil
        inner = int(2 * (4 * self.hidden_size) / 3)
        if self.ffn_dim_multiplier:
            inner = int(self.ffn_dim_multiplier * inner)
        return self.multiple_of * ((inner + self.multiple_of - 1) // self.multiple_of)


def rope_angles(positions: jax.Array, axes_dim: Tuple[int, ...], theta: float) -> jax.Array:
    """Per-token rotation angles from 3-axis position ids.

    ``positions`` (B, S, n_axes) → (B, S, sum(axes_dim)//2); axis ``i``
    contributes ``axes_dim[i]//2`` frequencies 1/theta^(2k/d) (reference
    ``Lumina2RotaryPosEmbed._precompute_freqs_cis`` via
    ``get_1d_rotary_pos_embed``).
    """
    parts = []
    for i, d in enumerate(axes_dim):
        freqs = 1.0 / theta ** (np.arange(0, d, 2, dtype=np.float64) / d)
        parts.append(positions[..., i : i + 1].astype(jnp.float32) * jnp.asarray(freqs, jnp.float32)[None, None])
    return jnp.concatenate(parts, axis=-1)


def apply_rope_complex(x: jax.Array, angles: jax.Array) -> jax.Array:
    """Interleaved complex rotation (diffusers ``apply_rotary_emb`` with
    ``use_real=False``): consecutive feature pairs rotate by ``angles``."""
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]
    x_f = x.astype(jnp.float32)
    x0, x1 = x_f[..., 0::2], x_f[..., 1::2]
    o0 = x0 * cos - x1 * sin
    o1 = x0 * sin + x1 * cos
    return jnp.stack([o0, o1], axis=-1).reshape(x.shape).astype(x.dtype)


class LuminaFFN(nn.Module):
    """SwiGLU: linear_2(silu_fp32(linear_1(x)) * linear_3(x)), all bias-free."""

    config: Lumina2Config
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        inner = self.config.ffn_inner
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype, use_bias=False)
        gate = LoRADense(inner, name="linear_1", **common, **lora)(x)
        up = LoRADense(inner, name="linear_3", **common, **lora)(x)
        # reference FP32SiLU: the gate nonlinearity runs in fp32
        h = (jax.nn.silu(gate.astype(jnp.float32)) * up.astype(jnp.float32)).astype(self.dtype)
        return LoRADense(self.config.hidden_size, name="linear_2", **common, **lora)(h)


class Lumina2Block(nn.Module):
    """One Next-DiT block (reference ``Lumina2TransformerBlock``).

    ``modulation=True``: 4-way adaLN from temb with tanh-gated sandwich norms;
    ``modulation=False`` (context refiner): plain sandwich RMSNorms.
    """

    config: Lumina2Config
    modulation: bool = True
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"

    @nn.compact
    def __call__(self, x, angles, temb=None, segment_ids=None):
        cfg = self.config
        dim = cfg.hidden_size
        dh = cfg.head_dim
        batch, seq = x.shape[:2]
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        norm = dict(eps=cfg.norm_eps, dtype=self.dtype, param_dtype=self.param_dtype)

        if self.modulation:
            mod = LoRADense(4 * dim, name="norm1_linear", **common)(nn.silu(temb.astype(jnp.float32)).astype(self.dtype))
            scale_msa, gate_msa, scale_mlp, gate_mlp = jnp.split(mod.astype(jnp.float32), 4, axis=-1)
            x_n = RMSNorm(name="norm1_norm", **norm)(x).astype(jnp.float32) * (1 + scale_msa[:, None])
            x_n = x_n.astype(self.dtype)
        else:
            x_n = RMSNorm(name="norm1_norm", **norm)(x)

        # --- GQA attention (bias-free) ---------------------------------------------------
        q = LoRADense(cfg.num_heads * dh, name="attn_q", use_bias=False, **common, **lora)(x_n)
        k = LoRADense(cfg.num_kv_heads * dh, name="attn_k", use_bias=False, **common, **lora)(x_n)
        v = LoRADense(cfg.num_kv_heads * dh, name="attn_v", use_bias=False, **common, **lora)(x_n)
        q = q.reshape(batch, seq, cfg.num_heads, dh)
        k = k.reshape(batch, seq, cfg.num_kv_heads, dh)
        v = v.reshape(batch, seq, cfg.num_kv_heads, dh)
        q = RMSNorm(name="norm_q", eps=1e-5, dtype=self.dtype, param_dtype=self.param_dtype)(q)
        k = RMSNorm(name="norm_k", eps=1e-5, dtype=self.dtype, param_dtype=self.param_dtype)(k)
        q = apply_rope_complex(q, angles)
        k = apply_rope_complex(k, angles)
        n_rep = cfg.num_heads // cfg.num_kv_heads
        if n_rep > 1:
            k = jnp.repeat(k, n_rep, axis=2)
            v = jnp.repeat(v, n_rep, axis=2)
        attn = dot_product_attention(
            q, k, v, q_segment_ids=segment_ids, kv_segment_ids=segment_ids
        ).reshape(batch, seq, cfg.num_heads * dh)
        attn = LoRADense(dim, name="attn_proj", use_bias=False, **common, **lora)(attn)

        if self.modulation:
            x = x + jnp.tanh(gate_msa)[:, None].astype(self.dtype) * RMSNorm(name="norm2", **norm)(attn)
            h = RMSNorm(name="ffn_norm1", **norm)(x).astype(jnp.float32) * (1 + scale_mlp[:, None])
            mlp = LuminaFFN(cfg, name="feed_forward", **common, **lora)(h.astype(self.dtype))
            x = x + jnp.tanh(gate_mlp)[:, None].astype(self.dtype) * RMSNorm(name="ffn_norm2", **norm)(mlp)
        else:
            x = x + RMSNorm(name="norm2", **norm)(attn)
            mlp = LuminaFFN(cfg, name="feed_forward", **common, **lora)(
                RMSNorm(name="ffn_norm1", **norm)(x)
            )
            x = x + RMSNorm(name="ffn_norm2", **norm)(mlp)
        return x


class Lumina2Transformer(nn.Module):
    config: Lumina2Config = Lumina2Config()
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
        timesteps: jax.Array,  # (B,) already normalized (model.py passes 1 - σ)
        context: jax.Array,  # (B, L, cap_feat_dim)
        context_mask: Optional[jax.Array] = None,  # (B, L) 1 = valid
    ) -> jax.Array:
        cfg = self.config
        dim = cfg.hidden_size
        p = cfg.patch_size
        batch, height, width, channels = latents.shape
        hh, ww = height // p, width // p
        img_len = hh * ww
        cap_len = context.shape[1]
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        if context_mask is None:
            context_mask = jnp.ones((batch, cap_len), jnp.int32)
        context_mask = context_mask.astype(jnp.int32)

        # --- conditioning ---------------------------------------------------------------
        t_emb = MLPEmbedder(cfg.time_dim, name="time_in", **common)(
            timestep_embedding(timesteps.astype(jnp.float32), 256, time_factor=1.0).astype(self.dtype)
        )
        cap = RMSNorm(name="cap_norm", eps=cfg.norm_eps, **common)(context.astype(self.dtype))
        cap = LoRADense(dim, name="cap_in", **common, **lora)(cap)

        # --- patchify -------------------------------------------------------------------
        x = latents.astype(self.dtype).reshape(batch, hh, p, ww, p, channels)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(batch, img_len, p * p * channels)
        x = LoRADense(dim, name="patch_in", **common, **lora)(x)

        # --- position ids → RoPE angles (reference Lumina2RotaryPosEmbed) ---------------
        eff_cap = jnp.sum(context_mask, axis=1)  # (B,)
        cap_pos0 = (jnp.cumsum(context_mask, axis=1) - 1) * context_mask  # pad → angle 0
        cap_positions = jnp.stack(
            [cap_pos0, jnp.zeros_like(cap_pos0), jnp.zeros_like(cap_pos0)], axis=-1
        )
        rows = jnp.repeat(jnp.arange(hh, dtype=jnp.int32), ww)
        cols = jnp.tile(jnp.arange(ww, dtype=jnp.int32), hh)
        img_positions = jnp.stack(
            [
                jnp.broadcast_to(eff_cap[:, None], (batch, img_len)),
                jnp.broadcast_to(rows[None], (batch, img_len)),
                jnp.broadcast_to(cols[None], (batch, img_len)),
            ],
            axis=-1,
        )
        cap_angles = rope_angles(cap_positions, cfg.axes_dim, cfg.rope_theta)
        img_angles = rope_angles(img_positions, cfg.axes_dim, cfg.rope_theta)

        # --- refiners -------------------------------------------------------------------
        block = dict(**common, **lora)
        ctx_cls = nn.remat(Lumina2Block) if self.remat else Lumina2Block
        for layer in range(cfg.refiner_depth):
            cap = ctx_cls(cfg, modulation=False, name=f"context_refiner_{layer}", **block)(
                cap, cap_angles, None, context_mask
            )
        for layer in range(cfg.refiner_depth):
            x = ctx_cls(cfg, modulation=True, name=f"noise_refiner_{layer}", **block)(
                x, img_angles, t_emb, None
            )

        # --- joint sequence [caption, image]; padded caption tokens masked --------------
        joint = jnp.concatenate([cap, x], axis=1)
        joint_angles = jnp.concatenate([cap_angles, img_angles], axis=1)
        segment_ids = jnp.concatenate(
            [context_mask, jnp.ones((batch, img_len), jnp.int32)], axis=1
        )
        # skip masking when every caption is full (reference `use_mask`)
        for layer in range(cfg.depth):
            joint = ctx_cls(cfg, modulation=True, name=f"layer_{layer}", **block)(
                joint, joint_angles, t_emb, segment_ids
            )
            self.sow("intermediates", f"layer_{layer}_hidden", joint[:, cap_len:])

        # --- final norm + projection (LuminaLayerNormContinuous) ------------------------
        emb = LoRADense(dim, name="final_mod", **common)(
            nn.silu(t_emb.astype(jnp.float32)).astype(self.dtype)
        )
        x = joint[:, cap_len:]
        x_f = x.astype(jnp.float32)
        mean = jnp.mean(x_f, axis=-1, keepdims=True)
        var = jnp.var(x_f, axis=-1, keepdims=True)
        x_n = (x_f - mean) * jax.lax.rsqrt(var + 1e-6)
        x_n = x_n * (1 + emb.astype(jnp.float32)[:, None])
        out = LoRADense(p * p * channels, name="final_proj", **common, **lora)(x_n.astype(self.dtype))
        out = out.reshape(batch, hh, ww, p, p, channels)
        out = jnp.transpose(out, (0, 1, 3, 2, 4, 5)).reshape(batch, height, width, channels)
        return out.astype(jnp.float32)
