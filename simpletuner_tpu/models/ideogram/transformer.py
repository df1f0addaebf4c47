"""Ideogram-4 packed-sequence DiT in flax.linen — checkpoint-faithful.

Reference behavior: helpers/models/ideogram/transformer.py
(``Ideogram4Transformer``, the Ideogram v3/4 FP8-first flow backbone):

- One packed sequence carries BOTH conditioning and image tokens, tagged by a
  per-token ``indicator`` (LLM_TOKEN=3, OUTPUT_IMAGE=2; constants.py:3-4).
  LLM features are zeroed on image positions and vice versa (:432-435); a
  2-row indicator embedding is added (:465-466).
- Conditioning: Qwen3-VL features from 13 tapped layers CONCATENATED on the
  feature axis (constants.py:11 — 13·4096), RMS-normed then projected
  (:304-305, :460-461).
- Time: ``Ideogram4EmbedScalar`` (:251-267) — t∈[0,1] scaled by 1e4, SIN-first
  sinusoid with freq denominator (half-1), SiLU MLP; then
  ``adaln_input = silu(adaln_proj(t_cond))`` (:455) shared by all blocks.
- Blocks (:193-236): fused bias-free qkv + per-head RMS q/k norms +
  interleaved mRoPE (theta 5e6, sections (24,20,20) — the cosmos3
  convention), block-diagonal segment-id masking, 4-param modulation
  [scale_msa, tanh-gate_msa, scale_mlp, tanh-gate_mlp] with RMS norms applied
  to the attention/FFN OUTPUTS (:234-235), SwiGLU FFN (w1/w3 gate, w2 down).
- Final layer (:270-279): parameter-free LN(eps 1e-6) scaled by
  ``1 + adaln_modulation(silu(c))`` then a biased linear to in_channels.

Timesteps may be per-sample (B,) or tokenwise (B, L) (:437-454).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..layers import LoRADense

Dtype = Any

OUTPUT_IMAGE_INDICATOR = 2
LLM_TOKEN_INDICATOR = 3
IMAGE_POSITION_OFFSET = 65536  # constants.py:8
QWEN3_VL_ACTIVATION_LAYERS = (0, 3, 6, 9, 12, 15, 18, 21, 24, 27, 30, 33, 35)


@dataclasses.dataclass(frozen=True)
class IdeogramConfig:
    emb_dim: int = 4608
    num_layers: int = 34
    num_heads: int = 18
    intermediate_size: int = 12288
    adanln_dim: int = 512
    in_channels: int = 128  # 32ch DC-AE latents, 2x2-packed
    llm_hidden: int = 4096
    llm_taps: int = len(QWEN3_VL_ACTIVATION_LAYERS)
    rope_theta: float = 5_000_000.0
    mrope_section: Tuple[int, int, int] = (24, 20, 20)
    norm_eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.emb_dim // self.num_heads

    @property
    def llm_features_dim(self) -> int:
        return self.llm_hidden * self.llm_taps

    @classmethod
    def tiny(cls) -> "IdeogramConfig":
        return cls(
            emb_dim=32, num_layers=2, num_heads=2, intermediate_size=64,
            adanln_dim=16, in_channels=16, llm_hidden=32, llm_taps=3,
            mrope_section=(4, 2, 2),
        )


def ideogram_mrope(config: IdeogramConfig, position_ids: jax.Array):
    """(B, L, 3) ids → cos/sin (B, L, head_dim), interleaved mRoPE in the
    rotate-half convention (reference Ideogram4MRoPE :77-125 — identical math
    to the cosmos3 Qwen-VL rope)."""
    hd = config.head_dim
    inv_freq = 1.0 / (config.rope_theta ** (np.arange(0, hd, 2, dtype=np.float64) / hd))
    freqs = position_ids.astype(jnp.float32).transpose(2, 0, 1)[:, :, :, None] * \
        jnp.asarray(inv_freq, jnp.float32)[None, None, None]
    # freqs (3, B, L, hd/2) → interleave H/W chunks
    idx = np.arange(hd // 2)
    h_sel = (idx % 3 == 1) & (idx < config.mrope_section[1] * 3)
    w_sel = (idx % 3 == 2) & (idx < config.mrope_section[2] * 3)
    mixed = freqs[0]
    mixed = jnp.where(jnp.asarray(h_sel)[None, None], freqs[1], mixed)
    mixed = jnp.where(jnp.asarray(w_sel)[None, None], freqs[2], mixed)
    emb = jnp.concatenate([mixed, mixed], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def _rms(x: jax.Array, scale: jax.Array, eps: float) -> jax.Array:
    x_f = x.astype(jnp.float32)
    y = x_f * jax.lax.rsqrt(jnp.mean(jnp.square(x_f), -1, keepdims=True) + eps)
    return (y * scale.astype(jnp.float32)).astype(x.dtype)


class IdeogramBlock(nn.Module):
    config: IdeogramConfig
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"

    @nn.compact
    def __call__(self, x, segment_ids, cos, sin, adaln_input):
        cfg = self.config
        heads, hd = cfg.num_heads, cfg.head_dim
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype, use_bias=False)
        batch, seq = x.shape[:2]

        scale = lambda name, dim: self.param(name, nn.initializers.ones, (dim,), self.param_dtype)
        mod = LoRADense(4 * cfg.emb_dim, name="adaln_modulation", use_bias=True,
                        dtype=jnp.float32, param_dtype=self.param_dtype)(
            adaln_input.astype(jnp.float32))
        scale_msa, gate_msa, scale_mlp, gate_mlp = jnp.split(mod, 4, axis=-1)
        gate_msa = jnp.tanh(gate_msa)
        gate_mlp = jnp.tanh(gate_mlp)

        h = (_rms(x, scale("attention_norm1", cfg.emb_dim), cfg.norm_eps).astype(jnp.float32)
             * (1.0 + scale_msa)).astype(x.dtype)
        qkv = LoRADense(3 * cfg.emb_dim, name="qkv", **common, **lora)(h)
        qkv = qkv.reshape(batch, seq, 3, heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = _rms(q, scale("norm_q", hd), 1e-5)
        k = _rms(k, scale("norm_k", hd), 1e-5)
        q = q * cos[:, :, None] + _rotate_half(q) * sin[:, :, None]
        k = k * cos[:, :, None] + _rotate_half(k) * sin[:, :, None]

        mask = segment_ids[:, :, None] == segment_ids[:, None, :]
        qf = q.astype(jnp.float32).transpose(0, 2, 1, 3)
        kf = k.astype(jnp.float32).transpose(0, 2, 1, 3)
        vf = v.astype(jnp.float32).transpose(0, 2, 1, 3)
        logits = qf @ kf.transpose(0, 1, 3, 2) / math.sqrt(hd)
        logits = jnp.where(mask[:, None], logits, -jnp.inf)
        attn = (jax.nn.softmax(logits, axis=-1) @ vf).transpose(0, 2, 1, 3)
        attn = attn.reshape(batch, seq, cfg.emb_dim).astype(self.dtype)
        attn = LoRADense(cfg.emb_dim, name="o", **common, **lora)(attn)
        attn = _rms(attn, scale("attention_norm2", cfg.emb_dim), cfg.norm_eps)
        x = (x.astype(jnp.float32) + gate_msa * attn.astype(jnp.float32)).astype(x.dtype)

        h = (_rms(x, scale("ffn_norm1", cfg.emb_dim), cfg.norm_eps).astype(jnp.float32)
             * (1.0 + scale_mlp)).astype(x.dtype)
        w1 = LoRADense(cfg.intermediate_size, name="w1", **common, **lora)(h)
        w3 = LoRADense(cfg.intermediate_size, name="w3", **common, **lora)(h)
        ff = LoRADense(cfg.emb_dim, name="w2", **common, **lora)(nn.silu(w1) * w3)
        ff = _rms(ff, scale("ffn_norm2", cfg.emb_dim), cfg.norm_eps)
        return (x.astype(jnp.float32) + gate_mlp * ff.astype(jnp.float32)).astype(x.dtype)


class IdeogramTransformer(nn.Module):
    config: IdeogramConfig = IdeogramConfig()
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        llm_features: jax.Array,  # (B, L, llm_features_dim)
        x: jax.Array,  # (B, L, in_channels) noise tokens
        t: jax.Array,  # (B,) or (B, L) flow time in [0, 1]
        position_ids: jax.Array,  # (B, L, 3)
        segment_ids: jax.Array,  # (B, L)
        indicator: jax.Array,  # (B, L) ∈ {LLM_TOKEN(3), OUTPUT_IMAGE(2)}
    ):
        cfg = self.config
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)

        llm_mask = (indicator == LLM_TOKEN_INDICATOR).astype(self.dtype)[..., None]
        img_mask = (indicator == OUTPUT_IMAGE_INDICATOR).astype(self.dtype)[..., None]

        x = LoRADense(cfg.emb_dim, name="input_proj", use_bias=True, **common, **lora)(
            x.astype(self.dtype) * img_mask
        ) * img_mask

        # t embedding: sin-first sinusoid of 1e4·t with (half-1) freq denominator
        half = cfg.emb_dim // 2
        freq = jnp.exp(jnp.arange(half, dtype=jnp.float32) * (-math.log(1e4) / (half - 1)))
        scaled = 1e4 * t.astype(jnp.float32)
        args = scaled[..., None] * freq
        emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
        t_cond = LoRADense(cfg.emb_dim, name="t_in", use_bias=True, dtype=jnp.float32,
                           param_dtype=self.param_dtype)(emb)
        t_cond = LoRADense(cfg.emb_dim, name="t_out", use_bias=True, dtype=jnp.float32,
                           param_dtype=self.param_dtype)(nn.silu(t_cond))
        if t.ndim == 1:
            t_cond = t_cond[:, None]
        adaln_input = nn.silu(
            LoRADense(cfg.adanln_dim, name="adaln_proj", use_bias=True, dtype=jnp.float32,
                      param_dtype=self.param_dtype)(t_cond)
        )

        cond_scale = self.param("llm_cond_norm", nn.initializers.ones,
                                (cfg.llm_features_dim,), self.param_dtype)
        llm = _rms(llm_features.astype(self.dtype) * llm_mask, cond_scale, 1e-6)
        llm = LoRADense(cfg.emb_dim, name="llm_cond_proj", use_bias=True, **common, **lora)(llm)
        llm = llm * llm_mask

        h = x + llm
        indicator_table = self.param(
            "embed_image_indicator", nn.initializers.normal(stddev=0.02),
            (2, cfg.emb_dim), self.param_dtype,
        )
        h = h + jnp.take(
            indicator_table, (indicator == OUTPUT_IMAGE_INDICATOR).astype(jnp.int32), axis=0
        ).astype(self.dtype)

        cos, sin = ideogram_mrope(cfg, position_ids)

        block_cls = nn.remat(IdeogramBlock) if self.remat else IdeogramBlock
        for i in range(cfg.num_layers):
            h = block_cls(cfg, **common, **lora, name=f"layer_{i}")(
                h, segment_ids, cos, sin, adaln_input
            )
            self.sow("intermediates", f"layer_{i}_hidden", h)

        # final: LN (no affine, eps 1e-6) scaled by 1 + mod(silu(adaln_input))
        h_f = h.astype(jnp.float32)
        mean = h_f.mean(-1, keepdims=True)
        h_f = (h_f - mean) * jax.lax.rsqrt(h_f.var(-1, keepdims=True) + 1e-6)
        final_scale = 1.0 + LoRADense(
            cfg.emb_dim, name="final_adaln", use_bias=True, dtype=jnp.float32,
            param_dtype=self.param_dtype,
        )(nn.silu(adaln_input))
        out = LoRADense(cfg.in_channels, name="final_linear", use_bias=True, **common, **lora)(
            (h_f * final_scale).astype(self.dtype)
        )
        return out.astype(jnp.float32)
