"""Compact Llama-style causal transformer for the HeartMuLa music LM.

Reference: helpers/models/heartmula/modeling_heartmula.py:27 ``_LLAMA_FLAVORS``
+ ``_build_llama_config`` — RMSNorm, llama3-scaled RoPE (θ=500k, factor 32),
grouped-query attention, SwiGLU MLP, no biases.

TPU notes: attention runs through ``jax.nn.dot_product_attention`` (fused on
TPU) with an explicit causal+padding mask; KV heads are repeated to full head
count before the kernel (GQA); all projections are LoRA-aware.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers import LoRADense

Dtype = jnp.dtype


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    num_layers: int = 28
    num_heads: int = 24
    num_kv_heads: int = 8
    embed_dim: int = 3072
    intermediate_dim: int = 8192
    max_seq_len: int = 8192
    rope_theta: float = 500000.0
    rope_factor: float = 32.0
    rope_low_freq_factor: float = 1.0
    rope_high_freq_factor: float = 4.0

    @classmethod
    def flavor(cls, name: str) -> "LlamaConfig":
        table = {
            "llama-3B": cls(),
            "llama-300M": cls(num_layers=3, num_heads=8, num_kv_heads=4, max_seq_len=2048),
            "llama-7B": cls(num_layers=32, num_heads=32, embed_dim=4096, intermediate_dim=14336),
            "llama-400M": cls(num_layers=4, num_heads=8, num_kv_heads=4, max_seq_len=2048),
        }
        if name not in table:
            raise ValueError(f"unsupported HeartMuLa Llama flavor {name!r}")
        return table[name]

    @classmethod
    def tiny(cls) -> "LlamaConfig":
        return cls(num_layers=2, num_heads=2, num_kv_heads=1, embed_dim=32,
                   intermediate_dim=64, max_seq_len=128)


def _llama3_inv_freq(cfg: LlamaConfig, head_dim: int) -> jax.Array:
    """llama3 rope scaling (reference modeling_heartmula.py:68 rope_scaling)."""
    inv = 1.0 / (cfg.rope_theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    wavelen = 2.0 * jnp.pi / inv
    low_wl = cfg.max_seq_len / cfg.rope_low_freq_factor
    high_wl = cfg.max_seq_len / cfg.rope_high_freq_factor
    smooth = (cfg.max_seq_len / wavelen - cfg.rope_low_freq_factor) / (
        cfg.rope_high_freq_factor - cfg.rope_low_freq_factor
    )
    smooth = jnp.clip(smooth, 0.0, 1.0)
    scaled = (1.0 - smooth) * inv / cfg.rope_factor + smooth * inv
    return jnp.where(wavelen > low_wl, inv / cfg.rope_factor,
                     jnp.where(wavelen < high_wl, inv, scaled))


def _apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos + rotated * sin


class RMSNorm(nn.Module):
    eps: float = 1e-5
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), self.param_dtype)
        norm = x * jax.lax.rsqrt(jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True) + self.eps)
        return (norm * scale).astype(x.dtype)


class LlamaBlock(nn.Module):
    config: LlamaConfig
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None

    @nn.compact
    def __call__(self, x, cos, sin, mask):
        cfg = self.config
        head_dim = cfg.embed_dim // cfg.num_heads
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype, use_bias=False,
                      lora_rank=self.lora_rank, lora_alpha=self.lora_alpha)
        batch, seq = x.shape[0], x.shape[1]

        h = RMSNorm(param_dtype=self.param_dtype, name="sa_norm")(x)
        q = LoRADense(cfg.num_heads * head_dim, name="q_proj", **common)(h)
        k = LoRADense(cfg.num_kv_heads * head_dim, name="k_proj", **common)(h)
        v = LoRADense(cfg.num_kv_heads * head_dim, name="v_proj", **common)(h)
        q = q.reshape(batch, seq, cfg.num_heads, head_dim)
        k = k.reshape(batch, seq, cfg.num_kv_heads, head_dim)
        v = v.reshape(batch, seq, cfg.num_kv_heads, head_dim)
        q = _apply_rope(q, cos, sin)
        k = _apply_rope(k, cos, sin)
        repeat = cfg.num_heads // cfg.num_kv_heads
        if repeat > 1:  # GQA: expand KV heads for the fused kernel
            k = jnp.repeat(k, repeat, axis=2)
            v = jnp.repeat(v, repeat, axis=2)
        attn = jax.nn.dot_product_attention(q, k, v, mask=mask, is_causal=mask is None)
        attn = attn.reshape(batch, seq, cfg.num_heads * head_dim)
        x = x + LoRADense(cfg.embed_dim, name="o_proj", **common)(attn)

        h = RMSNorm(param_dtype=self.param_dtype, name="mlp_norm")(x)
        gate = LoRADense(cfg.intermediate_dim, name="w1", **common)(h)
        up = LoRADense(cfg.intermediate_dim, name="w3", **common)(h)
        return x + LoRADense(cfg.embed_dim, name="w2", **common)(nn.silu(gate) * up)


class LlamaTransformer(nn.Module):
    """Stack over pre-computed input embeddings (no vocab head)."""

    config: LlamaConfig
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    remat: bool = False

    @nn.compact
    def __call__(self, inputs_embeds: jax.Array, attention_mask: Optional[jax.Array] = None):
        cfg = self.config
        head_dim = cfg.embed_dim // cfg.num_heads
        seq = inputs_embeds.shape[1]
        inv_freq = _llama3_inv_freq(cfg, head_dim)
        pos = jnp.arange(seq, dtype=jnp.float32)
        freqs = jnp.outer(pos, inv_freq)
        emb = jnp.concatenate([freqs, freqs], axis=-1)
        cos = jnp.cos(emb)[None, :, None, :].astype(self.dtype)
        sin = jnp.sin(emb)[None, :, None, :].astype(self.dtype)

        mask = None
        if attention_mask is not None:
            causal = jnp.tril(jnp.ones((seq, seq), jnp.bool_))
            pad = attention_mask.astype(jnp.bool_)[:, None, None, :]  # keys
            mask = causal[None, None, :, :] & pad

        block = nn.remat(LlamaBlock) if self.remat else LlamaBlock
        x = inputs_embeds.astype(self.dtype)
        for i in range(cfg.num_layers):
            x = block(
                cfg, dtype=self.dtype, param_dtype=self.param_dtype,
                lora_rank=self.lora_rank, lora_alpha=self.lora_alpha,
                name=f"layers_{i}",
            )(x, cos, sin, mask)
        return RMSNorm(param_dtype=self.param_dtype, name="norm")(x)
