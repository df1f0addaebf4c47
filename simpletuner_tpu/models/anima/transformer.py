"""Anima transformer in flax.linen — checkpoint-faithful.

Reference behavior: helpers/models/anima/transformer.py
(``AnimaTransformerModel`` = a Cosmos DiT ``core`` — anima dims 16×128 heads,
28 layers, rope_scale (1,4,4), text_embed_dim 1024 — plus an ``_LLMAdapter``
(:281-327) that translates Qwen3-0.6B hidden states into T5-token-aligned
conditioning):

- Adapter blocks (:240-278): pre-RMS self-attention over the T5-token target
  stream (1D rope, theta 1e4, angles repeated half-wise, rotate-half
  convention :65-66, :190-195), pre-RMS cross-attention into the Qwen source
  stream (target-rope queries, source-rope keys), biased exact-gelu MLP ×4.
- Attention (:198-237): bias-free q/k/v/o with per-head affine RMS norms
  (eps 1e-6 — ``_AnimaRMSNorm`` default).
- Adapter head: embed (T5 vocab 32128) → blocks → ``norm(out_proj(x))``
  (:327); the result is multiplied by optional per-token T5 weights and
  right-padded to 512 before entering the core (:398-401).

The Cosmos core itself lives in ``models/cosmos1/transformer.py``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..cosmos1.transformer import Cosmos1Config, Cosmos1Transformer
from ..layers import LoRADense

Dtype = Any


@dataclasses.dataclass(frozen=True)
class AnimaConfig:
    core: Cosmos1Config = dataclasses.field(default_factory=Cosmos1Config.anima)
    adapter_vocab_size: int = 32128
    adapter_dim: int = 1024
    adapter_layers: int = 6
    adapter_heads: int = 16
    adapter_pad_length: int = 512

    @classmethod
    def tiny(cls) -> "AnimaConfig":
        return cls(
            core=dataclasses.replace(Cosmos1Config.tiny(), text_embed_dim=32),
            adapter_vocab_size=64, adapter_dim=32, adapter_layers=1,
            adapter_heads=2, adapter_pad_length=16,
        )


def _adapter_rope(length: int, head_dim: int):
    """(S, head_dim) half-repeated angles (:179-195)."""
    inv = 1.0 / (10000.0 ** ((2.0 / head_dim) * np.arange(head_dim // 2, dtype=np.float64)))
    ang = np.outer(np.arange(length, dtype=np.float64), inv)
    full = np.concatenate([ang, ang], axis=-1)
    return jnp.asarray(np.cos(full), jnp.float32), jnp.asarray(np.sin(full), jnp.float32)


def _apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate-half over (B, S, H, D); cos/sin (S, D) (:56-66)."""
    half = x.shape[-1] // 2
    rotated = jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    return (x.astype(jnp.float32) * c + rotated.astype(jnp.float32) * s).astype(x.dtype)


def _rms(x: jax.Array, scale: jax.Array, eps: float = 1e-6) -> jax.Array:
    x_f = x.astype(jnp.float32)
    y = x_f * jax.lax.rsqrt(jnp.mean(jnp.square(x_f), -1, keepdims=True) + eps)
    return (y * scale.astype(jnp.float32)).astype(x.dtype)


class AnimaAdapterAttention(nn.Module):
    dim: int
    context_dim: int
    heads: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, key_mask=None, rope_q=None, rope_k=None):
        hd = self.dim // self.heads
        ctx = x if context is None else context
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype, use_bias=False)
        batch = x.shape[0]
        scale = lambda name: self.param(name, nn.initializers.ones, (hd,), self.param_dtype)

        q = LoRADense(self.dim, name="q_proj", **common)(x).reshape(batch, -1, self.heads, hd)
        k = LoRADense(self.dim, name="k_proj", **common)(ctx).reshape(batch, -1, self.heads, hd)
        v = LoRADense(self.dim, name="v_proj", **common)(ctx).reshape(batch, -1, self.heads, hd)
        q = _rms(q, scale("q_norm"))
        k = _rms(k, scale("k_norm"))
        if rope_q is not None:
            q = _apply_rope(q, *rope_q)
            k = _apply_rope(k, *rope_k)
        qf = q.astype(jnp.float32).transpose(0, 2, 1, 3)
        kf = k.astype(jnp.float32).transpose(0, 2, 1, 3)
        vf = v.astype(jnp.float32).transpose(0, 2, 1, 3)
        logits = qf @ kf.transpose(0, 1, 3, 2) / math.sqrt(hd)
        if key_mask is not None:
            logits = jnp.where(key_mask[:, None, None, :], logits, -jnp.inf)
        out = (jax.nn.softmax(logits, -1) @ vf).transpose(0, 2, 1, 3)
        out = out.reshape(batch, -1, self.dim).astype(self.dtype)
        return LoRADense(self.dim, name="o_proj", **common)(out)


class AnimaLLMAdapter(nn.Module):
    """_LLMAdapter (:281-327)."""

    config: AnimaConfig
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, source_hidden, target_ids, target_mask=None, source_mask=None):
        cfg = self.config
        dim = cfg.adapter_dim
        hd = dim // cfg.adapter_heads
        embed = self.param(
            "embed", nn.initializers.normal(stddev=0.02),
            (cfg.adapter_vocab_size, dim), self.param_dtype,
        )
        x = jnp.take(embed, target_ids, axis=0).astype(self.dtype)
        rope_t = _adapter_rope(x.shape[1], hd)
        rope_s = _adapter_rope(source_hidden.shape[1], hd)
        source = source_hidden.astype(self.dtype)
        for i in range(cfg.adapter_layers):
            n1 = self.param(f"block_{i}_norm_self", nn.initializers.ones, (dim,), self.param_dtype)
            x = x + AnimaAdapterAttention(dim, dim, cfg.adapter_heads, self.dtype,
                                          self.param_dtype, name=f"block_{i}_self")(
                _rms(x, n1), key_mask=target_mask, rope_q=rope_t, rope_k=rope_t)
            n2 = self.param(f"block_{i}_norm_cross", nn.initializers.ones, (dim,), self.param_dtype)
            x = x + AnimaAdapterAttention(dim, dim, cfg.adapter_heads, self.dtype,
                                          self.param_dtype, name=f"block_{i}_cross")(
                _rms(x, n2), context=source, key_mask=source_mask,
                rope_q=rope_t, rope_k=rope_s)
            n3 = self.param(f"block_{i}_norm_mlp", nn.initializers.ones, (dim,), self.param_dtype)
            h = LoRADense(dim * 4, use_bias=True, name=f"block_{i}_mlp_in",
                          dtype=self.dtype, param_dtype=self.param_dtype)(_rms(x, n3))
            h = LoRADense(dim, use_bias=True, name=f"block_{i}_mlp_out",
                          dtype=self.dtype, param_dtype=self.param_dtype)(
                nn.gelu(h, approximate=False))
            x = x + h
        x = LoRADense(dim, use_bias=True, name="out_proj", dtype=self.dtype,
                      param_dtype=self.param_dtype)(x)
        final = self.param("norm", nn.initializers.ones, (dim,), self.param_dtype)
        return _rms(x, final)


class AnimaTransformer(nn.Module):
    """Adapter + Cosmos core, one parameter tree (reference
    AnimaTransformerModel.forward :403-453)."""

    config: AnimaConfig = AnimaConfig()
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"
    remat: bool = False

    def setup(self):
        self.llm_adapter = AnimaLLMAdapter(self.config, self.dtype, self.param_dtype)
        self.core = Cosmos1Transformer(
            self.config.core, dtype=self.dtype, param_dtype=self.param_dtype,
            lora_rank=self.lora_rank, lora_alpha=self.lora_alpha,
            lora_algo=self.lora_algo, remat=self.remat,
        )

    def __call__(
        self,
        latents: jax.Array,  # (B, T, H, W, C)
        timesteps: jax.Array,
        text_embeds: jax.Array,  # Qwen3 source hidden states (B, S, adapter_dim)
        t5_ids: jax.Array,  # (B, T5_len) adapter target token ids
        t5_weights: Optional[jax.Array] = None,
    ):
        adapted = self.llm_adapter(text_embeds, t5_ids)
        if t5_weights is not None:
            adapted = adapted * t5_weights[..., None].astype(adapted.dtype)
        pad = self.config.adapter_pad_length - adapted.shape[1]
        if pad > 0:
            adapted = jnp.pad(adapted, ((0, 0), (0, pad), (0, 0)))
        return self.core(latents, timesteps, adapted)
