"""OmniGen: unified multimodal DiT on a Phi-3 language-model backbone.

Reference: helpers/models/omnigen/transformer.py:313 (OmniGenTransformer2DModel)
— one joint token sequence [prompt token embeds | time token | image patch
tokens] through Phi-3-style blocks (RMSNorm → GQA attention with su-scaled
RoPE → RMSNorm → fused gate_up SwiGLU); the time embedding enters as a
sequence token plus a final AdaLN over the image tokens.  Attention is causal
over the sequence with a bidirectional island over the output-image block
(reference OmniGen processor's 3D attention mask).

TPU notes: the pos-embed table, RoPE, and masks are static per shape; the
mask feeds ``jax.nn.dot_product_attention`` (fused on TPU); patchify is a
reshaped Dense so the MXU sees one (S × p²C × D) matmul.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..layers import LoRADense, timestep_embedding

Dtype = Any


@dataclasses.dataclass(frozen=True)
class OmniGenConfig:
    in_channels: int = 4
    patch_size: int = 2
    hidden_size: int = 3072
    num_heads: int = 32
    num_kv_heads: int = 32
    intermediate_size: int = 8192
    num_layers: int = 32
    vocab_size: int = 32064
    rope_base: float = 10000.0
    pos_embed_max_size: int = 192
    time_step_dim: int = 256
    rms_norm_eps: float = 1e-5

    @classmethod
    def tiny(cls) -> "OmniGenConfig":
        return cls(
            in_channels=4, hidden_size=64, num_heads=2, num_kv_heads=1,
            intermediate_size=128, num_layers=2, vocab_size=128,
            pos_embed_max_size=32, time_step_dim=32,
        )


def _sincos_2d(dim: int, size: int) -> np.ndarray:
    """(size², dim) fixed 2D sin-cos table (reference uses diffusers
    get_2d_sincos_pos_embed; cropped per-resolution at call time)."""
    def _1d(d, pos):
        omega = 1.0 / (10000 ** (np.arange(d // 2, dtype=np.float64) / (d / 2)))
        out = np.einsum("m,d->md", pos, omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid_h = np.arange(size, dtype=np.float64)
    grid_w = np.arange(size, dtype=np.float64)
    grid = np.meshgrid(grid_w, grid_h)  # w varies fastest
    emb_h = _1d(dim // 2, grid[1].reshape(-1))
    emb_w = _1d(dim // 2, grid[0].reshape(-1))
    return np.concatenate([emb_h, emb_w], axis=1).astype(np.float32)


class RMSNorm(nn.Module):
    eps: float = 1e-5
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],), self.param_dtype)
        y = x * jax.lax.rsqrt(jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True) + self.eps)
        return (y * w).astype(x.dtype)


class TimestepMLP(nn.Module):
    """diffusers TimestepEmbedding: Dense → silu → Dense."""

    hidden_size: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = LoRADense(self.hidden_size, name="linear_1", **common)(x.astype(self.dtype))
        return LoRADense(self.hidden_size, name="linear_2", **common)(nn.silu(x))


class OmniGenBlock(nn.Module):
    config: OmniGenConfig
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None

    @nn.compact
    def __call__(self, x, cos, sin, mask):
        cfg = self.config
        head_dim = cfg.hidden_size // cfg.num_heads
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype, use_bias=False,
                      lora_rank=self.lora_rank, lora_alpha=self.lora_alpha)
        batch, seq = x.shape[0], x.shape[1]

        h = RMSNorm(eps=cfg.rms_norm_eps, param_dtype=self.param_dtype, name="input_layernorm")(x)
        q = LoRADense(cfg.num_heads * head_dim, name="to_q", **common)(h)
        k = LoRADense(cfg.num_kv_heads * head_dim, name="to_k", **common)(h)
        v = LoRADense(cfg.num_kv_heads * head_dim, name="to_v", **common)(h)
        q = q.reshape(batch, seq, cfg.num_heads, head_dim)
        k = k.reshape(batch, seq, cfg.num_kv_heads, head_dim)
        v = v.reshape(batch, seq, cfg.num_kv_heads, head_dim)

        def rope(t):
            half = t.shape[-1] // 2
            t1, t2 = t[..., :half], t[..., half:]
            rot = jnp.concatenate([-t2, t1], axis=-1)
            return t * cos + rot * sin

        q, k = rope(q), rope(k)
        repeat = cfg.num_heads // cfg.num_kv_heads
        if repeat > 1:
            k = jnp.repeat(k, repeat, axis=2)
            v = jnp.repeat(v, repeat, axis=2)
        attn = jax.nn.dot_product_attention(q, k, v, mask=mask)
        attn = attn.reshape(batch, seq, cfg.num_heads * head_dim)
        x = x + LoRADense(cfg.hidden_size, name="to_out", **common)(attn)

        h = RMSNorm(eps=cfg.rms_norm_eps, param_dtype=self.param_dtype, name="post_attention_layernorm")(x)
        gate_up = LoRADense(2 * cfg.intermediate_size, name="gate_up_proj", **common)(h)
        gate, up = jnp.split(gate_up, 2, axis=-1)
        return x + LoRADense(cfg.hidden_size, name="down_proj", **common)(up * nn.silu(gate))


class OmniGenTransformer(nn.Module):
    config: OmniGenConfig = OmniGenConfig()
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        latents: jax.Array,  # (B, H, W, C) noisy output-image latents
        timesteps: jax.Array,  # (B,) t in [0, 1]
        input_ids: jax.Array,  # (B, L) Phi-3 prompt tokens
        text_mask: Optional[jax.Array] = None,  # (B, L) 1=real token
    ) -> jax.Array:
        cfg = self.config
        p = cfg.patch_size
        batch, height, width, channels = latents.shape
        gh, gw = height // p, width // p
        n_img = gh * gw
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        # patchify: (B, gh, gw, p*p*C) -> Dense (reference output_image_proj conv)
        patches = latents.reshape(batch, gh, p, gw, p, channels).transpose(0, 1, 3, 2, 4, 5)
        patches = patches.reshape(batch, n_img, p * p * channels)
        img_tok = LoRADense(cfg.hidden_size, name="output_image_proj", **common)(
            patches.astype(self.dtype)
        )
        # centre-cropped fixed sincos table (reference _cropped_pos_embed)
        table = jnp.asarray(_sincos_2d(cfg.hidden_size, cfg.pos_embed_max_size))
        table = table.reshape(cfg.pos_embed_max_size, cfg.pos_embed_max_size, -1)
        top = (cfg.pos_embed_max_size - gh) // 2
        left = (cfg.pos_embed_max_size - gw) // 2
        pos = table[top : top + gh, left : left + gw].reshape(1, n_img, -1)
        img_tok = img_tok + pos.astype(img_tok.dtype)

        # time token + AdaLN embedding (reference time_token / t_embedder)
        t_proj = timestep_embedding(timesteps, cfg.time_step_dim)
        temb = TimestepMLP(cfg.hidden_size, name="t_embedder", **common)(t_proj)
        time_tok = TimestepMLP(cfg.hidden_size, name="time_token", **common)(t_proj)[:, None, :]

        cond = nn.Embed(cfg.vocab_size, cfg.hidden_size, param_dtype=self.param_dtype,
                        name="embed_tokens")(input_ids).astype(self.dtype)
        x = jnp.concatenate([cond, time_tok, img_tok], axis=1)
        seq = x.shape[1]

        # su-scaled RoPE over flat positions (short-context branch: factors 1)
        head_dim = cfg.hidden_size // cfg.num_heads
        inv = 1.0 / (cfg.rope_base ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
        freqs = jnp.outer(jnp.arange(seq, dtype=jnp.float32), inv)
        emb = jnp.concatenate([freqs, freqs], axis=-1)
        cos = jnp.cos(emb)[None, :, None, :].astype(self.dtype)
        sin = jnp.sin(emb)[None, :, None, :].astype(self.dtype)

        # causal mask with a bidirectional output-image island + text padding
        causal = jnp.tril(jnp.ones((seq, seq), jnp.bool_))
        img_slot = jnp.arange(seq) >= (seq - n_img)
        island = img_slot[:, None] & img_slot[None, :]
        mask = causal | island
        if text_mask is not None:
            keys_ok = jnp.concatenate(
                [text_mask.astype(jnp.bool_),
                 jnp.ones((batch, 1 + n_img), jnp.bool_)], axis=1
            )
            mask = mask[None, :, :] & keys_ok[:, None, :]
        else:
            mask = mask[None, :, :]
        mask = mask[:, None, :, :]  # (B, 1, S, S) broadcast over heads

        block = nn.remat(OmniGenBlock) if self.remat else OmniGenBlock
        for i in range(cfg.num_layers):
            x = block(
                cfg, dtype=self.dtype, param_dtype=self.param_dtype,
                lora_rank=self.lora_rank, lora_alpha=self.lora_alpha,
                name=f"layers_{i}",
            )(x, cos, sin, mask)

        x = RMSNorm(eps=cfg.rms_norm_eps, param_dtype=self.param_dtype, name="norm")(x)
        x = x[:, -n_img:]
        # final AdaLN (reference norm_out: shift/scale from temb, no affine)
        ada = LoRADense(2 * cfg.hidden_size, name="norm_out_linear", **common)(nn.silu(temb))
        shift, scale = jnp.split(ada[:, None, :], 2, axis=-1)
        mean = jnp.mean(x.astype(jnp.float32), axis=-1, keepdims=True)
        var = jnp.var(x.astype(jnp.float32), axis=-1, keepdims=True)
        x = ((x - mean) * jax.lax.rsqrt(var + 1e-6)).astype(x.dtype) * (1 + scale) + shift
        out = LoRADense(p * p * cfg.in_channels, name="proj_out", **common)(x)
        out = out.reshape(batch, gh, gw, p, p, cfg.in_channels)
        return out.transpose(0, 1, 3, 2, 4, 5).reshape(batch, height, width, cfg.in_channels).astype(jnp.float32)
