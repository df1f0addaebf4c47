"""Krea-2 single-stream MMDiT in flax.linen — checkpoint-faithful.

Reference behavior: helpers/models/krea2/transformer.py
(``Krea2Transformer2DModel``, the Krea 2 8.9B flow backbone — NOT the Flux
"krea" flavour; SURVEY.md §2.3 lists krea2 as its own family):

- **Norms** (:63-77): zero-centered RMSNorm — effective scale ``1 + weight``,
  fp32, eps 1e-5.
- **Attention** (:80-209): bias-free GQA projections (48q/12kv × 128), a
  bias-free ``to_gate`` whose SIGMOID multiplies the attention output before
  ``to_out``, per-head zero-centered RMS q/k norms, flux-style
  interleaved-pair rotary over axes (32,48,48) with theta **1000**.
- **Blocks** (:290-341): one shared 6H modulation vector from the timestep
  (``time_mod_proj(gelu_tanh(temb))``) plus a per-block additive
  ``scale_shift_table``; order [prescale, preshift, pregate, postscale,
  postshift, postgate]; SwiGLU FFN (:212-222, bias-free).
- **Text fusion** (:247-287): tapped text-encoder hidden states
  (B, S, L, D_text) — ``num_layerwise_blocks`` pre-norm blocks attend across
  the L axis per token, a bias-free Linear(L→1) projector collapses it, and
  ``num_refiner_blocks`` attend across tokens; then ``txt_in`` =
  RMSNorm + 2-layer gelu-tanh MLP (:421-432).
- **Time embedding** (:344-418): cos-first sinusoid of t·1000 over
  ``timestep_embed_dim`` and a gelu-tanh MLP; kept (B, 1, H) so block
  modulations broadcast.
- **Final layer** (:435-449): (2, H) additive table, adaptive RMS, linear.

The combined [text, image] sequence runs through all blocks; the image slice
feeds the final layer (:740, :816-817).  Padded text tokens are masked as
attention keys (:729-734).
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


@dataclasses.dataclass(frozen=True)
class Krea2Config:
    in_channels: int = 64
    num_layers: int = 28
    attention_head_dim: int = 128
    num_attention_heads: int = 48
    num_key_value_heads: int = 12
    intermediate_size: int = 16384
    timestep_embed_dim: int = 256
    text_hidden_dim: int = 2560
    num_text_layers: int = 12
    text_num_attention_heads: int = 20
    text_num_key_value_heads: int = 20
    text_intermediate_size: int = 6912
    num_layerwise_text_blocks: int = 2
    num_refiner_text_blocks: int = 2
    axes_dims_rope: Tuple[int, int, int] = (32, 48, 48)
    rope_theta: float = 1000.0
    norm_eps: float = 1e-5

    @property
    def hidden_size(self) -> int:
        return self.attention_head_dim * self.num_attention_heads

    @classmethod
    def tiny(cls) -> "Krea2Config":
        return cls(
            in_channels=16, num_layers=2, attention_head_dim=16,
            num_attention_heads=4, num_key_value_heads=2, intermediate_size=96,
            timestep_embed_dim=32, text_hidden_dim=32, num_text_layers=3,
            text_num_attention_heads=2, text_num_key_value_heads=2,
            text_intermediate_size=48, num_layerwise_text_blocks=1,
            num_refiner_text_blocks=1, axes_dims_rope=(4, 6, 6),
        )


def _zrms(x: jax.Array, weight: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Zero-centered RMSNorm: scale = 1 + weight, fp32 (reference :63-77)."""
    x_f = x.astype(jnp.float32)
    y = x_f * jax.lax.rsqrt(jnp.mean(jnp.square(x_f), -1, keepdims=True) + eps)
    return (y * (1.0 + weight.astype(jnp.float32))).astype(x.dtype)


def krea2_rope(position_ids: np.ndarray, axes_dims: Tuple[int, ...], theta: float):
    """(S, 3) ids → interleaved-pair cos/sin (S, head_dim) (FluxPosEmbed with
    repeat_interleave_real=True)."""
    cos_parts, sin_parts = [], []
    for i, dax in enumerate(axes_dims):
        freqs = 1.0 / theta ** (np.arange(0, dax, 2, dtype=np.float64) / dax)
        ang = np.asarray(position_ids)[:, i : i + 1].astype(np.float64) * freqs[None]
        cos_parts.append(np.repeat(np.cos(ang), 2, axis=-1))
        sin_parts.append(np.repeat(np.sin(ang), 2, axis=-1))
    return (
        jnp.asarray(np.concatenate(cos_parts, -1), jnp.float32),
        jnp.asarray(np.concatenate(sin_parts, -1), jnp.float32),
    )


def _apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Interleaved-pair rotation (diffusers apply_rotary_emb, use_real +
    repeat_interleave)."""
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    x_f = x.astype(jnp.float32)
    x0, x1 = x_f[..., 0::2], x_f[..., 1::2]
    rotated = jnp.stack([-x1, x0], axis=-1).reshape(x_f.shape)
    return (x_f * c + rotated * s).astype(x.dtype)


class Krea2Attention(nn.Module):
    """GQA with zero-centered q/k RMS norms and a sigmoid output gate."""

    num_heads: int
    num_kv_heads: int
    head_dim: int
    norm_eps: float = 1e-5
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"

    @nn.compact
    def __call__(self, x, rope=None, key_mask=None):
        heads, kv_heads, hd = self.num_heads, self.num_kv_heads, self.head_dim
        hidden = heads * hd
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype, use_bias=False)
        batch, seq = x.shape[:2]

        q = LoRADense(heads * hd, name="to_q", **common, **lora)(x).reshape(batch, seq, heads, hd)
        k = LoRADense(kv_heads * hd, name="to_k", **common, **lora)(x).reshape(batch, seq, kv_heads, hd)
        v = LoRADense(kv_heads * hd, name="to_v", **common, **lora)(x).reshape(batch, seq, kv_heads, hd)
        gate = LoRADense(hidden, name="to_gate", **common, **lora)(x)

        q = _zrms(q, self.param("norm_q", nn.initializers.zeros, (hd,), self.param_dtype), self.norm_eps)
        k = _zrms(k, self.param("norm_k", nn.initializers.zeros, (hd,), self.param_dtype), self.norm_eps)
        if rope is not None:
            cos, sin = rope
            q = _apply_rope(q, cos, sin)
            k = _apply_rope(k, cos, sin)

        n_rep = heads // kv_heads
        qf = q.astype(jnp.float32).transpose(0, 2, 1, 3)
        kf = jnp.repeat(k, n_rep, axis=2).astype(jnp.float32).transpose(0, 2, 1, 3)
        vf = jnp.repeat(v, n_rep, axis=2).astype(jnp.float32).transpose(0, 2, 1, 3)
        logits = qf @ kf.transpose(0, 1, 3, 2) / math.sqrt(hd)
        if key_mask is not None:  # (B, S_kv) bool key-padding mask
            logits = jnp.where(key_mask[:, None, None, :], logits, -jnp.inf)
        probs = jax.nn.softmax(logits, axis=-1)
        out = (probs @ vf).transpose(0, 2, 1, 3).reshape(batch, seq, hidden).astype(self.dtype)
        out = out * jax.nn.sigmoid(gate.astype(jnp.float32)).astype(self.dtype)
        return LoRADense(hidden, name="to_out", **common, **lora)(out)


class Krea2SwiGLU(nn.Module):
    intermediate_size: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype, use_bias=False)
        gate = LoRADense(self.intermediate_size, name="gate", **common, **lora)(x)
        up = LoRADense(self.intermediate_size, name="up", **common, **lora)(x)
        return LoRADense(dim, name="down", **common, **lora)(nn.silu(gate) * up)


class Krea2TextFusionBlock(nn.Module):
    """Pre-norm block without rope or modulation (reference :225-244)."""

    config: Krea2Config
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, key_mask=None):
        cfg = self.config
        n1 = self.param("norm1", nn.initializers.zeros, (x.shape[-1],), self.param_dtype)
        n2 = self.param("norm2", nn.initializers.zeros, (x.shape[-1],), self.param_dtype)
        head_dim = cfg.text_hidden_dim // cfg.text_num_attention_heads
        x = x + Krea2Attention(
            cfg.text_num_attention_heads, cfg.text_num_key_value_heads, head_dim,
            cfg.norm_eps, self.dtype, self.param_dtype, name="attn",
        )(_zrms(x, n1, cfg.norm_eps), key_mask=key_mask)
        x = x + Krea2SwiGLU(cfg.text_intermediate_size, self.dtype, self.param_dtype,
                            name="ff")(_zrms(x, n2, cfg.norm_eps))
        return x


class Krea2Block(nn.Module):
    """Main block (reference :290-341): shared 6H modulation + per-block table."""

    config: Krea2Config
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"

    @nn.compact
    def __call__(self, x, temb_mod, rope, key_mask=None):
        cfg = self.config
        hidden = cfg.hidden_size
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        table = self.param("scale_shift_table", nn.initializers.zeros, (6, hidden), self.param_dtype)
        mods = temb_mod.reshape(temb_mod.shape[0], 1, 6, hidden) + table.astype(jnp.float32)
        prescale, preshift, pregate, postscale, postshift, postgate = [
            mods[:, :, i].astype(jnp.float32) for i in range(6)
        ]
        n1 = self.param("norm1", nn.initializers.zeros, (hidden,), self.param_dtype)
        n2 = self.param("norm2", nn.initializers.zeros, (hidden,), self.param_dtype)

        h = ((1.0 + prescale) * _zrms(x, n1, cfg.norm_eps).astype(jnp.float32) + preshift).astype(x.dtype)
        attn = Krea2Attention(
            cfg.num_attention_heads, cfg.num_key_value_heads, cfg.attention_head_dim,
            cfg.norm_eps, self.dtype, self.param_dtype, name="attn", **lora,
        )(h, rope=rope, key_mask=key_mask)
        x = (x.astype(jnp.float32) + pregate * attn.astype(jnp.float32)).astype(x.dtype)

        h = ((1.0 + postscale) * _zrms(x, n2, cfg.norm_eps).astype(jnp.float32) + postshift).astype(x.dtype)
        ff = Krea2SwiGLU(cfg.intermediate_size, self.dtype, self.param_dtype, name="ff", **lora)(h)
        return (x.astype(jnp.float32) + postgate * ff.astype(jnp.float32)).astype(x.dtype)


class Krea2Transformer(nn.Module):
    config: Krea2Config = Krea2Config()
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        hidden_states: jax.Array,  # (B, S_img, in_channels) packed latents
        encoder_hidden_states: jax.Array,  # (B, S_txt, num_text_layers, text_hidden_dim)
        timesteps: jax.Array,  # (B,) flow time in [0, 1]
        position_ids: jax.Array,  # (S_txt + S_img, 3)
        encoder_attention_mask: Optional[jax.Array] = None,  # (B, S_txt)
    ):
        cfg = self.config
        hidden = cfg.hidden_size
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        batch, img_len = hidden_states.shape[:2]
        txt_len = encoder_hidden_states.shape[1]

        # ---- time embedding (fp32, cos-first sinusoid of t*1000) -------------------
        half = cfg.timestep_embed_dim // 2
        freqs = jnp.exp(-math.log(1e4) * jnp.arange(half, dtype=jnp.float32) / half)
        args = (timesteps.astype(jnp.float32) * 1e3)[:, None, None] * freqs
        sinus = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
        temb = LoRADense(hidden, name="time_in_1", dtype=jnp.float32,
                         param_dtype=self.param_dtype)(sinus)
        temb = LoRADense(hidden, name="time_in_2", dtype=jnp.float32,
                         param_dtype=self.param_dtype)(nn.gelu(temb, approximate=True))
        temb_mod = LoRADense(6 * hidden, name="time_mod_proj", dtype=jnp.float32,
                             param_dtype=self.param_dtype)(nn.gelu(temb, approximate=True))

        # ---- text fusion (layerwise -> projector -> refiner) -----------------------
        key_mask = None
        full_mask = None
        if encoder_attention_mask is not None:
            key_mask = encoder_attention_mask.astype(bool)
            full_mask = jnp.concatenate(
                [key_mask, jnp.ones((batch, img_len), bool)], axis=1
            )
        text = encoder_hidden_states.astype(self.dtype)
        n_layers = cfg.num_text_layers
        text = text.reshape(batch * txt_len, n_layers, cfg.text_hidden_dim)
        for i in range(cfg.num_layerwise_text_blocks):
            text = Krea2TextFusionBlock(cfg, **common, name=f"text_layerwise_{i}")(text)
        text = text.reshape(batch, txt_len, n_layers, cfg.text_hidden_dim)
        text = text.transpose(0, 1, 3, 2)
        projector = self.param("text_projector", nn.initializers.lecun_normal(),
                               (n_layers, 1), self.param_dtype)
        text = (text @ projector.astype(text.dtype))[..., 0]
        for i in range(cfg.num_refiner_text_blocks):
            text = Krea2TextFusionBlock(cfg, **common, name=f"text_refiner_{i}")(text, key_mask=key_mask)

        # txt_in: RMSNorm + 2-layer gelu-tanh MLP (reference :421-432)
        tn = self.param("txt_norm", nn.initializers.zeros, (cfg.text_hidden_dim,), self.param_dtype)
        text = LoRADense(hidden, name="txt_in_1", **common)(_zrms(text, tn, cfg.norm_eps))
        text = LoRADense(hidden, name="txt_in_2", **common)(nn.gelu(text, approximate=True))

        img = LoRADense(hidden, name="img_in", **common, **lora)(hidden_states.astype(self.dtype))
        stream = jnp.concatenate([text, img], axis=1)
        cos_parts, sin_parts = [], []
        for i, dax in enumerate(cfg.axes_dims_rope):
            f = 1.0 / cfg.rope_theta ** (jnp.arange(0, dax, 2, dtype=jnp.float32) / dax)
            ang = position_ids[:, i : i + 1].astype(jnp.float32) * f[None]
            cos_parts.append(jnp.repeat(jnp.cos(ang), 2, axis=-1))
            sin_parts.append(jnp.repeat(jnp.sin(ang), 2, axis=-1))
        rope = (jnp.concatenate(cos_parts, -1), jnp.concatenate(sin_parts, -1))

        block_cls = nn.remat(Krea2Block) if self.remat else Krea2Block
        for i in range(cfg.num_layers):
            stream = block_cls(cfg, **common, **lora, name=f"block_{i}")(
                stream, temb_mod, rope, full_mask
            )
            self.sow("intermediates", f"block_{i}_hidden", stream)

        img = stream[:, txt_len:]
        table = self.param("final_scale_shift_table", nn.initializers.zeros, (2, hidden), self.param_dtype)
        fn = self.param("final_norm", nn.initializers.zeros, (hidden,), self.param_dtype)
        mod = temb.astype(jnp.float32) + table.astype(jnp.float32)[None]
        scale, shift = mod[:, 0:1], mod[:, 1:2]
        img = ((1.0 + scale) * _zrms(img, fn, cfg.norm_eps).astype(jnp.float32) + shift).astype(self.dtype)
        return LoRADense(cfg.in_channels, name="final_linear", use_bias=True, **common, **lora)(
            img
        ).astype(jnp.float32)
