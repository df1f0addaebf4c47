"""ERNIE-4.5 image DiT in flax.linen — checkpoint-faithful.

Reference behavior: helpers/models/ernie/transformer_diffusers.py
(``ErnieImageTransformer2DModel``, Baidu ERNIE-conditioned image flow DiT):

- **Sequence order is [IMAGE, text]** (:428): patch-embedded latents first,
  projected text after; the attention mask marks padded text keys (:457-465).
- **RoPE** (:53-71): per-axis flux-style angles over axes (32,48,48) with
  theta **256**, concatenated then PAIRWISE duplicated [θ0,θ0,θ1,θ1,...],
  applied with the non-interleaved rotate-half convention (:117-131).
  Image position ids are (text_len, y, x) — the temporal coordinate of every
  image token is the sample's text length (:443-454); text ids (i, 0, 0).
- **Time**: diffusers Timesteps sin-first + 2-layer SiLU MLP (:333-334,
  :468-470); one zero-init shared SiLU modulation head emits the 6 adaLN
  params used by EVERY layer (:348-350, :481-484).
- **Blocks** (:245-280): affine RMS pre-norms, bias-free qkv/out with
  per-head affine RMS q/k norms, fp32 modulate/gate arithmetic; FFN =
  ``linear_fc2(up_proj(x) · gelu(gate_proj(x)))`` (exact gelu, :233-242).
- **Final** (:283-294): LayerNorm (no affine) with ``linear(c)`` → [scale,
  shift] (NO silu), then a zero-init output linear (:357-360).

Layout: flax NTC over the [img, text] stream; latents enter NHWC and leave
NHWC (patch_size 1 in the shipped config — latents are cache-packed 128ch).
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
class ErnieConfig:
    hidden_size: int = 3072
    num_heads: int = 24
    num_layers: int = 24
    ffn_hidden_size: int = 8192
    in_channels: int = 128
    out_channels: int = 128
    patch_size: int = 1
    text_in_dim: int = 2560
    rope_theta: float = 256.0
    rope_axes_dim: Tuple[int, int, int] = (32, 48, 48)
    eps: float = 1e-6

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @classmethod
    def tiny(cls) -> "ErnieConfig":
        return cls(
            hidden_size=32, num_heads=2, num_layers=2, ffn_hidden_size=64,
            in_channels=16, out_channels=16, text_in_dim=32,
            rope_axes_dim=(4, 6, 6),
        )


def ernie_rope_angles(ids: jax.Array, axes_dim: Tuple[int, ...], theta: float) -> jax.Array:
    """(B, S, 3) ids → pairwise-duplicated angles (B, S, head_dim)."""
    parts = []
    for i, dax in enumerate(axes_dim):
        omega = 1.0 / theta ** (jnp.arange(0, dax, 2, dtype=jnp.float32) / dax)
        parts.append(ids[..., i, None].astype(jnp.float32) * omega)
    emb = jnp.concatenate(parts, axis=-1)  # (B, S, head_dim/2)
    return jnp.repeat(emb, 2, axis=-1)  # [θ0,θ0,θ1,θ1,...]


def _apply_ernie_rope(x: jax.Array, angles: jax.Array) -> jax.Array:
    """Non-interleaved rotate-half over the full rot dim (reference :119-127)."""
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]
    x_f = x.astype(jnp.float32)
    half = x.shape[-1] // 2
    rotated = jnp.concatenate([-x_f[..., half:], x_f[..., :half]], axis=-1)
    return (x_f * cos + rotated * sin).astype(x.dtype)


def _rms(x: jax.Array, scale: jax.Array, eps: float) -> jax.Array:
    x_f = x.astype(jnp.float32)
    y = x_f * jax.lax.rsqrt(jnp.mean(jnp.square(x_f), -1, keepdims=True) + eps)
    return (y * scale.astype(jnp.float32)).astype(x.dtype)


class ErnieBlock(nn.Module):
    config: ErnieConfig
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"

    @nn.compact
    def __call__(self, x, angles, temb6, key_mask=None):
        cfg = self.config
        heads, hd = cfg.num_heads, cfg.head_dim
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype, use_bias=False)
        batch, seq = x.shape[:2]
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = temb6

        scale = lambda name, dim: self.param(name, nn.initializers.ones, (dim,), self.param_dtype)
        h = _rms(x, scale("adaLN_sa_ln", cfg.hidden_size), cfg.eps)
        h = (h.astype(jnp.float32) * (1.0 + scale_msa) + shift_msa).astype(x.dtype)
        q = LoRADense(cfg.hidden_size, name="to_q", **common, **lora)(h).reshape(batch, seq, heads, hd)
        k = LoRADense(cfg.hidden_size, name="to_k", **common, **lora)(h).reshape(batch, seq, heads, hd)
        v = LoRADense(cfg.hidden_size, name="to_v", **common, **lora)(h).reshape(batch, seq, heads, hd)
        q = _rms(q, scale("norm_q", hd), 1e-5)
        k = _rms(k, scale("norm_k", hd), 1e-5)
        q = _apply_ernie_rope(q, angles)
        k = _apply_ernie_rope(k, angles)

        qf = q.astype(jnp.float32).transpose(0, 2, 1, 3)
        kf = k.astype(jnp.float32).transpose(0, 2, 1, 3)
        vf = v.astype(jnp.float32).transpose(0, 2, 1, 3)
        logits = qf @ kf.transpose(0, 1, 3, 2) / math.sqrt(hd)
        if key_mask is not None:
            logits = jnp.where(key_mask[:, None, None, :], logits, -jnp.inf)
        attn = (jax.nn.softmax(logits, axis=-1) @ vf).transpose(0, 2, 1, 3)
        attn = attn.reshape(batch, seq, cfg.hidden_size).astype(self.dtype)
        attn = LoRADense(cfg.hidden_size, name="to_out", **common, **lora)(attn)
        x = (x.astype(jnp.float32) + gate_msa * attn.astype(jnp.float32)).astype(x.dtype)

        h = _rms(x, scale("adaLN_mlp_ln", cfg.hidden_size), cfg.eps)
        h = (h.astype(jnp.float32) * (1.0 + scale_mlp) + shift_mlp).astype(x.dtype)
        gate_p = LoRADense(cfg.ffn_hidden_size, name="gate_proj", **common, **lora)(h)
        up = LoRADense(cfg.ffn_hidden_size, name="up_proj", **common, **lora)(h)
        ff = LoRADense(cfg.hidden_size, name="linear_fc2", **common, **lora)(
            up * nn.gelu(gate_p, approximate=False)
        )
        return (x.astype(jnp.float32) + gate_mlp * ff.astype(jnp.float32)).astype(x.dtype)


class ErnieTransformer(nn.Module):
    config: ErnieConfig = ErnieConfig()
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        latents: jax.Array,  # (B, H, W, in_channels) NHWC
        timesteps: jax.Array,  # (B,) scheduler-scale values
        text_embeds: jax.Array,  # (B, T, text_in_dim)
        text_lens: jax.Array,  # (B,) valid text lengths
    ):
        cfg = self.config
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        batch, height, width, _ = latents.shape
        n_img = height * width  # patch_size 1
        t_max = text_embeds.shape[1]

        # x_embedder: Conv k=1 s=1 over channels == per-token linear
        img = LoRADense(cfg.hidden_size, name="x_embedder", use_bias=True, **common, **lora)(
            latents.astype(self.dtype).reshape(batch, n_img, cfg.in_channels)
        )
        text = text_embeds.astype(self.dtype)
        if cfg.text_in_dim != cfg.hidden_size:
            text = LoRADense(cfg.hidden_size, name="text_proj", use_bias=False, **common)(text)
        x = jnp.concatenate([img, text], axis=1)  # IMAGE first (:428)

        # position ids: image rows (text_len, y, x); text rows (i, 0, 0)
        ys = jnp.repeat(jnp.arange(height), width).astype(jnp.float32)
        xs = jnp.tile(jnp.arange(width), height).astype(jnp.float32)
        img_ids = jnp.stack(
            [
                jnp.broadcast_to(text_lens.astype(jnp.float32)[:, None], (batch, n_img)),
                jnp.broadcast_to(ys[None], (batch, n_img)),
                jnp.broadcast_to(xs[None], (batch, n_img)),
            ],
            axis=-1,
        )
        text_ids = jnp.concatenate(
            [
                jnp.broadcast_to(jnp.arange(t_max, dtype=jnp.float32)[None, :, None], (batch, t_max, 1)),
                jnp.zeros((batch, t_max, 2), jnp.float32),
            ],
            axis=-1,
        )
        angles = ernie_rope_angles(
            jnp.concatenate([img_ids, text_ids], axis=1), cfg.rope_axes_dim, cfg.rope_theta
        )
        valid_text = jnp.arange(t_max)[None] < text_lens[:, None]
        key_mask = jnp.concatenate([jnp.ones((batch, n_img), bool), valid_text], axis=1)

        # time: diffusers Timesteps (sin-first, shift 0) + SiLU MLP
        half = cfg.hidden_size // 2
        freqs = jnp.exp(-math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half)
        args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
        sample = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
        c = LoRADense(cfg.hidden_size, name="time_in", use_bias=True, dtype=jnp.float32,
                      param_dtype=self.param_dtype)(sample)
        c = LoRADense(cfg.hidden_size, name="time_out", use_bias=True, dtype=jnp.float32,
                      param_dtype=self.param_dtype)(nn.silu(c))

        mod = LoRADense(6 * cfg.hidden_size, name="adaLN_modulation", use_bias=True,
                        kernel_init=nn.initializers.zeros, dtype=jnp.float32,
                        param_dtype=self.param_dtype)(nn.silu(c))
        temb6 = [m[:, None] for m in jnp.split(mod, 6, axis=-1)]

        block_cls = nn.remat(ErnieBlock) if self.remat else ErnieBlock
        for i in range(cfg.num_layers):
            x = block_cls(cfg, **common, **lora, name=f"layer_{i}")(x, angles, temb6, key_mask)
            self.sow("intermediates", f"layer_{i}_hidden", x)

        # final AdaLNContinuous: linear(c) -> [scale, shift], LN no affine
        fin = LoRADense(2 * cfg.hidden_size, name="final_adaLN", use_bias=True,
                        dtype=jnp.float32, param_dtype=self.param_dtype)(c)
        f_scale, f_shift = jnp.split(fin, 2, axis=-1)
        x_f = x.astype(jnp.float32)
        mean = x_f.mean(-1, keepdims=True)
        x_f = (x_f - mean) * jax.lax.rsqrt(x_f.var(-1, keepdims=True) + cfg.eps)
        x_f = x_f * (1.0 + f_scale[:, None]) + f_shift[:, None]
        out = LoRADense(cfg.out_channels, name="final_linear", use_bias=True,
                        kernel_init=nn.initializers.zeros, **common, **lora)(
            x_f.astype(self.dtype)
        )
        return out[:, :n_img].reshape(batch, height, width, cfg.out_channels).astype(jnp.float32)
