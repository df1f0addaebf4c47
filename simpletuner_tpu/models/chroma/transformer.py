"""Chroma DiT in flax.linen — checkpoint-faithful.

Reference behavior: helpers/models/chroma/transformer.py (vendored
ChromaTransformer2DModel): Flux topology with the per-block modulation MLPs
*pruned* — a single "distilled guidance" approximator (in_proj + 5 residual
silu-MLP layers with pre-RMSNorms + out_proj) maps, for every modulation slot,
[timestep sincos(16) ++ guidance sincos(16, fixed 0) ++ slot-index sincos(32)]
to the slot's (dim,) modulation vector.  Slot layout: 3 per single block
first, then 6 per double block for the image stream, then 6 per double block
for the text stream, then 2 for the final norm (shift first).  Blocks are
otherwise Flux double/single blocks with qk RMSNorms and axial RoPE.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops import apply_rope, axial_rope, dot_product_attention
from ..layers import FeedForward, LayerNorm, LoRADense, RMSNorm, modulate, timestep_embedding

Dtype = Any


@dataclasses.dataclass(frozen=True)
class ChromaConfig:
    in_channels: int = 64
    hidden_size: int = 3072
    num_heads: int = 24
    head_dim: int = 128
    mlp_ratio: float = 4.0
    depth_double: int = 19
    depth_single: int = 38
    axes_dim: Tuple[int, ...] = (16, 56, 56)
    theta: float = 10000.0
    txt_in_features: int = 4096  # T5-XXL
    approximator_channels: int = 64   # input features per modulation slot
    approximator_hidden: int = 5120
    approximator_layers: int = 5
    qkv_bias: bool = True
    # surface-compat with the Flux family machinery (chroma has neither)
    vec_in_features: int = 768
    guidance_embed: bool = False

    @property
    def mod_len(self) -> int:
        return 3 * self.depth_single + 12 * self.depth_double + 2

    @classmethod
    def tiny(cls) -> "ChromaConfig":
        return cls(
            in_channels=16, hidden_size=64, num_heads=2, head_dim=32,
            depth_double=2, depth_single=2, axes_dim=(8, 12, 12),
            txt_in_features=32, approximator_hidden=64, approximator_layers=2,
        )


class ChromaApproximator(nn.Module):
    """in_proj → n x [x + linear_2(silu(linear_1(rms(x))))] → out_proj."""

    config: ChromaConfig
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, mod_len, approximator_channels)
        cfg = self.config
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = LoRADense(cfg.approximator_hidden, name="in_proj", **common)(x)
        for i in range(cfg.approximator_layers):
            n = RMSNorm(name=f"norm_{i}", **common)(h)
            m = LoRADense(cfg.approximator_hidden, name=f"layer_{i}_1", **common)(n)
            m = LoRADense(cfg.approximator_hidden, name=f"layer_{i}_2", **common)(nn.silu(m))
            h = h + m
        return LoRADense(cfg.hidden_size, name="out_proj", **common)(h)


def chroma_input_vec(cfg: ChromaConfig, timesteps: jax.Array) -> jax.Array:
    """(B, mod_len, 64): [t sincos(16) ++ guidance-0 sincos(16) ++ index sincos(32)]."""
    nc = cfg.approximator_channels // 4  # 16
    t_proj = timestep_embedding(timesteps, nc, time_factor=1000.0)
    g_proj = timestep_embedding(jnp.zeros_like(timesteps), nc, time_factor=1000.0)
    tg = jnp.concatenate([t_proj, g_proj], axis=-1)  # (B, 32)
    idx = np.arange(cfg.mod_len, dtype=np.float32) * 1000.0
    half = nc  # 2*nc channels -> half = nc
    freqs = np.exp(-math.log(10000.0) * np.arange(half) / half)
    args = idx[:, None] * freqs[None]
    mod_proj = np.concatenate([np.cos(args), np.sin(args)], axis=-1).astype(np.float32)
    batch = timesteps.shape[0]
    tg_full = jnp.broadcast_to(tg[:, None, :], (batch, cfg.mod_len, 2 * nc))
    mod_full = jnp.broadcast_to(jnp.asarray(mod_proj)[None], (batch, cfg.mod_len, 2 * nc))
    return jnp.concatenate([tg_full, mod_full], axis=-1)


class ChromaDoubleBlock(nn.Module):
    config: ChromaConfig
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"

    @nn.compact
    def __call__(self, img, txt, img_mods, txt_mods, rope, segment_ids=None):
        cfg = self.config
        dim = cfg.hidden_size
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        im = [img_mods[:, i].astype(self.dtype) for i in range(6)]
        tm = [txt_mods[:, i].astype(self.dtype) for i in range(6)]

        img_n = modulate(LayerNorm(use_scale=False, use_bias=False, **common)(img), im[0], im[1])
        txt_n = modulate(LayerNorm(use_scale=False, use_bias=False, **common)(txt), tm[0], tm[1])

        def qkv(prefix, x):
            q = LoRADense(dim, use_bias=cfg.qkv_bias, name=f"{prefix}_attn_q", **common, **lora)(x)
            k = LoRADense(dim, use_bias=cfg.qkv_bias, name=f"{prefix}_attn_k", **common, **lora)(x)
            v = LoRADense(dim, use_bias=cfg.qkv_bias, name=f"{prefix}_attn_v", **common, **lora)(x)
            batch, seq = x.shape[:2]
            shape = (batch, seq, cfg.num_heads, cfg.head_dim)
            q, k, v = q.reshape(shape), k.reshape(shape), v.reshape(shape)
            q = RMSNorm(name=f"{prefix}_attn_norm_q", **common)(q)
            k = RMSNorm(name=f"{prefix}_attn_norm_k", **common)(k)
            return q, k, v

        img_q, img_k, img_v = qkv("img", img_n)
        txt_q, txt_k, txt_v = qkv("txt", txt_n)
        q = jnp.concatenate([txt_q, img_q], axis=1)
        k = jnp.concatenate([txt_k, img_k], axis=1)
        v = jnp.concatenate([txt_v, img_v], axis=1)
        cos, sin = rope
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        attn = dot_product_attention(q, k, v, q_segment_ids=segment_ids, kv_segment_ids=segment_ids)
        batch = img.shape[0]
        attn = attn.reshape(batch, -1, dim)
        txt_attn, img_attn = attn[:, : txt.shape[1]], attn[:, txt.shape[1]:]

        img = img + im[2][:, None, :] * LoRADense(dim, name="img_attn_proj", **common, **lora)(img_attn)
        txt = txt + tm[2][:, None, :] * LoRADense(dim, name="txt_attn_proj", **common, **lora)(txt_attn)

        img_m = modulate(LayerNorm(use_scale=False, use_bias=False, **common)(img), im[3], im[4])
        img = img + im[5][:, None, :] * FeedForward(dim, cfg.mlp_ratio, name="img_mlp", **common, **lora)(img_m)
        txt_m = modulate(LayerNorm(use_scale=False, use_bias=False, **common)(txt), tm[3], tm[4])
        txt = txt + tm[5][:, None, :] * FeedForward(dim, cfg.mlp_ratio, name="txt_mlp", **common, **lora)(txt_m)
        return img, txt


class ChromaSingleBlock(nn.Module):
    config: ChromaConfig
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"

    @nn.compact
    def __call__(self, x, mods, rope, segment_ids=None):
        cfg = self.config
        dim = cfg.hidden_size
        mlp_dim = int(dim * cfg.mlp_ratio)
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        shift, scale, gate = (mods[:, i].astype(self.dtype) for i in range(3))

        x_n = modulate(LayerNorm(use_scale=False, use_bias=False, **common)(x), shift, scale)
        fused = LoRADense(dim * 3 + mlp_dim, name="linear1", **common, **lora)(x_n)
        qkv, mlp = fused[..., : dim * 3], fused[..., dim * 3:]
        batch, seq = x.shape[:2]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        shape = (batch, seq, cfg.num_heads, cfg.head_dim)
        q, k, v = q.reshape(shape), k.reshape(shape), v.reshape(shape)
        q = RMSNorm(name="norm_q", **common)(q)
        k = RMSNorm(name="norm_k", **common)(k)
        cos, sin = rope
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        attn = dot_product_attention(
            q, k, v, q_segment_ids=segment_ids, kv_segment_ids=segment_ids
        ).reshape(batch, seq, dim)
        out = LoRADense(dim, name="linear2", **common, **lora)(
            jnp.concatenate([attn, nn.gelu(mlp, approximate=True)], axis=-1)
        )
        return x + gate[:, None, :] * out


class ChromaTransformer(nn.Module):
    """Inputs match FluxTransformer minus vec/guidance (both are distilled
    into the approximator conditioning)."""

    config: ChromaConfig = ChromaConfig()
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        img: jax.Array,
        img_ids: jax.Array,
        txt: jax.Array,
        txt_ids: jax.Array,
        timesteps: jax.Array,
        vec: Optional[jax.Array] = None,       # accepted + ignored (Flux surface)
        guidance: Optional[jax.Array] = None,  # distilled away
        r_timesteps: Optional[jax.Array] = None,  # flowmap surface, unused
        segment_ids: Optional[jax.Array] = None,
        tread_rng: Optional[jax.Array] = None,
        controlnet_double_residuals: Optional[Tuple[jax.Array, ...]] = None,
        controlnet_single_residuals: Optional[Tuple[jax.Array, ...]] = None,
    ) -> jax.Array:
        cfg = self.config
        dim = cfg.hidden_size
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)

        img_tok = LoRADense(dim, name="img_in", **common, **lora)(img)
        txt_tok = LoRADense(dim, name="txt_in", **common, **lora)(txt)

        pooled = ChromaApproximator(cfg, name="approximator", **common)(
            chroma_input_vec(cfg, timesteps).astype(self.dtype)
        )  # (B, mod_len, dim)

        ids = jnp.concatenate([txt_ids, img_ids], axis=1)
        rope = axial_rope(cfg.axes_dim, ids, cfg.theta)

        double_cls = nn.remat(ChromaDoubleBlock) if self.remat else ChromaDoubleBlock
        single_cls = nn.remat(ChromaSingleBlock) if self.remat else ChromaSingleBlock

        img_off = 3 * cfg.depth_single
        txt_off = img_off + 6 * cfg.depth_double
        for layer in range(cfg.depth_double):
            img_mods = pooled[:, img_off + 6 * layer : img_off + 6 * layer + 6]
            txt_mods = pooled[:, txt_off + 6 * layer : txt_off + 6 * layer + 6]
            img_tok, txt_tok = double_cls(cfg, name=f"double_{layer}", **common, **lora)(
                img_tok, txt_tok, img_mods, txt_mods, rope, segment_ids
            )
            self.sow("intermediates", f"double_{layer}_hidden", img_tok)

        stream = jnp.concatenate([txt_tok, img_tok], axis=1)
        txt_len = txt_tok.shape[1]
        for layer in range(cfg.depth_single):
            mods = pooled[:, 3 * layer : 3 * layer + 3]
            stream = single_cls(cfg, name=f"single_{layer}", **common, **lora)(
                stream, mods, rope, segment_ids
            )
            self.sow("intermediates", f"single_{layer}_hidden", stream[:, txt_len:])
        img_tok = stream[:, txt_len:]

        # final: shift FIRST, then scale (AdaLayerNormContinuousPruned)
        final = pooled[:, -2:]
        shift = final[:, 0].astype(self.dtype)
        scale = final[:, 1].astype(self.dtype)
        img_tok = modulate(LayerNorm(use_scale=False, use_bias=False, **common)(img_tok), shift, scale)
        return LoRADense(cfg.in_channels, name="final_proj", **common)(img_tok).astype(jnp.float32)
