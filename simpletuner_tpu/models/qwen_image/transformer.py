"""Qwen-Image MMDiT in flax.linen — checkpoint-faithful.

Reference behavior: helpers/models/qwen_image/transformer.py (vendored
QwenImageTransformer2DModel): 60 double-stream blocks with per-stream SiLU
modulation linears (img_mod/txt_mod, 6·dim each), joint attention with
per-head RMS qk norms, Qwen's centered ("scale_rope") axial rotary with
interleaved complex pairs — image h/w coordinates run from -(n - n//2) to
n//2 - 1 and text tokens sit at max(h//2, w//2) + position on all three axes —
RMSNorm on the raw 3584-dim Qwen2.5-VL features before txt_in, gelu-tanh FFNs,
and an AdaLayerNormContinuous (scale-first) output head.
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
class QwenImageConfig:
    in_channels: int = 64  # 2x2-packed 16-channel latents
    hidden_size: int = 3072
    num_heads: int = 24
    head_dim: int = 128
    mlp_ratio: float = 4.0
    depth: int = 60
    axes_dim: Tuple[int, ...] = (16, 56, 56)
    theta: float = 10000.0
    txt_in_features: int = 3584  # Qwen2.5-VL hidden
    # MageFlow/Z-Image ride this exact block layout but do NOT rotate text
    # tokens (vendor mage_layers.py: "text tokens are not rotated")
    txt_rope: bool = True

    @classmethod
    def tiny(cls) -> "QwenImageConfig":
        return cls(
            in_channels=16, hidden_size=64, num_heads=2, head_dim=32, depth=2,
            axes_dim=(8, 12, 12), txt_in_features=32,
        )


def qwen_rope_angles(cfg: QwenImageConfig, hh: int, ww: int, txt_len: int):
    """Per-token rotation angles (seq, head_dim//2) for image and text tokens."""

    def axis_angles(coords: np.ndarray, dim: int) -> np.ndarray:
        inv = 1.0 / (cfg.theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
        return np.outer(coords, inv)  # (n, dim/2)

    f_dim, h_dim, w_dim = cfg.axes_dim
    h_coords = np.arange(hh, dtype=np.float64) - (hh - hh // 2)
    w_coords = np.arange(ww, dtype=np.float64) - (ww - ww // 2)
    a_f = axis_angles(np.zeros(1), f_dim)  # single frame at coord 0
    a_h = axis_angles(h_coords, h_dim)
    a_w = axis_angles(w_coords, w_dim)
    img = np.concatenate(
        [
            np.broadcast_to(a_f[0][None, None], (hh, ww, f_dim // 2)),
            np.broadcast_to(a_h[:, None, :], (hh, ww, h_dim // 2)),
            np.broadcast_to(a_w[None, :, :], (hh, ww, w_dim // 2)),
        ],
        axis=-1,
    ).reshape(hh * ww, -1)

    max_vid = max(hh // 2, ww // 2)
    t_coords = max_vid + np.arange(txt_len, dtype=np.float64)
    txt = np.concatenate(
        [axis_angles(t_coords, f_dim), axis_angles(t_coords, h_dim), axis_angles(t_coords, w_dim)],
        axis=-1,
    )
    return img.astype(np.float32), txt.astype(np.float32)


def apply_interleaved_rope(x: jax.Array, angles: jax.Array) -> jax.Array:
    """x: (B, S, H, D); angles: (S, D/2); complex-polar (interleaved) rotation."""
    xf = x.astype(jnp.float32)
    cos = jnp.cos(angles)[None, :, None, :]
    sin = jnp.sin(angles)[None, :, None, :]
    x1 = xf[..., 0::2]
    x2 = xf[..., 1::2]
    o1 = x1 * cos - x2 * sin
    o2 = x2 * cos + x1 * sin
    return jnp.stack([o1, o2], axis=-1).reshape(xf.shape).astype(x.dtype)


class QwenImageBlock(nn.Module):
    config: QwenImageConfig
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"

    @nn.compact
    def __call__(self, img, txt, temb, rope_img, rope_txt, segment_ids=None):
        cfg = self.config
        dim = cfg.hidden_size
        inner = cfg.num_heads * cfg.head_dim
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        batch = img.shape[0]

        silu_temb = nn.silu(temb.astype(jnp.float32)).astype(self.dtype)
        img_mods = LoRADense(6 * dim, name="img_mod", **common)(silu_temb)
        txt_mods = LoRADense(6 * dim, name="txt_mod", **common)(silu_temb)
        i_sh1, i_sc1, i_g1, i_sh2, i_sc2, i_g2 = jnp.split(img_mods, 6, axis=-1)
        t_sh1, t_sc1, t_g1, t_sh2, t_sc2, t_g2 = jnp.split(txt_mods, 6, axis=-1)

        img_n = LayerNorm(use_scale=False, use_bias=False, **common)(img)
        img_n = img_n * (1 + i_sc1[:, None]) + i_sh1[:, None]
        txt_n = LayerNorm(use_scale=False, use_bias=False, **common)(txt)
        txt_n = txt_n * (1 + t_sc1[:, None]) + t_sh1[:, None]

        def qkv(x, prefix, seq):
            shape = (batch, seq, cfg.num_heads, cfg.head_dim)
            q = LoRADense(inner, name=f"{prefix}_q", **common, **lora)(x).reshape(shape)
            k = LoRADense(inner, name=f"{prefix}_k", **common, **lora)(x).reshape(shape)
            v = LoRADense(inner, name=f"{prefix}_v", **common, **lora)(x).reshape(shape)
            q = RMSNorm(name=f"{prefix}_norm_q", **common)(q)
            k = RMSNorm(name=f"{prefix}_norm_k", **common)(k)
            return q, k, v

        iq, ik, iv = qkv(img_n, "img_attn", img.shape[1])
        tq, tk, tv = qkv(txt_n, "txt_attn", txt.shape[1])
        iq = apply_interleaved_rope(iq, rope_img)
        ik = apply_interleaved_rope(ik, rope_img)
        if cfg.txt_rope:
            tq = apply_interleaved_rope(tq, rope_txt)
            tk = apply_interleaved_rope(tk, rope_txt)

        q = jnp.concatenate([tq, iq], axis=1)
        k = jnp.concatenate([tk, ik], axis=1)
        v = jnp.concatenate([tv, iv], axis=1)
        attn = dot_product_attention(
            q, k, v, q_segment_ids=segment_ids, kv_segment_ids=segment_ids
        ).reshape(batch, -1, inner)
        txt_len = txt.shape[1]
        txt_attn, img_attn = attn[:, :txt_len], attn[:, txt_len:]

        img = img + i_g1[:, None] * LoRADense(dim, name="img_attn_proj", **common, **lora)(img_attn)
        txt = txt + t_g1[:, None] * LoRADense(dim, name="txt_attn_proj", **common, **lora)(txt_attn)

        img_m = LayerNorm(use_scale=False, use_bias=False, **common)(img)
        img_m = img_m * (1 + i_sc2[:, None]) + i_sh2[:, None]
        h = LoRADense(int(dim * cfg.mlp_ratio), name="img_mlp_in", **common, **lora)(img_m)
        img = img + i_g2[:, None] * LoRADense(dim, name="img_mlp_out", **common, **lora)(
            nn.gelu(h, approximate=True)
        )
        txt_m = LayerNorm(use_scale=False, use_bias=False, **common)(txt)
        txt_m = txt_m * (1 + t_sc2[:, None]) + t_sh2[:, None]
        h = LoRADense(int(dim * cfg.mlp_ratio), name="txt_mlp_in", **common, **lora)(txt_m)
        txt = txt + t_g2[:, None] * LoRADense(dim, name="txt_mlp_out", **common, **lora)(
            nn.gelu(h, approximate=True)
        )
        return img, txt


class QwenImageTransformer(nn.Module):
    """Inputs are pre-packed tokens: img (B, S, in_channels) from 2x2-packed
    latents; the static (hh, ww) grid rides the hw attribute-free call via
    img_hw."""

    config: QwenImageConfig = QwenImageConfig()
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        img: jax.Array,       # (B, S_img, in_channels)
        img_hw: jax.Array,    # (2,) static-ish (hh, ww) — used via .shape trick below
        txt: jax.Array,       # (B, S_txt, txt_in_features)
        timesteps: jax.Array,
        segment_ids: Optional[jax.Array] = None,
    ) -> jax.Array:
        cfg = self.config
        dim = cfg.hidden_size
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        # hh/ww are carried as a dummy array whose SHAPE is (hh, ww): static
        hh, ww = img_hw.shape

        x = LoRADense(dim, name="img_in", **common, **lora)(img)
        t = RMSNorm(name="txt_norm", **common)(txt)
        t = LoRADense(dim, name="txt_in", **common, **lora)(t)

        temb = MLPEmbedder(dim, name="time_in", **common)(
            timestep_embedding(timesteps, 256).astype(self.dtype)
        )

        ang_img, ang_txt = qwen_rope_angles(cfg, hh, ww, txt.shape[1])
        rope_img = jnp.asarray(ang_img)
        rope_txt = jnp.asarray(ang_txt)

        block_cls = nn.remat(QwenImageBlock) if self.remat else QwenImageBlock
        for layer in range(cfg.depth):
            x, t = block_cls(cfg, name=f"block_{layer}", **common, **lora)(
                x, t, temb, rope_img, rope_txt, segment_ids
            )
            self.sow("intermediates", f"block_{layer}_hidden", x)

        # AdaLayerNormContinuous: linear emits (scale, shift) — scale first
        final = LoRADense(2 * dim, name="final_mod", **common)(
            nn.silu(temb.astype(jnp.float32)).astype(self.dtype)
        )
        scale, shift = jnp.split(final, 2, axis=-1)
        x = LayerNorm(use_scale=False, use_bias=False, **common)(x)
        x = x * (1 + scale[:, None]) + shift[:, None]
        return LoRADense(cfg.in_channels, name="final_proj", **common)(x).astype(jnp.float32)
