"""Stable Cascade Stage-C UNet in flax.linen — checkpoint-faithful.

Reference behavior: helpers/models/stable_cascade/unet.py
(``StableCascadeUNet``, the Wuerstchen Stage-C prior over 42x-compressed
EffNet latents):

- **Layers**: each "layer" of a level is the triple [``SDCascadeResBlock``,
  ``SDCascadeTimestepBlock``, ``SDCascadeAttnBlock``] (:213-216, :379-390);
  the first up-level res block of non-top levels takes the skip concat
  (:421-433, c_skip logic :424).
- **ResBlock** (:115-134): depthwise k3 conv → param-free channels-last LN
  (eps 1e-6) → Linear(4c) → exact GELU → GlobalResponseNorm (:138-147,
  L2 over spatial, normalized by its channel mean) → Linear(c) → residual.
- **TimestepBlock** (:49-112): the 3·64-dim [r, sca, crp] embedding is
  chunked; each condition has its own Linear → 2c; the (a, b) halves sum and
  modulate ``x·(1+a)+b``.
- **AttnBlock** (:150-166): silu+linear kv mapper on the CLIP stream; with
  ``self_attn`` the normed spatial tokens are PREPENDED to the mapped kv;
  biased q/k/v/out attention.
- **Down/up scalers**: param-free LN + k2 s2 Conv (down, :362-377) /
  ConvTranspose (up, :402-419), the upscaler applied at the END of each up
  level (:593).
- **Timestep ratio embedding** (:501-513): sin-first sinusoid of
  ratio·10000 with (half−1) log-spacing.
- **CLIP conditioning** (:515-529): pooled → ``conditioning_dim·clip_seq``
  reshaped to clip_seq tokens; optional text-sequence and image mappers;
  param-free LayerNorm over the concatenated [text, pooled(, img)] stream.

Layout: flax NHWC — torch (B, C, H, W) maps to (B, H, W, C).
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
class StableCascadeConfig:
    in_channels: int = 16
    out_channels: int = 16
    timestep_ratio_embedding_dim: int = 64
    patch_size: int = 1
    conditioning_dim: int = 2048
    block_out_channels: Tuple[int, ...] = (2048, 2048)
    num_attention_heads: Tuple[int, ...] = (32, 32)
    down_num_layers_per_block: Tuple[int, ...] = (8, 24)
    up_num_layers_per_block: Tuple[int, ...] = (24, 8)
    clip_text_in_channels: Optional[int] = 1280
    clip_text_pooled_in_channels: int = 1280
    clip_seq: int = 4
    kernel_size: int = 3
    timestep_conditioning_type: Tuple[str, ...] = ("sca", "crp")

    @classmethod
    def tiny(cls) -> "StableCascadeConfig":
        return cls(
            in_channels=4, out_channels=4, timestep_ratio_embedding_dim=8,
            conditioning_dim=16, block_out_channels=(16, 24),
            num_attention_heads=(2, 2), down_num_layers_per_block=(1, 1),
            up_num_layers_per_block=(1, 1), clip_text_in_channels=32,
            clip_text_pooled_in_channels=32, clip_seq=2,
        )


def cascade_ratio_embedding(ratio: jax.Array, dim: int) -> jax.Array:
    """sin-first sinusoid of ratio·1e4 with (half-1) spacing (:501-513)."""
    r = ratio.astype(jnp.float32) * 10000.0
    half = dim // 2
    emb = math.log(10000.0) / (half - 1)
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb)
    args = r[:, None] * freqs[None]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


def _ln(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    x_f = x.astype(jnp.float32)
    mean = x_f.mean(-1, keepdims=True)
    return ((x_f - mean) * jax.lax.rsqrt(x_f.var(-1, keepdims=True) + eps)).astype(x.dtype)


class CascadeResBlock(nn.Module):
    channels: int
    c_skip: int = 0
    kernel_size: int = 3
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None):
        c = self.channels
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        residual = x
        k = self.kernel_size
        h = nn.Conv(c, (k, k), padding=k // 2, feature_group_count=c,
                    name="depthwise", **common)(x)
        h = _ln(h)
        if skip is not None:
            h = jnp.concatenate([h, skip.astype(h.dtype)], axis=-1)
        h = LoRADense(c * 4, name="channelwise_0", use_bias=True, **common)(h)
        h = nn.gelu(h, approximate=False)
        # GlobalResponseNorm (:138-147): L2 over spatial, / channel mean
        gamma = self.param("grn_gamma", nn.initializers.zeros, (c * 4,), self.param_dtype)
        beta = self.param("grn_beta", nn.initializers.zeros, (c * 4,), self.param_dtype)
        h_f = h.astype(jnp.float32)
        agg = jnp.sqrt(jnp.sum(jnp.square(h_f), axis=(1, 2), keepdims=True))
        snd = agg / (agg.mean(axis=-1, keepdims=True) + 1e-6)
        h = (gamma.astype(jnp.float32) * (h_f * snd) + beta.astype(jnp.float32) + h_f).astype(h.dtype)
        h = LoRADense(c, name="channelwise_1", use_bias=True, **common)(h)
        return h + residual


class CascadeTimestepBlock(nn.Module):
    channels: int
    conds: Tuple[str, ...]
    t_dim: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, r_embed):
        c = self.channels
        common = dict(dtype=jnp.float32, param_dtype=self.param_dtype)
        pieces = jnp.split(r_embed.astype(jnp.float32), len(self.conds) + 1, axis=1)
        ab = LoRADense(2 * c, name="mapper", use_bias=True, **common)(pieces[0])
        a, b = jnp.split(ab, 2, axis=-1)
        for i, cond in enumerate(self.conds):
            ab_c = LoRADense(2 * c, name=f"mapper_{cond}", use_bias=True, **common)(pieces[i + 1])
            ac, bc = jnp.split(ab_c, 2, axis=-1)
            a = a + ac
            b = b + bc
        a = a[:, None, None, :]
        b = b[:, None, None, :]
        return (x.astype(jnp.float32) * (1.0 + a) + b).astype(x.dtype)


class CascadeAttnBlock(nn.Module):
    channels: int
    cond_dim: int
    heads: int
    self_attn: bool = True
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"

    @nn.compact
    def __call__(self, x, clip):
        c = self.channels
        hd = c // self.heads
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        batch, height, width, _ = x.shape

        kv = LoRADense(c, name="kv_mapper", use_bias=True, **common)(
            nn.silu(clip.astype(self.dtype)))
        norm_x = _ln(x)
        tokens = norm_x.reshape(batch, height * width, c)
        if self.self_attn:
            kv = jnp.concatenate([tokens, kv], axis=1)

        q = LoRADense(c, name="to_q", use_bias=True, **common, **lora)(tokens)
        k = LoRADense(c, name="to_k", use_bias=True, **common, **lora)(kv)
        v = LoRADense(c, name="to_v", use_bias=True, **common, **lora)(kv)
        qf = q.reshape(batch, -1, self.heads, hd).astype(jnp.float32).transpose(0, 2, 1, 3)
        kf = k.reshape(batch, -1, self.heads, hd).astype(jnp.float32).transpose(0, 2, 1, 3)
        vf = v.reshape(batch, -1, self.heads, hd).astype(jnp.float32).transpose(0, 2, 1, 3)
        attn = (jax.nn.softmax(qf @ kf.transpose(0, 1, 3, 2) / math.sqrt(hd), -1) @ vf)
        attn = attn.transpose(0, 2, 1, 3).reshape(batch, height * width, c).astype(self.dtype)
        attn = LoRADense(c, name="to_out", use_bias=True, **common, **lora)(attn)
        return x + attn.reshape(batch, height, width, c)


class StableCascadeUNet(nn.Module):
    config: StableCascadeConfig = StableCascadeConfig()
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,  # (B, H, W, in_channels) NHWC
        timestep_ratio: jax.Array,  # (B,) in [0, 1]
        clip_text_pooled: jax.Array,  # (B, 1280) or (B, S_p, 1280)
        clip_text: Optional[jax.Array] = None,  # (B, S, clip_text_in)
    ):
        cfg = self.config
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        levels = len(cfg.block_out_channels)
        batch = sample.shape[0]

        # timestep ratio embedding ++ per-condition zeros (sca/crp unused in
        # training default — reference feeds zeros_like(ratio) :628-636)
        r_embed = cascade_ratio_embedding(timestep_ratio, cfg.timestep_ratio_embedding_dim)
        for _ in cfg.timestep_conditioning_type:
            zero = cascade_ratio_embedding(jnp.zeros_like(timestep_ratio),
                                           cfg.timestep_ratio_embedding_dim)
            r_embed = jnp.concatenate([r_embed, zero], axis=1)

        # CLIP conditioning
        pooled = clip_text_pooled
        if pooled.ndim == 2:
            pooled = pooled[:, None]
        pooled_tokens = LoRADense(
            cfg.conditioning_dim * cfg.clip_seq, name="clip_txt_pooled_mapper",
            use_bias=True, **common,
        )(pooled.astype(self.dtype)).reshape(batch, pooled.shape[1] * cfg.clip_seq, cfg.conditioning_dim)
        if clip_text is not None and cfg.clip_text_in_channels is not None:
            txt = LoRADense(cfg.conditioning_dim, name="clip_txt_mapper", use_bias=True,
                            **common)(clip_text.astype(self.dtype))
            clip = jnp.concatenate([txt, pooled_tokens], axis=1)
        else:
            clip = pooled_tokens
        clip = _ln(clip)

        # embedding: pixel-unshuffle(patch 1 = no-op) + 1x1 conv + LN
        x = nn.Conv(cfg.block_out_channels[0], (1, 1), name="embedding_conv", **common)(
            sample.astype(self.dtype))
        x = _ln(x)

        def run_layer(level, tag, j, x, skip=None):
            res = CascadeResBlock(cfg.block_out_channels[level],
                                  kernel_size=cfg.kernel_size, **common,
                                  name=f"{tag}_{j}_res")
            x = res(x, skip)
            x = CascadeTimestepBlock(
                cfg.block_out_channels[level], cfg.timestep_conditioning_type,
                cfg.timestep_ratio_embedding_dim, **common, name=f"{tag}_{j}_time",
            )(x, r_embed)
            x = CascadeAttnBlock(
                cfg.block_out_channels[level], cfg.conditioning_dim,
                cfg.num_attention_heads[level], True, **common, **lora,
                name=f"{tag}_{j}_attn",
            )(x, clip)
            return x

        # ---- down ------------------------------------------------------------------
        level_outputs = []
        for i in range(levels):
            if i > 0:
                x = _ln(x)
                x = nn.Conv(cfg.block_out_channels[i], (2, 2), strides=(2, 2),
                            name=f"down_scaler_{i}", **common)(x)
            for j in range(cfg.down_num_layers_per_block[i]):
                x = run_layer(i, f"down_{i}", j, x)
            level_outputs.insert(0, x)

        # ---- up --------------------------------------------------------------------
        x = level_outputs[0]
        for u in range(levels):
            level = levels - 1 - u
            for j in range(cfg.up_num_layers_per_block[::-1][level]):
                skip = level_outputs[u] if j == 0 and u > 0 else None
                x = run_layer(level, f"up_{u}", j, x, skip)
            if level > 0:
                x = _ln(x)
                # ConvTranspose k2 s2 == lhs-dilated conv with flipped kernel
                kernel = self.param(
                    f"up_scaler_{u}_kernel", nn.initializers.lecun_normal(),
                    (2, 2, cfg.block_out_channels[level], cfg.block_out_channels[level - 1]),
                    self.param_dtype,
                )
                bias = self.param(f"up_scaler_{u}_bias", nn.initializers.zeros,
                                  (cfg.block_out_channels[level - 1],), self.param_dtype)
                x = jax.lax.conv_general_dilated(
                    x.astype(self.dtype), jnp.flip(kernel, (0, 1)).astype(self.dtype),
                    window_strides=(1, 1), padding=[(1, 1), (1, 1)],
                    lhs_dilation=(2, 2),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ) + bias.astype(self.dtype)

        # clf: LN + 1x1 conv (+ pixelshuffle no-op at patch 1)
        x = _ln(x)
        out = nn.Conv(cfg.out_channels * cfg.patch_size ** 2, (1, 1), name="clf_conv",
                      **common)(x)
        return out.astype(jnp.float32)
