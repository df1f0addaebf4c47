"""HunyuanVideo 1.5 MMDiT in flax.linen — checkpoint-faithful.

Reference behavior: helpers/models/hunyuanvideo/transformer.py (vendored
HunyuanVideo15Transformer3DModel): 54 dual-stream blocks (AdaLayerNormZero on
both streams, joint attention with per-head RMS qk norms, rope on the video
tokens only, theta=256), a 2-block "individual token refiner" over the Qwen
text features (time+pooled-text conditioned gates), a ByT5 glyph projection,
an image-embed projection (i2v), learned cond-type embeddings added per
conditioning source, and an AdaLayerNormContinuous (scale-first) output head.

The reference physically reorders text tokens valid-first per sample; joint
attention is permutation-equivariant over kv and the model output only reads
the video rows, so here invalid tokens are masked via segment ids instead —
same math, static shapes.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops import dot_product_attention
from ..layers import LayerNorm, LoRADense, MLPEmbedder, RMSNorm, timestep_embedding

Dtype = Any


@dataclasses.dataclass(frozen=True)
class HunyuanVideo15Config:
    in_channels: int = 65        # 32 latents + 32 cond latents + 1 mask (i2v packing)
    out_channels: int = 32
    num_heads: int = 16
    head_dim: int = 128
    depth: int = 54
    refiner_depth: int = 2
    mlp_ratio: float = 4.0
    patch: Tuple[int, int, int] = (1, 1, 1)
    text_dim: int = 3584         # Qwen2.5-VL
    text2_dim: int = 1472        # ByT5
    image_embed_dim: int = 1152  # SigLIP
    rope_theta: float = 256.0
    axes_dim: Tuple[int, ...] = (16, 56, 56)

    @property
    def hidden_size(self) -> int:
        return self.num_heads * self.head_dim

    @classmethod
    def tiny(cls) -> "HunyuanVideo15Config":
        return cls(
            in_channels=8, out_channels=8, num_heads=2, head_dim=32, depth=2,
            refiner_depth=1, text_dim=32, text2_dim=24, image_embed_dim=16,
            axes_dim=(8, 12, 12),
        )


def hunyuan_rope(cfg: HunyuanVideo15Config, t: int, h: int, w: int):
    """(seq, head_dim) cos/sin — get_1d_rotary_pos_embed(use_real) per axis with
    repeat_interleave(2) pairing, concatenated over (t, h, w)."""
    parts_cos, parts_sin = [], []
    grids = np.meshgrid(
        np.arange(t, dtype=np.float64),
        np.arange(h, dtype=np.float64),
        np.arange(w, dtype=np.float64),
        indexing="ij",
    )
    for axis, dim in enumerate(cfg.axes_dim):
        pos = grids[axis].reshape(-1)
        inv = 1.0 / (cfg.rope_theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
        freqs = np.outer(pos, inv)
        parts_cos.append(np.repeat(np.cos(freqs), 2, axis=1))
        parts_sin.append(np.repeat(np.sin(freqs), 2, axis=1))
    cos = np.concatenate(parts_cos, axis=1).astype(np.float32)
    sin = np.concatenate(parts_sin, axis=1).astype(np.float32)
    return cos, sin


def _apply_rope_interleaved(x: jax.Array, cos: np.ndarray, sin: np.ndarray) -> jax.Array:
    """x (B, S, H, D); diffusers apply_rotary_emb default (interleaved pairs)."""
    xf = x.astype(jnp.float32)
    c = jnp.asarray(cos)[None, :, None, :]
    s = jnp.asarray(sin)[None, :, None, :]
    x1 = xf[..., 0::2]
    x2 = xf[..., 1::2]
    rotated = jnp.stack([-x2, x1], axis=-1).reshape(xf.shape)
    return (xf * c + rotated * s).astype(x.dtype)


class RefinerBlock(nn.Module):
    """IndividualTokenRefinerBlock: affine LNs, plain self-attention, SiLU-gated
    residuals from an AdaNorm(2·dim) of the refiner temb."""

    config: HunyuanVideo15Config
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, mask_seg):
        cfg = self.config
        dim = cfg.hidden_size
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        batch, seq = x.shape[:2]

        gates = LoRADense(2 * dim, name="adanorm_lin", **common)(
            nn.silu(temb.astype(jnp.float32)).astype(self.dtype)
        )
        gate_msa, gate_mlp = jnp.split(gates, 2, axis=-1)

        x_n = LayerNorm(name="norm1", **common)(x)
        shape = (batch, seq, cfg.num_heads, cfg.head_dim)
        q = LoRADense(dim, name="attn_q", **common)(x_n).reshape(shape)
        k = LoRADense(dim, name="attn_k", **common)(x_n).reshape(shape)
        v = LoRADense(dim, name="attn_v", **common)(x_n).reshape(shape)
        attn = dot_product_attention(
            q, k, v, q_segment_ids=mask_seg, kv_segment_ids=mask_seg
        ).reshape(batch, seq, dim)
        x = x + gate_msa[:, None] * LoRADense(dim, name="attn_proj", **common)(attn)

        h = LoRADense(int(dim * cfg.mlp_ratio), name="ff_in", **common)(
            LayerNorm(name="norm2", **common)(x)
        )
        x = x + gate_mlp[:, None] * LoRADense(dim, name="ff_out", **common)(nn.silu(h))
        return x


class TokenRefiner(nn.Module):
    config: HunyuanVideo15Config
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, text, timesteps, mask):
        cfg = self.config
        dim = cfg.hidden_size
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        if mask is None:
            pooled = text.mean(axis=1)
            mask_seg = None
        else:
            mf = mask.astype(jnp.float32)[..., None]
            pooled = (text.astype(jnp.float32) * mf).sum(1) / jnp.maximum(mf.sum(1), 1.0)
            pooled = pooled.astype(text.dtype)
            # pad tokens -> SEGMENT_PAD_ID so they neither attend nor are attended
            mask_seg = jnp.where(mask.astype(jnp.int32) > 0, 0, -1)

        t_emb = MLPEmbedder(dim, name="time_in", **common)(
            timestep_embedding(timesteps, 256, time_factor=1.0).astype(self.dtype)
        )
        p_emb = MLPEmbedder(dim, name="text_in", **common)(pooled.astype(self.dtype))
        temb = t_emb + p_emb

        x = LoRADense(dim, name="proj_in", **common)(text)
        for i in range(cfg.refiner_depth):
            x = RefinerBlock(cfg, name=f"block_{i}", **common)(x, temb, mask_seg)
        return x


class HunyuanBlock(nn.Module):
    config: HunyuanVideo15Config
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"

    @nn.compact
    def __call__(self, img, txt, temb, rope, segment_ids):
        cfg = self.config
        dim = cfg.hidden_size
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        batch = img.shape[0]
        silu_t = nn.silu(temb.astype(jnp.float32)).astype(self.dtype)

        i_mods = jnp.split(LoRADense(6 * dim, name="norm1_lin", **common)(silu_t), 6, axis=-1)
        t_mods = jnp.split(LoRADense(6 * dim, name="norm1_context_lin", **common)(silu_t), 6, axis=-1)

        img_n = LayerNorm(use_scale=False, use_bias=False, **common)(img)
        img_n = img_n * (1 + i_mods[1][:, None]) + i_mods[0][:, None]
        txt_n = LayerNorm(use_scale=False, use_bias=False, **common)(txt)
        txt_n = txt_n * (1 + t_mods[1][:, None]) + t_mods[0][:, None]

        def qkv(x, prefix, seq):
            shape = (batch, seq, cfg.num_heads, cfg.head_dim)
            q = LoRADense(dim, name=f"{prefix}_q", **common, **lora)(x).reshape(shape)
            k = LoRADense(dim, name=f"{prefix}_k", **common, **lora)(x).reshape(shape)
            v = LoRADense(dim, name=f"{prefix}_v", **common, **lora)(x).reshape(shape)
            q = RMSNorm(name=f"{prefix}_norm_q", **common)(q)
            k = RMSNorm(name=f"{prefix}_norm_k", **common)(k)
            return q, k, v

        iq, ik, iv = qkv(img_n, "img_attn", img.shape[1])
        tq, tk, tv = qkv(txt_n, "txt_attn", txt.shape[1])
        cos, sin = rope
        iq = _apply_rope_interleaved(iq, cos, sin)
        ik = _apply_rope_interleaved(ik, cos, sin)

        # video tokens first, then conditioning tokens (reference processor order)
        q = jnp.concatenate([iq, tq], axis=1)
        k = jnp.concatenate([ik, tk], axis=1)
        v = jnp.concatenate([iv, tv], axis=1)
        attn = dot_product_attention(
            q, k, v, q_segment_ids=segment_ids, kv_segment_ids=segment_ids
        ).reshape(batch, -1, dim)
        img_attn, txt_attn = attn[:, : img.shape[1]], attn[:, img.shape[1]:]

        img = img + i_mods[2][:, None] * LoRADense(dim, name="img_attn_proj", **common, **lora)(img_attn)
        txt = txt + t_mods[2][:, None] * LoRADense(dim, name="txt_attn_proj", **common, **lora)(txt_attn)

        img_m = LayerNorm(use_scale=False, use_bias=False, **common)(img)
        img_m = img_m * (1 + i_mods[4][:, None]) + i_mods[3][:, None]
        h = LoRADense(int(dim * cfg.mlp_ratio), name="img_mlp_in", **common, **lora)(img_m)
        img = img + i_mods[5][:, None] * LoRADense(dim, name="img_mlp_out", **common, **lora)(
            nn.gelu(h, approximate=True)
        )
        txt_m = LayerNorm(use_scale=False, use_bias=False, **common)(txt)
        txt_m = txt_m * (1 + t_mods[4][:, None]) + t_mods[3][:, None]
        h = LoRADense(int(dim * cfg.mlp_ratio), name="txt_mlp_in", **common, **lora)(txt_m)
        txt = txt + t_mods[5][:, None] * LoRADense(dim, name="txt_mlp_out", **common, **lora)(
            nn.gelu(h, approximate=True)
        )
        return img, txt


class HunyuanVideo15Transformer(nn.Module):
    config: HunyuanVideo15Config = HunyuanVideo15Config()
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        latents: jax.Array,          # (B, T, H, W, C_in)
        timesteps: jax.Array,        # (B,) sigma in [0, 1]
        context: jax.Array,          # (B, L1, text_dim) Qwen features
        context_mask: Optional[jax.Array] = None,       # (B, L1)
        context_2: Optional[jax.Array] = None,           # (B, L2, text2_dim) ByT5
        context_2_mask: Optional[jax.Array] = None,
        image_embeds: Optional[jax.Array] = None,        # (B, L3, image_embed_dim)
    ) -> jax.Array:
        cfg = self.config
        dim = cfg.hidden_size
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        batch, t, h, w, channels = latents.shape
        t1000 = timesteps * 1000.0

        x = latents.reshape(batch, t * h * w, channels)
        x = LoRADense(dim, name="patch_in", **common, **lora)(x)

        temb = MLPEmbedder(dim, name="time_in", **common)(
            timestep_embedding(t1000, 256, time_factor=1.0).astype(self.dtype)
        )

        cond_type = self.param(
            "cond_type_embed", nn.initializers.normal(stddev=0.02), (3, dim), self.param_dtype
        )

        txt = TokenRefiner(cfg, name="refiner", **common)(context, t1000, context_mask)
        txt = txt + cond_type[0].astype(self.dtype)

        streams = [txt]
        seg_parts = [
            jnp.where(context_mask.astype(jnp.int32) > 0, 0, -1)
            if context_mask is not None
            else jnp.zeros(txt.shape[:2], jnp.int32)
        ]
        if context_2 is not None:
            t2 = LayerNorm(name="byt5_norm", **common)(context_2)
            t2 = LoRADense(2048, name="byt5_in_1", **common)(t2)
            t2 = LoRADense(2048, name="byt5_in_2", **common)(nn.gelu(t2, approximate=False))
            t2 = LoRADense(dim, name="byt5_in_3", **common)(nn.gelu(t2, approximate=False))
            t2 = t2 + cond_type[1].astype(self.dtype)
            streams.append(t2)
            seg_parts.append(
                jnp.where(context_2_mask.astype(jnp.int32) > 0, 0, -1)
                if context_2_mask is not None
                else jnp.zeros(t2.shape[:2], jnp.int32)
            )
        if image_embeds is not None:
            im = LayerNorm(name="img_embed_norm_in", **common)(image_embeds)
            im = LoRADense(cfg.image_embed_dim, name="img_embed_in_1", **common)(im)
            im = LoRADense(dim, name="img_embed_in_2", **common)(nn.gelu(im, approximate=False))
            im = LayerNorm(name="img_embed_norm_out", **common)(im)
            # t2v batches pass all-zero image embeds: zero the projection (the
            # cond-type embedding still rides along, matching the reference
            # order: zero first, then add cond emb) and mask the tokens out
            is_t2v = jnp.all(image_embeds == 0.0)
            im = jnp.where(is_t2v, 0.0, 1.0) * im + cond_type[2].astype(self.dtype)
            streams.append(im)
            seg_parts.append(
                jnp.where(is_t2v, -1, 0) * jnp.ones(im.shape[:2], jnp.int32)
            )
        txt_all = jnp.concatenate(streams, axis=1)
        txt_seg = jnp.concatenate(seg_parts, axis=1)
        img_seg = jnp.zeros((batch, x.shape[1]), jnp.int32)
        segment_ids = jnp.concatenate([img_seg, txt_seg], axis=1)

        cos, sin = hunyuan_rope(cfg, t, h, w)

        block_cls = nn.remat(HunyuanBlock) if self.remat else HunyuanBlock
        for layer in range(cfg.depth):
            x, txt_all = block_cls(cfg, name=f"block_{layer}", **common, **lora)(
                x, txt_all, temb, (cos, sin), segment_ids
            )
            self.sow("intermediates", f"block_{layer}_hidden", x)

        # AdaLayerNormContinuous: (scale, shift), scale first
        final = LoRADense(2 * dim, name="final_mod", **common)(
            nn.silu(temb.astype(jnp.float32)).astype(self.dtype)
        )
        scale, shift = jnp.split(final, 2, axis=-1)
        x = LayerNorm(use_scale=False, use_bias=False, **common)(x)
        x = x * (1 + scale[:, None]) + shift[:, None]
        x = LoRADense(cfg.out_channels, name="final_proj", **common)(x)
        return x.reshape(batch, t, h, w, cfg.out_channels).astype(jnp.float32)
