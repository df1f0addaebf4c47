"""Zlab i1 transformer (faithful architecture).

Reference: helpers/models/zlab_i1/transformer.py ``ZlabI1Transformer2DModel``
— a timestep-FREE U-ViT MMDiT (forward does ``del t``, :693; the frozen
t_embedder never runs):

* Conv patch embed + interpolated 2-D sincos position table added to image
  tokens (:123-131, :703); the sincos grid uses ``np.meshgrid(grid_w,
  grid_h)`` so the first half of the embedding encodes the COLUMN coordinate
  (:38-52) — reproduced verbatim;
* a 2-block text connector ("TextEncoderAdapterTransformer", :204-242) with a
  learnable null caption for dropout;
* U-ViT skip topology: depth//2 in blocks, one mid block, depth//2 out blocks
  whose inputs concat the LIFO-popped in-block outputs through
  ``skip_linear_{image,text}`` (:386-440, :882-921);
* MMDiT attention with separate image/text fused qkv, SHARED per-head RMS
  q/k norms (eps 1e-6), 3-axis rope — axis 0 is the caption index (image
  tokens sit at the per-sample valid text LENGTH), axes 1/2 are the image
  grid scaled by 256/image_resolution (:244-321, :614-652);
* blocks share ONE norm1 across modalities and post-norm the attention/mlp
  outputs through shared norm3/norm4 (:403-440); masked text tokens are
  zeroed after attention and at block end;
* SwiGLU FFN with fused ``w12`` and hidden ``int(2/3*int(dim*mlp_ratio))``;
* final RMSNorm + linear, NO adaLN (:442-450).

TPU-native notes: static shapes; batch-level caption masking uses
segment-ids inside the fused attention instead of additive masks; image
rows/cols positions are computed inline (the reference's precomputed clamp
tables are an optimization, not semantics).
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
from ..layers import LoRADense, RMSNorm

Dtype = Any


@dataclasses.dataclass(frozen=True)
class ZlabI1Config:
    input_size: int = 128  # latent pixels (1024 // 8)
    image_resolution: int = 1024
    patch_size: int = 2
    in_channels: int = 32
    hidden_size: int = 2016
    depth: int = 29
    num_heads: int = 28
    mlp_ratio: float = 4.0
    text_embed_dim: int = 2304
    text_num_tokens: int = 256
    rope_theta: float = 10000.0
    norm_eps: float = 1e-6

    @classmethod
    def tiny(cls) -> "ZlabI1Config":
        return cls(
            input_size=16, image_resolution=128, in_channels=8, hidden_size=96,
            depth=3, num_heads=4, text_embed_dim=32, text_num_tokens=12,
        )

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def num_in_blocks(self) -> int:
        return self.depth // 2

    @property
    def ffn_inner(self) -> int:
        return int(2 / 3 * int(self.hidden_size * self.mlp_ratio))

    @property
    def axes_dims(self) -> Tuple[int, int, int]:
        # reference _default_rope_axes_dims (:74-92)
        head_dim = self.head_dim
        time_dim = head_dim // 2
        if time_dim % 2 != 0:
            time_dim -= 1
        remaining = head_dim - time_dim
        row_dim = remaining // 2
        col_dim = remaining - row_dim
        if row_dim % 2 != 0:
            row_dim -= 1
            col_dim += 1
        if col_dim % 2 != 0:
            col_dim -= 1
            row_dim += 1
        return time_dim, row_dim, col_dim


def _get_1d_pos_embed(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega /= embed_dim / 2.0
    omega = 1.0 / 10000 ** omega
    out = np.outer(pos.reshape(-1), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def sincos_pos_embed(
    embed_dim: int,
    grid_height: int,
    grid_width: int,
    image_height: int,
    image_width: int,
    base_image_resolution: int = 256,
) -> np.ndarray:
    """Reference _get_interpolated/_rectangular_pos_embed (:38-72): meshgrid
    (w, h) in 'xy' indexing, so the first half encodes the column axis."""
    scale_h = float(base_image_resolution) / float(image_height)
    scale_w = float(base_image_resolution) / float(image_width)
    grid_h = np.arange(grid_height, dtype=np.float32) * scale_h
    grid_w = np.arange(grid_width, dtype=np.float32) * scale_w
    grid = np.meshgrid(grid_w, grid_h)
    grid = np.stack(grid, axis=0).reshape([2, 1, grid_height, grid_width])
    emb_h = _get_1d_pos_embed(embed_dim // 2, grid[0])
    emb_w = _get_1d_pos_embed(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1).astype(np.float32)


def rope_angles(
    positions: jax.Array,  # (B, S, 3) float/int
    axes_dims: Tuple[int, int, int],
    axes_scales: Tuple[float, float, float],
    theta: float,
) -> Tuple[jax.Array, jax.Array]:
    """angle = pos * scale * theta^{-2i/d} per axis, concatenated (:264-302)."""
    cos_parts, sin_parts = [], []
    for axis, (dim, scale) in enumerate(zip(axes_dims, axes_scales)):
        steps = jnp.arange(0, dim, 2, dtype=jnp.float32)
        base = 1.0 / (theta ** (steps / dim))
        ang = positions[..., axis].astype(jnp.float32)[..., None] * scale * base
        cos_parts.append(jnp.cos(ang))
        sin_parts.append(jnp.sin(ang))
    return jnp.concatenate(cos_parts, axis=-1), jnp.concatenate(sin_parts, axis=-1)


def apply_rope(x: jax.Array, angles: Tuple[jax.Array, jax.Array]) -> jax.Array:
    """(B, S, H, D) consecutive-pair rotation (reference reshape(..., d/2, 2),
    :305-318)."""
    cos, sin = angles
    cos = cos[:, :, None, :].astype(jnp.float32)
    sin = sin[:, :, None, :].astype(jnp.float32)
    x_f = x.astype(jnp.float32)
    x0, x1 = x_f[..., 0::2], x_f[..., 1::2]
    o0 = x0 * cos - x1 * sin
    o1 = x0 * sin + x1 * cos
    return jnp.stack([o0, o1], axis=-1).reshape(x.shape).astype(x.dtype)


class SwiGLUFFN(nn.Module):
    """w3(silu(x1) * x2) where (x1, x2) = chunk(w12 x) (:155-164)."""

    config: ZlabI1Config
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x12 = LoRADense(2 * cfg.ffn_inner, name="w12", **common, **lora)(x)
        x1, x2 = jnp.split(x12, 2, axis=-1)
        h = (jax.nn.silu(x1.astype(jnp.float32)) * x2.astype(jnp.float32)).astype(self.dtype)
        return LoRADense(cfg.hidden_size, name="w3", **common, **lora)(h)


class ConnectorAttention(nn.Module):
    """Self-attention with fused qkv and per-head RMS q/k norms (:176-202)."""

    config: ZlabI1Config
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        dh = cfg.head_dim
        batch, seq = x.shape[:2]
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        norm = dict(eps=cfg.norm_eps, dtype=self.dtype, param_dtype=self.param_dtype)
        qkv = LoRADense(3 * cfg.hidden_size, name="qkv", **common, **lora)(x)
        qkv = qkv.reshape(batch, seq, 3, cfg.num_heads, dh)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = RMSNorm(name="q_norm", **norm)(q)
        k = RMSNorm(name="k_norm", **norm)(k)
        out = dot_product_attention(q, k, v).reshape(batch, seq, cfg.hidden_size)
        return LoRADense(cfg.hidden_size, name="proj", **common, **lora)(out)


class TextAdapter(nn.Module):
    """Two residual attention+mlp rounds over caption embeds (:204-242)."""

    config: ZlabI1Config
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"

    @nn.compact
    def __call__(self, caption: jax.Array, dropout_mask: Optional[jax.Array] = None) -> jax.Array:
        cfg = self.config
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        norm = dict(eps=cfg.norm_eps, dtype=self.dtype, param_dtype=self.param_dtype)
        null_caption = self.param(
            "null_caption", nn.initializers.zeros,
            (1, cfg.text_num_tokens, cfg.text_embed_dim), self.param_dtype,
        )
        if dropout_mask is not None:
            caption = jnp.where(
                dropout_mask[:, None, None] > 0, null_caption.astype(caption.dtype), caption
            )
        x = LoRADense(cfg.hidden_size, name="connector_in", **common, **lora)(
            caption.astype(self.dtype)
        )
        x = x + ConnectorAttention(cfg, name="connector_attn", **common, **lora)(
            RMSNorm(name="connector_norm1", **norm)(x)
        )
        x = x + SwiGLUFFN(cfg, name="connector_mlp", **common, **lora)(
            RMSNorm(name="connector_norm2", **norm)(x)
        )
        x = x + ConnectorAttention(cfg, name="connector_attn2", **common, **lora)(
            RMSNorm(name="connector_norm3", **norm)(x)
        )
        return x + SwiGLUFFN(cfg, name="connector_mlp2", **common, **lora)(
            RMSNorm(name="connector_norm4", **norm)(x)
        )


class I1Block(nn.Module):
    """i1DiTBlock (:386-440): shared norm1, MMDiT attention, post-norms."""

    config: ZlabI1Config
    use_skip: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"

    @nn.compact
    def __call__(
        self,
        image_tokens: jax.Array,  # (B, Si, D)
        text_tokens: jax.Array,  # (B, St, D)
        image_angles,
        text_angles,
        text_mask: jax.Array,  # (B, St) 1 = valid
        skip: Optional[Tuple[jax.Array, jax.Array]] = None,
    ):
        cfg = self.config
        dh = cfg.head_dim
        batch, img_len = image_tokens.shape[:2]
        text_len = text_tokens.shape[1]
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        norm = dict(eps=cfg.norm_eps, dtype=self.dtype, param_dtype=self.param_dtype)

        if self.use_skip:
            image_tokens = LoRADense(cfg.hidden_size, name="skip_image", **common, **lora)(
                jnp.concatenate([image_tokens, skip[0]], axis=-1)
            )
            text_tokens = LoRADense(cfg.hidden_size, name="skip_text", **common, **lora)(
                jnp.concatenate([text_tokens, skip[1]], axis=-1)
            )

        norm1 = RMSNorm(name="norm1", **norm)  # SHARED across modalities
        img_n = norm1(image_tokens)
        txt_n = norm1(text_tokens)

        def project(prefix: str, x: jax.Array):
            qkv = LoRADense(3 * cfg.hidden_size, name=f"qkv_{prefix}", **common, **lora)(x)
            qkv = qkv.reshape(batch, x.shape[1], 3, cfg.num_heads, dh)
            return qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        q_i, k_i, v_i = project("image", img_n)
        q_t, k_t, v_t = project("text", txt_n)
        q_norm = RMSNorm(name="q_norm", **norm)
        k_norm = RMSNorm(name="k_norm", **norm)
        q_i, q_t = q_norm(q_i), q_norm(q_t)
        k_i, k_t = k_norm(k_i), k_norm(k_t)
        q_i = apply_rope(q_i, image_angles)
        k_i = apply_rope(k_i, image_angles)
        q_t = apply_rope(q_t, text_angles)
        k_t = apply_rope(k_t, text_angles)

        q = jnp.concatenate([q_i, q_t], axis=1)
        k = jnp.concatenate([k_i, k_t], axis=1)
        v = jnp.concatenate([v_i, v_t], axis=1)
        key_mask = jnp.concatenate(
            [jnp.ones((batch, img_len), jnp.int32), text_mask.astype(jnp.int32)], axis=1
        )
        out = dot_product_attention(
            q, k, v,
            q_segment_ids=jnp.ones_like(key_mask),
            kv_segment_ids=key_mask,
        ).reshape(batch, img_len + text_len, cfg.hidden_size)
        out = out * key_mask[:, :, None].astype(out.dtype)  # zero masked rows (:381)
        img_attn = LoRADense(cfg.hidden_size, name="proj_image", **common, **lora)(
            out[:, :img_len]
        )
        txt_attn = LoRADense(cfg.hidden_size, name="proj_text", **common, **lora)(
            out[:, img_len:]
        )

        norm3 = RMSNorm(name="norm3", **norm)
        image_tokens = image_tokens + norm3(img_attn)
        text_tokens = text_tokens + norm3(txt_attn)
        norm2 = RMSNorm(name="norm2", **norm)
        norm4 = RMSNorm(name="norm4", **norm)
        image_tokens = image_tokens + norm4(
            SwiGLUFFN(cfg, name="mlp_image", **common, **lora)(norm2(image_tokens))
        )
        text_tokens = text_tokens + norm4(
            SwiGLUFFN(cfg, name="mlp_text", **common, **lora)(norm2(text_tokens))
        )
        text_tokens = text_tokens * text_mask[:, :, None].astype(text_tokens.dtype)
        return image_tokens, text_tokens


class ZlabI1Transformer(nn.Module):
    config: ZlabI1Config = ZlabI1Config()
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        latents: jax.Array,  # (B, H, W, 32) noisy i1 latents
        timesteps: jax.Array,  # accepted and IGNORED (reference forward del t)
        context: jax.Array,  # (B, T, text_embed_dim)
        context_mask: Optional[jax.Array] = None,  # (B, T) 1 = valid
        caption_dropout: Optional[jax.Array] = None,  # (B,) 1 = use null caption
    ) -> jax.Array:
        del timesteps
        cfg = self.config
        p = cfg.patch_size
        batch, height, width, channels = latents.shape
        hh, ww = height // p, width // p
        img_len = hh * ww
        text_len = context.shape[1]
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        norm = dict(eps=cfg.norm_eps, dtype=self.dtype, param_dtype=self.param_dtype)
        if context_mask is None:
            context_mask = jnp.ones((batch, text_len), jnp.int32)
        context_mask = context_mask.astype(jnp.int32)

        # --- image tokens: conv patch embed (c, ph, pw flatten) + sincos table -------------
        x = latents.astype(self.dtype).reshape(batch, hh, p, ww, p, channels)
        x = jnp.transpose(x, (0, 1, 3, 5, 2, 4)).reshape(batch, img_len, channels * p * p)
        x = LoRADense(cfg.hidden_size, name="x_embedder", **common, **lora)(x)
        image_height = hh * p * 8
        image_width = ww * p * 8
        hw = cfg.input_size // p
        # the trainable table always exists at the native grid (so the param
        # tree is resolution-independent); non-native grids use a recomputed
        # rectangular table exactly like the reference (:625-640)
        native_table = sincos_pos_embed(
            cfg.hidden_size, hw, hw, cfg.image_resolution, cfg.image_resolution
        ).reshape(1, hw * hw, cfg.hidden_size)
        pos_param = self.param("pos_embed", lambda rng: jnp.asarray(native_table))
        if hh == hw and ww == hw:
            pos = pos_param
        else:
            pos_table = sincos_pos_embed(cfg.hidden_size, hh, ww, image_height, image_width)
            pos = jnp.asarray(pos_table.reshape(1, img_len, cfg.hidden_size))
        x = x + pos.astype(self.dtype)

        # --- text tokens through the connector ----------------------------------------------
        text_tokens = TextAdapter(cfg, name="text_adapter", **common, **lora)(
            context, caption_dropout
        )

        # --- rope position ids (:614-652): caption (i,0,0) masked->0; image
        # (text_valid_len, row, col) with spatial scale 256/image_resolution ---------------
        text_lengths = jnp.sum(context_mask, axis=1)  # (B,)
        cap_pos0 = jnp.where(
            context_mask > 0, jnp.arange(text_len, dtype=jnp.int32)[None, :], 0
        )
        zeros_cap = jnp.zeros_like(cap_pos0)
        cap_positions = jnp.stack([cap_pos0, zeros_cap, zeros_cap], axis=-1)
        rows = jnp.repeat(jnp.arange(hh, dtype=jnp.int32), ww)
        cols = jnp.tile(jnp.arange(ww, dtype=jnp.int32), hh)
        img_positions = jnp.stack(
            [
                jnp.broadcast_to(text_lengths[:, None], (batch, img_len)),
                jnp.broadcast_to(rows[None], (batch, img_len)),
                jnp.broadcast_to(cols[None], (batch, img_len)),
            ],
            axis=-1,
        )
        image_scale = 256.0 / float(image_height)
        image_scale_w = 256.0 / float(image_width)
        axes_dims = cfg.axes_dims
        # reference builds one (cos, sin) per axis with per-axis scales; the
        # time axis (captions + image "time" = text length) is unscaled
        text_angles = rope_angles(cap_positions, axes_dims, (1.0, image_scale, image_scale_w), cfg.rope_theta)
        image_angles = rope_angles(img_positions, axes_dims, (1.0, image_scale, image_scale_w), cfg.rope_theta)

        block = dict(**common, **lora)
        block_cls = nn.remat(I1Block, static_argnums=()) if self.remat else I1Block

        skips = []
        image_tokens = x
        layer_idx = 0
        for i in range(cfg.num_in_blocks):
            image_tokens, text_tokens = block_cls(cfg, name=f"in_{i}", **block)(
                image_tokens, text_tokens, image_angles, text_angles, context_mask
            )
            skips.append((image_tokens, text_tokens))
            self.sow("intermediates", f"layer_{layer_idx}_hidden", image_tokens)
            layer_idx += 1

        image_tokens, text_tokens = block_cls(cfg, name="mid", **block)(
            image_tokens, text_tokens, image_angles, text_angles, context_mask
        )
        self.sow("intermediates", f"layer_{layer_idx}_hidden", image_tokens)
        layer_idx += 1

        for i in range(cfg.num_in_blocks):
            skip = skips.pop()  # LIFO: out block 0 pairs with the LAST in block
            image_tokens, text_tokens = block_cls(cfg, use_skip=True, name=f"out_{i}", **block)(
                image_tokens, text_tokens, image_angles, text_angles, context_mask, skip
            )
            self.sow("intermediates", f"layer_{layer_idx}_hidden", image_tokens)
            layer_idx += 1

        out = RMSNorm(name="final_norm", **norm)(image_tokens)
        out = LoRADense(p * p * channels, name="final_linear", **common, **lora)(out)
        out = out.reshape(batch, hh, ww, p, p, channels)
        out = jnp.transpose(out, (0, 1, 3, 2, 4, 5)).reshape(batch, height, width, channels)
        return out.astype(jnp.float32)
