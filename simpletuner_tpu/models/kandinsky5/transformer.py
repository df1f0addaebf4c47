"""Kandinsky-5 3D DiT in flax.linen — checkpoint-faithful.

Reference behavior: helpers/models/kandinsky5_video/transformer_kandinsky5.py
(``Kandinsky5Transformer3DModel``, ai-forever Kandinsky 5.0 T2V/T2I "lite"):

- **Embeddings**: sinusoid(time)·[cos,sin] over ``get_freqs(model_dim/2)``
  (:70-72, :235-241) through a 2-layer SiLU MLP to ``time_dim``; text and
  pooled-text linear + affine LayerNorm (:303-311); visual patchify
  (1,2,2) with feature order [p_t, p_h, p_w, c] (:314-336).
- **RoPE**: pairwise 2x2 rotations; 1D over text positions, 3D axis-concat
  over (t, h, w) with per-axis ``scale_factor`` division (:339-388); applied
  to consecutive (even, odd) feature pairs in fp32 (:459-462).
- **Blocks**: zero-init SiLU modulation heads off the time embedding
  (6 params text / 9 visual / 2 out; :391-401); parameter-free LayerNorms;
  attention = biased qkv + per-head affine RMS q/k norms + sdpa + biased out
  (:515-563); feed-forward = bias-free Linear-GELU-Linear (:566-574).
- **Decoder block** (visual, :654-703): modulated self-attention (3D rope),
  modulated cross-attention over the text stream (no rope), modulated FF —
  residual adds computed in fp32.
- **Out layer** (:577-609): 2-param modulation + LN + linear to
  prod(patch)·out_dim, unpatchified with channel order [c, p_t, p_h, p_w].

Timesteps may be per-sample (B,) or tokenwise (B, S_vis) — tokenwise uses
per-token modulation for the visual stream and the token-mean for the text
stream (:910-917).  Layout: flax NTC; visual tokens are the flattened
(t, h', w') grid (fractal_flatten :94-104, block_mask off).
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
class Kandinsky5Config:
    in_visual_dim: int = 4
    out_visual_dim: int = 4
    in_text_dim: int = 3584  # Qwen2.5-VL hidden
    in_text_dim2: int = 768  # CLIP pooled
    time_dim: int = 512
    model_dim: int = 2048
    ff_dim: int = 5120
    num_text_blocks: int = 2
    num_visual_blocks: int = 32
    axes_dims: Tuple[int, int, int] = (16, 24, 24)
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    visual_cond: bool = False  # I2V: input carries [latent, cond, mask]
    rope_scale: Tuple[float, float, float] = (1.0, 2.0, 2.0)

    @property
    def head_dim(self) -> int:
        return sum(self.axes_dims)

    @property
    def num_heads(self) -> int:
        return self.model_dim // self.head_dim

    @property
    def visual_embed_dim(self) -> int:
        return 2 * self.in_visual_dim + 1 if self.visual_cond else self.in_visual_dim

    @classmethod
    def tiny(cls) -> "Kandinsky5Config":
        return cls(
            in_text_dim=24, in_text_dim2=12, time_dim=16, model_dim=32,
            ff_dim=64, num_text_blocks=1, num_visual_blocks=2,
            axes_dims=(4, 6, 6),
        )


def _get_freqs(dim: int) -> np.ndarray:
    return np.exp(-math.log(10000.0) * np.arange(dim, dtype=np.float64) / dim)


def k5_rope_1d(positions: np.ndarray, dim: int) -> jax.Array:
    """1D text rope angles (S, dim/2)."""
    return jnp.asarray(np.outer(positions, _get_freqs(dim // 2)), jnp.float32)


def k5_rope_3d(
    grid: Tuple[int, int, int], axes_dims: Tuple[int, int, int],
    scale: Tuple[float, float, float] = (1.0, 1.0, 1.0),
) -> jax.Array:
    """3D rope angles for the flattened (t, h, w) grid → (t·h·w, head_dim/2);
    per-axis angle tables divided by ``scale_factor`` (reference :370-383)."""
    t, h, w = grid
    t_args = np.outer(np.arange(t), _get_freqs(axes_dims[0] // 2)) / scale[0]
    h_args = np.outer(np.arange(h), _get_freqs(axes_dims[1] // 2)) / scale[1]
    w_args = np.outer(np.arange(w), _get_freqs(axes_dims[2] // 2)) / scale[2]
    full = np.concatenate(
        [
            np.tile(t_args[:, None, None, :], (1, h, w, 1)),
            np.tile(h_args[None, :, None, :], (t, 1, w, 1)),
            np.tile(w_args[None, None, :, :], (t, h, 1, 1)),
        ],
        axis=-1,
    )
    return jnp.asarray(full.reshape(t * h * w, -1), jnp.float32)


def k5_apply_rope(x: jax.Array, angles: jax.Array) -> jax.Array:
    """Pairwise rotation on consecutive feature pairs, computed fp32
    (reference apply_rotary :459-462)."""
    cos = jnp.cos(angles)[None, :, None, :]
    sin = jnp.sin(angles)[None, :, None, :]
    x_f = x.astype(jnp.float32)
    x0, x1 = x_f[..., 0::2], x_f[..., 1::2]
    out = jnp.stack([cos * x0 - sin * x1, sin * x0 + cos * x1], axis=-1)
    return out.reshape(x.shape).astype(x.dtype)


def _ln(x: jax.Array) -> jax.Array:
    """Parameter-free LayerNorm in fp32 (torch elementwise_affine=False)."""
    x_f = x.astype(jnp.float32)
    mean = x_f.mean(-1, keepdims=True)
    var = x_f.var(-1, keepdims=True)
    return (x_f - mean) * jax.lax.rsqrt(var + 1e-5)


class K5Modulation(nn.Module):
    """Zero-init SiLU modulation head (reference :391-401), fp32."""

    num_params: int
    model_dim: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t):  # (B, time_dim) or (B, S, time_dim)
        out = LoRADense(
            self.num_params * self.model_dim, name="out_layer",
            kernel_init=nn.initializers.zeros, dtype=jnp.float32,
            param_dtype=self.param_dtype,
        )(nn.silu(t.astype(jnp.float32)))
        return out


class K5Attention(nn.Module):
    """Biased qkv + per-head affine RMS norms + pairwise rope
    (reference :515-563)."""

    config: Kandinsky5Config
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"

    @nn.compact
    def __call__(self, x, context=None, angles=None):
        cfg = self.config
        heads, hd = cfg.num_heads, cfg.head_dim
        ctx = x if context is None else context
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        batch, s_q = x.shape[:2]
        s_kv = ctx.shape[1]

        q = LoRADense(cfg.model_dim, name="to_query", **common, **lora)(x).reshape(batch, s_q, heads, hd)
        k = LoRADense(cfg.model_dim, name="to_key", **common, **lora)(ctx).reshape(batch, s_kv, heads, hd)
        v = LoRADense(cfg.model_dim, name="to_value", **common, **lora)(ctx).reshape(batch, s_kv, heads, hd)

        def rms(name, a):
            g = self.param(name, nn.initializers.ones, (hd,), self.param_dtype)
            a_f = a.astype(jnp.float32)
            y = a_f * jax.lax.rsqrt(jnp.mean(jnp.square(a_f), -1, keepdims=True) + 1e-6)
            return (y * g).astype(a.dtype)

        q = rms("query_norm", q)
        k = rms("key_norm", k)
        if angles is not None:
            q = k5_apply_rope(q, angles)
            k = k5_apply_rope(k, angles)

        from ...ops import dot_product_attention

        out = dot_product_attention(q, k, v).reshape(batch, s_q, cfg.model_dim)
        return LoRADense(cfg.model_dim, name="out_layer", **common, **lora)(out)


class K5FeedForward(nn.Module):
    """Bias-free Linear-GELU-Linear (reference :566-574, exact gelu)."""

    config: Kandinsky5Config
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype, use_bias=False)
        h = LoRADense(cfg.ff_dim, name="in_layer", **common, **lora)(x)
        h = nn.gelu(h, approximate=False)
        return LoRADense(cfg.model_dim, name="out_layer", **common, **lora)(h)


def _modulate(x, shift, scale):
    """fp32 LN-modulate; shift/scale (B, D) or (B, S, D)."""
    if shift.ndim == 2:
        shift, scale = shift[:, None], scale[:, None]
    return (_ln(x) * (scale + 1.0) + shift).astype(x.dtype)


def _gated_add(x, gate, out):
    if gate.ndim == 2:
        gate = gate[:, None]
    return (x.astype(jnp.float32) + gate * out.astype(jnp.float32)).astype(x.dtype)


class K5EncoderBlock(nn.Module):
    """Text block (reference :612-651): 6-param modulation, self-attn, FF."""

    config: Kandinsky5Config
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"

    @nn.compact
    def __call__(self, x, t, angles):
        cfg = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        mods = K5Modulation(6, cfg.model_dim, self.dtype, self.param_dtype,
                            name="text_modulation")(t)
        attn_p, ff_p = jnp.split(mods, 2, axis=-1)
        shift, scale, gate = jnp.split(attn_p, 3, axis=-1)
        out = K5Attention(cfg, name="self_attention", **kw)(_modulate(x, shift, scale), angles=angles)
        x = _gated_add(x, gate, out)
        shift, scale, gate = jnp.split(ff_p, 3, axis=-1)
        out = K5FeedForward(cfg, name="feed_forward", **kw)(_modulate(x, shift, scale))
        return _gated_add(x, gate, out)


class K5DecoderBlock(nn.Module):
    """Visual block (reference :654-703): 9-param modulation, self-attn with
    3D rope, cross-attn over text, FF."""

    config: Kandinsky5Config
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"

    @nn.compact
    def __call__(self, x, text, t, angles):
        cfg = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        mods = K5Modulation(9, cfg.model_dim, self.dtype, self.param_dtype,
                            name="visual_modulation")(t)
        attn_p, cross_p, ff_p = jnp.split(mods, 3, axis=-1)

        shift, scale, gate = jnp.split(attn_p, 3, axis=-1)
        out = K5Attention(cfg, name="self_attention", **kw)(_modulate(x, shift, scale), angles=angles)
        x = _gated_add(x, gate, out)

        shift, scale, gate = jnp.split(cross_p, 3, axis=-1)
        out = K5Attention(cfg, name="cross_attention", **kw)(_modulate(x, shift, scale), context=text)
        x = _gated_add(x, gate, out)

        shift, scale, gate = jnp.split(ff_p, 3, axis=-1)
        out = K5FeedForward(cfg, name="feed_forward", **kw)(_modulate(x, shift, scale))
        return _gated_add(x, gate, out)


def k5_patchify(x: jax.Array, patch: Tuple[int, int, int]) -> jax.Array:
    """(B, T, H, W, C) → (B, T/pt, H/ph, W/pw, pt·ph·pw·C) in the reference
    [p_t, p_h, p_w, c] feature order (:320-336)."""
    b, t, h, w, c = x.shape
    pt, ph, pw = patch
    x = x.reshape(b, t // pt, pt, h // ph, ph, w // pw, pw, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(b, t // pt, h // ph, w // pw, pt * ph * pw * c)


def k5_unpatchify(x: jax.Array, patch: Tuple[int, int, int], out_dim: int) -> jax.Array:
    """(B, T', H', W', prod(patch)·C) → (B, T, H, W, C); the out layer's
    channel order is [c, p_t, p_h, p_w] (:592-608)."""
    b, t, h, w, _ = x.shape
    pt, ph, pw = patch
    x = x.reshape(b, t, h, w, out_dim, pt, ph, pw)
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)
    return x.reshape(b, t * pt, h * ph, w * pw, out_dim)


class Kandinsky5Transformer(nn.Module):
    config: Kandinsky5Config = Kandinsky5Config()
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        latents: jax.Array,  # (B, T, H, W, visual_embed_dim) NTHWC
        text_embeds: jax.Array,  # (B, S_txt, in_text_dim)
        pooled_embeds: jax.Array,  # (B, in_text_dim2)
        timesteps: jax.Array,  # (B,) or (B, S_vis) tokenwise
    ):
        cfg = self.config
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        batch = latents.shape[0]

        # ---- time embedding (fp32 sinusoid + SiLU MLP, reference :235-241) ----
        freqs = jnp.asarray(_get_freqs(cfg.model_dim // 2), jnp.float32)
        t_flat = timesteps.astype(jnp.float32).reshape(-1)
        args = t_flat[:, None] * freqs[None]
        sinusoid = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
        temb = LoRADense(cfg.time_dim, name="time_in", dtype=jnp.float32,
                         param_dtype=self.param_dtype)(sinusoid)
        temb = LoRADense(cfg.time_dim, name="time_out", dtype=jnp.float32,
                         param_dtype=self.param_dtype)(nn.silu(temb))
        temb = temb.reshape(*timesteps.shape, cfg.time_dim)

        # pooled text → time_dim (linear + affine LN, reference :303-311)
        pooled = LoRADense(cfg.time_dim, name="pooled_in", **common)(pooled_embeds.astype(self.dtype))
        pooled = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                              param_dtype=self.param_dtype, name="pooled_norm")(
            pooled.astype(jnp.float32))
        if temb.ndim == 2:
            text_time = temb + pooled
            visual_time = text_time
        else:  # tokenwise (B, S_vis, time_dim)
            visual_time = temb + pooled[:, None]
            text_time = visual_time.mean(axis=1)

        # ---- streams ---------------------------------------------------------------
        text = LoRADense(cfg.model_dim, name="text_in", **common)(text_embeds.astype(self.dtype))
        text = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=self.param_dtype,
                            name="text_norm")(text.astype(jnp.float32)).astype(self.dtype)

        vis_grid = k5_patchify(latents.astype(self.dtype), cfg.patch_size)
        t_len, h_len, w_len = vis_grid.shape[1:4]
        visual = LoRADense(cfg.model_dim, name="visual_in", **common, **lora)(vis_grid)
        visual = visual.reshape(batch, t_len * h_len * w_len, cfg.model_dim)

        text_angles = k5_rope_1d(np.arange(text.shape[1]), cfg.head_dim)
        vis_angles = k5_rope_3d((t_len, h_len, w_len), cfg.axes_dims, cfg.rope_scale)

        enc_cls = K5EncoderBlock
        dec_cls = K5DecoderBlock
        if self.remat:
            enc_cls = nn.remat(K5EncoderBlock)
            dec_cls = nn.remat(K5DecoderBlock)

        for i in range(cfg.num_text_blocks):
            text = enc_cls(cfg, name=f"text_block_{i}", **common, **lora)(text, text_time, text_angles)
        for i in range(cfg.num_visual_blocks):
            visual = dec_cls(cfg, name=f"visual_block_{i}", **common, **lora)(
                visual, text, visual_time, vis_angles
            )
            self.sow("intermediates", f"visual_block_{i}_hidden", visual)

        # ---- out layer (2-param modulation, reference :577-609) --------------------
        mods = K5Modulation(2, cfg.model_dim, self.dtype, self.param_dtype,
                            name="out_modulation")(visual_time)
        shift, scale = jnp.split(mods, 2, axis=-1)
        visual = _modulate(visual, shift, scale)
        out = LoRADense(
            int(np.prod(cfg.patch_size)) * cfg.out_visual_dim, name="out_proj", **common, **lora
        )(visual)
        out = out.reshape(batch, t_len, h_len, w_len, -1)
        return k5_unpatchify(out, cfg.patch_size, cfg.out_visual_dim).astype(jnp.float32)
