"""Sana-Video linear-attention video DiT in flax.linen — checkpoint-faithful.

Reference behavior: helpers/models/sanavideo/transformer.py
(``SanaVideoTransformer3DModel``, Efficient-Large-Model SANA-Video 2B):

- **Patch embedding**: Conv3d k=stride=(1,2,2) → token stream (:719-720,
  :868-869); inverse unpatchify permute (0,7,1,4,2,5,3,6) at the output
  (:1174-1179).
- **RoPE** (:193-254): per-axis tables built with dims (hd−4·(hd//6),
  2·(hd//6), 2·(hd//6)) pairwise-duplicated, then SPLIT with the DIFFERENT
  sizes (hd−2·(hd//3), hd//3, hd//3) — the reference reproduces this
  asymmetry and so do we; applied with interleaved-pair rotation using
  cos[0::2]/sin[1::2] (:152-166).
- **Linear self-attention** (:115-190): relu feature maps; rope applied
  AFTER relu; the normalizer ``z`` uses the UNROTATED q/k while the score
  matmuls use the rotated ones (:177-182); q/k norms are affine RMS ACROSS
  heads (full inner width, eps 1e-5).
- **Cross attention** (:433-510): standard sdpa with across-heads RMS q/k
  norms and biased projections.
- **FFN** (:59-112 ``GLUMBTempConv``): per-frame GLUMBConv (inverted conv ×2
  width, depthwise 3x3, glu, pointwise) plus a bias-free temporal conv (3,1)
  residual over (T, H·W); no residual_connection inside the block FFN.
- **Modulation**: AdaLayerNormSingle (pixart convention) → shared 6-param
  vector + per-block additive ``scale_shift_table`` (:570, :592-595);
  (2, dim) table + embedded timestep at the output (:769-771, :1170).

Only the shipped ``guidance_embeds=False`` configuration is ported.
Layout: flax NTHWC in/out; tokens flattened (t, h, w).
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
class SanaVideoConfig:
    in_channels: int = 16
    out_channels: int = 16
    num_heads: int = 20
    head_dim: int = 112
    num_layers: int = 20
    cross_heads: int = 20
    cross_head_dim: int = 112
    caption_channels: int = 2304
    mlp_ratio: float = 2.5
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    rope_max_seq_len: int = 1024
    norm_eps: float = 1e-6

    @property
    def hidden_size(self) -> int:
        return self.num_heads * self.head_dim

    @classmethod
    def tiny(cls) -> "SanaVideoConfig":
        # head_dim 12: the build dims (4,4,4) and split sizes (4,4,4) coincide
        return cls(
            in_channels=4, out_channels=4, num_heads=2, head_dim=12,
            num_layers=2, cross_heads=2, cross_head_dim=12, caption_channels=32,
            mlp_ratio=1.0, rope_max_seq_len=64,
        )


def sanavideo_rope(config: SanaVideoConfig, grid: Tuple[int, int, int]):
    """Reference WanRotaryPosEmbed (:193-254): build per-axis
    pairwise-duplicated tables with dims (t_dim, h_dim, w_dim), concat, then
    split with the (different) thirds sizes and tile over the (t, h, w) grid.
    Returns cos/sin (S, head_dim)."""
    hd = config.head_dim
    h_dim = w_dim = 2 * (hd // 6)
    t_dim = hd - h_dim - w_dim
    max_len = config.rope_max_seq_len

    tables_cos, tables_sin = [], []
    for dim in (t_dim, h_dim, w_dim):
        freqs = 1.0 / 10000.0 ** (np.arange(0, dim, 2, dtype=np.float64) / dim)
        ang = np.outer(np.arange(max_len, dtype=np.float64), freqs)
        tables_cos.append(np.repeat(np.cos(ang), 2, axis=1))
        tables_sin.append(np.repeat(np.sin(ang), 2, axis=1))
    full_cos = np.concatenate(tables_cos, axis=1)
    full_sin = np.concatenate(tables_sin, axis=1)

    split = [hd - 2 * (hd // 3), hd // 3, hd // 3]
    bounds = np.cumsum([0] + split)
    t, h, w = grid
    parts_cos, parts_sin = [], []
    for i, size in enumerate((t, h, w)):
        seg_c = full_cos[:size, bounds[i]:bounds[i + 1]]
        seg_s = full_sin[:size, bounds[i]:bounds[i + 1]]
        shape = [1, 1, 1, seg_c.shape[1]]
        shape[i] = size
        reps = [t, h, w, 1]
        reps[i] = 1
        parts_cos.append(np.tile(seg_c.reshape(shape), reps))
        parts_sin.append(np.tile(seg_s.reshape(shape), reps))
    cos = np.concatenate(parts_cos, axis=-1).reshape(t * h * w, hd)
    sin = np.concatenate(parts_sin, axis=-1).reshape(t * h * w, hd)
    return jnp.asarray(cos, jnp.float32), jnp.asarray(sin, jnp.float32)


def _apply_sv_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Interleaved-pair rotation with cos[0::2] / sin[1::2] (:152-166)."""
    c = cos[None, :, None, 0::2]
    s = sin[None, :, None, 1::2]
    x1, x2 = x[..., 0::2], x[..., 1::2]
    out = jnp.stack([x1 * c - x2 * s, x1 * s + x2 * c], axis=-1)
    return out.reshape(x.shape).astype(x.dtype)


def _rms_across_heads(x: jax.Array, scale: jax.Array) -> jax.Array:
    """Affine RMS over the full inner width (qk_norm='rms_norm_across_heads',
    eps 1e-5), applied before the head unflatten."""
    x_f = x.astype(jnp.float32)
    y = x_f * jax.lax.rsqrt(jnp.mean(jnp.square(x_f), -1, keepdims=True) + 1e-5)
    return (y * scale.astype(jnp.float32)).astype(x.dtype)


class GLUMBTempConv(nn.Module):
    """GLUMBTempConv (:59-112): per-frame GLUMBConv + temporal residual."""

    out_channels: int
    expand_ratio: float
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, T, H, W, C)
        b, t, h, w, c = x.shape
        hidden = int(self.expand_ratio * c)
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        flat = x.reshape(b * t, h, w, c)
        y = nn.Conv(hidden * 2, (1, 1), name="conv_inverted", **common)(flat)
        y = nn.silu(y)
        y = nn.Conv(hidden * 2, (3, 3), padding=1, feature_group_count=hidden * 2,
                    name="conv_depth", **common)(y)
        y, gate = jnp.split(y, 2, axis=-1)
        y = y * nn.silu(gate)
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False, name="conv_point", **common)(y)
        y = y.reshape(b, t, h, w, self.out_channels)
        # temporal conv (3,1) over (T, H*W), bias-free, residual (:100-102)
        seq = y.reshape(b, t, h * w, self.out_channels)
        temporal = nn.Conv(
            self.out_channels, (3, 1), padding=((1, 1), (0, 0)), use_bias=False,
            name="conv_temp", **common,
        )(seq)
        y = seq + temporal
        return y.reshape(b, t, h, w, self.out_channels)


class SanaVideoBlock(nn.Module):
    config: SanaVideoConfig
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"

    @nn.compact
    def __call__(self, x, context, t6, rope, grid, context_mask=None):
        cfg = self.config
        dim = cfg.hidden_size
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        batch, seq = x.shape[:2]
        t_len, h_len, w_len = grid
        cos, sin = rope

        table = self.param(
            "scale_shift_table", nn.initializers.normal(stddev=1.0 / dim ** 0.5),
            (6, dim), self.param_dtype,
        )
        mods = table[None, None].astype(jnp.float32) + t6.astype(jnp.float32)[:, None]
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = (
            mods[:, :, i].astype(self.dtype) for i in range(6)
        )

        def ln(a):
            a_f = a.astype(jnp.float32)
            mean = a_f.mean(-1, keepdims=True)
            return ((a_f - mean) * jax.lax.rsqrt(a_f.var(-1, keepdims=True) + cfg.norm_eps)).astype(a.dtype)

        # --- relu linear self-attention with rope (:115-190) -----------------------
        x_n = ln(x) * (1 + scale_msa) + shift_msa
        scale = lambda name, d: self.param(name, nn.initializers.ones, (d,), self.param_dtype)
        q = LoRADense(dim, use_bias=False, name="attn1_q", **common, **lora)(x_n)
        k = LoRADense(dim, use_bias=False, name="attn1_k", **common, **lora)(x_n)
        v = LoRADense(dim, use_bias=False, name="attn1_v", **common, **lora)(x_n)
        q = _rms_across_heads(q, scale("attn1_norm_q", dim))
        k = _rms_across_heads(k, scale("attn1_norm_k", dim))
        shape4 = (batch, seq, cfg.num_heads, cfg.head_dim)
        q = jax.nn.relu(q.reshape(shape4)).astype(jnp.float32)
        k = jax.nn.relu(k.reshape(shape4)).astype(jnp.float32)
        v4 = v.reshape(shape4).astype(jnp.float32)
        q_rot = _apply_sv_rope(q, cos, sin)
        k_rot = _apply_sv_rope(k, cos, sin)
        # z from UNROTATED q/k; scores from the rotated pair (:177-182)
        k_sum = k.sum(axis=1)  # (B, H, D)
        denom = jnp.einsum("bhd,bshd->bsh", k_sum, q) + 1e-15
        scores = jnp.einsum("bshd,bshe->bhde", v4, k_rot)  # (B, H, D_v, D_k)
        out = jnp.einsum("bhde,bshe->bshd", scores, q_rot)
        out = out / denom[..., None]
        out = out.reshape(batch, seq, dim).astype(self.dtype)
        x = x + gate_msa * LoRADense(dim, name="attn1_proj", **common, **lora)(out)

        # --- sdpa cross attention (:433-510) ---------------------------------------
        inner_cross = cfg.cross_heads * cfg.cross_head_dim
        q = LoRADense(inner_cross, name="attn2_q", **common, **lora)(x)
        k = LoRADense(inner_cross, name="attn2_k", **common, **lora)(context)
        v = LoRADense(inner_cross, name="attn2_v", **common, **lora)(context)
        q = _rms_across_heads(q, scale("attn2_norm_q", inner_cross))
        k = _rms_across_heads(k, scale("attn2_norm_k", inner_cross))
        qh = q.reshape(batch, seq, cfg.cross_heads, cfg.cross_head_dim).astype(jnp.float32)
        kh = k.reshape(batch, -1, cfg.cross_heads, cfg.cross_head_dim).astype(jnp.float32)
        vh = v.reshape(batch, -1, cfg.cross_heads, cfg.cross_head_dim).astype(jnp.float32)
        logits = jnp.einsum("bshd,bthd->bhst", qh, kh) / math.sqrt(cfg.cross_head_dim)
        if context_mask is not None:
            logits = logits + context_mask.astype(jnp.float32)[:, None, None, :]
        attn = jnp.einsum("bhst,bthd->bshd", jax.nn.softmax(logits, -1), vh)
        attn = attn.reshape(batch, seq, inner_cross).astype(self.dtype)
        x = x + LoRADense(dim, name="attn2_proj", **common, **lora)(attn)

        # --- GLUMBTempConv FFN -------------------------------------------------------
        x_f = ln(x) * (1 + scale_mlp) + shift_mlp
        ff = GLUMBTempConv(dim, cfg.mlp_ratio, self.dtype, self.param_dtype, name="ff")(
            x_f.reshape(batch, t_len, h_len, w_len, dim)
        ).reshape(batch, seq, dim)
        return x + gate_mlp * ff


class SanaVideoTransformer(nn.Module):
    config: SanaVideoConfig = SanaVideoConfig()
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        latents: jax.Array,  # (B, T, H, W, in_channels) NTHWC
        timesteps: jax.Array,  # (B,) scheduler-scale values
        context: jax.Array,  # (B, S_txt, caption_channels)
        context_mask: Optional[jax.Array] = None,  # (B, S_txt) 1=keep
    ):
        cfg = self.config
        dim = cfg.hidden_size
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        batch, t_in, h_in, w_in, _ = latents.shape
        pt, ph, pw = cfg.patch_size
        grid = (t_in // pt, h_in // ph, w_in // pw)

        # Conv3d k=stride=patch
        x = nn.Conv(dim, cfg.patch_size, strides=cfg.patch_size, name="patch_embedding",
                    **common)(latents.astype(self.dtype))
        x = x.reshape(batch, grid[0] * grid[1] * grid[2], dim)

        # AdaLayerNormSingle (pixart convention, [cos, sin] sinusoid)
        half = 128
        freqs = jnp.exp(-math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half)
        args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
        proj = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
        emb = LoRADense(dim, name="time_in", use_bias=True, dtype=jnp.float32,
                        param_dtype=self.param_dtype)(proj)
        emb = LoRADense(dim, name="time_out", use_bias=True, dtype=jnp.float32,
                        param_dtype=self.param_dtype)(nn.silu(emb))
        t6 = LoRADense(6 * dim, name="time_mod", use_bias=True, dtype=jnp.float32,
                       param_dtype=self.param_dtype)(nn.silu(emb)).reshape(batch, 6, dim)

        # caption projection (linear-gelu_tanh-linear) + affine RMS norm
        ctx = LoRADense(dim, name="caption_in_1", use_bias=True, **common)(context.astype(self.dtype))
        ctx = LoRADense(dim, name="caption_in_2", use_bias=True, **common)(
            nn.gelu(ctx, approximate=True))
        cap_scale = self.param("caption_norm", nn.initializers.ones, (dim,), self.param_dtype)
        ctx = _rms_across_heads(ctx, cap_scale)

        mask_bias = None
        if context_mask is not None:
            mask_bias = (1.0 - context_mask.astype(jnp.float32)) * -10000.0

        rope = sanavideo_rope(cfg, grid)
        block_cls = nn.remat(SanaVideoBlock) if self.remat else SanaVideoBlock
        for i in range(cfg.num_layers):
            x = block_cls(cfg, **common, **lora, name=f"block_{i}")(
                x, ctx, t6, rope, grid, mask_bias
            )
            self.sow("intermediates", f"block_{i}_hidden", x)

        # output: (2, dim) table + embedded timestep (:769-771, :1170)
        table = self.param(
            "scale_shift_table", nn.initializers.normal(stddev=1.0 / dim ** 0.5),
            (2, dim), self.param_dtype,
        )
        mods = table[None].astype(jnp.float32) + emb.astype(jnp.float32)[:, None]
        shift, scale_out = mods[:, 0][:, None], mods[:, 1][:, None]
        x_f = x.astype(jnp.float32)
        mean = x_f.mean(-1, keepdims=True)
        x_f = (x_f - mean) * jax.lax.rsqrt(x_f.var(-1, keepdims=True) + 1e-6)
        x = (x_f * (1 + scale_out) + shift).astype(self.dtype)
        out = LoRADense(int(np.prod(cfg.patch_size)) * cfg.out_channels, name="proj_out",
                        use_bias=True, **common, **lora)(x)

        # unpatchify (:1174-1179): channel layout [c, pt, ph, pw]
        t_len, h_len, w_len = grid
        out = out.reshape(batch, t_len, h_len, w_len, pt, ph, pw, cfg.out_channels)
        out = out.transpose(0, 1, 4, 2, 5, 3, 6, 7)
        return out.reshape(batch, t_len * pt, h_len * ph, w_len * pw,
                           cfg.out_channels).astype(jnp.float32)
