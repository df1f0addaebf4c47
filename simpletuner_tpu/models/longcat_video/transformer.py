"""LongCat-Video DiT in flax.linen — checkpoint-faithful.

Reference behavior: helpers/models/longcat_video/transformer.py
(``LongCatVideoTransformer3DModel``, meituan LongCat-Video 13.6B):

- **Patch embed**: Conv3d k=stride=(1,2,2) (:175-218); output unpatchify
  splits the feature dim as [p_t, p_h, p_w, C] (permute (0,7,1,4,2,5,3,6),
  :1377-1386).
- **Time**: [cos,sin] sinusoid (256) → biased SiLU MLP to ``adaln_tembed_dim``
  512, kept fp32 and expanded FRAMEWISE (B, N_t, ·) (:252-330, :1203-1215);
  each block has a biased SiLU 6H adaLN head over it, broadcast over spatial
  tokens per frame (:940-999); the final layer a 2H head (:406-439).
- **Blocks** (:922-1037): parameter-free fp32 LayerNorm modulate → fused-qkv
  self-attention (biased, per-head fp32 RMS q/k norms eps 1e-6, 3D rope) →
  framewise gate; affine LayerNorm → cross-attention (q_linear/kv_linear,
  per-head RMS q/k norms, per-sample text lengths as key masking) with an
  UNGATED residual; then the FFN path REUSES the modulated tensor as its
  residual base (x ← modulate(x); x ← x + gate·ffn(x) — :1030-1034);
  SwiGLU FFN with the 2/3 · multiple_of-256 inner width (:228-249).
- **RoPE** (:467-519): per-axis tables dim_t = hd−4(hd//6),
  dim_h = dim_w = 2(hd//6), theta 1e4, angles repeat_interleave(2),
  INTERLEAVED-pair rotation (:96-100).
- **Caption embedder**: biased Linear-gelu_tanh-Linear (:386-404).

Layout: flax NTHWC; the (B, L, D) padded text batch with a key mask is the
dense equivalent of the reference's packed variable-length streams
(:1260-1286).
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
class LongCatVideoConfig:
    in_channels: int = 16
    out_channels: int = 16
    hidden_size: int = 4096
    depth: int = 48
    num_heads: int = 32
    caption_channels: int = 4096
    mlp_ratio: float = 4.0
    adaln_tembed_dim: int = 512
    frequency_embedding_size: int = 256
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    multiple_of: int = 256

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def ffn_hidden(self) -> int:
        hidden = int(2 * int(self.hidden_size * self.mlp_ratio) / 3)
        return self.multiple_of * ((hidden + self.multiple_of - 1) // self.multiple_of)

    @classmethod
    def tiny(cls) -> "LongCatVideoConfig":
        return cls(
            in_channels=4, out_channels=4, hidden_size=24, depth=2, num_heads=2,
            caption_channels=32, mlp_ratio=2.0, adaln_tembed_dim=16,
            frequency_embedding_size=32, multiple_of=8,
        )


def longcat_rope(config: LongCatVideoConfig, grid: Tuple[int, int, int]):
    """(S, head_dim) pairwise-duplicated per-axis angles (:487-506)."""
    hd = config.head_dim
    dim_t = hd - 4 * (hd // 6)
    dim_h = dim_w = 2 * (hd // 6)
    t, h, w = grid

    def axis(n, dim):
        freqs = 1.0 / 10000.0 ** (np.arange(0, dim, 2, dtype=np.float64)[: dim // 2] / dim)
        ang = np.outer(np.linspace(0, n - 1, n), freqs)
        return np.repeat(ang, 2, axis=-1)

    at = axis(t, dim_t)[:, None, None, :]
    ah = axis(h, dim_h)[None, :, None, :]
    aw = axis(w, dim_w)[None, None, :, :]
    full = np.concatenate(
        [np.broadcast_to(at, (t, h, w, at.shape[-1])),
         np.broadcast_to(ah, (t, h, w, ah.shape[-1])),
         np.broadcast_to(aw, (t, h, w, aw.shape[-1]))], axis=-1,
    ).reshape(t * h * w, hd)
    return jnp.asarray(np.cos(full), jnp.float32), jnp.asarray(np.sin(full), jnp.float32)


def _rotate_pairs(x: jax.Array) -> jax.Array:
    """Interleaved-pair rotate (:96-100)."""
    x1, x2 = x[..., 0::2], x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def _apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    return (x.astype(jnp.float32) * c + _rotate_pairs(x.astype(jnp.float32)) * s).astype(x.dtype)


def _rms(x: jax.Array, scale: jax.Array, eps: float = 1e-6) -> jax.Array:
    x_f = x.astype(jnp.float32)
    y = x_f * jax.lax.rsqrt(jnp.mean(jnp.square(x_f), -1, keepdims=True) + eps)
    return (y.astype(x.dtype) * scale.astype(x.dtype))


def _ln(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    x_f = x.astype(jnp.float32)
    mean = x_f.mean(-1, keepdims=True)
    return (x_f - mean) * jax.lax.rsqrt(x_f.var(-1, keepdims=True) + eps)


class LongCatBlock(nn.Module):
    config: LongCatVideoConfig
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"

    @nn.compact
    def __call__(self, x, context, t_frames, rope, grid, context_mask=None):
        cfg = self.config
        dim = cfg.hidden_size
        heads, hd = cfg.num_heads, cfg.head_dim
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        batch, seq = x.shape[:2]
        t_len = grid[0]
        spatial = seq // t_len
        cos, sin = rope

        # framewise 6H modulation (fp32)
        mod = LoRADense(6 * dim, name="adaLN", use_bias=True, dtype=jnp.float32,
                        param_dtype=self.param_dtype)(nn.silu(t_frames.astype(jnp.float32)))
        mod = mod.reshape(batch, t_len, 1, 6, dim)
        sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp = (mod[..., i, :] for i in range(6))

        def modulate(a, shift, scale):
            a4 = _ln(a.reshape(batch, t_len, spatial, dim))
            return ((a4 * (scale + 1.0) + shift).reshape(batch, seq, dim)).astype(a.dtype)

        scale = lambda name: self.param(name, nn.initializers.ones, (hd,), self.param_dtype)

        # --- self attention (fused qkv, biased) -------------------------------------
        x_m = modulate(x, sh_msa, sc_msa)
        qkv = LoRADense(3 * dim, name="qkv", use_bias=True, **common, **lora)(x_m)
        qkv = qkv.reshape(batch, seq, 3, heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = _rms(q, scale("q_norm"))
        k = _rms(k, scale("k_norm"))
        q = _apply_rope(q, cos, sin)
        k = _apply_rope(k, cos, sin)
        qf = q.astype(jnp.float32).transpose(0, 2, 1, 3)
        kf = k.astype(jnp.float32).transpose(0, 2, 1, 3)
        vf = v.astype(jnp.float32).transpose(0, 2, 1, 3)
        attn = (jax.nn.softmax(qf @ kf.transpose(0, 1, 3, 2) / math.sqrt(hd), -1) @ vf)
        attn = attn.transpose(0, 2, 1, 3).reshape(batch, seq, dim).astype(self.dtype)
        attn = LoRADense(dim, name="attn_proj", use_bias=True, **common, **lora)(attn)
        x = (x.astype(jnp.float32)
             + (g_msa * attn.reshape(batch, t_len, spatial, dim).astype(jnp.float32)).reshape(batch, seq, dim)
             ).astype(x.dtype)

        # --- cross attention (ungated residual) -------------------------------------
        ln_scale = self.param("pre_crs_scale", nn.initializers.ones, (dim,), self.param_dtype)
        ln_bias = self.param("pre_crs_bias", nn.initializers.zeros, (dim,), self.param_dtype)
        x_n = (_ln(x) * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)).astype(x.dtype)
        q = LoRADense(dim, name="crs_q", use_bias=True, **common, **lora)(x_n)
        kv = LoRADense(2 * dim, name="crs_kv", use_bias=True, **common, **lora)(context.astype(self.dtype))
        q = q.reshape(batch, seq, heads, hd)
        kv = kv.reshape(batch, -1, 2, heads, hd)
        ck, cv = kv[:, :, 0], kv[:, :, 1]
        q = _rms(q, scale("crs_q_norm"))
        ck = _rms(ck, scale("crs_k_norm"))
        qf = q.astype(jnp.float32).transpose(0, 2, 1, 3)
        kf = ck.astype(jnp.float32).transpose(0, 2, 1, 3)
        vf = cv.astype(jnp.float32).transpose(0, 2, 1, 3)
        logits = qf @ kf.transpose(0, 1, 3, 2) / math.sqrt(hd)
        if context_mask is not None:
            logits = jnp.where(context_mask[:, None, None, :], logits, -jnp.inf)
        cattn = (jax.nn.softmax(logits, -1) @ vf).transpose(0, 2, 1, 3)
        cattn = cattn.reshape(batch, seq, dim).astype(self.dtype)
        cattn = LoRADense(dim, name="crs_proj", use_bias=True, **common, **lora)(cattn)
        x = x + cattn

        # --- FFN: residual base is the MODULATED tensor (:1030-1034) ----------------
        x = modulate(x, sh_mlp, sc_mlp)
        w1 = LoRADense(cfg.ffn_hidden, name="ffn_w1", use_bias=False, **common, **lora)(x)
        w3 = LoRADense(cfg.ffn_hidden, name="ffn_w3", use_bias=False, **common, **lora)(x)
        ff = LoRADense(dim, name="ffn_w2", use_bias=False, **common, **lora)(nn.silu(w1) * w3)
        x = (x.astype(jnp.float32)
             + (g_mlp * ff.reshape(batch, t_len, spatial, dim).astype(jnp.float32)).reshape(batch, seq, dim)
             ).astype(x.dtype)
        return x


class LongCatVideoTransformer(nn.Module):
    config: LongCatVideoConfig = LongCatVideoConfig()
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        latents: jax.Array,  # (B, T, H, W, C)
        timesteps: jax.Array,  # (B,) scheduler-scale values
        context: jax.Array,  # (B, L, caption_channels)
        context_mask: Optional[jax.Array] = None,
    ):
        cfg = self.config
        dim = cfg.hidden_size
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        batch, t_in, h_in, w_in, _ = latents.shape
        pt, ph, pw = cfg.patch_size
        grid = (t_in // pt, h_in // ph, w_in // pw)
        seq = grid[0] * grid[1] * grid[2]

        x = nn.Conv(dim, cfg.patch_size, strides=cfg.patch_size, name="x_embedder",
                    **common)(latents.astype(self.dtype))
        x = x.reshape(batch, seq, dim)

        # time: [cos,sin] 256 sinusoid → biased SiLU MLP (fp32), framewise
        half = cfg.frequency_embedding_size // 2
        freqs = jnp.exp(-math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half)
        args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
        t_freq = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
        t_emb = LoRADense(cfg.adaln_tembed_dim, name="t_in", use_bias=True, dtype=jnp.float32,
                          param_dtype=self.param_dtype)(t_freq)
        t_emb = LoRADense(cfg.adaln_tembed_dim, name="t_out", use_bias=True, dtype=jnp.float32,
                          param_dtype=self.param_dtype)(nn.silu(t_emb))
        t_frames = jnp.broadcast_to(t_emb[:, None], (batch, grid[0], cfg.adaln_tembed_dim))

        ctx = LoRADense(dim, name="y_in_1", use_bias=True, **common)(context.astype(self.dtype))
        ctx = LoRADense(dim, name="y_in_2", use_bias=True, **common)(nn.gelu(ctx, approximate=True))

        mask = context_mask.astype(bool) if context_mask is not None else None
        rope = longcat_rope(cfg, grid)

        block_cls = nn.remat(LongCatBlock) if self.remat else LongCatBlock
        for i in range(cfg.depth):
            x = block_cls(cfg, **common, **lora, name=f"block_{i}")(
                x, ctx, t_frames, rope, grid, mask
            )
            self.sow("intermediates", f"block_{i}_hidden", x)

        # final layer: 2H framewise adaLN + biased linear (:406-439)
        mod = LoRADense(2 * dim, name="final_adaLN", use_bias=True, dtype=jnp.float32,
                        param_dtype=self.param_dtype)(nn.silu(t_frames.astype(jnp.float32)))
        mod = mod.reshape(batch, grid[0], 1, 2, dim)
        shift, scale = mod[..., 0, :], mod[..., 1, :]
        spatial = seq // grid[0]
        x4 = _ln(x.reshape(batch, grid[0], spatial, dim))
        x = ((x4 * (scale + 1.0) + shift).reshape(batch, seq, dim)).astype(self.dtype)
        out = LoRADense(pt * ph * pw * cfg.out_channels, name="final_linear", use_bias=True,
                        **common, **lora)(x)

        # unpatchify: feature split [pt, ph, pw, C] (:1377-1386)
        out = out.reshape(batch, grid[0], grid[1], grid[2], pt, ph, pw, cfg.out_channels)
        out = out.transpose(0, 1, 4, 2, 5, 3, 6, 7)
        return out.reshape(batch, t_in, h_in, w_in, cfg.out_channels).astype(jnp.float32)
