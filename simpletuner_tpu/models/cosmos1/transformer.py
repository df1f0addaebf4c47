"""Cosmos (1.x/2.x predict) video DiT core in flax.linen — checkpoint-faithful.

Reference behavior: helpers/models/cosmos/transformer.py (vendored diffusers
``CosmosTransformer3DModel``, also the ``core`` of the Anima family —
anima/transformer.py:365-381):

- **Patch embed** (:65-97): bias-free linear over [C, p_t, p_h, p_w]-ordered
  patch features (permute(0,2,4,6,1,3,5,7)); the output unpatchify uses the
  DIFFERENT [p_h, p_w, p_t, C] order (:956-963 — "not the inverse... this is
  correct").
- **Padding mask channel** (:740-797): a mask plane is concatenated onto the
  latent channels before patchify (``concat_padding_mask``); Anima feeds an
  all-zeros plane by default (anima/transformer.py:90-95).
- **Time** (:100-176): [cos,sin] sinusoid → bias-free SiLU MLP to 3H
  (``temb``) and an affine RMSNorm of the sinusoid (``embedded_timestep``).
- **AdaLN-LoRA** (:179-252): per-block zero-gated heads — silu(embedded) →
  linear_1 (H→256, bias-free) → linear_2 (256→3H, bias-free), PLUS temb;
  chunk to shift/scale/gate.  The output norm is the 2H variant consuming
  ``temb[..., :2H]`` (:199-200).
- **Blocks** (:329-434): self-attn (rope) + cross-attn (text) + exact-gelu
  FF, all bias-free with per-head affine RMS q/k norms (eps 1e-5 — the
  diffusers Attention default) and gated residuals.
- **RoPE** (:437-497): per-axis NTK-scaled thetas
  (10000 · scale^(d/(d−2))), freq tables over (t, h, w) grids concatenated
  [t,h,w]×2, applied with the non-interleaved half convention
  (use_real_unbind_dim=-2); temporal positions scale by base_fps/fps for
  videos.
- **Learnable pos embed** (:500-537): per-axis tables summed then
  L2-normalized with the √(1/H)-weighted eps.

Layout: flax NTHWC — torch (B, C, T, H, W) maps to (B, T, H, W, C).
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
class Cosmos1Config:
    in_channels: int = 16
    out_channels: int = 16
    num_heads: int = 32
    head_dim: int = 128
    num_layers: int = 28
    mlp_ratio: float = 4.0
    text_embed_dim: int = 1024
    adaln_lora_dim: int = 256
    max_size: Tuple[int, int, int] = (128, 240, 240)
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    rope_scale: Tuple[float, float, float] = (2.0, 1.0, 1.0)
    concat_padding_mask: bool = True
    learnable_pos_embed: bool = True
    base_fps: int = 24

    @property
    def hidden_size(self) -> int:
        return self.num_heads * self.head_dim

    @classmethod
    def tiny(cls) -> "Cosmos1Config":
        return cls(
            in_channels=4, out_channels=4, num_heads=2, head_dim=12, num_layers=2,
            mlp_ratio=2.0, text_embed_dim=32, adaln_lora_dim=8,
            max_size=(16, 64, 64),
        )

    @classmethod
    def anima(cls) -> "Cosmos1Config":
        """Anima core dims (anima/transformer.py:342-355, :775: the Anima /
        Cosmos-Predict2 core sets ``extra_pos_embed_type=None``)."""
        return cls(
            num_heads=16, head_dim=128, num_layers=28, text_embed_dim=1024,
            rope_scale=(1.0, 4.0, 4.0), learnable_pos_embed=False,
        )

    @classmethod
    def predict2_2b(cls) -> "Cosmos1Config":
        """Cosmos-Predict2-2B-Text2Image transformer config (reference
        cosmos/model.py:52-66 loads nvidia/Cosmos-Predict2-2B-Text2Image;
        same core dims as the Anima wrap of it, anima/transformer.py:775)."""
        return cls.anima()

    @classmethod
    def predict2_14b(cls) -> "Cosmos1Config":
        """Cosmos-Predict2-14B-Text2Image: 36 heads x 128 = 5120 wide, 36
        layers (NVIDIA Cosmos-Predict2 14B release)."""
        return cls(
            num_heads=40, head_dim=128, num_layers=36, text_embed_dim=1024,
            rope_scale=(1.0, 4.0, 4.0), learnable_pos_embed=False,
        )


def cosmos1_rope(config: Cosmos1Config, grid: Tuple[int, int, int],
                 fps: Optional[float] = None):
    """cos/sin (S, head_dim) over the post-patch (t, h, w) grid (:437-497)."""
    hd = config.head_dim
    dim_h = dim_w = hd // 6 * 2
    dim_t = hd - dim_h - dim_w
    t_theta = 10000.0 * config.rope_scale[0] ** (dim_t / (dim_t - 2))
    h_theta = 10000.0 * config.rope_scale[1] ** (dim_h / (dim_h - 2))
    w_theta = 10000.0 * config.rope_scale[2] ** (dim_w / (dim_w - 2))

    t, h, w = grid
    h_freqs = 1.0 / h_theta ** (np.arange(0, dim_h, 2, dtype=np.float64)[: dim_h // 2] / dim_h)
    w_freqs = 1.0 / w_theta ** (np.arange(0, dim_w, 2, dtype=np.float64)[: dim_w // 2] / dim_w)
    t_freqs = 1.0 / t_theta ** (np.arange(0, dim_t, 2, dtype=np.float64)[: dim_t // 2] / dim_t)

    t_pos = np.arange(t, dtype=np.float64)
    if fps is not None:
        t_pos = t_pos / fps * config.base_fps
    emb_t = np.outer(t_pos, t_freqs)[:, None, None, :]
    emb_h = np.outer(np.arange(h, dtype=np.float64), h_freqs)[None, :, None, :]
    emb_w = np.outer(np.arange(w, dtype=np.float64), w_freqs)[None, None, :, :]
    full = np.concatenate(
        [np.broadcast_to(emb_t, (t, h, w, emb_t.shape[-1])),
         np.broadcast_to(emb_h, (t, h, w, emb_h.shape[-1])),
         np.broadcast_to(emb_w, (t, h, w, emb_w.shape[-1]))] * 2,
        axis=-1,
    ).reshape(t * h * w, hd)
    return jnp.asarray(np.cos(full), jnp.float32), jnp.asarray(np.sin(full), jnp.float32)


def _apply_half_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Non-interleaved half rotation (diffusers use_real_unbind_dim=-2)."""
    half = x.shape[-1] // 2
    rotated = jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    return (x.astype(jnp.float32) * c + rotated.astype(jnp.float32) * s).astype(x.dtype)


def _rms(x: jax.Array, scale: jax.Array, eps: float) -> jax.Array:
    x_f = x.astype(jnp.float32)
    y = x_f * jax.lax.rsqrt(jnp.mean(jnp.square(x_f), -1, keepdims=True) + eps)
    return (y * scale.astype(jnp.float32)).astype(x.dtype)


def _ln(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    x_f = x.astype(jnp.float32)
    mean = x_f.mean(-1, keepdims=True)
    return (x_f - mean) * jax.lax.rsqrt(x_f.var(-1, keepdims=True) + eps)


class CosmosAdaZero(nn.Module):
    """CosmosAdaLayerNormZero (:212-252): per-block adaLN-LoRA head."""

    hidden_size: int
    lora_dim: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, embedded, temb):
        e = nn.silu(embedded.astype(jnp.float32))
        if self.lora_dim != self.hidden_size:
            e = LoRADense(self.lora_dim, use_bias=False, name="linear_1", dtype=jnp.float32,
                          param_dtype=self.param_dtype)(e)
        e = LoRADense(3 * self.hidden_size, use_bias=False, name="linear_2", dtype=jnp.float32,
                      param_dtype=self.param_dtype)(e)
        e = e + temb.astype(jnp.float32)
        shift, scale, gate = jnp.split(e, 3, axis=-1)
        if shift.ndim == 2:
            shift, scale, gate = shift[:, None], scale[:, None], gate[:, None]
        normed = (_ln(x) * (1.0 + scale) + shift).astype(x.dtype)
        return normed, gate


class Cosmos1Block(nn.Module):
    config: Cosmos1Config
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"

    @nn.compact
    def __call__(self, x, context, embedded, temb, rope, context_mask=None):
        cfg = self.config
        dim = cfg.hidden_size
        heads, hd = cfg.num_heads, cfg.head_dim
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype, use_bias=False)
        batch, seq = x.shape[:2]
        scale = lambda name: self.param(name, nn.initializers.ones, (hd,), self.param_dtype)

        def attend(prefix, query_src, kv_src, use_rope, mask=None):
            q = LoRADense(dim, name=f"{prefix}_q", **common, **lora)(query_src)
            k = LoRADense(dim, name=f"{prefix}_k", **common, **lora)(kv_src)
            v = LoRADense(dim, name=f"{prefix}_v", **common, **lora)(kv_src)
            q = q.reshape(batch, -1, heads, hd)
            k = k.reshape(batch, -1, heads, hd)
            v = v.reshape(batch, -1, heads, hd)
            q = _rms(q, scale(f"{prefix}_norm_q"), 1e-5)
            k = _rms(k, scale(f"{prefix}_norm_k"), 1e-5)
            if use_rope:
                cos, sin = rope
                q = _apply_half_rope(q, cos, sin)
                k = _apply_half_rope(k, cos, sin)
            qf = q.astype(jnp.float32).transpose(0, 2, 1, 3)
            kf = k.astype(jnp.float32).transpose(0, 2, 1, 3)
            vf = v.astype(jnp.float32).transpose(0, 2, 1, 3)
            logits = qf @ kf.transpose(0, 1, 3, 2) / math.sqrt(hd)
            if mask is not None:
                logits = jnp.where(mask[:, None, None, :], logits, -jnp.inf)
            out = (jax.nn.softmax(logits, -1) @ vf).transpose(0, 2, 1, 3)
            out = out.reshape(batch, -1, dim).astype(self.dtype)
            return LoRADense(dim, name=f"{prefix}_out", **common, **lora)(out)

        normed, gate = CosmosAdaZero(dim, cfg.adaln_lora_dim, self.param_dtype, name="norm1")(
            x, embedded, temb)
        x = (x.astype(jnp.float32) + gate * attend("attn1", normed, normed, True).astype(jnp.float32)).astype(x.dtype)

        normed, gate = CosmosAdaZero(dim, cfg.adaln_lora_dim, self.param_dtype, name="norm2")(
            x, embedded, temb)
        x = (x.astype(jnp.float32) + gate * attend(
            "attn2", normed, context, False, context_mask).astype(jnp.float32)).astype(x.dtype)

        normed, gate = CosmosAdaZero(dim, cfg.adaln_lora_dim, self.param_dtype, name="norm3")(
            x, embedded, temb)
        h = LoRADense(int(dim * cfg.mlp_ratio), name="ff_in", **common, **lora)(normed)
        h = LoRADense(dim, name="ff_out", **common, **lora)(nn.gelu(h, approximate=False))
        return (x.astype(jnp.float32) + gate * h.astype(jnp.float32)).astype(x.dtype)


class Cosmos1Transformer(nn.Module):
    config: Cosmos1Config = Cosmos1Config()
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
        timesteps: jax.Array,  # (B,) or (B, S) flow times
        context: jax.Array,  # (B, S_txt, text_embed_dim)
        context_mask: Optional[jax.Array] = None,
        padding_mask_value: float = 0.0,  # constant mask plane (anima: zeros)
        fps: Optional[float] = None,
    ):
        cfg = self.config
        dim = cfg.hidden_size
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        batch, t_in, h_in, w_in, _ = latents.shape
        pt, ph, pw = cfg.patch_size
        grid = (t_in // pt, h_in // ph, w_in // pw)
        seq = grid[0] * grid[1] * grid[2]

        x = latents.astype(self.dtype)
        if cfg.concat_padding_mask:
            plane = jnp.full((batch, t_in, h_in, w_in, 1), padding_mask_value, self.dtype)
            x = jnp.concatenate([x, plane], axis=-1)

        # patchify: feature order [C, p_t, p_h, p_w] (:82-97)
        c_in = x.shape[-1]
        x = x.reshape(batch, grid[0], pt, grid[1], ph, grid[2], pw, c_in)
        x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)
        x = x.reshape(batch, seq, c_in * pt * ph * pw)
        x = LoRADense(dim, use_bias=False, name="patch_embed", **common, **lora)(x)

        # time embedding (:100-176)
        half = dim // 2
        freqs = jnp.exp(-math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half)
        t_flat = timesteps.astype(jnp.float32).reshape(-1)
        args = t_flat[:, None] * freqs[None]
        proj = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
        temb = LoRADense(dim, use_bias=False, name="t_embedder_1", dtype=jnp.float32,
                         param_dtype=self.param_dtype)(proj)
        temb = LoRADense(3 * dim, use_bias=False, name="t_embedder_2", dtype=jnp.float32,
                         param_dtype=self.param_dtype)(nn.silu(temb))
        norm_scale = self.param("t_norm", nn.initializers.ones, (dim,), self.param_dtype)
        embedded = _rms(proj, norm_scale, 1e-6)
        if timesteps.ndim == 2:
            temb = temb.reshape(batch, timesteps.shape[1], 3 * dim)
            embedded = embedded.reshape(batch, timesteps.shape[1], dim)

        rope = cosmos1_rope(cfg, grid, fps=fps)

        extra = None
        if cfg.learnable_pos_embed:
            if (grid[0] > cfg.max_size[0] // pt or grid[1] > cfg.max_size[1] // ph
                    or grid[2] > cfg.max_size[2] // pw):
                raise ValueError(
                    f"input grid {grid} exceeds learnable pos-embed max_size "
                    f"{cfg.max_size} (post-patch)"
                )
            pos_t = self.param("pos_emb_t", nn.initializers.normal(0.02),
                               (cfg.max_size[0] // pt, dim), self.param_dtype)
            pos_h = self.param("pos_emb_h", nn.initializers.normal(0.02),
                               (cfg.max_size[1] // ph, dim), self.param_dtype)
            pos_w = self.param("pos_emb_w", nn.initializers.normal(0.02),
                               (cfg.max_size[2] // pw, dim), self.param_dtype)
            emb = (pos_t[: grid[0], None, None] + pos_h[None, : grid[1], None]
                   + pos_w[None, None, : grid[2]]).reshape(seq, dim)[None]
            emb = jnp.broadcast_to(emb, (batch, seq, dim)).astype(jnp.float32)
            norm = jnp.sqrt(jnp.sum(jnp.square(emb), -1, keepdims=True))
            # torch.add(eps, norm, alpha=sqrt(norm.numel()/emb.numel())) = eps + norm/sqrt(H)
            norm = 1e-6 + norm * np.sqrt(1.0 / dim)
            extra = (emb / norm).astype(self.dtype)

        ctx = context.astype(self.dtype)
        mask = context_mask.astype(bool) if context_mask is not None else None

        block_cls = nn.remat(Cosmos1Block) if self.remat else Cosmos1Block
        for i in range(cfg.num_layers):
            if extra is not None:
                x = x + extra  # added before EVERY block (:381-382)
            x = block_cls(cfg, **common, **lora, name=f"block_{i}")(
                x, ctx, embedded, temb, rope, mask
            )
            self.sow("intermediates", f"block_{i}_hidden", x)

        # output norm: 2H adaLN consuming temb[..., :2H] (:179-209)
        e = nn.silu(embedded.astype(jnp.float32))
        e = LoRADense(cfg.adaln_lora_dim, use_bias=False, name="norm_out_1", dtype=jnp.float32,
                      param_dtype=self.param_dtype)(e)
        e = LoRADense(2 * dim, use_bias=False, name="norm_out_2", dtype=jnp.float32,
                      param_dtype=self.param_dtype)(e)
        e = e + temb[..., : 2 * dim].astype(jnp.float32)
        shift, scale_out = jnp.split(e, 2, axis=-1)
        if shift.ndim == 2:
            shift, scale_out = shift[:, None], scale_out[:, None]
        x = (_ln(x) * (1.0 + scale_out) + shift).astype(self.dtype)
        out = LoRADense(pt * ph * pw * cfg.out_channels, use_bias=False, name="proj_out",
                        **common, **lora)(x)

        # unpatchify with [p_h, p_w, p_t, C] feature order (:956-963)
        out = out.reshape(batch, grid[0], grid[1], grid[2], ph, pw, pt, cfg.out_channels)
        out = out.transpose(0, 1, 6, 2, 4, 3, 5, 7)  # (B, T', pt, H', ph, W', pw, C)
        return out.reshape(batch, t_in, h_in, w_in, cfg.out_channels).astype(jnp.float32)
