"""FLUX.2 transformer in flax.linen — checkpoint-faithful.

Reference behavior: helpers/models/flux2/transformer.py (vendored
``Flux2Transformer2DModel``): bias-free throughout; GLOBAL modulation — one
(shift, scale, gate) x (attn, mlp) pair per stream shared by ALL double
blocks (``double_stream_modulation_img/txt``) and one set shared by ALL
single blocks — instead of Flux-1's per-block adaLN; double blocks are
Flux-1-style joint attention ([text, image] order) with per-head RMS q/k
norms (eps 1e-6) and SwiGLU FFN (mult 3, fused gate in ``linear_in``);
single blocks are ViT-22B parallel blocks: one fused
``to_qkv_mlp_proj`` → [q,k,v | mlp_gate,mlp_up] and one fused
``to_out([attn, silu(gate)*up])``.  RoPE is 4-axis (t,h,w,l) at theta 2000:
image ids (0,h,w,0), text ids (0,0,0,l).  Timestep AND guidance sinusoids
are scaled by 1000 (transformer.py:1162-1166).  Final AdaLayerNormContinuous
(scale-first chunk) + bias-free projection.

The VAE wrapper space-to-depths 32-channel latents 2x2 → 128 features
(autoencoder.py:171); here the transformer patchifies internally
(in_channels x patch²  = x_embedder in-features) which is the same math.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import apply_rope, dot_product_attention
from ...ops.rope import axial_rope
from ..layers import LayerNorm, LoRADense, RMSNorm, timestep_embedding

Dtype = Any


@dataclasses.dataclass(frozen=True)
class Flux2Config:
    in_channels: int = 32
    patch_size: int = 2
    num_heads: int = 48
    head_dim: int = 128
    depth_double: int = 8
    depth_single: int = 48
    txt_in_features: int = 15360  # Mistral-3 multi-layer features
    mlp_ratio: float = 3.0
    axes_dim: Tuple[int, int, int, int] = (32, 32, 32, 32)
    rope_theta: float = 2000.0
    guidance_embed: bool = True

    @property
    def hidden_size(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def mlp_hidden(self) -> int:
        return int(self.hidden_size * self.mlp_ratio)

    @classmethod
    def tiny(cls) -> "Flux2Config":
        return cls(
            in_channels=4, num_heads=2, head_dim=16, depth_double=1, depth_single=2,
            txt_in_features=32, axes_dim=(4, 4, 4, 4),
        )

    @classmethod
    def klein(cls) -> "Flux2Config":
        # FLUX.2-klein: guidance-free distilled variant
        return cls(num_heads=24, depth_double=5, depth_single=20, guidance_embed=False)


class Flux2DoubleBlock(nn.Module):
    """Joint [text, image] attention block with externally-supplied global
    modulation (reference Flux2TransformerBlock)."""

    config: Flux2Config
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"

    @nn.compact
    def __call__(self, img, txt, mod_img, mod_txt, rope):
        cfg = self.config
        dim = cfg.hidden_size
        inner = cfg.num_heads * cfg.head_dim
        batch = img.shape[0]
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype, use_bias=False)
        norm = dict(eps=1e-6, dtype=self.dtype, param_dtype=self.param_dtype)
        (i_sh1, i_sc1, i_g1), (i_sh2, i_sc2, i_g2) = mod_img
        (t_sh1, t_sc1, t_g1), (t_sh2, t_sc2, t_g2) = mod_txt

        ln = LayerNorm(use_scale=False, use_bias=False, **norm)
        img_n = (1 + i_sc1) * ln(img) + i_sh1
        txt_n = (1 + t_sc1) * ln(txt) + t_sh1

        def qkv(x, prefix):
            q = LoRADense(inner, name=f"{prefix}_q", **common, **lora)(x)
            k = LoRADense(inner, name=f"{prefix}_k", **common, **lora)(x)
            v = LoRADense(inner, name=f"{prefix}_v", **common, **lora)(x)
            to_h = lambda a: a.reshape(batch, -1, cfg.num_heads, cfg.head_dim)
            return to_h(q), to_h(k), to_h(v)

        q_i, k_i, v_i = qkv(img_n, "attn")
        q_t, k_t, v_t = qkv(txt_n, "attn_add")
        rms = lambda name: RMSNorm(name=name, eps=1e-6, dtype=self.dtype, param_dtype=self.param_dtype)
        q_i, k_i = rms("norm_q")(q_i), rms("norm_k")(k_i)
        q_t, k_t = rms("norm_added_q")(q_t), rms("norm_added_k")(k_t)

        # text FIRST (reference Flux2AttnProcessor:225-227)
        q = jnp.concatenate([q_t, q_i], axis=1)
        k = jnp.concatenate([k_t, k_i], axis=1)
        v = jnp.concatenate([v_t, v_i], axis=1)
        cos, sin = rope
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        attn = dot_product_attention(q, k, v).reshape(batch, -1, inner)
        txt_len = txt.shape[1]
        attn_t, attn_i = attn[:, :txt_len], attn[:, txt_len:]
        img = img + i_g1 * LoRADense(dim, name="attn_proj", **common, **lora)(attn_i)
        txt = txt + t_g1 * LoRADense(dim, name="attn_add_proj", **common, **lora)(attn_t)

        def ffn(x, prefix):
            h = LoRADense(2 * cfg.mlp_hidden, name=f"{prefix}_in", **common, **lora)(x)
            gate, up = jnp.split(h, 2, axis=-1)
            return LoRADense(dim, name=f"{prefix}_out", **common, **lora)(nn.silu(gate) * up)

        img_f = ln(img) * (1 + i_sc2) + i_sh2
        img = img + i_g2 * ffn(img_f, "ff")
        txt_f = ln(txt) * (1 + t_sc2) + t_sh2
        txt = txt + t_g2 * ffn(txt_f, "ff_context")
        return img, txt


class Flux2SingleBlock(nn.Module):
    """ViT-22B parallel block: fused [qkv | mlp-in] and fused
    [attn-out | mlp-out] projections (reference Flux2ParallelSelfAttention)."""

    config: Flux2Config
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"

    @nn.compact
    def __call__(self, x, mod, rope):
        cfg = self.config
        dim = cfg.hidden_size
        inner = cfg.num_heads * cfg.head_dim
        mlp_h = cfg.mlp_hidden
        batch, seq = x.shape[:2]
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype, use_bias=False)
        shift, scale, gate = mod

        x_n = (1 + scale) * LayerNorm(
            use_scale=False, use_bias=False, eps=1e-6, dtype=self.dtype, param_dtype=self.param_dtype
        )(x) + shift

        fused = LoRADense(3 * inner + 2 * mlp_h, name="qkv_mlp", **common, **lora)(x_n)
        q, k, v, mlp_gate, mlp_up = jnp.split(
            fused, [inner, 2 * inner, 3 * inner, 3 * inner + mlp_h], axis=-1
        )
        to_h = lambda a: a.reshape(batch, seq, cfg.num_heads, cfg.head_dim)
        rms = lambda name: RMSNorm(name=name, eps=1e-6, dtype=self.dtype, param_dtype=self.param_dtype)
        q, k = rms("norm_q")(to_h(q)), rms("norm_k")(to_h(k))
        cos, sin = rope
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        attn = dot_product_attention(q, k, to_h(v)).reshape(batch, seq, inner)

        merged = jnp.concatenate([attn, nn.silu(mlp_gate) * mlp_up], axis=-1)
        return x + gate * LoRADense(dim, name="proj_out", **common, **lora)(merged)


class Flux2Transformer(nn.Module):
    config: Flux2Config = Flux2Config()
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        latents: jax.Array,  # (B, H, W, C) pre-packed VAE latents
        timesteps: jax.Array,  # (B,) flow σ ∈ (0,1)
        context: jax.Array,  # (B, L, txt_in_features)
        guidance: Optional[jax.Array] = None,  # (B,) raw guidance values
    ) -> jax.Array:
        cfg = self.config
        dim = cfg.hidden_size
        p = cfg.patch_size
        batch, height, width, channels = latents.shape
        hh, ww = height // p, width // p
        img_len = hh * ww
        txt_len = context.shape[1]
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype, use_bias=False)
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)

        # --- timestep + guidance embedding (both sinusoids x1000; bias-free MLPs,
        # reference Flux2TimestepGuidanceEmbeddings sample_proj_bias=False) --------------
        def embed_scalar(values, prefix):
            sinusoid = timestep_embedding(values.astype(jnp.float32), 256).astype(self.dtype)
            h = LoRADense(dim, name=f"{prefix}_1", **common)(sinusoid)
            return LoRADense(dim, name=f"{prefix}_2", **common)(nn.silu(h))

        temb = embed_scalar(timesteps, "time_in")
        if cfg.guidance_embed:
            g = guidance if guidance is not None else jnp.ones_like(timesteps)
            temb = temb + embed_scalar(g, "guidance_in")

        def modulation(name, sets):
            mod = LoRADense(3 * sets * dim, name=name, **common)(
                nn.silu(temb.astype(jnp.float32)).astype(self.dtype)
            )[:, None, :]
            parts = jnp.split(mod, 3 * sets, axis=-1)
            return tuple(tuple(parts[3 * i : 3 * (i + 1)]) for i in range(sets))

        mod_img = modulation("mod_double_img", 2)
        mod_txt = modulation("mod_double_txt", 2)
        (mod_single,) = modulation("mod_single", 1)

        # --- input projections ----------------------------------------------------------
        x = latents.astype(self.dtype).reshape(batch, hh, p, ww, p, channels)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(batch, img_len, p * p * channels)
        x = LoRADense(dim, name="patch_in", **common, **lora)(x)
        txt = LoRADense(dim, name="txt_in", **common, **lora)(context.astype(self.dtype))

        # --- 4-axis RoPE: text (0,0,0,l) then image (0,h,w,0) ---------------------------
        rows = jnp.repeat(jnp.arange(hh, dtype=jnp.float32), ww)
        cols = jnp.tile(jnp.arange(ww, dtype=jnp.float32), hh)
        zeros_i = jnp.zeros_like(rows)
        img_ids = jnp.stack([zeros_i, rows, cols, zeros_i], axis=-1)
        ell = jnp.arange(txt_len, dtype=jnp.float32)
        zeros_t = jnp.zeros_like(ell)
        txt_ids = jnp.stack([zeros_t, zeros_t, zeros_t, ell], axis=-1)
        ids = jnp.concatenate([txt_ids, img_ids], axis=0)
        cos, sin = axial_rope(cfg.axes_dim, ids[None], cfg.rope_theta)
        rope = (cos, sin)

        double_cls = nn.remat(Flux2DoubleBlock) if self.remat else Flux2DoubleBlock
        single_cls = nn.remat(Flux2SingleBlock) if self.remat else Flux2SingleBlock
        block = dict(dtype=self.dtype, param_dtype=self.param_dtype, **lora)

        for layer in range(cfg.depth_double):
            x, txt = double_cls(cfg, name=f"double_{layer}", **block)(
                x, txt, mod_img, mod_txt, rope
            )
            self.sow("intermediates", f"double_{layer}_hidden", x)

        stream = jnp.concatenate([txt, x], axis=1)
        for layer in range(cfg.depth_single):
            stream = single_cls(cfg, name=f"single_{layer}", **block)(stream, mod_single, rope)
            self.sow("intermediates", f"single_{layer}_hidden", stream[:, txt_len:])

        # --- final AdaLayerNormContinuous (scale-first chunk) + projection --------------
        x = stream[:, txt_len:]
        ada = LoRADense(2 * dim, name="final_mod", **common)(
            nn.silu(temb.astype(jnp.float32)).astype(self.dtype)
        )
        scale, shift = jnp.split(ada, 2, axis=-1)
        x = LayerNorm(use_scale=False, use_bias=False, eps=1e-6, dtype=self.dtype, param_dtype=self.param_dtype)(x)
        x = x * (1 + scale[:, None]) + shift[:, None]
        x = LoRADense(p * p * channels, name="final_proj", **common, **lora)(x)
        x = x.reshape(batch, hh, ww, p, p, channels)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(batch, height, width, channels)
        return x.astype(jnp.float32)
