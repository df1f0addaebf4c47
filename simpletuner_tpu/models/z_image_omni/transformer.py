"""Z-Image Omni transformer (faithful architecture).

Reference: helpers/models/z_image_omni/transformer.py
``ZImageOmniTransformer2DModel`` — a single-stream DiT with:

* per-patch-size x embedders / final layers (``all_x_embedder["2-1"]``,
  ``all_final_layer["2-1"]``; :676-683) — one patch config here;
* three refiner stacks (:684-720): ``noise_refiner`` (modulated) over image
  tokens, ``context_refiner`` and ``siglip_refiner`` (unmodulated) over
  caption / SigLIP tokens;
* 256-dim adaLN conditioning (ADALN_EMBED_DIM; t_embedder mid 1024, :721-725)
  with **scale-only** modulation and tanh gates (:362-456), selected PER TOKEN
  between a "noisy" embedding (t·1000) and a "clean" one (t=1·1000) by a
  noise mask (:1057-1060 ``torch.cat([t, ones_like(t)])``) — edit/omni
  conditioning rides clean reference-image tokens next to noisy targets;
* bias-free attention with per-head RMS q/k norms (eps 1e-5) and 3-axis
  complex RoPE at theta 256 (:497-559); SwiGLU FFN of width dim·8/3 (:307);
* learned pad tokens substituted at alignment-padding positions
  (``x_pad_token``/``cap_pad_token``/``siglip_pad_token``, :730-732) with
  position ids (0,0,0);
* sequence layout [caption, images..., siglip] (:1224-1247); caption token
  axis-0 positions run 1..len, each image block sits at its caption's end
  position, siglip at end+1 with h/w rescaled onto the image grid
  (:791-905).

TPU-native notes: ragged per-sample packing becomes static-shape [cap | cond?
| noisy | siglip?] with segment masking for batch-level padding; caption
positions are mask-aware.  Fixed-length caption padding is treated like the
reference's SEQ_MULTI_OF alignment padding: pad-token substituted, attended,
position (0,0,0).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import dot_product_attention
from ..layers import LoRADense, RMSNorm, timestep_embedding

Dtype = Any

ADALN_EMBED_DIM = 256


@dataclasses.dataclass(frozen=True)
class ZImageOmniConfig:
    in_channels: int = 16
    patch_size: int = 2
    hidden_size: int = 3840
    depth: int = 30
    refiner_depth: int = 2
    num_heads: int = 30
    num_kv_heads: int = 30
    cap_feat_dim: int = 2560
    siglip_feat_dim: int = 1152
    norm_eps: float = 1e-5
    rope_theta: float = 256.0
    t_scale: float = 1000.0
    t_mid_size: int = 1024
    axes_dim: Tuple[int, int, int] = (32, 48, 48)

    @classmethod
    def tiny(cls) -> "ZImageOmniConfig":
        return cls(
            in_channels=4, hidden_size=96, depth=2, refiner_depth=1,
            num_heads=4, num_kv_heads=4, cap_feat_dim=32, siglip_feat_dim=24,
            t_mid_size=64, axes_dim=(8, 8, 8),
        )

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def adaln_dim(self) -> int:
        return min(self.hidden_size, ADALN_EMBED_DIM)

    @property
    def ffn_inner(self) -> int:
        return int(self.hidden_size / 3 * 8)


def rope_angles(positions: jax.Array, axes_dim, theta: float) -> Tuple[jax.Array, jax.Array]:
    """(..., 3) integer positions -> (cos, sin) of shape (..., head_dim//2).

    Reference RopeEmbedder (:497-559): per axis, freqs 1/θ^(2i/d) over d/2
    pairs, complex polar table indexed by position, concatenated across axes.
    """
    cos_parts, sin_parts = [], []
    for axis, dim in enumerate(axes_dim):
        steps = jnp.arange(0, dim, 2, dtype=jnp.float32)
        base = 1.0 / (theta ** (steps / dim))
        ang = positions[..., axis].astype(jnp.float32)[..., None] * base
        cos_parts.append(jnp.cos(ang))
        sin_parts.append(jnp.sin(ang))
    return jnp.concatenate(cos_parts, axis=-1), jnp.concatenate(sin_parts, axis=-1)


def apply_rope(x: jax.Array, angles: Tuple[jax.Array, jax.Array]) -> jax.Array:
    """Interleaved-pair complex rotation (reference view_as_complex on
    reshape(..., -1, 2)); angles broadcast over heads."""
    cos, sin = angles
    cos = cos[:, :, None, :].astype(jnp.float32)
    sin = sin[:, :, None, :].astype(jnp.float32)
    x_f = x.astype(jnp.float32)
    x0, x1 = x_f[..., 0::2], x_f[..., 1::2]
    o0 = x0 * cos - x1 * sin
    o1 = x0 * sin + x1 * cos
    return jnp.stack([o0, o1], axis=-1).reshape(x.shape).astype(x.dtype)


class ZOmniFFN(nn.Module):
    """w2(silu(w1 x) * w3 x), bias-free (reference FeedForward :307-319)."""

    config: ZImageOmniConfig
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype, use_bias=False)
        gate = LoRADense(cfg.ffn_inner, name="w1", **common, **lora)(x)
        up = LoRADense(cfg.ffn_inner, name="w3", **common, **lora)(x)
        h = (jax.nn.silu(gate.astype(jnp.float32)) * up.astype(jnp.float32)).astype(self.dtype)
        return LoRADense(cfg.hidden_size, name="w2", **common, **lora)(h)


class ZOmniBlock(nn.Module):
    """ZImageTransformerBlock (:322-456): scale-only adaLN (4·dim from the
    256-dim cond, NO SiLU before the linear), tanh gates, sandwich RMSNorms,
    per-token noisy/clean modulation select."""

    config: ZImageOmniConfig
    modulation: bool = True
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # (B, S, D)
        angles,  # (cos, sin) each (B, S, head_dim//2)
        cond_noisy: Optional[jax.Array] = None,  # (B, adaln_dim)
        cond_clean: Optional[jax.Array] = None,
        noise_mask: Optional[jax.Array] = None,  # (B, S) 1 = noisy token
        segment_ids: Optional[jax.Array] = None,  # (B, S) 0 = batch pad
    ) -> jax.Array:
        cfg = self.config
        dim = cfg.hidden_size
        dh = cfg.head_dim
        batch, seq = x.shape[:2]
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        norm = dict(eps=cfg.norm_eps, dtype=self.dtype, param_dtype=self.param_dtype)

        if self.modulation:
            mod_lin = LoRADense(4 * dim, name="adaLN_modulation", **common)
            mod_noisy = mod_lin(cond_noisy.astype(self.dtype)).astype(jnp.float32)
            mod_clean = mod_lin(cond_clean.astype(self.dtype)).astype(jnp.float32)
            if noise_mask is None:
                mod = mod_noisy[:, None, :]
            else:
                mod = jnp.where(
                    noise_mask[:, :, None] == 1, mod_noisy[:, None, :], mod_clean[:, None, :]
                )
            scale_msa, gate_msa, scale_mlp, gate_mlp = jnp.split(mod, 4, axis=-1)
            scale_msa, scale_mlp = 1.0 + scale_msa, 1.0 + scale_mlp
            gate_msa, gate_mlp = jnp.tanh(gate_msa), jnp.tanh(gate_mlp)
            x_n = (
                RMSNorm(name="attention_norm1", **norm)(x).astype(jnp.float32) * scale_msa
            ).astype(self.dtype)
        else:
            x_n = RMSNorm(name="attention_norm1", **norm)(x)

        # bias-free attention with per-head RMS q/k norms (eps 1e-5)
        q = LoRADense(cfg.num_heads * dh, name="attn_q", use_bias=False, **common, **lora)(x_n)
        k = LoRADense(cfg.num_kv_heads * dh, name="attn_k", use_bias=False, **common, **lora)(x_n)
        v = LoRADense(cfg.num_kv_heads * dh, name="attn_v", use_bias=False, **common, **lora)(x_n)
        q = q.reshape(batch, seq, cfg.num_heads, dh)
        k = k.reshape(batch, seq, cfg.num_kv_heads, dh)
        v = v.reshape(batch, seq, cfg.num_kv_heads, dh)
        q = RMSNorm(name="norm_q", eps=1e-5, dtype=self.dtype, param_dtype=self.param_dtype)(q)
        k = RMSNorm(name="norm_k", eps=1e-5, dtype=self.dtype, param_dtype=self.param_dtype)(k)
        q = apply_rope(q, angles)
        k = apply_rope(k, angles)
        n_rep = cfg.num_heads // cfg.num_kv_heads
        if n_rep > 1:
            k = jnp.repeat(k, n_rep, axis=2)
            v = jnp.repeat(v, n_rep, axis=2)
        attn = dot_product_attention(
            q, k, v, q_segment_ids=segment_ids, kv_segment_ids=segment_ids
        ).reshape(batch, seq, cfg.num_heads * dh)
        attn = LoRADense(dim, name="attn_proj", use_bias=False, **common, **lora)(attn)

        if self.modulation:
            x = x + gate_msa.astype(self.dtype) * RMSNorm(name="attention_norm2", **norm)(attn)
            h = (
                RMSNorm(name="ffn_norm1", **norm)(x).astype(jnp.float32) * scale_mlp
            ).astype(self.dtype)
            mlp = ZOmniFFN(cfg, name="feed_forward", **common, **lora)(h)
            x = x + gate_mlp.astype(self.dtype) * RMSNorm(name="ffn_norm2", **norm)(mlp)
        else:
            x = x + RMSNorm(name="attention_norm2", **norm)(attn)
            mlp = ZOmniFFN(cfg, name="feed_forward", **common, **lora)(
                RMSNorm(name="ffn_norm1", **norm)(x)
            )
            x = x + RMSNorm(name="ffn_norm2", **norm)(mlp)
        return x


class ZImageOmniTransformer(nn.Module):
    config: ZImageOmniConfig = ZImageOmniConfig()
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        latents: jax.Array,  # (B, H, W, C) noisy latents
        timesteps: jax.Array,  # (B,) flow σ in [0, 1]
        context: jax.Array,  # (B, L, cap_feat_dim)
        context_mask: Optional[jax.Array] = None,  # (B, L) 1 = valid
        siglip_embeds: Optional[jax.Array] = None,  # (B, Sh, Sw, sig_feat)
        cond_latents: Optional[jax.Array] = None,  # (B, H, W, C) clean reference
    ) -> jax.Array:
        cfg = self.config
        dim = cfg.hidden_size
        p = cfg.patch_size
        batch, height, width, channels = latents.shape
        hh, ww = height // p, width // p
        img_len = hh * ww
        cap_len = context.shape[1]
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        if context_mask is None:
            context_mask = jnp.ones((batch, cap_len), jnp.int32)
        context_mask = context_mask.astype(jnp.int32)

        # --- timestep embeddings: noisy (t·1000) and clean (1·1000) -----------------------
        # one shared embedder instance, called twice (flax shares params on
        # repeated calls of the same module instance)
        t_in = LoRADense(cfg.t_mid_size, name="t_in", **common)
        t_out = LoRADense(cfg.adaln_dim, name="t_out", **common)

        def t_embed(t: jax.Array) -> jax.Array:
            h = t_in(timestep_embedding(t, 256, time_factor=1.0).astype(self.dtype))
            return t_out(nn.silu(h))

        t_noisy = t_embed(timesteps.astype(jnp.float32) * cfg.t_scale)
        t_clean = t_embed(jnp.full_like(timesteps, 1.0).astype(jnp.float32) * cfg.t_scale)

        # --- token embeddings --------------------------------------------------------------
        def patchify(v: jax.Array) -> jax.Array:
            v = v.astype(self.dtype).reshape(batch, hh, p, ww, p, channels)
            # reference packing order (pf ph pw c) with f=1 -> (ph, pw, c)
            return jnp.transpose(v, (0, 1, 3, 2, 4, 5)).reshape(batch, img_len, p * p * channels)

        x_embed = LoRADense(dim, name="x_embedder", **common, **lora)
        x = x_embed(patchify(latents))
        cap = RMSNorm(name="cap_norm", eps=cfg.norm_eps, **common)(context.astype(self.dtype))
        cap = LoRADense(dim, name="cap_embedder", **common, **lora)(cap)
        cap_pad = self.param("cap_pad_token", nn.initializers.normal(0.02), (1, dim), self.param_dtype)
        cap = jnp.where(
            context_mask[:, :, None] == 1, cap, cap_pad[None].astype(self.dtype)
        )

        # --- positions (reference patchify_and_embed :791-905) ------------------------------
        eff_cap = jnp.sum(context_mask, axis=1)  # (B,)
        cap_pos0 = (jnp.cumsum(context_mask, axis=1)) * context_mask  # 1..eff, pads 0
        zeros_cap = jnp.zeros_like(cap_pos0)
        cap_positions = jnp.stack([cap_pos0, zeros_cap, zeros_cap], axis=-1)
        cap_end = 1 + eff_cap  # cap positions start at 1 (cu_len init 1)

        rows = jnp.repeat(jnp.arange(hh, dtype=jnp.int32), ww)
        cols = jnp.tile(jnp.arange(ww, dtype=jnp.int32), hh)

        def img_positions(axis0: jax.Array) -> jax.Array:  # (B,) -> (B, img_len, 3)
            return jnp.stack(
                [
                    jnp.broadcast_to(axis0[:, None], (batch, img_len)),
                    jnp.broadcast_to(rows[None], (batch, img_len)),
                    jnp.broadcast_to(cols[None], (batch, img_len)),
                ],
                axis=-1,
            )

        cap_angles = rope_angles(cap_positions, cfg.axes_dim, cfg.rope_theta)
        noisy_angles = rope_angles(img_positions(cap_end), cfg.axes_dim, cfg.rope_theta)

        block = dict(**common, **lora)
        block_cls = nn.remat(ZOmniBlock) if self.remat else ZOmniBlock
        # instantiate refiners ONCE — the noise refiner runs over both the
        # noisy target and the clean reference tokens with shared params
        noise_refiners = [
            block_cls(cfg, modulation=True, name=f"noise_refiner_{layer}", **block)
            for layer in range(cfg.refiner_depth)
        ]
        context_refiners = [
            block_cls(cfg, modulation=False, name=f"context_refiner_{layer}", **block)
            for layer in range(cfg.refiner_depth)
        ]

        # --- refiners ------------------------------------------------------------------------
        # reference forward :1035-1170: x = concat(cond_latents + [target]) per
        # sample — the noise refiner attends over ALL image tokens jointly
        # (cond and noisy target in one sequence), per-token noise_mask picks
        # the modulation branch
        ones_img = jnp.ones((batch, img_len), jnp.int32)
        if cond_latents is not None:
            cond = x_embed(patchify(cond_latents))
            # each image block sits at its caption's end position (reference
            # x_item pos start=(cap_end_pos[j], 0, 0))
            cond_angles = rope_angles(img_positions(cap_end), cfg.axes_dim, cfg.rope_theta)
            zeros_img = jnp.zeros((batch, img_len), jnp.int32)
            x = jnp.concatenate([cond, x], axis=1)
            x_angles = (
                jnp.concatenate([cond_angles[0], noisy_angles[0]], axis=1),
                jnp.concatenate([cond_angles[1], noisy_angles[1]], axis=1),
            )
            x_noise_mask = jnp.concatenate([zeros_img, ones_img], axis=1)
        else:
            x_angles = noisy_angles
            x_noise_mask = ones_img
        for refiner in noise_refiners:
            x = refiner(x, x_angles, t_noisy, t_clean, x_noise_mask, None)
        for refiner in context_refiners:
            cap = refiner(cap, cap_angles, None, None, None, None)

        segments = [cap, x]
        angle_cos = [cap_angles[0], x_angles[0]]
        angle_sin = [cap_angles[1], x_angles[1]]
        # the caption inherits the FIRST image's noise mask (reference :830-833
        # cap j takes images_noise_mask[j]; images = cond + [target], so the
        # caption rides clean (0) when a reference image is present, noisy (1)
        # in pure t2i)
        cap_mask_value = 0 if cond_latents is not None else 1
        noise_masks = [jnp.full((batch, cap_len), cap_mask_value, jnp.int32), x_noise_mask]
        seg_valid = [context_mask * 0 + 1, jnp.ones_like(x_noise_mask)]  # inner caption pads stay attended

        if siglip_embeds is not None:
            sb, sh, sw, sc = siglip_embeds.shape
            sig = siglip_embeds.astype(self.dtype).reshape(batch, sh * sw, sc)
            sig = RMSNorm(name="siglip_norm", eps=cfg.norm_eps, **common)(sig)
            sig = LoRADense(dim, name="siglip_embedder", **common, **lora)(sig)
            # siglip h/w positions rescale onto the LATENT PIXEL grid — the
            # reference (:943-944) scales by (x_size[j][1]-1) = latent H-1,
            # not tokens-1 — with int32 truncation
            sig_rows = jnp.repeat(jnp.arange(sh, dtype=jnp.float32), sw)
            sig_cols = jnp.tile(jnp.arange(sw, dtype=jnp.float32), sh)
            sig_rows = (sig_rows / max(sh - 1, 1) * (height - 1)).astype(jnp.int32)
            sig_cols = (sig_cols / max(sw - 1, 1) * (width - 1)).astype(jnp.int32)
            sig_positions = jnp.stack(
                [
                    jnp.broadcast_to((cap_end + 1)[:, None], (batch, sh * sw)),
                    jnp.broadcast_to(sig_rows[None], (batch, sh * sw)),
                    jnp.broadcast_to(sig_cols[None], (batch, sh * sw)),
                ],
                axis=-1,
            )
            sig_angles = rope_angles(sig_positions, cfg.axes_dim, cfg.rope_theta)
            for layer in range(cfg.refiner_depth):
                sig = block_cls(cfg, modulation=False, name=f"siglip_refiner_{layer}", **block)(
                    sig, sig_angles, None, None, None, None
                )
            segments.append(sig)
            angle_cos.append(sig_angles[0])
            angle_sin.append(sig_angles[1])
            noise_masks.append(jnp.zeros((batch, sh * sw), jnp.int32))
            seg_valid.append(jnp.ones((batch, sh * sw), jnp.int32))

        unified = jnp.concatenate(segments, axis=1)
        unified_angles = (
            jnp.concatenate(angle_cos, axis=1),
            jnp.concatenate(angle_sin, axis=1),
        )
        unified_noise = jnp.concatenate(noise_masks, axis=1)
        unified_valid = jnp.concatenate(seg_valid, axis=1)

        noisy_start = cap_len + (img_len if cond_latents is not None else 0)
        for layer in range(cfg.depth):
            unified = block_cls(cfg, modulation=True, name=f"layer_{layer}", **block)(
                unified, unified_angles, t_noisy, t_clean, unified_noise, unified_valid
            )
            self.sow(
                "intermediates",
                f"layer_{layer}_hidden",
                unified[:, noisy_start: noisy_start + img_len],
            )

        # --- final layer (:460-494): affine-free LayerNorm eps 1e-6, scale-only adaLN --------
        x = unified[:, noisy_start: noisy_start + img_len]
        final_mod = LoRADense(dim, name="final_adaLN", **common)
        scale_noisy = 1.0 + final_mod(nn.silu(t_noisy.astype(jnp.float32)).astype(self.dtype)).astype(jnp.float32)
        x_f = x.astype(jnp.float32)
        mean = jnp.mean(x_f, axis=-1, keepdims=True)
        var = jnp.var(x_f, axis=-1, keepdims=True)
        x_n = (x_f - mean) * jax.lax.rsqrt(var + 1e-6)
        x_n = x_n * scale_noisy[:, None, :]
        out = LoRADense(p * p * channels, name="final_linear", **common, **lora)(
            x_n.astype(self.dtype)
        )
        out = out.reshape(batch, hh, ww, p, p, channels)
        out = jnp.transpose(out, (0, 1, 3, 2, 4, 5)).reshape(batch, height, width, channels)
        return out.astype(jnp.float32)
