"""LTX-2 audiovisual DiT in flax.linen — checkpoint-faithful.

Reference behavior: helpers/models/ltxvideo2/transformer.py (vendored
``LTX2VideoTransformer3DModel``): 48 dual-modal blocks — video stream
(32 heads x 128) and audio stream (32 heads x 64) each run self-attention,
prompt cross-attention, audio↔video cross-attention (a2v: Q=video / KV=audio;
v2a: Q=audio / KV=video) and a gelu-tanh FFN.  All norms are affine-free RMS;
q/k norms are "rms_norm_across_heads" (full projection width, WITH affine).
Modulation is adaLN-single with TOKENWISE timestep embeddings: global
``time_embed``/``audio_time_embed`` produce per-token (shift, scale, gate)
sets that per-block ``scale_shift_table``s offset; the a2v/v2a cross
attentions take their own 4-param scale/shift + 1-param gate adaLN heads.
RoPE uses fractional [0,1] coordinates from pixel-space patch-boundary
midpoints: freqs = (2·frac − 1) · (theta^linspace(0,1,dim//(2·ndims)) · π/2),
interleave-repeated to the FULL projection width and applied before the head
split; cross-attention rope embeds only the temporal axis of each modality so
audio and video tokens align on real timestamps.  Output heads modulate with
(2, dim) tables at the embedded timestep and project per modality.

TPU-first: tokenwise temb is one dense (B, S, n·dim) tensor (no python
branches on timestep shape), masks are additive biases, and the dual-modal
block is pure dense matmuls — pjit-shardable over batch/sequence axes.  The
reference's Gemma text "connectors" run on the encode side; the transformer
consumes their cached 3840-dim caption features.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..layers import LayerNorm, LoRADense

Dtype = Any


@dataclasses.dataclass(frozen=True)
class LTX2Config:
    # video stream
    in_channels: int = 128
    patch_size: int = 1
    patch_size_t: int = 1
    num_heads: int = 32
    head_dim: int = 128
    cross_attention_dim: int = 4096
    vae_scale_factors: Tuple[int, int, int] = (8, 32, 32)
    pos_embed_max_pos: int = 20
    base_height: int = 2048
    base_width: int = 2048
    gated_attn: bool = False
    # audio stream
    audio_in_channels: int = 128
    audio_num_heads: int = 32
    audio_head_dim: int = 64
    audio_cross_attention_dim: int = 2048
    audio_scale_factor: int = 4
    audio_pos_embed_max_pos: int = 20
    audio_sampling_rate: int = 16000
    audio_hop_length: int = 160
    audio_gated_attn: bool = False
    # shared
    num_layers: int = 48
    caption_channels: int = 3840
    rope_theta: float = 10000.0
    causal_offset: int = 1
    norm_eps: float = 1e-6

    @property
    def inner_dim(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def audio_inner_dim(self) -> int:
        return self.audio_num_heads * self.audio_head_dim

    @classmethod
    def tiny(cls) -> "LTX2Config":
        return cls(
            in_channels=8, num_heads=2, head_dim=16, cross_attention_dim=24,
            audio_in_channels=6, audio_num_heads=2, audio_head_dim=8,
            audio_cross_attention_dim=16, num_layers=2, caption_channels=20,
        )


# -------------------------------------------------------------------------------------
# RoPE (LTX2AudioVideoRotaryPosEmbed)
# -------------------------------------------------------------------------------------


def ltx2_video_coords(config: LTX2Config, num_frames: int, height: int, width: int, fps: float = 25.0):
    """Fractional (t_seconds, h_px, w_px) patch midpoints (reference
    prepare_video_coords): pixel-space boundaries with the causal first-frame
    shift, temporal axis divided by fps.  Returns (S, 3) fp64."""
    sf = config.vae_scale_factors
    grid = np.stack(
        np.meshgrid(
            np.arange(0, num_frames, config.patch_size_t, dtype=np.float64),
            np.arange(0, height, config.patch_size, dtype=np.float64),
            np.arange(0, width, config.patch_size, dtype=np.float64),
            indexing="ij",
        ),
        axis=0,
    ).reshape(3, -1)
    patch = np.asarray([config.patch_size_t, config.patch_size, config.patch_size], np.float64)
    start = grid * np.asarray(sf, np.float64)[:, None]
    end = (grid + patch[:, None]) * np.asarray(sf, np.float64)[:, None]
    for arr in (start, end):
        arr[0] = np.clip(arr[0] + config.causal_offset - sf[0], 0, None) / fps
    mid = (start + end) / 2.0
    return mid.T  # (S, 3)


def ltx2_audio_coords(config: LTX2Config, num_frames: int):
    """Per-latent-frame (start+end)/2 timestamps in seconds (reference
    prepare_audio_coords).  Returns (S, 1) fp64."""
    sf = config.audio_scale_factor
    grid = np.arange(0, num_frames, config.patch_size_t, dtype=np.float64)
    start = np.clip(grid * sf + config.causal_offset - sf, 0, None)
    end = np.clip((grid + config.patch_size_t) * sf + config.causal_offset - sf, 0, None)
    to_s = config.audio_hop_length / config.audio_sampling_rate
    mid = (start * to_s + end * to_s) / 2.0
    return mid[:, None]  # (S, 1)


def ltx2_rope_tables(coords: np.ndarray, max_positions, dim: int, theta: float):
    """(S, ndims) coords → full-width interleaved cos/sin (S, dim) (reference
    LTX2AudioVideoRotaryPosEmbed.forward, rope_type='interleaved')."""
    ndims = coords.shape[1]
    elems = 2 * ndims
    n_freq = dim // elems
    frac = coords / np.asarray(max_positions, np.float64)[None, :]
    pow_indices = theta ** np.linspace(0.0, 1.0, n_freq, dtype=np.float64)
    freqs = pow_indices * math.pi / 2.0
    angles = (frac[:, :, None] * 2.0 - 1.0) * freqs[None, None]  # (S, ndims, n_freq)
    angles = np.swapaxes(angles, 1, 2).reshape(coords.shape[0], -1)  # (S, ndims*n_freq)
    cos = np.repeat(np.cos(angles), 2, axis=-1)
    sin = np.repeat(np.sin(angles), 2, axis=-1)
    pad = dim % elems
    if pad:
        cos = np.concatenate([np.ones_like(cos[:, :pad]), cos], axis=-1)
        sin = np.concatenate([np.zeros_like(sin[:, :pad]), sin], axis=-1)
    return jnp.asarray(cos, jnp.float32), jnp.asarray(sin, jnp.float32)


def apply_interleaved_rope(x: jax.Array, rope) -> jax.Array:
    """x (B, S, C) with full-width cos/sin (S, C) (reference
    apply_interleaved_rotary_emb)."""
    cos, sin = rope
    x_f = x.astype(jnp.float32)
    x0, x1 = x_f[..., 0::2], x_f[..., 1::2]
    rotated = jnp.stack([-x1, x0], axis=-1).reshape(x.shape)
    return (x_f * cos[None] + rotated * sin[None]).astype(x.dtype)


def _rms_affine(x, scale, eps=1e-6):
    x_f = x.astype(jnp.float32)
    y = x_f * jax.lax.rsqrt(jnp.mean(jnp.square(x_f), axis=-1, keepdims=True) + eps)
    return (y * scale.astype(jnp.float32)).astype(x.dtype)


def _rms_plain(x, eps=1e-6):
    x_f = x.astype(jnp.float32)
    return (x_f * jax.lax.rsqrt(jnp.mean(jnp.square(x_f), axis=-1, keepdims=True) + eps)).astype(x.dtype)


class LTX2Attention(nn.Module):
    """q/k/v with bias, full-width affine RMS q/k norms, optional per-head
    sigmoid gates (reference LTX2Attention + LTX2AudioVideoAttnProcessor)."""

    heads: int
    head_dim: int
    out_dim: int
    kv_dim: Optional[int] = None  # encoder feature dim for cross attention
    gated: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"

    @nn.compact
    def __call__(self, x, context=None, q_rope=None, k_rope=None, mask_bias=None):
        inner = self.heads * self.head_dim
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        kv_src = x if context is None else context
        batch, q_len = x.shape[:2]
        kv_len = kv_src.shape[1]

        q = LoRADense(inner, name="to_q", **common, **lora)(x)
        k = LoRADense(inner, name="to_k", **common, **lora)(kv_src)
        v = LoRADense(inner, name="to_v", **common, **lora)(kv_src)
        q = _rms_affine(q, self.param("norm_q", nn.initializers.ones, (inner,), self.param_dtype))
        k = _rms_affine(k, self.param("norm_k", nn.initializers.ones, (inner,), self.param_dtype))
        if q_rope is not None:
            q = apply_interleaved_rope(q, q_rope)
            k = apply_interleaved_rope(k, k_rope if k_rope is not None else q_rope)

        qh = q.reshape(batch, q_len, self.heads, self.head_dim).astype(jnp.float32).transpose(0, 2, 1, 3)
        kh = k.reshape(batch, kv_len, self.heads, self.head_dim).astype(jnp.float32).transpose(0, 2, 1, 3)
        vh = v.reshape(batch, kv_len, self.heads, self.head_dim).astype(jnp.float32).transpose(0, 2, 1, 3)
        logits = qh @ kh.transpose(0, 1, 3, 2) / math.sqrt(self.head_dim)
        if mask_bias is not None:
            logits = logits + mask_bias.astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        out = (probs @ vh).transpose(0, 2, 1, 3)

        if self.gated:
            gate_logits = LoRADense(self.heads, name="to_gate_logits", **common)(x)
            gates = 2.0 * jax.nn.sigmoid(gate_logits.astype(jnp.float32))
            out = out * gates[..., None]
        out = out.reshape(batch, q_len, inner).astype(self.dtype)
        return LoRADense(self.out_dim, name="to_out", **common, **lora)(out)


class LTX2FFN(nn.Module):
    """diffusers FeedForward with gelu-approximate (net.0.proj → net.2)."""

    dim: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"

    @nn.compact
    def __call__(self, x):
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = LoRADense(4 * self.dim, name="proj_in", **common, **lora)(x)
        return LoRADense(self.dim, name="proj_out", **common, **lora)(nn.gelu(h, approximate=True))


def _mod_params(table: jax.Array, temb: jax.Array):
    """Per-block table (n, d) + tokenwise temb (B, S, n·d) → n tensors (B, S, d)
    (reference LTX2VideoTransformerBlock.get_mod_params)."""
    n, d = table.shape
    batch = temb.shape[0]
    values = table[None, None].astype(jnp.float32) + temb.astype(jnp.float32).reshape(batch, -1, n, d)
    return tuple(values[:, :, i] for i in range(n))


class LTX2Block(nn.Module):
    config: LTX2Config
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"

    @nn.compact
    def __call__(
        self,
        video, audio, text_v, text_a,
        temb, temb_audio, temb_ca, temb_ca_audio, temb_ca_gate, temb_ca_audio_gate,
        video_rope, audio_rope, ca_video_rope, ca_audio_rope,
        text_mask_bias=None, audio_text_mask_bias=None,
    ):
        cfg = self.config
        dim = cfg.inner_dim
        a_dim = cfg.audio_inner_dim
        eps = cfg.norm_eps
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        init = nn.initializers.normal(stddev=1.0)

        table = self.param(
            "scale_shift_table", nn.initializers.normal(stddev=1.0 / dim ** 0.5), (6, dim), self.param_dtype
        )
        a_table = self.param(
            "audio_scale_shift_table", nn.initializers.normal(stddev=1.0 / a_dim ** 0.5), (6, a_dim), self.param_dtype
        )
        v_ca_table = self.param("video_ca_scale_shift_table", init, (5, dim), self.param_dtype)
        a_ca_table = self.param("audio_ca_scale_shift_table", init, (5, a_dim), self.param_dtype)

        sh1, sc1, g1, sh2, sc2, g2 = (m.astype(self.dtype) for m in _mod_params(table, temb))
        a_sh1, a_sc1, a_g1, a_sh2, a_sc2, a_g2 = (m.astype(self.dtype) for m in _mod_params(a_table, temb_audio))

        # --- 1. self-attention -----------------------------------------------------------
        v_n = _rms_plain(video, eps) * (1 + sc1) + sh1
        video = video + g1 * LTX2Attention(
            cfg.num_heads, cfg.head_dim, dim, gated=cfg.gated_attn, name="attn1", **common, **lora
        )(v_n, q_rope=video_rope)

        a_n = _rms_plain(audio, eps) * (1 + a_sc1) + a_sh1
        audio = audio + a_g1 * LTX2Attention(
            cfg.audio_num_heads, cfg.audio_head_dim, a_dim, gated=cfg.audio_gated_attn,
            name="audio_attn1", **common, **lora,
        )(a_n, q_rope=audio_rope)

        # --- 2. prompt cross-attention ---------------------------------------------------
        v_n = _rms_plain(video, eps)
        video = video + LTX2Attention(
            cfg.num_heads, cfg.head_dim, dim, gated=cfg.gated_attn, name="attn2", **common, **lora
        )(v_n, context=text_v, mask_bias=text_mask_bias)
        a_n = _rms_plain(audio, eps)
        audio = audio + LTX2Attention(
            cfg.audio_num_heads, cfg.audio_head_dim, a_dim, gated=cfg.audio_gated_attn,
            name="audio_attn2", **common, **lora,
        )(a_n, context=text_a, mask_bias=audio_text_mask_bias)

        # --- 3. a2v / v2a cross-attention ------------------------------------------------
        v_norm = _rms_plain(video, eps)
        a_norm = _rms_plain(audio, eps)
        v_a2v_sc, v_a2v_sh, v_v2a_sc, v_v2a_sh = _mod_params(v_ca_table[:4], temb_ca)
        (a2v_gate,) = _mod_params(v_ca_table[4:], temb_ca_gate)
        a_a2v_sc, a_a2v_sh, a_v2a_sc, a_v2a_sh = _mod_params(a_ca_table[:4], temb_ca_audio)
        (v2a_gate,) = _mod_params(a_ca_table[4:], temb_ca_audio_gate)

        q_v = v_norm * (1 + v_a2v_sc.astype(self.dtype)) + v_a2v_sh.astype(self.dtype)
        kv_a = a_norm * (1 + a_a2v_sc.astype(self.dtype)) + a_a2v_sh.astype(self.dtype)
        video = video + a2v_gate.astype(self.dtype) * LTX2Attention(
            cfg.audio_num_heads, cfg.audio_head_dim, dim, gated=cfg.gated_attn,
            name="audio_to_video_attn", **common, **lora,
        )(q_v, context=kv_a, q_rope=ca_video_rope, k_rope=ca_audio_rope)

        q_a = a_norm * (1 + a_v2a_sc.astype(self.dtype)) + a_v2a_sh.astype(self.dtype)
        kv_v = v_norm * (1 + v_v2a_sc.astype(self.dtype)) + v_v2a_sh.astype(self.dtype)
        audio = audio + v2a_gate.astype(self.dtype) * LTX2Attention(
            cfg.audio_num_heads, cfg.audio_head_dim, a_dim, gated=cfg.audio_gated_attn,
            name="video_to_audio_attn", **common, **lora,
        )(q_a, context=kv_v, q_rope=ca_audio_rope, k_rope=ca_video_rope)

        # --- 4. feed-forward -------------------------------------------------------------
        v_f = _rms_plain(video, eps) * (1 + sc2) + sh2
        video = video + g2 * LTX2FFN(dim, name="ff", **common, **lora)(v_f)
        a_f = _rms_plain(audio, eps) * (1 + a_sc2) + a_sh2
        audio = audio + a_g2 * LTX2FFN(a_dim, name="audio_ff", **common, **lora)(a_f)
        return video, audio


class _TimestepAdaLN(nn.Module):
    """LTX2AdaLayerNormSingle: Timesteps(256)+MLP timestep embedding plus a
    SiLU-linear producing n modulation params.  Returns (mod, embedded_t),
    both tokenwise (B, S, ·)."""

    dim: int
    n_params: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, timesteps: jax.Array):  # (B, S) or (B,) σ-values
        from ..layers import timestep_embedding

        batch = timesteps.shape[0]
        flat = timesteps.reshape(-1).astype(jnp.float32)
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        sinusoid = timestep_embedding(flat, 256).astype(self.dtype)
        emb = LoRADense(self.dim, name="in_layer", **common)(sinusoid)
        emb = LoRADense(self.dim, name="out_layer", **common)(nn.silu(emb))
        mod = LoRADense(self.n_params * self.dim, name="mod", **common)(
            nn.silu(emb.astype(jnp.float32)).astype(self.dtype)
        )
        return mod.reshape(batch, -1, self.n_params * self.dim), emb.reshape(batch, -1, self.dim)


class LTX2Transformer(nn.Module):
    config: LTX2Config = LTX2Config()
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        video_tokens: jax.Array,  # (B, S_v, in_channels) packed video latents
        audio_tokens: jax.Array,  # (B, S_a, audio_in_channels)
        text_embeds: jax.Array,  # (B, L, caption_channels) connector features
        timesteps: jax.Array,  # (B,) or (B, S_v) σ-valued
        num_frames: int,
        height: int,
        width: int,
        audio_timesteps: Optional[jax.Array] = None,
        text_mask: Optional[jax.Array] = None,
        fps: float = 25.0,
        ref_tokens: Optional[jax.Array] = None,  # (B, S_ref, in_channels) IC-LoRA
        ref_shape: Optional[tuple] = None,  # static (frames, height, width) of the ref latents
        ref_spatial_scale: int = 1,
        ref_temporal_scale: int = 1,
        ref_strength: Optional[jax.Array] = None,  # (B, S_ref) in [0, 1]; None = 1
    ):
        cfg = self.config
        dim = cfg.inner_dim
        a_dim = cfg.audio_inner_dim
        batch = video_tokens.shape[0]
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        if audio_timesteps is None:
            audio_timesteps = timesteps if timesteps.ndim == 1 else timesteps[:, :1].squeeze(1)

        # --- IC-LoRA reference tokens (reference model.py:2048-2102: packed
        # conditioning latents concatenate BEFORE the target tokens; ref
        # timesteps ride t·(1−strength); ref rope coords are built at the ref
        # resolution and re-scaled into target pixel space) ------------------------------
        ref_len = 0
        scalar_video_t = timesteps if timesteps.ndim == 1 else timesteps[:, 0]
        if ref_tokens is not None:
            if ref_shape is None:
                raise ValueError("ref_tokens requires the static ref_shape (F, H, W)")
            ref_len = ref_tokens.shape[1]
            target_t = (
                jnp.broadcast_to(timesteps[:, None], (batch, video_tokens.shape[1]))
                if timesteps.ndim == 1 else timesteps
            )
            scalar_t = timesteps if timesteps.ndim == 1 else timesteps[:, 0]
            strength = (
                jnp.ones((batch, ref_len), jnp.float32) if ref_strength is None
                else ref_strength.astype(jnp.float32)
            )
            # pipeline_ltx2.py:1289: per-token t = t·(1 − conditioning_mask)
            ref_t = scalar_t[:, None] * (1.0 - strength)
            timesteps = jnp.concatenate([ref_t.astype(target_t.dtype), target_t], axis=1)
            video_tokens = jnp.concatenate([ref_tokens, video_tokens], axis=1)

        # --- rope tables (static shapes; fp64 tables built in numpy) --------------------
        v_coords = ltx2_video_coords(cfg, num_frames, height, width, fps)
        if ref_tokens is not None:
            # _scale_ltx2_reference_coords (reference model.py:1916-1948):
            # spatial midpoints scale up to the target's pixel frame; the
            # temporal axis shifts back by (temporal_scale−1)·(first target
            # patch's temporal end) and clamps at 0
            r_coords = ltx2_video_coords(cfg, ref_shape[0], ref_shape[1], ref_shape[2], fps)
            spatial = int(ref_spatial_scale or 1)
            temporal = int(ref_temporal_scale or 1)
            if temporal != 1:
                sf_t = cfg.vae_scale_factors[0]
                first_end = max(cfg.patch_size_t * sf_t + cfg.causal_offset - sf_t, 0.0) / fps
                r_coords[:, 0] = np.clip(r_coords[:, 0] - (temporal - 1) * first_end, 0.0, None)
            if spatial != 1:
                r_coords[:, 1] *= spatial
                r_coords[:, 2] *= spatial
            v_coords = np.concatenate([r_coords, v_coords], axis=0)
        a_coords = ltx2_audio_coords(cfg, audio_tokens.shape[1])
        v_max = (cfg.pos_embed_max_pos, cfg.base_height, cfg.base_width)
        a_max = (cfg.audio_pos_embed_max_pos,)
        ca_max = (max(cfg.pos_embed_max_pos, cfg.audio_pos_embed_max_pos),)
        video_rope = ltx2_rope_tables(v_coords, v_max, dim, cfg.rope_theta)
        audio_rope = ltx2_rope_tables(a_coords, a_max, a_dim, cfg.rope_theta)
        # cross-attention rope: temporal axis only, shared max, cross dim width
        ca_video_rope = ltx2_rope_tables(
            v_coords[:, :1], ca_max, cfg.audio_cross_attention_dim, cfg.rope_theta
        )
        ca_audio_rope = ltx2_rope_tables(
            a_coords, ca_max, cfg.audio_cross_attention_dim, cfg.rope_theta
        )

        # --- projections + conditioning --------------------------------------------------
        video = LoRADense(dim, name="proj_in", **common, **lora)(video_tokens.astype(self.dtype))
        audio = LoRADense(a_dim, name="audio_proj_in", **common, **lora)(audio_tokens.astype(self.dtype))

        def caption(prefix, width_):
            h = LoRADense(width_, name=f"{prefix}_1", **common, **lora)(text_embeds.astype(self.dtype))
            return LoRADense(width_, name=f"{prefix}_2", **common, **lora)(nn.gelu(h, approximate=True))

        text_v = caption("caption_proj", dim)
        text_a = caption("audio_caption_proj", a_dim)
        mask_bias = None
        audio_mask_bias = None
        if text_mask is not None:
            bias = (1.0 - text_mask.astype(jnp.float32)) * -10000.0
            mask_bias = bias[:, None, None, :]
            audio_mask_bias = mask_bias

        temb, embedded_t = _TimestepAdaLN(dim, 6, name="time_embed", **common)(timesteps)
        temb_audio, audio_embedded_t = _TimestepAdaLN(a_dim, 6, name="audio_time_embed", **common)(audio_timesteps)

        scalar_v = scalar_video_t  # the TARGET sigma (ref tokens may sit at t=0 ahead of it)
        scalar_a = audio_timesteps if audio_timesteps.ndim == 1 else audio_timesteps[:, 0]
        temb_ca, _ = _TimestepAdaLN(dim, 4, name="av_ca_video_scale_shift", **common)(scalar_v)
        temb_ca_gate, _ = _TimestepAdaLN(dim, 1, name="av_ca_video_a2v_gate", **common)(scalar_v)
        temb_ca_audio, _ = _TimestepAdaLN(a_dim, 4, name="av_ca_audio_scale_shift", **common)(scalar_a)
        temb_ca_audio_gate, _ = _TimestepAdaLN(a_dim, 1, name="av_ca_audio_v2a_gate", **common)(scalar_a)

        block_cls = nn.remat(LTX2Block) if self.remat else LTX2Block
        for layer in range(cfg.num_layers):
            video, audio = block_cls(cfg, name=f"block_{layer}", **common, **lora)(
                video, audio, text_v, text_a,
                temb, temb_audio, temb_ca, temb_ca_audio, temb_ca_gate, temb_ca_audio_gate,
                video_rope, audio_rope, ca_video_rope, ca_audio_rope,
                mask_bias, audio_mask_bias,
            )
            self.sow("intermediates", f"block_{layer}_hidden", video)

        # --- output heads ----------------------------------------------------------------
        table = self.param(
            "scale_shift_table", nn.initializers.normal(stddev=1.0 / dim ** 0.5), (2, dim), self.param_dtype
        )
        a_table = self.param(
            "audio_scale_shift_table", nn.initializers.normal(stddev=1.0 / a_dim ** 0.5),
            (2, a_dim), self.param_dtype,
        )
        # reference: table[None, None] + embedded_timestep[:, :, None] — the same
        # embedded timestep feeds both the shift and scale rows
        shift, scale = _mod_params(table, jnp.concatenate([embedded_t, embedded_t], axis=-1))
        ln = LayerNorm(use_scale=False, use_bias=False, eps=1e-6, **common)
        video = ln(video).astype(jnp.float32) * (1 + scale) + shift
        video_out = LoRADense(cfg.in_channels, name="proj_out", **common, **lora)(video.astype(self.dtype))

        a_shift, a_scale = _mod_params(a_table, jnp.concatenate([audio_embedded_t, audio_embedded_t], axis=-1))
        audio = ln(audio).astype(jnp.float32) * (1 + a_scale) + a_shift
        audio_out = LoRADense(cfg.audio_in_channels, name="audio_proj_out", **common, **lora)(audio.astype(self.dtype))
        if ref_len:
            # loss/denoising consume target tokens only; the reference tokens
            # are conditioning (reference model.py:2250 drops them the same way)
            video_out = video_out[:, ref_len:]
        return video_out.astype(jnp.float32), audio_out.astype(jnp.float32)
