"""ACE-Step text-to-music transformer in flax.linen — checkpoint-faithful.

Reference behavior: helpers/models/ace_step/transformer.py (vendored
``ACEStepTransformer2DModel``): mel-style latents (B, 8, 16, T) through a
conv PatchEmbed ((16,1) patch conv → GroupNorm(32) → 1x1 conv) into a 1-D
token sequence; 28 Sana-style ``LinearTransformerBlock``s — ReLU linear
(Lite-LA) self-attention + standard cross-attention over the conditioning
sequence + GLUMBConv (inverted 1x1 conv → depthwise GLU conv → 1x1 point
conv) — with adaLN-single (one shared ``t_block`` 6-way modulation plus a
per-block ``scale_shift_table``).  Qwen2-style RoPE (cos/sin of the FULL head
dim via cat(freqs, freqs), rotate-half on interleaved pairs; theta 1e6).
Conditioning ``encode()``: speaker embedding (512→d), genre/text projection
(768→d), and lyrics through an embedding + 6-block wenet Conformer encoder
(rel-pos ESPnet attention with pos_bias_u/v, pre-LN, swish FFN 1024→4096) +
projection, concatenated [speaker, genre, lyrics].  SSL projector heads
(MERT / m-HuBERT) tap blocks 9/9 for REPA-style cosine alignment.  Final
T2IFinalLayer: RMSNorm (no affine) + (2, d) scale_shift_table + linear.

TPU-first: Lite-LA is two dense matmuls (O(S·D²)) — no softmax, no masks —
already ideal MXU shape; the depthwise GLU conv maps to ``lax.conv`` with
feature_group_count; all ragged masking is static multiplicative masking.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..layers import LayerNorm, LoRADense, MLPEmbedder, RMSNorm, timestep_embedding

Dtype = Any


@dataclasses.dataclass(frozen=True)
class ACEStepConfig:
    in_channels: int = 8
    latent_height: int = 16  # mel bins (patch covers the full height)
    patch_mult: int = 256  # early-conv expansion (reference in_channels*256)
    num_layers: int = 28
    num_heads: int = 24
    head_dim: int = 64
    mlp_ratio: float = 4.0
    rope_theta: float = 1_000_000.0
    speaker_dim: int = 512
    text_dim: int = 768
    lyric_vocab: int = 6681
    lyric_hidden: int = 1024
    lyric_depth: int = 6
    lyric_heads: int = 16
    lyric_ffn: int = 4096
    ssl_dims: Tuple[int, ...] = (1024, 768)
    ssl_depths: Tuple[int, ...] = (9, 9)
    ssl_names: Tuple[str, ...] = ("mert", "m-hubert")

    @property
    def inner_dim(self) -> int:
        return self.num_heads * self.head_dim

    @classmethod
    def tiny(cls) -> "ACEStepConfig":
        return cls(
            in_channels=4, latent_height=1, patch_mult=8, num_layers=2,
            num_heads=2, head_dim=16, speaker_dim=16, text_dim=16,
            lyric_vocab=64, lyric_hidden=32, lyric_depth=1, lyric_heads=2,
            lyric_ffn=64, ssl_dims=(24,), ssl_depths=(1,), ssl_names=("mert",),
        )


def qwen2_rope_tables(seq_len: int, dim: int, theta: float):
    """cos/sin of shape (S, D): angles over the half-dim frequencies repeated
    as cat(freqs, freqs) (reference Qwen2RotaryEmbedding:105-113)."""
    inv = 1.0 / theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim)
    t = np.arange(seq_len, dtype=np.float64)
    freqs = np.outer(t, inv)
    emb = np.concatenate([freqs, freqs], axis=-1)
    return jnp.asarray(np.cos(emb), jnp.float32), jnp.asarray(np.sin(emb), jnp.float32)


def qwen2_apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x (B, S, H, D); rotate-half on interleaved pairs with full-dim cos/sin
    (reference CustomLiteLAProcessor2_0.apply_rotary_emb)."""
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    x_f = x.astype(jnp.float32)
    x0, x1 = x_f[..., 0::2], x_f[..., 1::2]
    rotated = jnp.stack([-x1, x0], axis=-1).reshape(x.shape)
    return (x_f * c + rotated * s).astype(x.dtype)


def lite_la_attention(q, k, v, mask=None, eps=1e-15, pad_val=1.0):
    """ReLU linear attention (reference CustomLiteLAProcessor2_0:141-156).

    q/k/v: (B, S, H, D); mask (B, S) multiplicative.  fp32 throughout.
    """
    q = jax.nn.relu(q.astype(jnp.float32))
    k = jax.nn.relu(k.astype(jnp.float32))
    v = v.astype(jnp.float32)
    if mask is not None:
        m = mask.astype(jnp.float32)[:, :, None, None]
        q = q * m
        k = k * m
        v = v * m
    v = jnp.concatenate([v, jnp.full(v.shape[:-1] + (1,), pad_val, jnp.float32)], axis=-1)
    # vk[b,h,e,d] = Σ_s v[b,s,h,e] k[b,s,h,d];  out[b,s,h,e] = Σ_d vk[e,d] q[b,s,h,d]
    vk = jnp.einsum("bshe,bshd->bhed", v, k)
    out = jnp.einsum("bhed,bshd->bshe", vk, q)
    return out[..., :-1] / (out[..., -1:] + eps)


class GLUMBConv(nn.Module):
    """Inverted 1x1 conv → depthwise GLU conv (k=3) → 1x1 point conv
    (reference attention.py GLUMBConv; SiLU on the first conv, GLU gate on
    the depthwise output)."""

    dim: int
    hidden: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, S, D)
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = nn.Conv(2 * self.hidden, (1,), use_bias=True, name="inverted", **common)(x)
        h = nn.silu(h)
        h = nn.Conv(
            2 * self.hidden, (3,), padding=1, feature_group_count=2 * self.hidden,
            use_bias=True, name="depth", **common,
        )(h)
        value, gate = jnp.split(h, 2, axis=-1)
        h = value * nn.silu(gate)
        return nn.Conv(self.dim, (1,), use_bias=False, name="point", **common)(h)


class ACEStepBlock(nn.Module):
    """LinearTransformerBlock: Lite-LA self-attn → cross-attn → GLUMBConv,
    adaLN-single with per-block scale_shift_table."""

    config: ACEStepConfig
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"

    @nn.compact
    def __call__(self, x, context, temb6, rope_self, rope_cross, mask=None, context_mask=None):
        cfg = self.config
        dim = cfg.inner_dim
        batch, seq = x.shape[:2]
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        table = self.param(
            "scale_shift_table", nn.initializers.normal(stddev=1.0 / dim ** 0.5),
            (6, dim), self.param_dtype,
        )
        mods = table[None].astype(jnp.float32) + temb6.astype(jnp.float32).reshape(batch, 6, dim)
        sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp = (
            mods[:, i][:, None, :] for i in range(6)
        )

        rms = RMSNorm(eps=1e-6, use_scale=False, **common)
        x_n = (rms(x).astype(jnp.float32) * (1 + sc_msa) + sh_msa).astype(self.dtype)

        # --- Lite-LA self-attention (projections have bias) ------------------------------
        to_h = lambda a: a.reshape(batch, -1, cfg.num_heads, cfg.head_dim)
        q = to_h(LoRADense(dim, name="attn_q", **common, **lora)(x_n))
        k = to_h(LoRADense(dim, name="attn_k", **common, **lora)(x_n))
        v = to_h(LoRADense(dim, name="attn_v", **common, **lora)(x_n))
        cos_s, sin_s = rope_self
        q = qwen2_apply_rope(q, cos_s, sin_s)
        k = qwen2_apply_rope(k, cos_s, sin_s)
        attn = lite_la_attention(q, k, v, mask).reshape(batch, seq, dim).astype(self.dtype)
        attn = LoRADense(dim, name="attn_proj", **common, **lora)(attn)
        x = x + g_msa.astype(self.dtype) * attn

        # --- cross-attention (sdpa; rope on q from self positions, k from encoder) ------
        qc = to_h(LoRADense(dim, name="cross_q", **common, **lora)(x))
        kc = to_h(LoRADense(dim, name="cross_k", **common, **lora)(context))
        vc = to_h(LoRADense(dim, name="cross_v", **common, **lora)(context))
        qc = qwen2_apply_rope(qc, cos_s, sin_s)
        cos_c, sin_c = rope_cross
        kc = qwen2_apply_rope(kc, cos_c, sin_c)
        qf = qc.astype(jnp.float32).transpose(0, 2, 1, 3)
        kf = kc.astype(jnp.float32).transpose(0, 2, 1, 3)
        vf = vc.astype(jnp.float32).transpose(0, 2, 1, 3)
        logits = qf @ kf.transpose(0, 1, 3, 2) / math.sqrt(cfg.head_dim)
        if context_mask is not None:
            qm = mask if mask is not None else jnp.ones((batch, seq), jnp.float32)
            combined = qm.astype(jnp.float32)[:, :, None] * context_mask.astype(jnp.float32)[:, None, :]
            logits = jnp.where(combined[:, None] == 1, logits, -jnp.inf)
        probs = jax.nn.softmax(logits, axis=-1)
        probs = jnp.nan_to_num(probs)  # fully-masked rows
        cross = (probs @ vf).transpose(0, 2, 1, 3).reshape(batch, seq, dim).astype(self.dtype)
        x = x + LoRADense(dim, name="cross_proj", **common, **lora)(cross)

        # --- GLUMBConv FFN ---------------------------------------------------------------
        x_f = (rms(x).astype(jnp.float32) * (1 + sc_mlp) + sh_mlp).astype(self.dtype)
        ff = GLUMBConv(dim, int(dim * cfg.mlp_ratio), name="ff", **common)(x_f)
        return x + g_mlp.astype(self.dtype) * ff


# ---------------------------------------------------------------------------------
# Conformer lyric encoder (reference lyrics_utils/lyric_encoder.py:
# ConformerEncoder with defaults — no macaron, no cnn module, pre-LN,
# ESPnet relative-position attention)
# ---------------------------------------------------------------------------------


def espnet_rel_pos(seq_len: int, dim: int):
    """(2T-1, D) relative position table: positions T-1 … 0 … -(T-1)
    (reference EspnetRelPositionalEncoding.extend_pe)."""
    position = np.arange(seq_len, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, dim, 2, dtype=np.float64) * -(math.log(10000.0) / dim))
    pos = np.zeros((seq_len, dim))
    neg = np.zeros((seq_len, dim))
    pos[:, 0::2] = np.sin(position * div)
    pos[:, 1::2] = np.cos(position * div)
    neg[:, 0::2] = np.sin(-position * div)
    neg[:, 1::2] = np.cos(-position * div)
    return jnp.asarray(np.concatenate([pos[::-1], neg[1:]], axis=0), jnp.float32)


def _rel_shift(x: jax.Array) -> jax.Array:
    """(B, H, T, 2T-1) → (B, H, T, T) ESPnet shifting trick."""
    b, h, t1, t2 = x.shape
    zero = jnp.zeros((b, h, t1, 1), x.dtype)
    padded = jnp.concatenate([zero, x], axis=-1).reshape(b, h, t2 + 1, t1)
    return padded[:, :, 1:].reshape(b, h, t1, t2)[..., : (t2 + 1) // 2]


class ConformerLayer(nn.Module):
    """Pre-LN rel-pos MHSA + pre-LN FFN (swish)."""

    hidden: int
    heads: int
    ffn: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos_emb, mask):
        d = self.hidden
        dk = d // self.heads
        batch, seq = x.shape[:2]
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        h = LayerNorm(eps=1e-5, name="norm_mha", **common)(x)
        to_h = lambda a: a.reshape(batch, seq, self.heads, dk)
        q = to_h(LoRADense(d, name="attn_q", **common)(h)).astype(jnp.float32)
        k = to_h(LoRADense(d, name="attn_k", **common)(h)).astype(jnp.float32)
        v = to_h(LoRADense(d, name="attn_v", **common)(h)).astype(jnp.float32)
        p = LoRADense(d, name="linear_pos", use_bias=False, **common)(
            pos_emb.astype(self.dtype)
        ).reshape(-1, self.heads, dk).astype(jnp.float32)
        bias_u = self.param("pos_bias_u", nn.initializers.xavier_uniform(), (self.heads, dk), self.param_dtype)
        bias_v = self.param("pos_bias_v", nn.initializers.xavier_uniform(), (self.heads, dk), self.param_dtype)

        qT = q.transpose(0, 2, 1, 3)
        kT = k.transpose(0, 2, 1, 3)
        vT = v.transpose(0, 2, 1, 3)
        ac = (qT + bias_u.astype(jnp.float32)[None, :, None]) @ kT.transpose(0, 1, 3, 2)
        bd = (qT + bias_v.astype(jnp.float32)[None, :, None]) @ p.transpose(1, 2, 0)[None]
        bd = _rel_shift(bd)
        scores = (ac + bd) / math.sqrt(dk)
        if mask is not None:
            scores = jnp.where(mask.astype(bool)[:, None, None, :], scores, -jnp.inf)
        probs = jnp.nan_to_num(jax.nn.softmax(scores, axis=-1))
        attn = (probs @ vT).transpose(0, 2, 1, 3).reshape(batch, seq, d).astype(self.dtype)
        x = x + LoRADense(d, name="attn_out", **common)(attn)

        h = LayerNorm(eps=1e-5, name="norm_ff", **common)(x)
        h = LoRADense(self.ffn, name="ff_1", **common)(h)
        h = nn.silu(h)
        return x + LoRADense(d, name="ff_2", **common)(h)


class LyricEncoder(nn.Module):
    """wenet ConformerEncoder with ACE-Step's settings (linear embed,
    rel_pos_espnet, full-attention mask, after-norm)."""

    config: ACEStepConfig
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens, mask):
        cfg = self.config
        d = cfg.lyric_hidden
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        embs = self.param(
            "lyric_embs", nn.initializers.normal(stddev=0.02),
            (cfg.lyric_vocab, d), self.param_dtype,
        )
        x = jnp.take(embs, tokens, axis=0).astype(self.dtype)
        x = LoRADense(d, name="embed_out", **common)(x)
        x = LayerNorm(eps=1e-5, name="embed_norm", **common)(x)
        x = x * math.sqrt(d)
        pos_emb = espnet_rel_pos(x.shape[1], d)
        for i in range(cfg.lyric_depth):
            x = ConformerLayer(
                d, cfg.lyric_heads, cfg.lyric_ffn, name=f"layer_{i}", **common
            )(x, pos_emb, mask)
        return LayerNorm(eps=1e-5, name="after_norm", **common)(x)


class ACEStepTransformer(nn.Module):
    config: ACEStepConfig = ACEStepConfig()
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"
    remat: bool = False

    def encode_conditioning(self, text_embeds, speaker_embeds, lyric_tokens, lyric_mask, text_mask=None):
        """[speaker(1), genre(text), lyrics] conditioning sequence
        (reference transformer.py:433-497 ``encode``)."""
        cfg = self.config
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        batch = text_embeds.shape[0]
        spk = LoRADense(cfg.inner_dim, name="speaker_embedder", **common)(
            speaker_embeds.astype(self.dtype)
        )[:, None, :]
        genre = LoRADense(cfg.inner_dim, name="genre_embedder", **common)(
            text_embeds.astype(self.dtype)
        )
        lyric = LyricEncoder(cfg, name="lyric_encoder", **common)(lyric_tokens, lyric_mask)
        lyric = LoRADense(cfg.inner_dim, name="lyric_proj", **common)(lyric)
        context = jnp.concatenate([spk, genre, lyric], axis=1)
        ones = jnp.ones((batch, 1), jnp.float32)
        t_mask = text_mask if text_mask is not None else jnp.ones(text_embeds.shape[:2], jnp.float32)
        context_mask = jnp.concatenate(
            [ones, t_mask.astype(jnp.float32), lyric_mask.astype(jnp.float32)], axis=1
        )
        return context, context_mask

    @nn.compact
    def __call__(
        self,
        latents: jax.Array,  # (B, H_mel, T, C) NHWC audio latents
        timesteps: jax.Array,  # (B,) flow σ ∈ (0,1)
        text_embeds: jax.Array,  # (B, L_text, text_dim) genre/caption features
        speaker_embeds: Optional[jax.Array] = None,  # (B, speaker_dim)
        lyric_tokens: Optional[jax.Array] = None,  # (B, L_lyric) int ids
        lyric_mask: Optional[jax.Array] = None,
        text_mask: Optional[jax.Array] = None,
        latent_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        cfg = self.config
        dim = cfg.inner_dim
        batch, h_mel, t_len, channels = latents.shape
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)

        if speaker_embeds is None:
            speaker_embeds = jnp.zeros((batch, cfg.speaker_dim), jnp.float32)
        if lyric_tokens is None:
            lyric_tokens = jnp.zeros((batch, 1), jnp.int32)
        if lyric_mask is None:
            lyric_mask = jnp.ones(lyric_tokens.shape, jnp.float32)

        context, context_mask = self.encode_conditioning(
            text_embeds, speaker_embeds, lyric_tokens, lyric_mask, text_mask
        )

        # --- timestep: sinusoid(σ·1000) → MLP → shared 6-way t_block --------------------
        embedded_t = MLPEmbedder(dim, name="time_in", **common)(
            timestep_embedding(timesteps.astype(jnp.float32), 256).astype(self.dtype)
        )
        temb6 = LoRADense(6 * dim, name="t_block", **common)(
            nn.silu(embedded_t.astype(jnp.float32)).astype(self.dtype)
        )

        # --- PatchEmbed: (16,1) patch conv → GroupNorm(32) → 1x1 conv -------------------
        x = nn.Conv(
            channels * cfg.patch_mult, (cfg.latent_height, 1), strides=(cfg.latent_height, 1),
            padding="VALID", use_bias=True, name="patch_conv", **common,
        )(latents.astype(self.dtype))
        x = nn.GroupNorm(
            num_groups=min(32, channels * cfg.patch_mult), epsilon=1e-6,
            name="patch_norm", **common,
        )(x)
        x = nn.Conv(dim, (1, 1), use_bias=True, name="patch_proj", **common)(x)
        x = x.reshape(batch, -1, dim)  # (B, T, D)
        seq = x.shape[1]

        rope_self = qwen2_rope_tables(seq, cfg.head_dim, cfg.rope_theta)
        rope_cross = qwen2_rope_tables(context.shape[1], cfg.head_dim, cfg.rope_theta)

        block_cls = nn.remat(ACEStepBlock) if self.remat else ACEStepBlock
        for layer in range(cfg.num_layers):
            x = block_cls(cfg, name=f"block_{layer}", **common, **lora)(
                x, context, temb6, rope_self, rope_cross, latent_mask, context_mask
            )
            self.sow("intermediates", f"block_{layer}_hidden", x)
            # SSL projector taps (REPA-style; reference decode():671-706)
            for head, depth in enumerate(cfg.ssl_depths):
                if layer == depth:
                    proj = x
                    for j, feat in enumerate((2 * dim, 2 * dim, cfg.ssl_dims[head])):
                        proj = LoRADense(feat, name=f"projector_{head}_{j}", **common)(proj)
                        if j < 2:
                            proj = nn.silu(proj)
                    self.sow("intermediates", f"ssl_proj_{cfg.ssl_names[head]}", proj)

        # --- T2IFinalLayer ---------------------------------------------------------------
        table = self.param(
            "final_scale_shift_table", nn.initializers.normal(stddev=1.0 / dim ** 0.5),
            (2, dim), self.param_dtype,
        )
        mods = table[None].astype(jnp.float32) + embedded_t.astype(jnp.float32)[:, None]
        shift, scale = mods[:, 0][:, None], mods[:, 1][:, None]
        x_n = RMSNorm(eps=1e-6, use_scale=False, **common)(x).astype(jnp.float32)
        x_n = x_n * (1 + scale) + shift
        out = LoRADense(
            cfg.latent_height * channels, name="final_proj", **common, **lora
        )(x_n.astype(self.dtype))
        # unpatchify: (B, T, 16*C) → (B, 16, T, C); reference T2IFinalLayer.unpatchfy
        out = out.reshape(batch, t_len, cfg.latent_height, channels)
        out = jnp.transpose(out, (0, 2, 1, 3))
        return out.astype(jnp.float32)
