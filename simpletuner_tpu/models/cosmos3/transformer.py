"""Cosmos3 omni MoT transformer in flax.linen — checkpoint-faithful core.

Reference behavior: helpers/models/cosmos3/transformer.py (vendored
``Cosmos3OmniTransformer``): a Qwen3-style VL backbone run as a Mixture of
Transformers — every decoder layer holds TWO parameter pathways.  The
"understanding" pathway (text prefix) runs causal GQA self-attention
(32 q / 8 kv heads x 128) with per-head affine RMS q/k norms and a SwiGLU
MLP; the "generation" pathway (vision diffusion tokens) has its own
projections (``add_*_proj`` / ``mlp_moe_gen`` / ``*_moe_gen`` norms) and
attends with FULL attention over the concatenated [und, gen] keys/values.
Rotary embeddings are Qwen2-VL interleaved mRoPE: per-axis frequency chunks
[T..H..W] interleaved as [THTHW...] then duplicated (rotate-half convention),
theta 5e6 over 3-axis position ids.  Vision latents are 2x2-patchified to
192 features, projected to 4096, and the per-token timestep embedding
(sinusoid of t·0.001) is ADDED onto noisy tokens; predictions read back
through ``proj_out`` after the generation-side final norm.

This core covers the text2world training path (text prefix + all-noisy
vision tokens) plus the generator-only split-reasoner replay (``reasoner_kv``
from ``reasoner.py``); the sound submodality's waveform codec lives in
``audio_tokenizer.py``.  Dedicated sound/action output heads are not ported.
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
class Cosmos3Config:
    vocab_size: int = 151936
    hidden_size: int = 4096
    head_dim: int = 128
    num_heads: int = 32
    num_kv_heads: int = 8
    num_layers: int = 36
    intermediate_size: int = 12288
    latent_channel: int = 48
    latent_patch_size: int = 2
    rope_theta: float = 5_000_000.0
    rope_axes_dim: Tuple[int, int, int] = (24, 20, 20)
    rms_norm_eps: float = 1e-6
    timestep_scale: float = 0.001
    attention_bias: bool = False

    @property
    def patch_latent_dim(self) -> int:
        return self.latent_channel * self.latent_patch_size ** 2

    @classmethod
    def tiny(cls) -> "Cosmos3Config":
        return cls(
            vocab_size=64, hidden_size=32, head_dim=16, num_heads=2, num_kv_heads=1,
            num_layers=2, intermediate_size=64, latent_channel=2,
            rope_axes_dim=(4, 2, 2),
        )


def cosmos3_mrope(config: Cosmos3Config, position_ids: jax.Array):
    """(B, 3, S) mRoPE position ids → cos/sin (B, S, head_dim) in the
    rotate-half convention (reference Cosmos3VLTextRotaryEmbedding)."""
    hd = config.head_dim
    inv_freq = 1.0 / (config.rope_theta ** (np.arange(0, hd, 2, dtype=np.float64) / hd))
    freqs = position_ids.astype(jnp.float32)[:, :, :, None] * jnp.asarray(inv_freq, jnp.float32)[None, None, None]
    # [B, 3, S, hd/2] → interleave T/H/W chunks (apply_interleaved_mrope)
    t_dim, h_dim, w_dim = config.rope_axes_dim
    mixed = freqs[:, 0]
    idx = np.arange(hd // 2)
    h_sel = (idx % 3 == 1) & (idx < h_dim * 3)
    w_sel = (idx % 3 == 2) & (idx < w_dim * 3)
    mixed = jnp.where(jnp.asarray(h_sel)[None, None], freqs[:, 1], mixed)
    mixed = jnp.where(jnp.asarray(w_sel)[None, None], freqs[:, 2], mixed)
    emb = jnp.concatenate([mixed, mixed], axis=-1)  # (B, S, hd)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def _apply_mrope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    # x (B, S, H, D); cos/sin (B, S, D) broadcast over heads
    return x * cos[:, :, None] + _rotate_half(x) * sin[:, :, None]


def _rms(x: jax.Array, scale: jax.Array, eps: float) -> jax.Array:
    x_f = x.astype(jnp.float32)
    y = x_f * jax.lax.rsqrt(jnp.mean(jnp.square(x_f), axis=-1, keepdims=True) + eps)
    return (y * scale.astype(jnp.float32)).astype(x.dtype)


class Cosmos3MLP(nn.Module):
    """SwiGLU (reference Cosmos3VLTextMLP, hidden_act='silu')."""

    config: Cosmos3Config
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
        gate = LoRADense(cfg.intermediate_size, name="gate_proj", **common, **lora)(x)
        up = LoRADense(cfg.intermediate_size, name="up_proj", **common, **lora)(x)
        return LoRADense(cfg.hidden_size, name="down_proj", **common, **lora)(nn.silu(gate) * up)


class Cosmos3MoTLayer(nn.Module):
    """One MoT decoder layer: dual parameter pathways, shared attention field
    (reference Cosmos3VLTextMoTDecoderLayer + Cosmos3AttnProcessor)."""

    config: Cosmos3Config
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"

    @nn.compact
    def __call__(self, und, gen, rope_und, rope_gen, reasoner_kv=None):
        """``reasoner_kv`` = (k, v) replayed from a frozen ``Cosmos3Reasoner``
        (reference forward_gen_only transformer.py:420-451, :542-552): the und
        pathway is skipped and the generation tokens attend over
        [reasoner_k, gen_k] instead — matching generator-only checkpoints."""
        cfg = self.config
        dh = cfg.head_dim
        eps = cfg.rms_norm_eps
        n_rep = cfg.num_heads // cfg.num_kv_heads
        batch, gen_len = gen.shape[:2]
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype, use_bias=cfg.attention_bias)

        scale = lambda name, dim: self.param(name, nn.initializers.ones, (dim,), self.param_dtype)
        gen_n = _rms(gen, scale("input_layernorm_moe_gen", cfg.hidden_size), eps)

        def qkv(x, prefix, seq):
            q = LoRADense(cfg.num_heads * dh, name=f"{prefix}q", **common, **lora)(x)
            k = LoRADense(cfg.num_kv_heads * dh, name=f"{prefix}k", **common, **lora)(x)
            v = LoRADense(cfg.num_kv_heads * dh, name=f"{prefix}v", **common, **lora)(x)
            return (
                q.reshape(batch, seq, cfg.num_heads, dh),
                k.reshape(batch, seq, cfg.num_kv_heads, dh),
                v.reshape(batch, seq, cfg.num_kv_heads, dh),
            )

        def attend(q, k, v, causal):
            qf = q.astype(jnp.float32).transpose(0, 2, 1, 3)
            kf = jnp.repeat(k, n_rep, axis=2).astype(jnp.float32).transpose(0, 2, 1, 3)
            vf = jnp.repeat(v, n_rep, axis=2).astype(jnp.float32).transpose(0, 2, 1, 3)
            logits = qf @ kf.transpose(0, 1, 3, 2) / math.sqrt(dh)
            if causal:
                mask = jnp.tril(jnp.ones((q.shape[1], k.shape[1]), bool))
                logits = jnp.where(mask[None, None], logits, -jnp.inf)
            probs = jax.nn.softmax(logits, axis=-1)
            out = (probs @ vf).transpose(0, 2, 1, 3)
            return out.reshape(batch, q.shape[1], cfg.num_heads * dh).astype(self.dtype)

        cos_g, sin_g = rope_gen
        q_g, k_g, v_g = qkv(gen_n, "attn_gen_", gen_len)
        q_g = _rms(q_g, scale("norm_added_q", dh), eps)
        k_g = _rms(k_g, scale("norm_added_k", dh), eps)
        q_g = _apply_mrope(q_g, cos_g, sin_g)
        k_g = _apply_mrope(k_g, cos_g, sin_g)

        if reasoner_kv is None:
            und_n = _rms(und, scale("input_layernorm", cfg.hidden_size), eps)
            und_len = und.shape[1]
            q_u, k_u, v_u = qkv(und_n, "attn_und_", und_len)
            q_u = _rms(q_u, scale("norm_q", dh), eps)
            k_u = _rms(k_u, scale("norm_k", dh), eps)
            cos_u, sin_u = rope_und
            q_u = _apply_mrope(q_u, cos_u, sin_u)
            k_u = _apply_mrope(k_u, cos_u, sin_u)
            und_attn = attend(q_u, k_u, v_u, causal=True)
        else:
            k_u, v_u = reasoner_kv  # roped k / raw v from the frozen reasoner

        all_k = jnp.concatenate([k_u.astype(k_g.dtype), k_g], axis=1)
        all_v = jnp.concatenate([v_u.astype(v_g.dtype), v_g], axis=1)
        gen_attn = attend(q_g, all_k, all_v, causal=False)
        gen = gen + LoRADense(cfg.hidden_size, name="attn_gen_out", **common, **lora)(gen_attn)
        gen_n = _rms(gen, scale("post_attention_layernorm_moe_gen", cfg.hidden_size), eps)
        gen = gen + Cosmos3MLP(cfg, name="mlp_moe_gen", dtype=self.dtype, param_dtype=self.param_dtype,
                               **lora)(gen_n)

        if reasoner_kv is None:
            und = und + LoRADense(cfg.hidden_size, name="attn_und_out", **common, **lora)(und_attn)
            und_n = _rms(und, scale("post_attention_layernorm", cfg.hidden_size), eps)
            und = und + Cosmos3MLP(cfg, name="mlp", dtype=self.dtype, param_dtype=self.param_dtype,
                                   **lora)(und_n)
        return und, gen


class Cosmos3OmniTransformer(nn.Module):
    config: Cosmos3Config = Cosmos3Config()
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        text_ids: Optional[jax.Array],  # (B, S_und) int token ids (understanding prefix)
        vision_tokens: jax.Array,  # (B, S_gen, patch_latent_dim) patchified latents
        position_ids: jax.Array,  # (B, 3, S_und + S_gen) mRoPE ids
        timesteps: jax.Array,  # (B, S_gen) per-token σ·1000-style scheduler values
        noisy_mask: Optional[jax.Array] = None,  # (B, S_gen) 1 = noisy (gets temb)
        reasoner_kv: Optional[Tuple[Any, ...]] = None,  # per-layer (k, v) replay
    ):
        """With ``reasoner_kv`` (one (k, v) pair per layer from a frozen
        ``Cosmos3Reasoner``), the understanding pathway is skipped entirely
        and ``text_ids`` may be None — the generator-only replay mode
        (reference transformer.py:947-953); ``position_ids`` still covers
        [reasoner prefix, gen] so the gen rope slice lines up."""
        cfg = self.config
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        batch, gen_len = vision_tokens.shape[:2]
        und_len = position_ids.shape[2] - gen_len
        replay = reasoner_kv is not None
        if replay and len(reasoner_kv) != cfg.num_layers:
            raise ValueError(
                f"reasoner replay needs {cfg.num_layers} (k, v) pairs, got {len(reasoner_kv)}"
            )

        und = None
        if not replay:
            if text_ids is None:
                raise ValueError("text_ids required unless reasoner_kv replay is given")
            embed = self.param(
                "embed_tokens", nn.initializers.normal(stddev=0.02),
                (cfg.vocab_size, cfg.hidden_size), self.param_dtype,
            )
            und = jnp.take(embed, text_ids, axis=0).astype(self.dtype)

        gen = LoRADense(cfg.hidden_size, name="proj_in", use_bias=True, **common, **lora)(
            vision_tokens.astype(self.dtype)
        )
        # sinusoid of t·timestep_scale, [cos, sin] halves (Timesteps flip_sin_to_cos)
        from ..layers import timestep_embedding

        t_flat = (timesteps.astype(jnp.float32) * cfg.timestep_scale).reshape(-1)
        sinusoid = timestep_embedding(t_flat, 256, time_factor=1.0).astype(self.dtype)
        temb = LoRADense(cfg.hidden_size, name="time_in_1", use_bias=True, **common)(sinusoid)
        temb = LoRADense(cfg.hidden_size, name="time_in_2", use_bias=True, **common)(nn.silu(temb))
        temb = temb.reshape(batch, gen_len, cfg.hidden_size)
        if noisy_mask is None:
            gen = gen + temb
        else:
            gen = gen + temb * noisy_mask.astype(self.dtype)[:, :, None]

        cos, sin = cosmos3_mrope(cfg, position_ids)
        rope_und = (cos[:, :und_len], sin[:, :und_len])
        rope_gen = (cos[:, und_len:], sin[:, und_len:])

        layer_cls = nn.remat(Cosmos3MoTLayer) if self.remat else Cosmos3MoTLayer
        for layer in range(cfg.num_layers):
            und, gen = layer_cls(cfg, name=f"layer_{layer}", **common, **lora)(
                und, gen, rope_und, rope_gen,
                reasoner_kv[layer] if replay else None,
            )
            self.sow("intermediates", f"layer_{layer}_hidden", gen)

        scale = lambda name: self.param(name, nn.initializers.ones, (cfg.hidden_size,), self.param_dtype)
        gen_out = _rms(gen, scale("norm_moe_gen"), cfg.rms_norm_eps)
        vision_pred = LoRADense(
            cfg.patch_latent_dim, name="proj_out", use_bias=True, **common, **lora
        )(gen_out)
        if replay:
            return vision_pred.astype(jnp.float32), None
        und_out = _rms(und, scale("norm"), cfg.rms_norm_eps)
        logits = LoRADense(cfg.vocab_size, name="lm_head", use_bias=False, **common)(und_out)
        return vision_pred.astype(jnp.float32), logits.astype(jnp.float32)


def cosmos3_patchify(latents: jax.Array, patch: int = 2) -> jax.Array:
    """(B, T, H, W, C) NHWC video latents → (B, T·H/p·W/p, p²·C) tokens in the
    reference (t, h, w, p, q, c) feature order (_patchify_and_pack_latents)."""
    b, t, h, w, c = latents.shape
    x = latents.reshape(b, t, h // patch, patch, w // patch, patch, c)
    x = jnp.transpose(x, (0, 1, 2, 4, 3, 5, 6))
    return x.reshape(b, t * (h // patch) * (w // patch), patch * patch * c)


def cosmos3_unpatchify(tokens: jax.Array, t: int, h: int, w: int, patch: int = 2) -> jax.Array:
    b = tokens.shape[0]
    c = tokens.shape[-1] // (patch * patch)
    x = tokens.reshape(b, t, h // patch, w // patch, patch, patch, c)
    x = jnp.transpose(x, (0, 1, 2, 4, 3, 5, 6))
    return x.reshape(b, t, h, w, c)


def cosmos3_position_ids(
    config: Cosmos3Config, und_len: int, t: int, h: int, w: int,
    temporal_margin: int = 15000,
) -> np.ndarray:
    """(3, S_und + S_gen) mRoPE ids: text counts all three axes together; the
    vision grid restarts spatial axes and offsets the temporal axis by the
    modality margin (reference unified_3d_mrope semantics)."""
    p = config.latent_patch_size
    hh, ww = h // p, w // p
    text = np.tile(np.arange(und_len), (3, 1))
    t_ids = np.repeat(np.arange(t), hh * ww) + und_len + temporal_margin
    h_ids = np.tile(np.repeat(np.arange(hh), ww), t)
    w_ids = np.tile(np.arange(ww), t * hh)
    vision = np.stack([t_ids, h_ids, w_ids])
    return np.concatenate([text, vision], axis=1)
